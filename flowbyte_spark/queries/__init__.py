"""Query registry: every verification query (SURVEY.md §2.11) registered as
a (Spark callable, DuckDB oracle SQL) pair.

``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame``; ``ORACLE[name]`` is
ANSI SQL DuckDB runs over the same parquet fixtures.  Column names/aliases
match exactly between the two — the driver sorts columns by name before
hashing values.  Queries with no SQL-expressible oracle (streaming, LSH
internals) register with ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Queries introduced AFTER the current round's 50-slot driver window
# saturated.  Tier-3 coverage contract, pinned by tests/test_registry.py:
# each entry must carry a hash oracle AND an in-suite differential test
# (the identical comparison the driver runs), and the NEXT round's window
# must lead with these names.  Round 13: the 26 r12 post-saturation
# queries (v135-v160) now LEAD the window per the pinned rotation, so
# this set is EMPTY — it refills only if round 13 registers queries
# after its own window saturates.
POST_WINDOW_NEW: frozenset[str] = frozenset()

# The r13 window holds 26 first-driver-row queries + 24 refreshes, which
# leaves 16 r10-aged queries un-refreshed (26 + 40 candidates > 50
# slots — the two-round schedule mandated at r12 close).  These names
# are PINNED to lead round 14's window; tests/test_registry.py derives
# the same set from the CORRECTNESS_r* files and asserts it matches, so
# the pin cannot drift from the actual freshness ledger.
#
# R14 RECIPE (assuming CORRECTNESS_r13 lands green on the current
# window): these 16 lead, then exactly 34 refill slots remain for the
# 44 queries whose latest driver row is r11.  Lowest query number
# first, the 34 refills are v01-v10, v27-v30, v34, v36, v42, v46,
# v47, v50-v58, v65, v71, v72, v74, v90, v95; the 10-query r11-aged
# residue to pin for r15 is v100, v101, v102, v116, v117, v119,
# v120, v121, v123, v125.  This is
# also why round 13 registered ZERO new queries: any POST_WINDOW_NEW
# entry would displace a refill and stretch the freshness debt a
# third round.
R14_PINNED: frozenset[str] = frozenset(
    {
        "v68_pii_scrub",
        "v69_decontaminate",
        "v73_stream_dedup",
        "v76_stream_upsert",
        "v91_lateral_topk",
        "v92_recursive_cte",
        "v93_xml_extract",
        "v94_salted_join",
        "v96_salted_asof",
        "v106_data_expectations",
        "v107_snapshot_diff",
        "v108_table_profile",
        "v112_bucketed_smb_join",
        "v113_null_aware_anti",
        "v114_correlated_max_order",
        "v115_profile_approx",
    }
)


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle) to the
    registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from flowbyte_spark.queries import (  # noqa: F401
        batteries,
        batteries2,
        batteries3,
        connectors_q,
        extended,
        functions_q,
        session_q,
        llm,
        llm2,
        pipeline_q,
        pipeline2,
        quality_q,
        relational,
        relational2,
        relational3,
        relational4,
        round10b,
        round11,
        round12,
        round12b,
        round12c,
        scale_q,
        streaming_q,
        tier_a,
    )


_load_all()


def _reorder() -> None:
    """Deterministic driver-facing ordering.

    The driver's correctness sweep caps at 50 queries per round in
    dict-iteration order, so with 80+ registered queries we rotate which
    ones lead.  Policy (pinned by tests/test_registry.py via
    queries/_coverage.py): any query whose code changed in-round — at
    function granularity, transitively — must also sit inside the
    50-query window, so in-round rewrites always get an in-round driver
    row (the gap that shipped v34 broken in r3 and left v64/v65/v67
    unverified in r4).
    """
    # ROUND-13 WINDOW (executes the recipe pinned at r12 close —
    # VERDICT r12 "next round" #1):
    # (a) the 26 r12 POST_WINDOW_NEW queries (v135-v160, tier-3, never
    # driver-verified) LEAD, in their pinned order;
    # (b) refill the remaining 24 slots with r10-aged queries, lowest
    # query number first — EXCEPT v80 is pulled in ahead of v68 because
    # round 13's v80 soak work (VERDICT r12 task 3) may touch
    # operators/substrings.py, and in-round-changed queries must sit
    # inside the window.  The 16-query residue is pinned, in code, to
    # lead round 14 (R14_PINNED above).
    first = [
        # (a) r12 post-saturation additions — must lead r13.
        "v135_incremental_minmax_pruned",
        "v136_frequent_terms_sketch",
        "v137_incremental_distinct_hll",
        "v138_q2_min_cost_supplier",
        "v139_q13_order_distribution",
        "v140_q20_excess_shippers",
        "v141_q19_disjunctive_revenue",
        "v142_q15_top_supplier",
        "v143_q16_supplier_count",
        "v144_q11_important_parts",
        "v145_q14_promo_share",
        "v146_incremental_topk",
        "v147_q4_priority_check",
        "v148_q5_local_volume",
        "v149_q6_forecast_revenue",
        "v150_q9_product_profit",
        "v151_q10_returned_items",
        "v152_q12_ship_priority",
        "v153_incremental_variance",
        "v154_gapfill_locf",
        "v155_interval_range_window",
        "v156_width_bucket_histogram",
        "v157_funnel_analysis",
        "v158_cohort_retention",
        "v159_stream_topk",
        "v160_pagerank",
        # (b) r10-aged refills (24 of 40; residue pinned to lead r14).
        "v19_dedup_exact",
        "v20_cosine_topk",
        "v21_dedup_content_hash",
        "v22_minhash_lsh",
        "v23_jaccard_pairs",
        "v24_simhash",
        "v25_ann_ivf",
        "v26_embedding_neardup",
        "v32_streaming_window",
        "v35_pivot",
        "v40_math_funcs",
        "v41_session_window",
        "v44_string_funcs",
        "v45_date_funcs",
        "v48_exists_subquery",
        "v49_scalar_subquery",
        "v59_sliding_window",
        "v60_late_data_drop",
        "v62_full_outer_join",
        "v63_right_outer_join",
        "v64_neardup_clusters",
        "v66_scd2_merge",
        "v67_cluster_corpus_prep",
        "v80_exact_substrings",
    ]
    # Runtime stays lenient (an import-time crash here would zero a whole
    # driver round); tests/test_registry.py asserts the list is exact.
    rest = sorted(k for k in QUERIES if k not in first)
    order = [k for k in first if k in QUERIES] + rest
    for mapping in (QUERIES, ORACLE):
        snapshot = {k: mapping[k] for k in order if k in mapping}
        mapping.clear()
        mapping.update(snapshot)


_reorder()
