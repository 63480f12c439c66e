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
# must lead with these names.  Round 11: the r10 batch (v116-v123) now
# LEADS the window per the pinned rotation and this round's v124-v127
# fit inside it; the window then saturated at exactly 50, so the second
# batch of round-11 additions below carries the in-suite differential
# until they lead r12's window.
POST_WINDOW_NEW: frozenset[str] = frozenset(
    {
        "v128_q17_small_quantity",
        "v129_doc_chunking",
        "v130_stream_full_outer_join",
        "v131_bucketed_agg",
        "v132_stream_join_window",
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
    # ROUND-11 WINDOW (executes the recipe pinned at r10 close —
    # VERDICT r10 "next round" #1):
    # (a) the 8 r10 POST_WINDOW_NEW queries (tier-3, never
    # driver-verified) LEAD, in their pinned order;
    # (b) round-11 registrations, never driver-verified (v124-v127);
    # (c) the 20 queries whose last driver row is CORRECTNESS_r08.json
    # (the r8 freshness floor — r10 VERDICT mandate);
    # (d) queries whose code changes in round 11: the v71 DSIR perf
    # rework plus the floor-adjacent perf targets v65/v34/v90;
    # (e) refill with r9-aged queries (45 exist, 13 fit).
    first = [
        # (a) r10 post-saturation additions — must lead r11.
        "v116_q22_idle_customers",
        "v117_batched_ann",
        "v118_incremental_agg",
        "v119_stream_outer_join",
        "v120_skewed_join_agg",
        "v121_bloom_filter_join",
        "v122_sparse_cosine_pairs",
        "v123_schema_evolution",
        # (b) new round-11 registrations — never driver-verified.
        "v124_incremental_minmax",
        "v125_stream_session_window",
        "v126_schema_widening",
        "v127_prefix_cosine_pairs",
        # (c) last driver row is r8 — two rounds stale, must refresh.
        "v27_text_quality",
        "v28_lang_id",
        "v29_token_count",
        "v30_fingerprint",
        "v36_grouping_sets",
        "v42_cube",
        "v46_array_funcs",
        "v47_null_conditional",
        "v50_window_battery",
        "v51_unpivot",
        "v52_string_agg",
        "v53_hash_split",
        "v54_pack_by_budget",
        "v55_stratified_sample",
        "v56_interleave",
        "v57_corpus_prep",
        "v58_cross_join",
        "v72_global_shuffle",
        "v74_domain_cap",
        "v95_two_phase_agg",
        # (d) round-11 perf work (changed or adjudicated in-round),
        # plus v38 (tfidf module changed by the prefix-filter work).
        "v71_dsir_importance",
        "v65_repetition_signals",
        "v34_range_join",
        "v90_q21_waiting_suppliers",
        "v38_tfidf",
        # (e) last driver row is r9 — refill.
        "v01_scan",
        "v02_project_filter",
        "v03_agg_q1",
        "v04_join_agg",
        "v05_q3_top10",
        "v06_left_join_coalesce",
        "v07_semi_anti",
        "v08_theta_join",
        "v09_rollup",
        "v10_window_rank",
        "v100_srp_neardup",
        "v101_url_dedup",
        "v102_partition_pruning",
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
