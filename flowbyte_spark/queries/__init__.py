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
# must lead with these names.  Round 10: the window refilled to exactly
# 50 (17 r7-aged + 4 new + 5 changed + 24 r8-aged), so the second batch
# of round-10 additions (queries/round10b.py) carries the in-suite
# differential until they lead r11's window.
POST_WINDOW_NEW: frozenset[str] = frozenset(
    {
        "v116_q22_idle_customers",
        "v117_batched_ann",
        "v118_incremental_agg",
        "v119_stream_outer_join",
        "v120_skewed_join_agg",
        "v121_bloom_filter_join",
        "v122_sparse_cosine_pairs",
        "v123_schema_evolution",
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
    # ROUND-10 WINDOW (executes the recipe pinned at r9 close):
    # (a) the 17 queries whose last driver row is CORRECTNESS_r07.json
    # (two rounds stale — r9 VERDICT mandate #1) lead;
    # (b) round-10 registrations, never driver-verified (v112-v115);
    # (c) queries whose code changes in round 10: ADVICE fixes touch
    # expectations → v106, quality_q → v106/v107/v108 (module-level
    # v115 constant marks the whole module), salted asof → v96, and
    # the exact-substrings plan rework → v80;
    # (d) refill with r8-aged queries (44 exist, 24 fit — the 20 left
    # at last-row=r8 are the stable pure-function/split batteries
    # v27-v30, v36, v42, v46/v47, v50-v58, v72, v74, v95; they satisfy
    # the freshness floor of r8 and must lead the r11 window).
    first = [
        # (a) last driver row is r7 — two rounds stale, must lead.
        "v12_set_ops",
        "v13_scalar_funcs",
        "v15_time_bucket",
        "v16_count_distinct",
        "v20_cosine_topk",
        "v24_simhash",
        "v25_ann_ivf",
        "v26_embedding_neardup",
        "v35_pivot",
        "v38_tfidf",
        "v39_map_struct_json",
        "v40_math_funcs",
        "v41_session_window",
        "v44_string_funcs",
        "v45_date_funcs",
        "v62_full_outer_join",
        "v63_right_outer_join",
        # (b) new round-10 registrations — never driver-verified.
        "v112_bucketed_smb_join",
        "v113_null_aware_anti",
        "v114_correlated_max_order",
        "v115_profile_approx",
        # (c) changed in round 10 (ADVICE fixes / substrings rework).
        "v80_exact_substrings",
        "v96_salted_asof",
        "v106_data_expectations",
        "v107_snapshot_diff",
        "v108_table_profile",
        # (d) last driver row is r8 — refill toward the freshness floor.
        "v18_insert_delete",
        "v19_dedup_exact",
        "v21_dedup_content_hash",
        "v22_minhash_lsh",
        "v23_jaccard_pairs",
        "v32_streaming_window",
        "v34_range_join",
        "v48_exists_subquery",
        "v49_scalar_subquery",
        "v59_sliding_window",
        "v60_late_data_drop",
        "v64_neardup_clusters",
        "v66_scd2_merge",
        "v67_cluster_corpus_prep",
        "v68_pii_scrub",
        "v69_decontaminate",
        "v73_stream_dedup",
        "v76_stream_upsert",
        "v88_variant_json",
        "v90_q21_waiting_suppliers",
        "v91_lateral_topk",
        "v92_recursive_cte",
        "v93_xml_extract",
        "v94_salted_join",
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
