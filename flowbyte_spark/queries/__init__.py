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
# must lead with these names.  Round 12: the r11 batch (v128-v132) now
# LEADS the window per the pinned rotation; the window refilled to
# exactly 50 (v133/v134 in-window), so the second batch of round-12
# additions below carries the in-suite differential until they lead
# r13's window.
POST_WINDOW_NEW: frozenset[str] = frozenset(
    {
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
    # ROUND-12 WINDOW (executes the recipe pinned at r11 close —
    # VERDICT r11 "next round" #1):
    # (a) the 5 r11 POST_WINDOW_NEW queries (tier-3, never
    # driver-verified) LEAD, in their pinned order;
    # (b) round-12 registrations, never driver-verified (v133, v134);
    # (c) the 30 queries whose last driver row is CORRECTNESS_r09.json
    # (the r9 freshness floor — r11 VERDICT mandate: after r12 nothing
    # outside the window may be older than r10);
    # (d) queries whose code changes in round 12: the v39 JSON-path
    # rework, the v88 variant re-measure, the tfidf family (v127
    # crossover soak touches the module) and the incremental family
    # (v124 partitioned-fact soak);
    # (e) refill remaining slots with the oldest r10-aged queries.
    first = [
        # (a) r11 post-saturation additions — must lead r12.
        "v128_q17_small_quantity",
        "v129_doc_chunking",
        "v130_stream_full_outer_join",
        "v131_bucketed_agg",
        "v132_stream_join_window",
        # (b) new round-12 registrations — never driver-verified.
        "v133_stream_dedup_join_window",
        "v134_cbo_join_order",
        # (c) last driver row is r9 — the freshness floor, must refresh.
        "v103_dpp_star_join",
        "v104_srp_cluster_dedup",
        "v105_runtime_filter_join",
        "v109_q7_volume_shipping",
        "v110_q8_market_share",
        "v111_stream_static_join",
        "v11_window_frames",
        "v14_json_extract",
        "v17_update_by_keys",
        "v31_multimodal_features",
        "v33_asof_join",
        "v37_approx_distinct",
        "v43_percentiles_stats",
        "v61_approx_percentiles",
        "v70_semantic_dedup",
        "v75_stateful_totals",
        "v77_q18_large_orders",
        "v78_paragraph_dedup",
        "v79_c4_quality_filter",
        "v81_stream_stream_join",
        "v82_python_datasource",
        "v83_jdbc_roundtrip",
        "v84_media_decode",
        "v85_salted_window",
        "v86_salted_lag",
        "v87_pq_ann",
        "v89_asof_forward",
        "v97_jpeg_decode",
        "v98_wav_decode",
        "v99_y4m_decode",
        # (d) round-12 in-round code changes (perf reworks + soak work).
        "v39_map_struct_json",
        "v88_variant_json",
        "v126_schema_widening",
        "v38_tfidf",
        "v122_sparse_cosine_pairs",
        "v127_prefix_cosine_pairs",
        "v118_incremental_agg",
        "v124_incremental_minmax",
        # (e) oldest r10-aged refills (lowest query number first).
        "v12_set_ops",
        "v13_scalar_funcs",
        "v15_time_bucket",
        "v16_count_distinct",
        "v18_insert_delete",
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
