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
# must lead with these names.  Round 9: r8's six post-saturation
# additions (v89_asof_forward, v97_jpeg_decode, v98_wav_decode,
# v99_y4m_decode, v100_srp_neardup, v101_url_dedup) moved INTO the
# window head per the pinned recipe (they lead the r9 rotation below),
# so the set is empty until the r9 window saturates again.
POST_WINDOW_NEW: frozenset[str] = frozenset()


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
    # ROUND-9 WINDOW (executes the recipe pinned at r8 close):
    # (a) r8's six post-saturation additions — NEVER driver-verified
    # (no row in any CORRECTNESS file) — lead, per r8 VERDICT #1;
    # (b) refill with every query whose last driver row is
    # CORRECTNESS_r07.json so nothing ages past two rounds (45 such
    # queries exist; 37 fit — the 8 deferred to r10 are the stable
    # pure-function batteries v13/v15/v39/v40/v44/v45 plus the
    # rows-only-by-design v37/v61, all unchanged since r5);
    # (c) queries whose code changes in round 9 (ADVICE fixes touch
    # jpeg/wav/y4m/multimodal/srp → v31, v84; asof auto-bucket → v33,
    # v96) plus the round's new registrations close the list to 50.
    first = [
        # (a) never driver-verified: tier-3 in r8, must lead.
        "v89_asof_forward",
        "v97_jpeg_decode",
        "v98_wav_decode",
        "v99_y4m_decode",
        "v100_srp_neardup",
        "v101_url_dedup",
        # (c) changed in round 9 (ADVICE fixes / asof heuristic) and new
        # round-9 registrations (never verified — must be in-window).
        "v102_partition_pruning",
        "v103_dpp_star_join",
        "v104_srp_cluster_dedup",
        "v31_multimodal_features",
        "v84_media_decode",
        "v33_asof_join",
        "v96_salted_asof",
        # llm2.py gained a module-level shared-oracle constant, so the
        # function-granular coverage conservatively marks every llm2
        # query changed; v79/v82 are the two not already in the window.
        "v79_c4_quality_filter",
        "v82_python_datasource",
        "v105_runtime_filter_join",
        "v106_data_expectations",
        "v107_snapshot_diff",
        "v108_table_profile",
        "v109_q7_volume_shipping",
        "v110_q8_market_share",
        "v111_stream_static_join",
        "v37_approx_distinct",
        "v61_approx_percentiles",
        # (b) last driver row is r7 — refill so they don't go stale.
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
        "v11_window_frames",
        "v14_json_extract",
        "v17_update_by_keys",
        "v43_percentiles_stats",
        "v65_repetition_signals",
        "v70_semantic_dedup",
        "v71_dsir_importance",
        "v75_stateful_totals",
        "v77_q18_large_orders",
        "v78_paragraph_dedup",
        "v80_exact_substrings",
        "v81_stream_stream_join",
        "v83_jdbc_roundtrip",
        "v85_salted_window",
        "v86_salted_lag",
        "v87_pq_ann",
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
