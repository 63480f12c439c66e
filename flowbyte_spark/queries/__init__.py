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
# must lead with these names.  Round 6: r5's four tier-3 queries (v79-v82)
# lead the r6 window; the head list then refilled the window exactly
# (4 tier-3 + 28 no-r5-row + 11 changed-in-round + 5 new = 48 named +
# 2 from the sorted remainder = 50), so v88/v90 — added after
# saturation — carry tier-3 coverage and lead r7.
POST_WINDOW_NEW: frozenset[str] = frozenset(
    {
        "v88_variant_json",
        "v90_q21_waiting_suppliers",
        "v91_lateral_topk",
        "v92_recursive_cte",
        "v93_xml_extract",
        "v94_salted_join",
        "v95_two_phase_agg",
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
        relational,
        relational2,
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
    # ROUND-7 REBUILD RECIPE: replace this list with (a) any
    # POST_WINDOW_NEW names (tier-3, never driver-verified — must lead),
    # (b) every query with no row in CORRECTNESS_r06.json, (c) every
    # query _coverage marks narrow-changed in round 7.  Update
    # test_driver_window_plus_prior_files_cover_everything to also read
    # the r6 file.
    first = [
        # r5's tier-3 additions: NEVER driver-verified (no row in any
        # CORRECTNESS file) — they lead, per r5 VERDICT mandate #1.
        "v79_c4_quality_filter",
        "v80_exact_substrings",
        "v81_stream_stream_join",
        "v82_python_datasource",
        # no round-5 driver row (rotated out of r5's 50-query window;
        # all green in CORRECTNESS_r04.json or earlier).
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
        "v12_set_ops",
        "v14_json_extract",
        "v15_time_bucket",
        "v16_count_distinct",
        "v33_asof_join",
        "v35_pivot",
        "v37_approx_distinct",
        "v38_tfidf",
        "v39_map_struct_json",
        "v40_math_funcs",
        "v41_session_window",
        "v43_percentiles_stats",
        "v44_string_funcs",
        "v45_date_funcs",
        "v61_approx_percentiles",
        "v62_full_outer_join",
        "v63_right_outer_join",
        # changed in round 6 (forced in-window by the _coverage policy
        # test): DSIR one-scan rework, stateful key-guard lift, ADVICE
        # fixes (simhash empty-doc join-back, sep regex-escape in
        # paragraph/substr/c4, gopher boolean rule guards).
        "v71_dsir_importance",  # importance.py one-scan rework
        "v75_stateful_totals",  # stateful.py max_keys guard lift
        "v24_simhash",  # dedup.py simhash empty-doc zero-signature
        "v78_paragraph_dedup",  # paragraphs.py sep escape
        "v65_repetition_signals",  # text.py gopher rule-column guard
        "v31_multimodal_features",  # multimodal.py real PNG kernel dispatch
        "v20_cosine_topk",  # similarity.py gained the PQ tier (module residue)
        "v25_ann_ivf",  # same
        "v26_embedding_neardup",  # same
        "v70_semantic_dedup",  # same
        "v77_q18_large_orders",  # relational2.py gained v85/v86 (residue)
        # new in round 6: no prior driver row exists at all.  (Names are
        # appended here in the same commit that registers each query —
        # test_rotation_head_names_all_exist fails otherwise.)
        "v83_jdbc_roundtrip",
        "v84_media_decode",
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
