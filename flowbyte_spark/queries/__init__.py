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
# must lead with these names.  Round 8: r6's seven tier-3 queries
# (v88_variant_json, v90_q21_waiting_suppliers, v91_lateral_topk,
# v92_recursive_cte, v93_xml_extract, v94_salted_join, v95_two_phase_agg)
# moved INTO the window head (they lead the r8 rotation below), which
# then refilled to exactly 50 named slots mid-round — so the queries
# registered after saturation — v97_jpeg_decode, v98_wav_decode,
# v99_y4m_decode (the real JPEG/WAV/y4m kernels under the hash gate)
# and v89_asof_forward (forward-direction ASOF vs DuckDB's native
# forward ASOF) — carry tier-3 coverage and must lead r9's window.
POST_WINDOW_NEW: frozenset[str] = frozenset(
    {"v97_jpeg_decode", "v98_wav_decode", "v99_y4m_decode",
     "v89_asof_forward", "v100_srp_neardup", "v101_url_dedup"}
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
    # ROUND-9 REBUILD RECIPE: replace this list with (a) the six
    # POST_WINDOW_NEW names (v89, v97-v101 — tier-3, never
    # driver-verified — they MUST lead), (b) every query with no row in
    # CORRECTNESS_r08.json or CORRECTNESS_r05.json-or-later per the
    # union-coverage policy, (c) every query _coverage marks
    # narrow-changed in round 9.  Update test_registry.py's prior-files
    # list to include r08 and refresh the README counts.
    #
    # ROUND-8 WINDOW (r7 shipped no commits, so this executes the rotation
    # r7 was mandated to run): (a) the seven r6 tier-3 queries that have
    # NEVER had a driver row lead; (b) every query whose last driver row
    # is CORRECTNESS_r05.json (rotated out of the r6/r7 window) refills;
    # (c) queries whose code changes in round 8 close the list.  44+6
    # named = the full 50-slot window.
    first = [
        # (a) r6's post-saturation additions: NEVER driver-verified (no
        # row in any CORRECTNESS file) — they lead, per r7 VERDICT #1.
        "v88_variant_json",
        "v90_q21_waiting_suppliers",
        "v91_lateral_topk",
        "v92_recursive_cte",
        "v93_xml_extract",
        "v94_salted_join",
        "v95_two_phase_agg",
        # (b) no r6/r7 driver row (last green in CORRECTNESS_r05.json).
        "v18_insert_delete",
        "v19_dedup_exact",
        "v21_dedup_content_hash",
        "v22_minhash_lsh",
        "v23_jaccard_pairs",
        "v27_text_quality",
        "v28_lang_id",
        "v29_token_count",
        "v30_fingerprint",
        "v32_streaming_window",
        "v34_range_join",
        "v36_grouping_sets",
        "v42_cube",
        "v46_array_funcs",
        "v47_null_conditional",
        "v48_exists_subquery",
        "v49_scalar_subquery",
        "v50_window_battery",
        "v51_unpivot",
        "v52_string_agg",
        "v53_hash_split",
        "v54_pack_by_budget",
        "v55_stratified_sample",
        "v56_interleave",
        "v57_corpus_prep",
        "v58_cross_join",
        "v59_sliding_window",
        "v60_late_data_drop",
        "v64_neardup_clusters",
        "v66_scd2_merge",
        "v67_cluster_corpus_prep",
        "v68_pii_scrub",
        "v69_decontaminate",
        "v72_global_shuffle",
        "v73_stream_dedup",
        "v74_domain_cap",
        "v76_stream_upsert",
        # (c) changed in round 8 (forced in-window by the _coverage
        # policy test): C4 filter single-pass fuse; Python DS stream
        # writer manifest-before-delete crash-window fix; asof.py tagging
        # refactor (v33) + the new salted ASOF operator (v96).
        "v79_c4_quality_filter",  # quality_filter.py fused line pass
        "v82_python_datasource",  # python_ds.py commit-order fix
        "v33_asof_join",  # asof.py _tag_union refactor
        "v96_salted_asof",  # new in round 8: skew-resistant ASOF join
        "v31_multimodal_features",  # multimodal.py JPEG kernel dispatch
        "v84_media_decode",  # same
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
