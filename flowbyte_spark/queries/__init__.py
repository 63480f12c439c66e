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

# Queries introduced AFTER this round's 50-slot driver window saturated
# (the window must hold the 17 no-r4-row queries plus every query whose
# code changed in-round — exactly 50).  Tier-3 coverage contract, pinned
# by tests/test_registry.py: each entry must carry a hash oracle AND an
# in-suite differential test (the identical comparison the driver runs),
# and the NEXT round's window must lead with these names.
POST_WINDOW_NEW: frozenset[str] = frozenset(
    {
        "v79_c4_quality_filter",
        "v80_exact_substrings",
        "v81_stream_stream_join",
        "v82_python_datasource",
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
    dict-iteration order, so with 68+ registered queries we rotate which
    ones lead.  Round 4's file covered v01-v45 + v59-v63; the 17 it missed
    (v46-v58, v64-v67) lead this round.  Policy (pinned by
    tests/test_registry.py via queries/_coverage.py): any query whose code
    changed in-round — at function granularity, transitively — must also
    sit inside the 50-query window, so in-round rewrites always get an
    in-round driver row (the gap that shipped v34 broken in r3 and left
    v64/v65/v67 unverified in r4).
    """
    # ROUND-6 REBUILD RECIPE: replace this list with (a) POST_WINDOW_NEW
    # (tier-3, never driver-verified — must lead), (b) every query with
    # no row in CORRECTNESS_r05.json (the set below minus r5's window),
    # (c) every query _coverage marks narrow-changed in round 6.  Update
    # test_driver_window_plus_r4_file_covers_everything to read the r5
    # file at the same time.
    first = [
        # no round-4 driver row (rotated out of the 50-query window).
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
        "v64_neardup_clusters",
        "v65_repetition_signals",
        "v66_scd2_merge",
        "v67_cluster_corpus_prep",
        # changed-in-round-5 queries that sorted order would leave outside
        # the window (forced in by the _coverage policy test).
        "v34_range_join",  # asof.py integer bucket math
        "v36_grouping_sets",  # cube_agg → cache (r5 seam/accounting edits)
        "v42_cube",  # cube_agg imports operators.cache (exact-id accounting)
        # streaming_q rewrites this round (sentinel build, scoped state
        # width) — narrow-affected, must re-verify in-window.
        "v32_streaming_window",
        "v59_sliding_window",
        "v60_late_data_drop",
        # new this round: no prior driver row exists at all.
        "v68_pii_scrub",
        "v69_decontaminate",
        "v70_semantic_dedup",
        "v71_dsir_importance",
        "v72_global_shuffle",
        "v73_stream_dedup",
        "v74_domain_cap",
        "v75_stateful_totals",
        "v76_stream_upsert",
        "v77_q18_large_orders",
        "v78_paragraph_dedup",
        # text.py/dedup.py/similarity.py gained or touched operators in-
        # round (PII scrub, decontamination, IVF index reuse); the
        # conservative module-level change tracking marks their sibling
        # queries changed too — re-verify in-window.
        "v19_dedup_exact",
        "v20_cosine_topk",
        "v21_dedup_content_hash",
        "v22_minhash_lsh",
        "v23_jaccard_pairs",
        "v24_simhash",
        "v25_ann_ivf",
        "v26_embedding_neardup",
        "v27_text_quality",
        "v28_lang_id",
        "v29_token_count",
        "v30_fingerprint",
        "v31_multimodal_features",
        # merge/mutate/table seam + v13 sort/catalog work this round.
        "v13_scalar_funcs",
        "v17_update_by_keys",
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
