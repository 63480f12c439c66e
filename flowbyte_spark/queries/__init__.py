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
        pipeline_q,
        pipeline2,
        relational,
        streaming_q,
        tier_a,
    )


_load_all()


def _reorder() -> None:
    """Deterministic driver-facing ordering.

    The driver's correctness sweep caps at 50 queries per round in
    dict-iteration order, so with 66+ registered queries we rotate which
    ones lead.  Round 2's file covered v01-v45 + v59-v63; the 16 it missed
    (v46-v58, v64-v66) plus any brand-new queries go first this round so
    the union of rounds leaves nothing without a driver-green row.
    """
    first = [
        # never driver-verified (registered in round 2's final commit)
        "v64_neardup_clusters",
        "v65_repetition_signals",
        "v66_scd2_merge",
        # new this round
        "v67_cluster_corpus_prep",
        # green in round 1 but rotated out of round 2's 50-row file
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
    ]
    rest = sorted(k for k in QUERIES if k not in first)
    order = [k for k in first if k in QUERIES] + rest
    for mapping in (QUERIES, ORACLE):
        snapshot = {k: mapping[k] for k in order if k in mapping}
        mapping.clear()
        mapping.update(snapshot)


_reorder()
