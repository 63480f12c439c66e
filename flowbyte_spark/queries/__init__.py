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

    The round-1 driver truncated the correctness sweep after 50 entries in
    dict-iteration order, leaving the dict tail (v12-v18, v32) unverified.
    Put those first so a truncated sweep still covers them, then everything
    else in ascending vNN order (cheap relational queries surface early,
    heavy LSH/streaming shapes later).
    """
    first = [
        "v12_set_ops",
        "v13_scalar_funcs",
        "v14_json_extract",
        "v15_time_bucket",
        "v16_count_distinct",
        "v17_update_by_keys",
        "v18_insert_delete",
        "v32_streaming_window",
        # round-2 additions: not yet driver-verified, so they also go first
        "v59_sliding_window",
        "v60_late_data_drop",
        "v61_approx_percentiles",
        "v62_full_outer_join",
        "v63_right_outer_join",
    ]
    rest = sorted(k for k in QUERIES if k not in first)
    order = [k for k in first if k in QUERIES] + rest
    for mapping in (QUERIES, ORACLE):
        snapshot = {k: mapping[k] for k in order if k in mapping}
        mapping.clear()
        mapping.update(snapshot)


_reorder()
