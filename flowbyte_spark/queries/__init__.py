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
    dict-iteration order, so with 68+ registered queries we rotate which
    ones lead.  Round 3's file covered v01-v33 + v46-v58 + v64-v67; the 17
    it missed (v34-v45, v59-v63) go first this round — one of them (v34)
    silently broke under r3's fixture regen and the rotation gap is exactly
    how it shipped unchecked, so the no-r3-row set leads r4.
    """
    first = [
        # no round-3 driver row (rotated out of the 50-query window);
        # v34 is the round-3 regression the gap hid — it leads.
        "v34_range_join",
        "v35_pivot",
        "v36_grouping_sets",
        "v37_approx_distinct",
        "v38_tfidf",
        "v39_map_struct_json",
        "v40_math_funcs",
        "v41_session_window",
        "v42_cube",
        "v43_percentiles_stats",
        "v44_string_funcs",
        "v45_date_funcs",
        "v59_sliding_window",
        "v60_late_data_drop",
        "v61_approx_percentiles",
        "v62_full_outer_join",
        "v63_right_outer_join",
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
