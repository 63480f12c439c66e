"""Driver contract for the flowbyte-spark engine.

``entry(spark)`` runs the flagship query (TPC-H Q1 shape, V03) at sf0.001.
``queries()`` exposes every implemented verification query from
SURVEY.md §2.11; ``oracle_sql()`` the matching DuckDB oracles.  Query
implementations live in :mod:`flowbyte_spark.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from flowbyte_spark.queries import ORACLE, QUERIES  # noqa: E402
from flowbyte_spark.session import configure  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return QUERIES["v03_agg_q1"](spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Align the driver-owned session with engine semantics (UTC
        # timestamps, Arrow, nanos-parquet handling) before planning.
        configure(spark)
        # The driver sweeps 50 queries through ONE session, collecting
        # each result before requesting the next — so the previous
        # query's tracked caches (LSH signature tables, gram streams,
        # CC round checkpoints) are already materialized and safe to
        # free.  Without this, executor storage accumulates across the
        # sweep and the heavy tail runs against a polluted heap.
        from flowbyte_spark.operators import cache

        cache.release_persisted()
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each queries() entry (omitted only for
    non-SQL-expressible operators, which get a rows-only check)."""
    return dict(ORACLE)
