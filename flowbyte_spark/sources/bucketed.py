"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB, the dominant cost of a fact⋈fact join is the shuffle.  Writing
both tables bucketed by the join key (same bucket count) stores them
pre-partitioned: Spark's scan reports the bucketing as the output
partitioning and the join planner skips both Exchanges entirely.  The
write pays one shuffle once; every subsequent join is shuffle-free —
the right trade for tables joined repeatedly (fact tables keyed by
entity id, feature stores, …).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    num_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save as a bucketed (and optionally sorted) catalog table.

    ``sort_by`` additionally sorts within buckets — joins on the sorted
    key can skip the in-task sort of a sort-merge join.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog; a
    plain path read would lose it)."""
    return spark.table(table_name)
