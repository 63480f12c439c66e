"""Size-adaptive global ordering.

``orderBy`` always plans a range exchange: a sampling pass over the sort
input to pick partition bounds, a full shuffle, then per-partition sorts.
That is the right plan whenever the data spans many partitions — and pure
overhead when the sort input is ONE partition, where the exchange samples
and shuffles rows that are already globally contiguous and a
partition-local sort is, provably, a total order.

``global_sort`` makes that cost-based call the way an optimizer would —
from the plan's source statistics, not the data: when every scan feeding
the sort fits below ``spark.sql.files.maxPartitionBytes`` (so the scan
side is a single split) and the only join in between is hinted broadcast
(stream-side partitioning preserved, so the join output inherits the
single partition), it emits ``sortWithinPartitions``; otherwise the
ordinary ``orderBy``.  At 100 TB the byte check fails immediately and the
plan is byte-identical to plain ``orderBy`` — the branch exists to stop a
fixed two-extra-stage tax (sample job + shuffle + an AQE replan barrier,
~0.2 s) from dominating sub-second interactive queries, exactly the
"small query fast path" classical engines apply before parallelizing a
sort.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def max_partition_bytes(spark: SparkSession) -> int:
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    raw = raw.lower().rstrip("b")
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if raw.endswith(suffix):
            return int(float(raw[:-1]) * mult)
    return int(raw)


def source_bytes(*paths: str) -> int:
    """Total on-disk bytes of the given parquet files/directories."""
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def fits_single_partition(spark: SparkSession, *paths: str) -> bool:
    """True when the scan over ``paths`` is one split — i.e. a partition-
    local sort of a plan streaming from it is already a total order."""
    return source_bytes(*paths) <= max_partition_bytes(spark)


def global_sort(df: DataFrame, cols, *, single_partition: bool) -> DataFrame:
    """Totally-ordered ``df`` by ``cols``.

    ``single_partition`` is the caller's statistics-based claim that the
    plan's output is one partition (see :func:`fits_single_partition`) —
    under it the range exchange is elided.  A wrong claim cannot corrupt
    data, only ordering; keep the claim to stream-side-preserving plans
    (scans, filters, projections, broadcast-hash joins probing the single
    partition side).
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    if single_partition:
        return df.sortWithinPartitions(*cols)
    return df.orderBy(*cols)
