"""Size-adaptive global ordering.

``orderBy`` always plans a range exchange: a sampling pass over the sort
input to pick partition bounds, a full shuffle, then per-partition sorts.
That is the right plan whenever the data spans many partitions — and pure
overhead when the sort input is ONE partition, where the exchange samples
and shuffles rows that are already globally contiguous and a
partition-local sort is, provably, a total order.

``global_sort`` makes that cost-based call the way an optimizer would —
from the plan's source statistics, not the data: when every scan feeding
the sort is a single split (computed with Spark's own
``FilePartition`` packing formula — see :func:`scan_partitions`; a raw
byte threshold is NOT equivalent) and the only join in between is hinted
broadcast (stream-side partitioning preserved, so the join output
inherits the single partition), it emits ``sortWithinPartitions``;
otherwise the ordinary ``orderBy``.  At 100 TB the check fails on the
first extra file and the
plan is byte-identical to plain ``orderBy`` — the branch exists to stop a
fixed two-extra-stage tax (sample job + shuffle + an AQE replan barrier,
~0.2 s) from dominating sub-second interactive queries, exactly the
"small query fast path" classical engines apply before parallelizing a
sort.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    try:
        raw = str(spark.conf.get(key))
    except Exception:
        return default
    raw = raw.lower().rstrip("b")
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if raw.endswith(suffix):
            return int(float(raw[:-1]) * mult)
    try:
        return int(raw)
    except ValueError:
        return default


def _file_sizes(*paths: str) -> list[int]:
    sizes: list[int] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                sizes.extend(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        elif os.path.exists(p):
            sizes.append(os.path.getsize(p))
    return sizes


def scan_partitions(spark: SparkSession, *paths: str) -> int:
    """Partition count of a parquet scan over ``paths``, computed exactly
    as `FilePartition.getFilePartitions` does — from file sizes and confs,
    no plan materialization.

    ``maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    totalBytes/minPartitionNum))``; files larger than it are split, then
    (split, file) chunks are packed greedily (each file also costs
    ``openCostInBytes`` toward the bin).  The subtle consequence this gets
    right (a byte-threshold check does NOT): ten 2 MB files total 20 MB —
    far below maxPartitionBytes — yet scan as TEN partitions, because
    maxSplitBytes collapses to the open cost and each padded file
    overflows the bin.
    """
    sizes = _file_sizes(*paths)
    if not sizes:
        return 0
    max_pb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    parallelism = spark.sparkContext.defaultParallelism
    min_pn = int(
        _conf_bytes(spark, "spark.sql.files.minPartitionNum", parallelism)
        or parallelism
    )
    total = sum(sizes) + open_cost * len(sizes)
    max_split = min(max_pb, max(open_cost, total // max(min_pn, 1)))
    chunks: list[int] = []
    for s in sorted(sizes, reverse=True):
        while s > max_split:
            chunks.append(max_split)
            s -= max_split
        chunks.append(s)
    partitions, current = 0, 0
    for c in chunks:  # greedy pack in descending-size order, like Spark
        if current + c > max_split and current > 0:
            partitions += 1
            current = 0
        current += c + open_cost  # accumulated size carries the open cost
    return partitions + (1 if current > 0 else 0)


def fits_single_partition(spark: SparkSession, *paths: str) -> bool:
    """True when EVERY listed scan is ONE split — i.e. a partition-local
    sort of a plan streaming from (a broadcast-join chain over) them is
    already a total order.  Each path is its own scan, so partition counts
    are computed per path, not pooled."""
    return all(scan_partitions(spark, p) == 1 for p in paths)


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
