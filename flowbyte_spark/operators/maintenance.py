"""Table maintenance (round 6): the OPTIMIZE-style jobs a long-lived
parquet table needs — small-file compaction and z-order clustering —
through ParquetTable's atomic swap protocol.

Separate module from mutate.py: mutate's units back three
driver-verified queries and the function-level change tracker treats new
module-level imports as whole-module changes, so maintenance lands here
and verified code stays byte-identical.

Scale notes: compaction is one full rewrite sized by on-disk bytes
(files_before/target); production schedules it off-peak exactly like
Delta OPTIMIZE.  Z-ordering equi-width-normalizes each clustered column
to ``bits``-bit integers (one bounded min/max aggregate) and interleaves
them MSB-first (Morton curve) in plain Catalyst bit arithmetic — every
output file then covers a small hyper-rectangle of the key space, so
parquet min/max stats prune files for predicates on ANY clustered
column, not just a lexicographic leading one.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from flowbyte_spark import log
from flowbyte_spark.operators.mutate import ParquetTable


def _table_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _parquet_file_count(path: str) -> int:
    return sum(
        1
        for _root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def _partition_dirs(path: str) -> list[str]:
    return [
        d
        for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]


def compact(table: ParquetTable, target_file_mb: int = 128) -> tuple[int, int]:
    """Rewrite the table into ~``target_file_mb`` files (Delta/Iceberg
    OPTIMIZE): streaming appends leave hundreds of small files whose
    per-file open/footer cost dominates scans long before data size
    does.  Returns (files_before, files_after).  One full rewrite
    through the atomic swap — crash-safe like every other mutation.

    Refuses hive-partitioned layouts (key=value directories): a flat
    rewrite would silently demote partition columns to data columns and
    destroy directory pruning — compact within partitions instead.
    """
    parts = _partition_dirs(table.path)
    if parts:
        raise ValueError(
            f"{table.path} is hive-partitioned ({parts[:3]}...); a flat "
            "compaction would destroy the partition layout — compact "
            "each partition directory separately"
        )
    before = _parquet_file_count(table.path)
    n_parts = max(
        1, -(-_table_bytes(table.path) // (target_file_mb * 1024 * 1024))
    )
    table._swap_in(table.read().repartition(n_parts))
    after = _parquet_file_count(table.path)
    log.success(f"compacted {table.path}: {before} -> {after} files")
    return before, after


def zorder_key(cols: Sequence[str], bits: int = 12) -> Column:
    """Interleaved-bit (Morton/Z-curve) sort key over ``bits``-bit
    non-negative integer columns, MSB-first.  Callers normalize value
    ranges first (see :func:`zorder_by`) — raw interleave lets the
    widest-range column own the high bits and degenerates to a
    single-column sort."""
    if bits * len(cols) > 63:
        raise ValueError(
            f"z-key needs {bits * len(cols)} bits but a signed long holds "
            "63 — lower bits or cluster fewer columns (the dropped bits "
            "would be the MOST significant, silently destroying the "
            "coarse ordering)"
        )
    key = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):  # MSB first
        for c in cols:
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            key = F.shiftleft(key, 1).bitwiseOR(bit)
    return key


def zorder_by(
    table: ParquetTable,
    cols: Sequence[str],
    num_files: int = 8,
    bits: int = 12,
) -> None:
    """Rewrite the table range-partitioned + sorted by the z-curve key of
    ``cols`` so file-level min/max stats prune on every clustered
    column.  Equi-width normalization per column from one bounded
    (min, max) aggregate; NULLs normalize to bucket 0 explicitly
    (``F.least`` SKIPS nulls, so an un-guarded least/coalesce chain
    would send them to the TOP bucket instead — round-6 review
    finding)."""
    import uuid as _uuid

    df = table.read()
    nonce = _uuid.uuid4().hex[:8]  # collision-proof temp names
    zcol = f"__z_{nonce}__"
    ncol = lambda i: f"__zn_{nonce}_{i}__"  # noqa: E731
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    top = (1 << bits) - 1
    normed = []
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
        span = ((mx - mn) if mn is not None and mx is not None else 0.0) or 1.0
        bucket = F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - (mn or 0.0)) / span * top + 0.5),
        )
        normed.append(
            F.when(F.col(c).isNull(), F.lit(0))
            .otherwise(bucket)
            .cast("long")
            .alias(ncol(i))
        )
    keyed = df.select("*", *normed).withColumn(
        zcol, zorder_key([ncol(i) for i in range(len(cols))], bits)
    )
    clustered = (
        keyed.repartitionByRange(num_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol, *[ncol(i) for i in range(len(cols))])
    )
    table._swap_in(clustered)
    log.success(f"z-ordered {table.path} by {list(cols)}")
