"""Partitioned-layout writer, DPP-safe star join, and pruning proofs.

At 100 TB the single biggest scan-cost lever is whether a query reads
only the partitions its predicate selects.  Two mechanisms:

* **Static pruning** — free from Catalyst when the predicate names the
  partition column: the FileSourceScan's ``PartitionFilters`` carries
  the predicate and the file index never lists the other directories.
* **Dynamic partition pruning (DPP)** — the fact side of a star join is
  pruned by the DIM side's selective filter at runtime.  Two silent
  disablers found while building the verification queries (both leave
  the query correct but scanning everything):

  1. Spark's DPP rule only fires for a *likely-selective* dim predicate
     (equality / IN / LIKE...); a bare boolean column does not count.
  2. With AQE, the dynamic filter is only planned when the DIM side's
     broadcast exchange is reusable.  At small scale Spark may choose
     to broadcast the FACT instead (it fits), which quietly turns DPP
     off — so :func:`dpp_join` pins the dim side with an explicit
     ``broadcast()`` hint.  That hint is also the right call at
     production scale: the dim is the small side by construction.

Reference anchor: ``delete_data_with_conditions`` (sql.py:321-332) is
the predicated pattern the reference's users run against partitioned
layouts; this module is its scan-side dual plus the proof harness.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a directory-partitioned parquet layout.

    Partition columns become directories (``col=value/``), so any scan
    with a predicate on them lists only the matching directories —
    partition count, not data volume, bounds the planning cost.
    """
    if not partition_cols:
        raise ValueError("partition_cols must name at least one column")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def dpp_join(
    fact: DataFrame, dim: DataFrame, on: Column | list[str], how: str = "inner"
) -> DataFrame:
    """Star join whose dim side is pinned as the broadcast build side.

    Joining a partitioned fact to a filtered dim on the partition column
    makes the fact scan eligible for dynamic partition pruning — but
    ONLY if the dim is the broadcast side (see module docstring).  The
    explicit hint removes the size-estimation coin flip.
    """
    return fact.join(F.broadcast(dim), on, how)


def _walk_physical(node) -> list[Any]:
    """Flatten a physical plan, descending through AQE wrapper nodes
    (AdaptiveSparkPlanExec and QueryStageExec hide the real subtree
    behind accessors, not children())."""
    out = [node]
    name = node.getClass().getSimpleName()
    ch = node.children()
    for i in range(ch.size()):
        out.extend(_walk_physical(ch.apply(i)))
    if name == "AdaptiveSparkPlanExec":
        out.extend(_walk_physical(node.executedPlan()))
    elif name.endswith("QueryStageExec"):
        out.extend(_walk_physical(node.plan()))
    return out


def _opt_str(scala_map, key: str) -> str | None:
    opt = scala_map.get(key)
    return str(opt.get()) if not opt.isEmpty() else None


def file_scan_stats(df: DataFrame) -> list[dict]:
    """Execution stats for every file scan in ``df``'s physical plan.

    Call AFTER an action on this exact DataFrame object — the metrics
    live on its (cached) QueryExecution.  Each dict carries:
    ``num_files``, ``num_partitions`` (None for unpartitioned layouts),
    ``num_output_rows``, ``partition_filters``, ``pushed_filters``,
    ``location``.  Used by the pruning verification tests and available
    to users as a plan audit (docs/SCALE.md).
    """
    root = df._jdf.queryExecution().executedPlan()
    nodes = _walk_physical(root)
    stats = []
    for n in nodes:
        if "FileSourceScan" not in n.getClass().getSimpleName():
            continue
        metrics = n.metrics()
        vals: dict[str, int] = {}
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        md = n.metadata()
        stats.append(
            {
                "num_files": vals.get("numFiles"),
                "num_partitions": vals.get("numPartitions"),
                "num_output_rows": vals.get("numOutputRows"),
                "pruning_time_ms": vals.get("pruningTime"),
                "partition_filters": _opt_str(md, "PartitionFilters"),
                "pushed_filters": _opt_str(md, "PushedFilters"),
                "location": _opt_str(md, "Location"),
            }
        )
    return stats


def shuffle_stats(df: DataFrame) -> list[dict]:
    """Execution stats for every shuffle exchange in ``df``'s plan.

    Same post-action contract as :func:`file_scan_stats`.  One dict per
    exchange: ``records_written``, ``bytes_written``, ``data_size``.
    The audit dual of SCALE.md's "minimize shuffles" rule — what a
    query actually moved, not what the plan suggests.  AQE materializes
    each exchange both as a stage and inside its parent tree; nodes are
    deduplicated by plan id.
    """
    root = df._jdf.queryExecution().executedPlan()
    seen: set[int] = set()
    stats = []
    for n in _walk_physical(root):
        if "ShuffleExchange" not in n.getClass().getSimpleName():
            continue
        nid = n.id()
        if nid in seen:
            continue
        seen.add(nid)
        metrics = n.metrics()
        vals: dict[str, int] = {}
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            vals[kv._1()] = kv._2().value()
        stats.append(
            {
                "records_written": vals.get("shuffleRecordsWritten"),
                "bytes_written": vals.get("shuffleBytesWritten"),
                "data_size": vals.get("dataSize"),
            }
        )
    return stats


def plan_has_dynamic_pruning(df: DataFrame) -> bool:
    """True when the (pre-execution) plan carries a DPP expression for
    some partitioned scan — the shape assertion for star joins."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "dynamicpruning" in plan.lower()
