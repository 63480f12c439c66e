"""Manual runtime filter: broadcast semi-join reduction of a fact table.

Spark inserts Bloom-filter runtime filters itself, but only past
``spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold``
(10 GB by default) and only when the creation side is under its own
threshold — a band a real workload can easily miss on both ends.  This
operator is the always-available, explicit form of the same idea: when
a join's dim side is selective, pre-filter the fact with a broadcast
LEFT SEMI join on the dim's DISTINCT join keys BEFORE the fact enters
its join shuffle, so the shuffle moves only rows that can match.

Semantics: for an INNER equi-join this is an identity rewrite (rows
dropped by the semi-join can never appear in the result), verified by
v105's hash gate against DuckDB's plain join.  Measured on the proof
test: a 4.7%-selective dim cuts the fact's shuffleRecordsWritten by the
same ~20x (tests/test_runtime_filter.py asserts it via shuffle_stats).

At 100 TB: the distinct-key build is a dim-sized aggregate (tiny by
assumption — gate on dim size if unsure) and the broadcast is one
hash-set per executor; the saved shuffle is fact-sized.  If the dim is
NOT selective the semi-join is wasted work — this is a targeted tool,
not a default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def semi_join_reduction(
    fact: DataFrame, dim: DataFrame, on: list[str] | str
) -> DataFrame:
    """Return ``fact`` reduced to rows whose join keys exist in ``dim``.

    ``on`` names equi-join key column(s) present in BOTH sides.  Compose
    as ``semi_join_reduction(fact, dim, keys).join(dim, keys)`` — the
    subsequent inner join's fact shuffle then carries only matchable
    rows.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("on must name at least one join key column")
    return fact.join(F.broadcast(dim.select(*keys).distinct()), keys, "left_semi")


def reduced_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | str
) -> DataFrame:
    """Inner equi-join with the fact side runtime-filtered first."""
    keys = [on] if isinstance(on, str) else list(on)
    return semi_join_reduction(fact, dim, keys).join(dim, keys)
