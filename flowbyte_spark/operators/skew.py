"""Skew mitigation for joins and aggregations.

AQE's skew-join splitting handles most hot keys at runtime
(spark.sql.adaptive.skewJoin.enabled, on by default in session.py);
salting is the explicit fallback for the cases AQE cannot fix — a
broadcast-too-big dimension joined on a power-law key, or a groupBy where
one key holds half the data.

``salted_join``: replicate the small side R times, salt the big side with
hash(row)%R — the hot key spreads over R tasks at the cost of an R×
replication of the small side.  ``two_phase_agg``: pre-aggregate on
(key, salt) then finish on key — classic partial/final split for
aggregations whose combiner Catalyst cannot derive (e.g. collect_list).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt__") -> DataFrame:
    """Deterministic row salt in [0, buckets): hash of the whole row, not
    rand() — reruns and retried tasks get identical assignments."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).cast("int")
    )


def replicate(df: DataFrame, buckets: int, col_name: str = "__salt__") -> DataFrame:
    """Per-row replication with salt values 0..buckets-1."""
    return df.withColumn(
        col_name,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in ``big``.

    big gets a per-row salt; small is replicated ``buckets`` times; the
    join key becomes (keys…, salt).  Output equals the plain join (salt
    columns dropped).  Choose buckets ≈ hottest-key-rows / target-task-rows.

    Only join types where the replicated side cannot leak duplicates are
    accepted: inner and left keep each big row's single salt; left_semi /
    left_anti reduce to a key-existence test because every salt value
    exists on the replicated side.  right/full would emit each unmatched
    small-side row ``buckets`` times — rejected rather than silently wrong
    (salt the other side, or dedupe downstream, for those shapes).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of the "
            "replicated small side would appear once per salt bucket"
        )
    b = with_salt(big, buckets)
    s = replicate(small, buckets)
    joined = b.join(s, [*on, "__salt__"], how)
    return joined.drop("__salt__")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: phase 1 groups by (keys, salt) — the hot key
    splits into ``buckets`` partial groups; phase 2 merges partials by key.

    Caller supplies both phases, e.g. partial ``F.sum(x).alias("s")`` /
    final ``F.sum("s").alias("total")``.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt__").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
