"""Incremental aggregate maintenance: update a grouped-aggregate state
from a CDC delta without rescanning the fact.

The reference's users keep warehouse summary tables current by
re-running full aggregations after every load (its API offers only
full-table `get_data` + `insert_data`, sql.py:88/174); at 100 TB a
nightly full rescan of the fact is the single largest avoidable job.
Count/sum-class aggregates form a commutative group — inserts add,
deletes subtract — so the new state is computable from the OLD STATE
plus the DELTA alone:

    new_state = merge(state, +agg(inserts), -agg(deletes))

Scale shape: one aggregate over the delta (map-side partial combine,
one key shuffle of per-group partials) plus one key shuffle of the
state table — both O(groups + |delta|), independent of fact size.
Sums are kept as exact DECIMAL(38,6) so a fully-deleted group's
measures cancel to exactly zero (float residue would leak phantom
groups past the count filter) and merge order cannot change results.

Only group-homomorphic measures belong here (count, sum, and anything
derived from them downstream — avg = sum/count at read time).  MIN/MAX
are NOT invertible under deletes; maintain those with the snapshot
diff + targeted recompute instead (operators/diff.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flowbyte_spark.functions import DEC


def agg_state(
    df: DataFrame, keys: list[str], sum_cols: list[str], sign: int = 1
) -> DataFrame:
    """Grouped state ``(keys..., __cnt__, sum_<c>...)`` over ``df``.

    ``sign=-1`` negates counts and sums — the delete leg of a delta
    merge.  Sums are exact DECIMAL(38,6); counts are longs.
    """
    if sign not in (1, -1):
        raise ValueError(f"sign must be +1 or -1, got {sign!r}")
    aggs = [(F.count(F.lit(1)) * sign).cast("long").alias("__cnt__")]
    for c in sum_cols:
        aggs.append(
            (F.sum(F.col(c).cast(DEC)) * sign).cast(DEC).alias(f"sum_{c}")
        )
    return df.groupBy(*keys).agg(*aggs)


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge signed states into one: union → one key shuffle → groups
    whose merged count reaches zero vanish (their exact-decimal sums
    cancel with them)."""
    if not states:
        raise ValueError("no states to merge")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    measure_cols = [c for c in out.columns if c not in keys]
    merged = out.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in measure_cols]
    )
    return merged.where(F.col("__cnt__") > 0).select(
        *keys,
        F.col("__cnt__").cast("long").alias("__cnt__"),
        *[F.col(c).cast(DEC).alias(c) for c in measure_cols if c != "__cnt__"],
    )


def incremental_update(
    state: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """New aggregate state from the old state plus a CDC delta —
    NO fact rescan.  ``inserts``/``deletes`` are row-level tables in
    the fact's schema; equal to ``agg_state(post_delta_fact)`` by the
    group laws (differentially tested in tests/test_incremental.py)."""
    return merge_states(
        [
            state,
            agg_state(inserts, keys, sum_cols, sign=1),
            agg_state(deletes, keys, sum_cols, sign=-1),
        ],
        keys,
    )
