"""Set-based keyed merge operators.

Capability parity with the reference's update path
(/root/reference/src/flowbyte/sql.py:191-289), re-designed for scale:

- the reference executes one UPDATE statement *per record* with a commit per
  row (sql.py:233-245) — O(n) driver round-trips;
- here both operators compile to ONE distributed plan: broadcast (or
  shuffle) the delta, left-join the target on the merge keys, and
  ``coalesce(new, old)`` each updatable column.  Net state is identical;
  cost is a single pass over the target.

At 100 TB the delta is almost always small relative to the target, so the
join side is broadcast and the target never shuffles.  For giant deltas,
Catalyst/AQE falls back to a shuffled join automatically — still one pass.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark import log


def _updates_to_df(
    spark: SparkSession,
    update_records: DataFrame | Sequence[Mapping],
) -> DataFrame:
    if isinstance(update_records, DataFrame):
        return update_records
    if not isinstance(update_records, (list, tuple)) or not all(
        isinstance(r, Mapping) for r in update_records
    ):
        # same contract as the reference's validation (sql.py:218-219)
        raise TypeError("update_records must be a DataFrame or a list of dicts")
    return spark.createDataFrame(list(update_records))


def update_by_keys(
    target: DataFrame,
    update_records: DataFrame | Sequence[Mapping],
    key_columns: Sequence[str],
) -> DataFrame:
    """Apply keyed point-updates to ``target``; returns the merged DataFrame.

    Semantics of the reference's ``update_data`` (sql.py:191-249): every
    non-key column present in the updates overwrites the matching target
    row; unmatched target rows pass through unchanged.  A key column missing
    from the updates is dropped from the join predicate with a warning,
    mirroring sql.py:236-239 (where a record lacking a key loses that
    predicate term).

    Updates that match no target row are ignored (an SQL UPDATE never
    inserts) — use :meth:`ParquetTable.append` for inserts.
    """
    spark = target.sparkSession
    updates = _updates_to_df(spark, update_records)

    keys = [k for k in key_columns]
    missing = [k for k in keys if k not in updates.columns]
    if missing:
        log.warning(
            f"key column(s) {missing} missing from update records — "
            "skipped from the merge predicate"
        )
        keys = [k for k in keys if k not in missing]
    if not keys:
        raise ValueError("no usable key columns for update_by_keys")

    set_cols = [c for c in updates.columns if c not in keys and c in target.columns]
    unknown = [c for c in updates.columns if c not in target.columns]
    if unknown:
        log.warning(f"update columns {unknown} not present in target — ignored")

    # Align update-side types with the target before the join so the merge
    # never widens the table schema (int delta vs long target etc.).
    tgt_types = {f.name: f.dataType for f in target.schema.fields}
    updates = updates.select(
        *[F.col(c).cast(tgt_types[c]).alias(c) for c in keys + set_cols]
    )
    # One delta row per key, deterministically — the reference applies
    # records in list order, so the LAST record for a key wins (each row's
    # UPDATE overwrites the previous one, sql.py:233-245).
    updates = (
        updates.withColumn("__seq__", F.monotonically_increasing_id())
        .groupBy(*keys)
        .agg(*[F.max_by(c, "__seq__").alias(c) for c in set_cols])
    )

    u = F.broadcast(updates.alias("u"))
    t = target.alias("t")
    cond = None
    for k in keys:
        term = F.col(f"t.{k}") == F.col(f"u.{k}")
        cond = term if cond is None else (cond & term)

    merged = t.join(u, cond, "left").select(
        *[
            (
                F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}"))
                if c in set_cols
                else F.col(f"t.{c}")
            ).alias(c)
            for c in target.columns
        ]
    )
    return merged


def update_from_table(
    target: DataFrame,
    source: DataFrame,
    key_columns: Sequence[str],
    *,
    compat_skip_first_column: bool = True,
) -> DataFrame:
    """Join-update ``target`` from ``source`` on ``key_columns``.

    Mirrors the reference's ``update_from_table`` (sql.py:253-289), which
    generates a single ``UPDATE … FROM … JOIN``.  Quirk preserved: the
    reference SETs *all source columns except the first*
    (``df.columns[1:]``, sql.py:271).  ``compat_skip_first_column=True``
    (default) reproduces that; pass False for the fixed native behavior
    (update every non-key source column).
    """
    cols = list(source.columns)
    if compat_skip_first_column and cols:
        set_candidates = cols[1:]
    else:
        set_candidates = cols
    set_cols = [c for c in set_candidates if c not in key_columns]
    updates = source.select(*key_columns, *set_cols)
    return update_by_keys(target, updates, key_columns)
