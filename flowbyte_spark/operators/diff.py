"""Snapshot diff: keyed change detection between two table versions.

The CDC complement of the mutation tier (operators/merge.py applies
deltas; this RECOVERS a delta from two snapshots — the pattern behind
audit reports, replication validation, and building a CDC feed from
full extracts when the source system, like the reference's MSSQL
surface, only offers SELECTs).

Plan: ONE full outer join on the key, then a null-safe struct
comparison — no window, no collect.  At 100 TB both snapshots shuffle
once on the key (or zero-shuffle if both live bucketed on it); change
classification is a map-side projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key change rows between ``old`` and ``new``.

    Returns ``keys... , change_type`` with ``change_type`` in
    ``inserted`` (key only in new), ``deleted`` (only in old),
    ``updated`` (both, some compared column differs null-safely),
    ``unchanged``.  ``compare_cols`` defaults to every non-key column
    the snapshots share.  Duplicate keys in either snapshot are a
    caller bug that would silently multiply rows — fail loud upstream
    with expectations.check_unique if unsure.

    NULL key values are handled null-safely (round 15): the full outer
    join runs on a struct-wrapped key (struct equality is null-safe per
    field — the engine's r14 convention), so a NULL-key row present in
    both snapshots classifies as updated/unchanged like any other key;
    a raw-key join would never pair the sides and misreport it as one
    ``deleted`` plus one ``inserted``.
    """
    if not keys:
        raise ValueError("keys must name at least one column")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(
        F.struct(*[F.col(k) for k in keys]).alias("__jk__"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__old__"),
        F.lit(1).alias("__in_old__"),
    )
    n = new.select(
        F.struct(*[F.col(k) for k in keys]).alias("__jk__"),
        F.struct(*[F.col(c) for c in compare_cols]).alias("__new__"),
        F.lit(1).alias("__in_new__"),
    )
    j = o.join(n, "__jk__", "full_outer")
    change = (
        F.when(F.col("__in_old__").isNull(), F.lit("inserted"))
        .when(F.col("__in_new__").isNull(), F.lit("deleted"))
        # eqNullSafe: a NULL -> value (or value -> NULL) flip is an update
        .when(~F.col("__old__").eqNullSafe(F.col("__new__")), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[F.col("__jk__").getField(k).alias(k) for k in keys],
        change.alias("change_type"),
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """``(change_type, n_rows)`` rollup of :func:`snapshot_diff` —
    includes zero rows for absent change types so the output schema is
    stable across inputs."""
    spark = old.sparkSession
    kinds = spark.createDataFrame(
        [("inserted",), ("deleted",), ("updated",), ("unchanged",)],
        "change_type string",
    )
    counts = (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    return (
        kinds.join(counts, "change_type", "left")
        .select(
            "change_type",
            F.coalesce(F.col("__n__"), F.lit(0)).cast("long").alias("n_rows"),
        )
        .orderBy("change_type")
    )
