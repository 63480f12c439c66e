"""Data-quality expectations: declarative constraint checks that return
violation COUNTS as a DataFrame instead of failing jobs mid-flight.

The reference's users run predicated deletes and keyed updates
(sql.py:271-332) against warehouse tables whose integrity they must
re-validate after every load; this module is that validation as one
Spark pass per table.  Every check is pure DataFrame algebra — counts,
anti-joins, grouped HAVING — so Catalyst fuses the battery into a small
number of aggregates, and nothing here collects to the driver.

Scale shape: ``check_not_null``/``check_range`` are map-side aggregates
(zero shuffle beyond the final 1-row partials merge).  ``check_unique``
is one groupBy on the key.  ``check_foreign_key`` is one anti-join —
broadcast when the parent's key set is small, shuffled otherwise
(AQE's call).  A full battery over a 100 TB fact is therefore bounded
by one scan plus one key shuffle per uniqueness/FK rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCHEMA = "check string, n_violations long"


def _summary(df: DataFrame, check: str, n: Column) -> DataFrame:
    return df.agg(
        F.lit(check).alias("check"), n.cast("long").alias("n_violations")
    )


def check_not_null(df: DataFrame, col: str) -> DataFrame:
    """One row ``(check, n_violations)`` counting NULLs in ``col``.

    Vacuously passes on an empty table: SUM over zero rows is NULL, so
    coalesce to 0 to match check_unique/check_foreign_key — a NULL count
    would surface as ``passed = NULL`` downstream.
    """
    return _summary(
        df,
        f"not_null({col})",
        F.coalesce(F.sum(F.col(col).isNull().cast("long")), F.lit(0)),
    )


def check_range(
    df: DataFrame, col: str, lo=None, hi=None
) -> DataFrame:
    """Count rows outside ``[lo, hi]`` (either bound optional; NULLs do
    not violate a range rule — pair with :func:`check_not_null`)."""
    if lo is None and hi is None:
        raise ValueError("check_range needs at least one bound")
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    label = f"range({col},{lo},{hi})"
    return _summary(
        df, label, F.coalesce(F.sum(cond.cast("long")), F.lit(0))
    )


def check_unique(df: DataFrame, keys: list[str]) -> DataFrame:
    """Count rows carrying a duplicated key (total membership of all
    key groups with count > 1 — i.e. rows an exact-dedup would touch)."""
    dup_rows = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .where(F.col("__n__") > 1)
        .agg(F.coalesce(F.sum("__n__"), F.lit(0)).alias("__v__"))
    )
    return dup_rows.select(
        F.lit(f"unique({','.join(keys)})").alias("check"),
        F.col("__v__").cast("long").alias("n_violations"),
    )


def check_foreign_key(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Count child rows whose non-NULL key has no parent row (orphans).

    NULL child keys are not orphans (SQL FK semantics); reject them with
    :func:`check_not_null` if the column is mandatory.
    """
    orphans = (
        child.where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
    )
    return _summary(
        orphans,
        f"foreign_key({child_key})",
        F.coalesce(F.count(F.lit(1)), F.lit(0)),
    )


def not_null_rule(col: str) -> tuple[str, Column]:
    """(label, violation condition) for :func:`fused_scalar_checks`."""
    return f"not_null({col})", F.col(col).isNull()


def range_rule(col: str, lo=None, hi=None) -> tuple[str, Column]:
    """(label, violation condition) for :func:`fused_scalar_checks`.
    NULLs do not violate a range rule — pair with :func:`not_null_rule`."""
    if lo is None and hi is None:
        raise ValueError("range_rule needs at least one bound")
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return f"range({col},{lo},{hi})", cond


def fused_scalar_checks(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """Every row-predicate rule (not-null / range / any boolean
    condition) in ONE scan: a single aggregate row of violation counts,
    melted executor-side to ``(check, n_violations)`` rows.

    ``run_expectations`` over per-rule DataFrames unions independent
    aggregates — N scalar rules cost N scans of the fact.  At 100 TB
    the scan IS the job, so the battery belongs in one pass; this is
    the profile-operator pattern (one agg + explode) applied to
    constraint checking.  Keyed rules (unique, FK) still need their own
    shuffle/join and stay separate.
    """
    if not rules:
        raise ValueError("no rules given")
    aggs = [
        F.coalesce(F.sum(cond.cast("long")), F.lit(0))
        .cast("long")
        .alias(f"__v{i}__")
        for i, (_, cond) in enumerate(rules)
    ]
    entries = [
        F.struct(
            F.lit(label).alias("check"),
            F.col(f"__v{i}__").alias("n_violations"),
        )
        for i, (label, _) in enumerate(rules)
    ]
    return (
        df.agg(*aggs)
        .select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
    )


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union the battery into one ``(check, n_violations, passed)``
    summary, ordered by check name."""
    if not checks:
        raise ValueError("no checks given")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check")
