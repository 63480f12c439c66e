"""Column profiling: one-pass per-column statistics as a DataFrame.

The first thing anyone does with an unfamiliar 100 TB table — null
rates, cardinalities, numeric ranges — expressed as ONE aggregate over
one scan, then unpivoted to (column, metric...) rows.  No per-column
jobs, no driver loops: the battery is a single ``agg(...)`` whose
result is one row, melted executor-side.

Exact distinct counts use Spark's multi-distinct Expand (rows multiply
by the number of profiled columns before the shuffle) — fine for a
profiling pass, but at 100 TB prefer ``exact=False``, which swaps in
``approx_count_distinct`` (HLL++, rsd 2%): partial-aggregatable, one
ordinary shuffle, bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """``(column, n_rows, n_nulls, n_distinct, min_num, max_num)`` per
    profiled column; ``min_num``/``max_num`` are NULL for non-numeric
    columns (DOUBLE-cast otherwise, so the schema is column-agnostic).
    ``n_distinct`` counts distinct NON-NULL values.
    """
    cols = list(df.columns) if cols is None else list(cols)
    if not cols:
        raise ValueError("no columns to profile")
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    distinct_of = (
        F.count_distinct if exact
        else lambda c: F.approx_count_distinct(c, rsd=0.02)
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"))
        aggs.append(distinct_of(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
    one = df.agg(*aggs)
    # melt the single stats row into per-column rows, executor-side
    entries = []
    for c in cols:
        mn = F.col(f"__mn_{c}") if isinstance(fields[c], _NUMERIC) else F.lit(
            None
        ).cast("double")
        mx = F.col(f"__mx_{c}") if isinstance(fields[c], _NUMERIC) else F.lit(
            None
        ).cast("double")
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                mn.alias("min_num"),
                mx.alias("max_num"),
            )
        )
    return (
        one.select(F.explode(F.array(*entries)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )
