"""Column profiling: per-column statistics as a DataFrame.

The first thing anyone does with an unfamiliar 100 TB table — null
rates, cardinalities, numeric ranges — as ONE lazy plan (a union of
thin per-column branches for ``exact=True``, a single aggregate for
``exact=False``), one action, no driver loops.

The exact path used to be a single ``agg`` with one ``count_distinct``
per column, which plans as Spark's multi-distinct Expand: rows multiply
by (k+1) for k profiled columns BEFORE the shuffle.  Since r16 each
column instead gets its own branch — ``groupBy(col).count()`` (map-side
partial aggregation collapses to distinct values pre-shuffle) feeding
one tiny global aggregate that derives every metric from the
(value, count) pairs.  Parquet being columnar, k single-column scans
read the same bytes as one k-column scan, and the shuffle carries each
column's distinct values ONCE instead of (k+1)x the full row count
(guide §2.3 "aggregate before you shuffle"; interleaved A/B on v108's
5-column profile at sf0.1 under the engine conf: 1.75 s -> 1.29 s
median, identical rows).

At 100 TB still prefer ``exact=False``: approx_count_distinct (HLL++,
rsd 2%) is one ordinary partial-aggregatable shuffle with bounded
state, no per-value groups at all.

INPUT-SHAPE ASSUMPTION for ``exact=True`` (ADVICE r16): the k branches
each re-evaluate ``df``'s upstream plan once.  The equal-I/O argument
holds when that plan is a bare columnar scan (k single-column parquet
reads == one k-column read); for a DERIVED input — joins, filters,
exploded text — the upstream pipeline replays k times.  Callers
profiling a derived frame should persist it first (materialize-then-
release via operators.cache) or use ``exact=False``, whose single
aggregate scans the input once regardless of shape.
"""

from __future__ import annotations

from functools import reduce

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

    if exact:
        parts = []
        for c in cols:
            is_num = isinstance(fields[c], _NUMERIC)
            grouped = (
                df.select(F.col(c).alias("__v"))
                .groupBy("__v")
                .agg(F.count(F.lit(1)).alias("__cnt"))
            )
            # Same empty-input semantics as the one-pass aggregate:
            # n_rows 0, n_nulls NULL (a SUM over zero rows), n_distinct 0.
            parts.append(
                grouped.agg(
                    F.coalesce(F.sum("__cnt"), F.lit(0))
                    .cast("long")
                    .alias("n_rows"),
                    F.sum(
                        F.when(F.col("__v").isNull(), F.col("__cnt")).otherwise(
                            F.lit(0)
                        )
                    )
                    .cast("long")
                    .alias("n_nulls"),
                    F.count("__v").cast("long").alias("n_distinct"),
                    (
                        F.min("__v").cast("double")
                        if is_num
                        else F.lit(None).cast("double")
                    ).alias("min_num"),
                    (
                        F.max("__v").cast("double")
                        if is_num
                        else F.lit(None).cast("double")
                    ).alias("max_num"),
                ).select(
                    F.lit(c).alias("column"),
                    "n_rows",
                    "n_nulls",
                    "n_distinct",
                    "min_num",
                    "max_num",
                )
            )
        return reduce(lambda a, b: a.unionByName(b), parts).orderBy("column")

    distinct_of = lambda c: F.approx_count_distinct(c, rsd=0.02)  # noqa: E731
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
