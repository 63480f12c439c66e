"""As-of and range joins — time-series operators Spark SQL lacks natively
(SURVEY.md §2.3, §4.3: API-level rewrites, no custom Catalyst rule needed).

Both avoid the naive non-equi join (which Catalyst plans as a broadcast
nested loop — quadratic work and a 100 TB non-starter):

- :func:`asof_join` uses the union-sort trick: tag both sides, union, one
  window sort per key carries the most recent right-side row forward.
  Cost: ONE shuffle on the key, O(n log n) per partition, no pair blowup.
- :func:`range_join` buckets timestamps to the range width and joins on
  (key, bucket) ∪ (key, bucket±1), filtering exactly afterwards.  Each row
  meets only rows in adjacent buckets — the classic interval-banding
  rewrite Catalyst's own range-join hints implement on the inside.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    direction: str = "backward",
    suffix: str = "_matched",
) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per ``on`` key.

    Union-sort implementation: right rows become carriers, left rows pick
    up the latest carrier seen in the window.  Ties at the exact same
    timestamp resolve to the right row (it sorts before the left row at
    equal time for backward, after for forward) — matching the common
    "trade picks up the quote at the same instant" ASOF convention.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("__k__"),
        F.col(left_time).alias("__t__"),
        F.lit(1).alias("__side__"),  # left sorts after right at equal ts
        F.struct(*lcols).alias("__l__"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}__")
          for c in right_values],
    )
    tagged_right = right.select(
        F.col(on).alias("__k__"),
        F.col(right_time).alias("__t__"),
        F.lit(0).alias("__side__"),
        F.lit(None).cast(
            tagged_left.schema["__l__"].dataType
        ).alias("__l__"),
        *[F.col(c).alias(f"__rv_{c}__") for c in right_values],
    )
    unioned = tagged_left.unionByName(tagged_right)

    if direction == "backward":
        w = (
            Window.partitionBy("__k__")
            .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [
            F.last(f"__rv_{c}__", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_values
        ]
    else:
        w = (
            Window.partitionBy("__k__")
            .orderBy(F.col("__t__").desc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [
            F.last(f"__rv_{c}__", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_values
        ]

    return (
        unioned.select("__side__", "__l__", *carried)
        .where(F.col("__side__") == 1)
        .select(*[F.col(f"__l__.{c}").alias(c) for c in lcols], *[
            F.col(f"{c}{suffix}") for c in right_values
        ])
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_seconds: int = 0,
    upper_seconds: int = 600,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Pairs where ``right_time - left_time`` ∈ [lower, upper] seconds,
    same ``on`` key.

    Bucketed equi-join: both sides bucket timestamps to ``upper_seconds``
    width; any in-range pair lands in the same or the next bucket, so two
    ordinary hash joins (bucket, bucket+1) + an exact filter replace the
    nested-loop non-equi join.  Shuffle volume is O(rows), work is
    O(pairs-within-adjacent-buckets) — survives 100 TB where a theta join
    would not.

    Right-side columns colliding with left names come back suffixed
    ``_r``.
    """
    if upper_seconds <= 0 or lower_seconds < 0 or lower_seconds > upper_seconds:
        raise ValueError("need 0 <= lower_seconds <= upper_seconds, upper > 0")
    width = upper_seconds

    rename = {
        c: (f"{c}_r" if c in left.columns else c)
        for c in right.columns
    }
    r = right.select(*[F.col(c).alias(a) for c, a in rename.items()])
    r_on, r_time = rename[on], rename[right_time]

    # NTZ-safe epoch micros: Spark 4 rejects TIMESTAMP_NTZ → double casts,
    # and unix_timestamp truncates micros (fine for bucket keys, wrong for
    # the range predicate).  The session TZ is pinned UTC (session.py), so
    # NTZ→LTZ is value-preserving and unix_micros gives one exact integer
    # timeline for both the bucket keys and the exact filter.
    l_us = F.unix_micros(F.col(left_time).cast("timestamp_ltz"))
    r_us = F.unix_micros(F.col(r_time).cast("timestamp_ltz"))
    width_us = width * 1_000_000
    # Exact integer floor division for the bucket keys: the obvious
    # F.floor(us / width) divides as DOUBLE, and once |epoch_µs| > 2^52
    # (~before 1827 / after 2112) the quotient's ulp exceeds 1, so a row
    # 1 µs under a bucket boundary can land in the wrong bucket and a true
    # pair silently drops.  pmod is non-negative, so (us - pmod) is an
    # exact multiple of the width and truncating `div` equals floor for
    # either sign.
    bucket = "( {us} - pmod({us}, {w}) ) div {w}".format
    l = left.withColumn("__lus__", l_us).withColumn(
        "__lb__", F.expr(bucket(us="__lus__", w=f"{width_us}L"))
    )
    r = r.withColumn("__rus__", r_us).withColumn(
        "__rb__", F.expr(bucket(us="__rus__", w=f"{width_us}L"))
    )

    delta_us = F.col("__rus__") - F.col("__lus__")
    cond = (delta_us >= lower_seconds * 1_000_000) & (
        delta_us <= upper_seconds * 1_000_000
    )
    if extra_cond is not None:
        cond = cond & extra_cond

    out = None
    for offset in (0, 1):
        cand = l.join(
            r,
            (F.col(on) == F.col(r_on))
            & ((F.col("__lb__") + offset) == F.col("__rb__")),
        )
        out = cand if out is None else out.unionByName(cand)
    return out.where(cond).drop("__lb__", "__rb__", "__lus__", "__rus__")
