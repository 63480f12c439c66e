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

from pyspark.sql import Column, DataFrame, Window
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


def _null_safe_add(w: Column, o: Column) -> Column:
    # Running-sum null semantics: NULL only while EVERY value so far is
    # NULL.  A plain `w + o` would null out whenever the current bucket
    # (or the offset) is all-NULL.
    return F.when(w.isNull() & o.isNull(), F.lit(None)).otherwise(
        F.coalesce(w, F.lit(0)) + F.coalesce(o, F.lit(0))
    )


_RUNNING_FNS = {
    # running fn -> (within-bucket agg, bucket-total agg, rollup of the
    # totals across earlier buckets, merge of (within, rolled offset)).
    # count's rollup is SUM — counting the totals would tally buckets.
    "sum": (F.sum, F.sum, F.sum, _null_safe_add),
    "count": (F.count, F.count, F.sum, _null_safe_add),
    "min": (F.min, F.min, F.min, lambda w, o: F.least(w, o)),
    "max": (F.max, F.max, F.max, lambda w, o: F.greatest(w, o)),
}


def _time_bucket(order_by: str, width_seconds: int) -> Column:
    """Contiguous time bucket with exact integer floor-div (asof.py's
    far-epoch-safe pattern)."""
    w_us = width_seconds * 1_000_000
    return F.expr(
        f"( us - pmod(us, {w_us}L) ) div {w_us}L".replace(
            "us", f"unix_micros(cast({order_by} as timestamp_ltz))"
        )
    )


# Bucket id for NULL order_by values.  The unsalted window sorts NULL
# times FIRST (Spark asc default), so NULL-time rows must land in a
# bucket that precedes every real one and still carries a JOINABLE
# (non-NULL) id — a NULL __b__ would fall out of the plain equi-join
# with the offsets table and the rows would vanish from the output.
# Real buckets are bounded by |unix_micros|/width < 2^63/10^6, nowhere
# near -2^62.
_NULL_TIME_BUCKET = -(2**62)


def _group_key(keys: Sequence[str]) -> Column:
    """Null-safe composite key for the two-phase rewrites.

    ``Window.partitionBy`` and ``groupBy`` put NULL keys in one group,
    but the phase-merge equi-join would DROP those rows (NULL = NULL is
    never true), silently losing every NULL-key row the unsalted window
    keeps.  Struct equality is null-safe per field (``struct(NULL) =
    struct(NULL)`` is TRUE) and a struct is an ordinary hash-join /
    hash-partition key, so partitioning, grouping, AND joining on
    ``struct(*keys)`` preserves NULL groups end-to-end with no extra
    exchange (an ``eqNullSafe`` join instead re-shuffles both sides:
    measured 3 → 5 exchanges on the salted-window plan)."""
    return F.struct(*keys)


def salted_window_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str,
    aggs: dict[str, tuple[str, str]],
    bucket_width_seconds: int,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Running window aggregates that survive one hot key (VERDICT r4 #4).

    ``Window.partitionBy(key).orderBy(t)`` puts a key's ENTIRE history in
    one task — AQE cannot split windows, so at 100× one hot customer
    stalls the stage.  This computes the same running aggregates in two
    phases: rows window within (key, contiguous time bucket) — the hot
    key spreads over its time range — then per-bucket totals (one row per
    key × bucket, tiny) roll into cross-bucket offsets merged back in.
    Exact for associative fns: ``aggs`` maps output name →
    ``(fn, column)`` with fn ∈ {sum, count, min, max} over the frame
    ``rowsBetween(unboundedPreceding, currentRow)``.

    Rows tied on ``(order_by, *tiebreakers)`` within a bucket keep the
    same any-order ambiguity the unsalted window has; ties never straddle
    buckets (equal time ⇒ equal bucket).  Pick ``bucket_width_seconds``
    so the hottest key's densest width fits a task (~10-100 M rows).

    NULL handling matches the unsalted window exactly (round 14 — before
    that, NULL-key and NULL-``order_by`` rows fell out of the phase-merge
    equi-join and VANISHED from the output): NULL keys form one group
    (:func:`_group_key`), and NULL times land in a first-sorting sentinel
    bucket (:data:`_NULL_TIME_BUCKET`) so their values roll into every
    later bucket's offsets, exactly as nulls-first ordering feeds the
    unsalted running aggregate.
    """
    bad = [fn for fn, _ in aggs.values() if fn not in _RUNNING_FNS]
    if bad:
        raise ValueError(
            f"unsupported running fns {sorted(set(bad))}; "
            f"supported: {sorted(_RUNNING_FNS)} (associative merges only)"
        )
    reserved = {"__b__", "__jk__"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"column names {sorted(reserved)} are reserved by "
            "salted_window_agg"
        )

    b = df.withColumn(
        "__b__",
        F.coalesce(
            _time_bucket(order_by, bucket_width_seconds),
            F.lit(_NULL_TIME_BUCKET),
        ),
    ).withColumn("__jk__", _group_key(keys))
    w_in = (
        Window.partitionBy("__jk__", "__b__")
        .orderBy(order_by, *tiebreakers)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for out, (fn, col) in aggs.items():
        b = b.withColumn(out, _RUNNING_FNS[fn][0](col).over(w_in))

    totals = b.groupBy("__jk__", "__b__").agg(
        *[
            _RUNNING_FNS[fn][1](col).alias(f"__t_{out}__")
            for out, (fn, col) in aggs.items()
        ]
    )
    w_prev = (
        Window.partitionBy("__jk__")
        .orderBy("__b__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__jk__",
        "__b__",
        *[
            _RUNNING_FNS[fn][2](f"__t_{out}__").over(w_prev).alias(f"__o_{out}__")
            for out, (fn, col) in aggs.items()
        ],
    )
    merged = b.join(offsets, ["__jk__", "__b__"])
    for out, (fn, _col) in aggs.items():
        merged = merged.withColumn(
            out, _RUNNING_FNS[fn][3](F.col(out), F.col(f"__o_{out}__"))
        )
    return merged.drop("__b__", "__jk__", *[f"__o_{out}__" for out in aggs])


def salted_lag(
    df: DataFrame,
    keys: Sequence[str],
    order_by: str,
    col: str,
    out: str,
    bucket_width_seconds: int,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """``F.lag(col)`` over a hot key, two-phase (VERDICT r4 #4).

    Within (key, time bucket) a plain lag; each bucket's FIRST row takes
    instead the LAST value of the key's previous non-empty bucket, carried
    through a one-row-per-bucket boundary table.  Distinguishes "first in
    bucket" from "previous value is genuinely NULL" by row position, not
    coalesce.

    NULL handling matches the unsalted lag exactly (round 14, same fix
    as :func:`salted_window_agg`): NULL keys form one group, NULL times
    land in the first-sorting sentinel bucket — neither falls out of the
    phase-merge join any more.
    """
    reserved = {"__b__", "__jk__"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"column names {sorted(reserved)} are reserved by salted_lag"
        )
    b = df.withColumn(
        "__b__",
        F.coalesce(
            _time_bucket(order_by, bucket_width_seconds),
            F.lit(_NULL_TIME_BUCKET),
        ),
    ).withColumn("__jk__", _group_key(keys))
    w_o = Window.partitionBy("__jk__", "__b__").orderBy(order_by, *tiebreakers)

    order_struct = F.struct(order_by, *tiebreakers)
    bounds = b.groupBy("__jk__", "__b__").agg(
        F.max_by(col, order_struct).alias("__last_v__")
    )
    w_b = Window.partitionBy("__jk__").orderBy("__b__")
    prev = bounds.select(
        "__jk__",
        "__b__",
        F.lag("__last_v__").over(w_b).alias("__prev_last__"),
    )
    return (
        b.withColumn("__rn__", F.row_number().over(w_o))
        .withColumn("__within__", F.lag(col).over(w_o))
        .join(prev, ["__jk__", "__b__"])
        .withColumn(
            out,
            F.when(F.col("__rn__") == 1, F.col("__prev_last__")).otherwise(
                F.col("__within__")
            ),
        )
        .drop("__b__", "__jk__", "__rn__", "__within__", "__prev_last__")
    )


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
