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


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
) -> DataFrame:
    """Shared union-sort tagging: key/time/side plus the left row as a
    struct and the right VALUES as ONE struct carrier ``__rv__``.  Left
    rows get ``__side__ = 1`` so they sort AFTER right rows at equal
    time — the "trade picks up the quote at the same instant" ASOF
    convention.

    The single-struct carrier is load-bearing for ROW semantics
    (round 15): per-column carriers let ``last(ignorenulls)`` skip a
    nearest carrier's NULL field and backfill it from an OLDER row —
    tearing the match across two right rows, where the oracle (DuckDB
    ``ASOF JOIN``, pandas ``merge_asof``) attaches the nearest ROW
    wholesale, NULL fields included.  The struct is non-NULL for every
    right row (a struct whose fields are all NULL is still a value), so
    ``ignorenulls`` skips exactly the left rows' typed-NULL carriers
    and the nearest right row always wins intact.

    NULL contract (predicate semantics — ``r.ts <= l.ts`` and
    ``l.k = r.k`` are never true when a side is NULL): rows with a NULL
    time OR a NULL key are excluded from BOTH sides here.  A NULL
    carrier would otherwise sort to the front of the window and get
    carried into every left row's match, and NULL-key carriers would
    meet the NULL-key left rows that ``Window.partitionBy`` groups
    together though SQL equality never matches them (the bug class the
    r13 funnel ADVICE caught).  Callers union the excluded LEFT rows
    back as unmatched via :func:`_null_left_unmatched` — left-join
    semantics keep them, with no NULL ever entering the carry plan.
    """
    lcols = left.columns
    left = left.where(
        F.col(on).isNotNull() & F.col(left_time).isNotNull()
    )
    tagged_right = right.where(
        F.col(right_time).isNotNull() & F.col(on).isNotNull()
    ).select(
        F.col(on).alias("__k__"),
        F.col(right_time).alias("__t__"),
        F.lit(0).alias("__side__"),
        F.struct(*[F.col(c) for c in right_values]).alias("__rv__"),
    )
    tagged_left = left.select(
        F.col(on).alias("__k__"),
        F.col(left_time).alias("__t__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(
            tagged_right.schema["__rv__"].dataType
        ).alias("__rv__"),
        F.struct(*lcols).alias("__l__"),
    )
    tagged_right = tagged_right.withColumn(
        "__l__", F.lit(None).cast(tagged_left.schema["__l__"].dataType)
    )
    return tagged_left.unionByName(tagged_right)


def _null_left_unmatched(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_values: list[str],
    suffix: str,
) -> DataFrame:
    """Left rows with a NULL key or NULL time, emitted unmatched (every
    ``*_matched`` column a typed NULL literal) — the rows
    :func:`_tag_union` excludes from the carry plan.  Map-only: one
    filter + projection, zero exchanges."""
    return left.where(
        F.col(on).isNull() | F.col(left_time).isNull()
    ).select(
        *left.columns,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in right_values
        ],
    )


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

    NULL times follow predicate semantics (``NULL <= t`` is never true):
    right rows with NULL time never match anything; left rows with NULL
    time are kept, unmatched.  (Before round 14 a NULL-time right row
    sorted nulls-first into the backward carry and matched EVERY left
    row of its key; forward had the mirror problem on NULL left times.)

    ``left`` must be DETERMINISTIC (ADVICE r14): it is evaluated in two
    plan branches — the carry union here and the NULL-time unmatched leg
    (:func:`_null_left_unmatched`) — so an input whose rows change
    between evaluations (``rand()``, ``uuid()``, an unstable sample)
    can lose or duplicate rows between the legs.  Cache/checkpoint such
    an input first; deterministic inputs (any table scan + deterministic
    transforms, i.e. everything this engine's query tier feeds it) need
    nothing.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns
    unioned = _tag_union(left, right, on, left_time, right_time, right_values)

    if direction == "backward":
        w = (
            Window.partitionBy("__k__")
            .orderBy(F.col("__t__").asc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("__k__")
            .orderBy(F.col("__t__").desc(), F.col("__side__").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    # ONE ignorenulls carry of the whole right-row struct: the nearest
    # right row wins wholesale, its NULL fields included (row
    # semantics — see _tag_union).
    carried = F.last("__rv__", ignorenulls=True).over(w).alias("__rvm__")

    matched = (
        unioned.select("__side__", "__l__", carried)
        .where(F.col("__side__") == 1)
        .select(*[F.col(f"__l__.{c}").alias(c) for c in lcols], *[
            F.col("__rvm__").getField(c).alias(f"{c}{suffix}")
            for c in right_values
        ])
    )
    return matched.unionByName(
        _null_left_unmatched(left, right, on, left_time, right_values, suffix)
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


def auto_bucket_width(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    target_rows_per_bucket: int = 5_000_000,
) -> int:
    """Derive ``bucket_width_seconds`` for :func:`salted_asof_join`.

    The one parameter that decides whether a hot key serializes: too
    wide and the hottest key's densest bucket lands in one task; too
    narrow and the boundary roll-up grows for nothing.  Heuristic, under
    the CONSERVATIVE worst case that a single key owns every row spread
    uniformly over the time span:

        width = span_seconds * target_rows_per_bucket / total_rows

    so even that key's per-(key, bucket) task holds at most
    ``target_rows_per_bucket`` rows (default 5M ~ a few hundred MB — a
    healthy task).  Skew WITHIN time (all rows in one burst second)
    still bounds the bucket by the burst size, which no time bucketing
    can split further.

    Cost: one count/min/max aggregate per side — two small driver jobs
    at PLAN-CONSTRUCTION time (map-side partial agg over one column,
    same bounded-probe contract as srp_neardup_pairs' dimension probe).
    Empty inputs or constant timestamps fall back to 3600 s.
    """
    n_total = 0
    lo: float | None = None
    hi: float | None = None
    for df, t in ((left, left_time), (right, right_time)):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col(t).cast("timestamp").cast("double")).alias("lo"),
            F.max(F.col(t).cast("timestamp").cast("double")).alias("hi"),
        ).collect()[0]
        n_total += row["n"]
        for bound, val in (("lo", row["lo"]), ("hi", row["hi"])):
            if val is None:
                continue
            if bound == "lo":
                lo = val if lo is None else min(lo, val)
            else:
                hi = val if hi is None else max(hi, val)
    if not n_total or lo is None or hi is None or hi <= lo:
        return 3600
    span = hi - lo
    return max(1, int(span * target_rows_per_bucket / n_total))


def salted_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    direction: str = "backward",
    suffix: str = "_matched",
    bucket_width_seconds: int | str = 3600,
    target_rows_per_bucket: int = 5_000_000,
) -> DataFrame:
    """:func:`asof_join` that survives one hot key.

    ``Window.partitionBy(key)`` puts a key's entire history in ONE task —
    AQE cannot split windows, so at 100 TB a power-law key (one symbol,
    one user) stalls the stage.  Same two-phase carry merge as
    ``skew.salted_window_agg``:

    1. the union-sort carry runs within ``(key, contiguous time bucket)``
       — the hot key spreads across its time range;
    2. a per-(key, bucket) boundary table (each bucket's nearest non-null
       carrier per value column, one row per key x bucket — tiny) rolls
       across buckets with a second ignorenulls carry, filling left rows
       whose match lives in an earlier (backward) / later (forward)
       bucket.

    Row-identical to :func:`asof_join` (property-tested in
    tests/test_property_asof.py): the carrier is the whole right-row
    STRUCT (round 15 — row semantics, see :func:`_tag_union`), which is
    NULL exactly when a bucket holds no right row, so
    ``coalesce(within-bucket, cross-bucket)`` is exact — a nearest
    carrier whose FIELDS are all NULL still wins the bucket and
    surfaces its NULLs, never an older row's values.

    ``bucket_width_seconds`` buckets ``left_time``/``right_time`` (any
    type castable to timestamp; ties never straddle buckets because equal
    time implies equal bucket).  Pick it so the hottest key's densest
    bucket fits a task (~10-100 M rows), or pass ``"auto"`` to derive it
    from the inputs' row count and time span (:func:`auto_bucket_width`,
    worst-case-hot-key sizing toward ``target_rows_per_bucket``).

    ``left`` must be DETERMINISTIC, same contract as :func:`asof_join`
    (ADVICE r14): it feeds both the carry union and the NULL-time
    unmatched leg, so a non-deterministic input can lose or duplicate
    rows between the two plan branches — cache/checkpoint it first.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if bucket_width_seconds == "auto":
        bucket_width_seconds = auto_bucket_width(
            left, right, left_time, right_time, target_rows_per_bucket
        )
    elif (
        not isinstance(bucket_width_seconds, int)
        or isinstance(bucket_width_seconds, bool)  # True would pass as 1
        or bucket_width_seconds < 1
    ):
        raise ValueError(
            "bucket_width_seconds must be a positive int or 'auto', got "
            f"{bucket_width_seconds!r}"
        )
    from flowbyte_spark.operators.skew import _time_bucket

    lcols = left.columns
    unioned = _tag_union(left, right, on, left_time, right_time, right_values)
    b = unioned.withColumn("__b__", _time_bucket("__t__", bucket_width_seconds))

    asc = direction == "backward"
    t_order = [F.col("__t__").asc() if asc else F.col("__t__").desc(),
               F.col("__side__").asc()]
    w_in = (
        Window.partitionBy("__k__", "__b__")
        .orderBy(*t_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Whole-row struct carry within the bucket (row semantics — see
    # _tag_union): __w__ is NULL exactly when the bucket holds NO right
    # row at-or-before (after, forward) this row — "no carrier in
    # bucket" and nothing else, so the cross-bucket coalesce below is
    # exact even when the nearest carrier's FIELDS are all NULL.
    within = F.last("__rv__", ignorenulls=True).over(w_in).alias("__w__")

    # Boundary: the bucket's nearest carrier ROW.  max_by / min_by skip
    # rows whose ordering expression is NULL, so masking the ordering
    # with the carrier's null-ness (struct-level: non-NULL iff a right
    # row) yields the last (backward) / first (forward) carrier —
    # matching the ignorenulls carry.
    nearest = F.max_by if asc else F.min_by
    order_struct = F.struct("__t__", "__side__")
    bounds = b.groupBy("__k__", "__b__").agg(
        nearest(
            F.col("__rv__"),
            F.when(F.col("__rv__").isNotNull(), order_struct),
        ).alias("__bl__")
    )
    w_prev = (
        Window.partitionBy("__k__")
        .orderBy(F.col("__b__").asc() if asc else F.col("__b__").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bounds.select(
        "__k__",
        "__b__",
        F.last("__bl__", ignorenulls=True).over(w_prev).alias("__o__"),
    )

    carried = b.select("__k__", "__b__", "__side__", "__l__", within).join(
        offsets, ["__k__", "__b__"]
    )
    rv = F.coalesce(F.col("__w__"), F.col("__o__"))
    matched = (
        carried.where(F.col("__side__") == 1)
        .select(
            *[F.col(f"__l__.{c}").alias(c) for c in lcols],
            *[
                rv.getField(c).alias(f"{c}{suffix}")
                for c in right_values
            ],
        )
    )
    # NULL-key / NULL-time left rows never enter the carry plan
    # (_tag_union excludes them — a null-safe join with offsets would
    # instead cost an EXTRA full shuffle of the carried stream,
    # measured 4 → 5 exchanges, just to route rows whose answer is
    # known).  Union them back unmatched, map-only.
    return matched.unionByName(
        _null_left_unmatched(left, right, on, left_time, right_values, suffix)
    )
