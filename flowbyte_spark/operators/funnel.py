"""Ordered event-sequence (funnel) matching with a skew brake.

Funnel semantics (the v157 contract): per user, stage 1 anchors at the
FIRST ``stages[0]`` event; stage k+1 matches the first ``stages[k+1]``
event strictly after the stage-k match and within ``windows_hours[k]``
hours of it.  Counts are reported per segment.  The reference has no
funnel capability (charter behavioral-analytics extension; sql.py
delegates all query logic to SQL Server).

Two physical forms, selected by ``variant``:

``array`` (default) — the one-pass shape: ONE ``groupBy(user)``
    collecting each stage's sorted timestamp array, then pure
    higher-order expressions (``filter`` + ``array_min``) walk the
    funnel.  Zero joins, one scan of the event stream, ≤3 exchanges
    (plan-asserted in tests/test_round12c.py).  Its failure mode is the
    hot user: ``collect_list`` materializes EVERY event of a key inside
    one aggregation buffer, so a 10M-event bot builds an ~80 MB array —
    the same hot-key class the engine salts elsewhere.  The
    ``max_events_per_user`` brake (the ``streaming/stateful.py``
    ``max_keys`` pattern) makes that fail LOUD: a ``count(*)`` rides the
    same aggregation and an ``assert_true`` filter raises mid-job,
    naming the oversized key and pointing at the ``staged`` variant.

``staged`` — the skew-safe escape hatch (the oracle's own shape): one
    bounded ``min`` aggregation per stage plus a per-stage range join
    back to the event stream.  Hot users cost shuffle volume only —
    ``min`` is partially aggregatable (map-side combine collapses the
    bot's 10M rows to one candidate per map partition) and the probe
    joins stream 1:N without buffering a key's rows.  Price: 3 scans of
    the event stream and join exchanges.

Guidance: use ``array`` when per-user event counts are bounded (the
common product-analytics case — sessions, not firehoses); use
``staged`` when the corpus may carry unbounded hot keys, or after the
``array`` brake fires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default brake: 1M events/user ≈ 8 MB of timestamps in one aggregation
# buffer — loud well before a buffer becomes an executor-memory problem,
# generous enough that no organic user trips it.
DEFAULT_MAX_EVENTS_PER_USER = 1_000_000


def funnel_counts(
    events: DataFrame,
    segment: Column,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    windows_hours: tuple[int, int] = (12, 24),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    variant: str = "array",
    max_events_per_user: int | None = DEFAULT_MAX_EVENTS_PER_USER,
) -> DataFrame:
    """Per-segment funnel counts ``(segment, n_<s1>, n_<s2>, n_<s3>)``.

    ``segment`` is evaluated AFTER the projection renames ``user_col``
    to the canonical ``user_id`` — it must be a function of the
    ``user_id`` column alone (e.g. ``F.col("user_id") % 10``), never of
    the caller's original column name.  Rows with a NULL ``ts_col`` OR a
    NULL ``user_col`` are dropped up front in BOTH variants (predicate
    semantics, the engine's asof/skew convention): an unstamped event
    can anchor no stage, an unattributed event belongs to no per-user
    funnel, and filtering here keeps the two physical forms equivalent —
    ``collect_list`` silently drops NULL timestamps while a
    groupBy-``min`` would still emit the user with ``t1=NULL``, and
    (ADVICE r14) ``groupBy`` would pool every NULL user into one
    synthetic "user" that can convert through stages while the staged
    variant's equi-joins on ``user_id`` never advance a NULL user past
    stage 1.
    ``max_events_per_user`` bounds the ``array`` variant's per-key
    aggregation buffer — exceeding it raises mid-job (pass ``None`` to
    waive deliberately); the ``staged`` variant never buffers a key and
    ignores it.
    """
    s1, s2, s3 = stages
    ev = events.where(
        F.col(type_col).isin(*stages)
        & F.col(ts_col).isNotNull()
        & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
    )
    if variant == "array":
        funnel = _array_funnel(
            ev, segment, s1, s2, s3, windows_hours, max_events_per_user
        )
    elif variant == "staged":
        funnel = _staged_funnel(ev, segment, s1, s2, s3, windows_hours)
    else:
        raise ValueError(f"unknown funnel variant: {variant!r}")
    return (
        funnel.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias(f"n_{s1}"),
            F.count("t2").alias(f"n_{s2}"),
            F.count("t3").alias(f"n_{s3}"),
        )
        .orderBy("segment")
    )


def _array_funnel(
    ev: DataFrame,
    segment: Column,
    s1: str,
    s2: str,
    s3: str,
    windows_hours: tuple[int, int],
    max_events_per_user: int | None,
) -> DataFrame:
    def stage_arr(t: str, name: str):
        return F.sort_array(
            F.collect_list(F.when(F.col("event_type") == t, F.col("ts")))
        ).alias(name)

    per_user = ev.groupBy("user_id", segment.alias("segment")).agg(
        stage_arr(s1, "a1"),
        stage_arr(s2, "a2"),
        stage_arr(s3, "a3"),
        F.count(F.lit(1)).alias("n_events"),
    )
    if max_events_per_user is not None:
        # Fail-loud skew brake: the assert rides a filter (filters are
        # always evaluated — a projected-then-dropped assert column
        # would be pruned), raising with the offending key mid-job
        # instead of silently building an unbounded buffer.  It fires
        # AFTER the oversized buffer was built for that key — it is a
        # tripwire naming the bot, not a memory guard; corpora where
        # the buffer itself is the risk belong on variant='staged'.
        brake = F.assert_true(
            F.col("n_events") <= F.lit(max_events_per_user),
            F.concat(
                F.lit(
                    "funnel_counts(variant='array') exceeded "
                    f"max_events_per_user={max_events_per_user}: user "
                ),
                F.col("user_id").cast("string"),
                F.lit(
                    f" has more events; collect_list buffers O(events/user)."
                    " Use variant='staged' for hot-key corpora, or raise/"
                    "waive the brake (max_events_per_user=None)."
                ),
            ),
        )
        per_user = per_user.where(brake.isNull())
    w2, w3 = windows_hours
    return (
        per_user.withColumn("t1", F.expr("try_element_at(a1, 1)"))
        .withColumn(
            "t2",
            F.expr(
                "array_min(filter(a2, x -> x > t1"
                f" AND x <= t1 + INTERVAL {w2} HOURS))"
            ),
        )
        .withColumn(
            "t3",
            F.expr(
                "array_min(filter(a3, x -> x > t2"
                f" AND x <= t2 + INTERVAL {w3} HOURS))"
            ),
        )
        .where(F.col("t1").isNotNull())
    )


def _staged_funnel(
    ev: DataFrame,
    segment: Column,
    s1: str,
    s2: str,
    s3: str,
    windows_hours: tuple[int, int],
) -> DataFrame:
    """Three staged min-joins — bounded state per key at every step.

    Each stage is groupBy-min (partially aggregatable: a bot's 10M rows
    collapse map-side) and each probe join streams the event side —
    nothing ever holds a key's full event list in memory, so skew costs
    shuffle volume only.
    """
    w2, w3 = windows_hours
    anchors = (
        ev.where(F.col("event_type") == s1)
        .groupBy("user_id", segment.alias("segment"))
        .agg(F.min("ts").alias("t1"))
    )
    stage2 = (
        ev.where(F.col("event_type") == s2)
        .join(anchors.select("user_id", "t1"), "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr(f"INTERVAL {w2} HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    stage3 = (
        ev.where(F.col("event_type") == s3)
        .join(stage2, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr(f"INTERVAL {w3} HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        anchors.join(stage2, "user_id", "left")
        .join(stage3, "user_id", "left")
        .select("user_id", "segment", "t1", "t2", "t3")
    )
