"""Property-based check: salted (two-phase) window aggregates vs the plain
unsalted window.

The salted forms must be EXACT rewrites: same running sums/counts/min/max
and same lag values, for any row distribution — including empty buckets
between occupied ones, all rows in one bucket, genuine NULLs in the lagged
column, and ties broken by an explicit tiebreaker.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from flowbyte_spark.operators.skew import salted_lag, salted_window_agg

pytestmark = pytest.mark.filterwarnings("ignore")

T0 = datetime(2024, 1, 1)

# seconds 0..600 across a 60 s bucket width: rows scatter over ~10 buckets
# with gaps; value pool includes None for the lag null-semantics case.
# key and time may ALSO be None (round 14): Window.partitionBy groups
# NULL keys into one partition and sorts NULL times FIRST — the salted
# rewrites must reproduce both (before the r14 fix, NULL-key and
# NULL-time rows fell out of the phase-merge equi-join and vanished;
# this generator could never catch it).
row = st.tuples(
    st.one_of(st.none(), st.integers(0, 1)),  # key (nullable)
    st.one_of(st.none(), st.integers(0, 600)),  # seconds offset (nullable)
    st.one_of(st.none(), st.integers(-5, 5)),  # value (nullable)
)
rows_strategy = st.lists(row, min_size=1, max_size=12)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (  # i = unique tiebreaker
                k,
                None if s is None else T0 + timedelta(seconds=s),
                v,
                i,
            )
            for i, (k, s, v) in enumerate(rows)
        ],
        "k INT, ts TIMESTAMP, v INT, rid INT",
    )


@given(rows=rows_strategy)
@SETTINGS
def test_salted_running_aggs_match_unsalted(spark, rows):
    df = _df(spark, rows)
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["rid"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.select(
            "rid",
            F.sum("v").over(w).alias("s"),
            F.count("v").over(w).alias("c"),
            F.min("v").over(w).alias("mn"),
            F.max("v").over(w).alias("mx"),
        ).collect()
    }
    got = {
        r["rid"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_window_agg(
            df,
            keys=["k"],
            order_by="ts",
            aggs={
                "s": ("sum", "v"),
                "c": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
            },
            bucket_width_seconds=60,
            tiebreakers=["rid"],
        ).collect()
    }
    assert got == want


@given(rows=rows_strategy)
@SETTINGS
def test_salted_lag_matches_unsalted(spark, rows):
    df = _df(spark, rows)
    w = Window.partitionBy("k").orderBy("ts", "rid")
    want = {
        r["rid"]: r["l"]
        for r in df.select("rid", F.lag("v").over(w).alias("l")).collect()
    }
    got = {
        r["rid"]: r["l"]
        for r in salted_lag(
            df,
            keys=["k"],
            order_by="ts",
            col="v",
            out="l",
            bucket_width_seconds=60,
            tiebreakers=["rid"],
        ).collect()
    }
    assert got == want


def test_phase1_window_partitions_include_bucket(spark):
    # The scale property: phase 1's window partition spec must include the
    # time bucket, so one hot key spreads over its time range instead of
    # landing in a single task.
    import contextlib
    import io

    df = _df(spark, [(0, i, i) for i in range(50)])
    out = salted_window_agg(
        df, ["k"], "ts", {"s": ("sum", "v")}, bucket_width_seconds=10
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "__b__" in plan, "phase-1 window not bucketed"
    assert out.count() == 50


def test_unsupported_fn_rejected(spark):
    df = _df(spark, [(0, 0, 1)])
    with pytest.raises(ValueError, match="associative"):
        salted_window_agg(df, ["k"], "ts", {"a": ("avg", "v")}, 60)
