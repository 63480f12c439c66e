"""Property-based check: asof_join vs a brute-force per-row reference.

The union-sort rewrite (operators/asof.py) earns its single shuffle with
subtle mechanics — side tags ordering ties, last(ignorenulls) carrying —
so hypothesis drives random key/timestamp collisions (tiny timestamp pool
forces equal-instant ties) against the obvious O(n·m) definition:
backward = latest right row at-or-before, forward = earliest at-or-after.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flowbyte_spark.operators.asof import asof_join

pytestmark = pytest.mark.filterwarnings("ignore")

T0 = datetime(2024, 1, 1)

# 2 keys x 6 instants: collisions on both are guaranteed at these sizes.
# key/time may be None (round 14): predicate semantics — a NULL key or
# NULL time never satisfies the join predicate, so NULL right rows match
# nothing and NULL left rows emit unmatched (the r13 funnel ADVICE class:
# a generator that never produces NULLs cannot catch a NULL carrier
# being carried into every row of its key).
row = st.tuples(
    st.one_of(st.none(), st.integers(0, 1)),
    st.one_of(st.none(), st.integers(0, 5)),
)
rows_strategy = st.lists(row, min_size=1, max_size=6)

# FB_HYP_EXAMPLES=100 runs the deeper soak profile (the r15 audit's
# knob, shared with tests/test_incremental.py); default stays CI-sized.
import os

SETTINGS = settings(
    max_examples=int(os.environ.get("FB_HYP_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, value_base):
    return spark.createDataFrame(
        [
            (
                k,
                None if m is None else T0 + timedelta(minutes=m),
                float(value_base + i),
            )
            for i, (k, m) in enumerate(rows)
        ],
        "k INT, ts TIMESTAMP, v DOUBLE",
    )


def _reference(left_rows, right_rows, direction):
    # predicate semantics: a None key or None time on EITHER side makes
    # `rk == k and rm <= m` unsatisfiable — the left row stays unmatched
    out = {}
    for i, (k, m) in enumerate(left_rows):
        if k is None or m is None:
            out[float(i)] = None
            continue
        if direction == "backward":
            cand = [
                (rm, j) for j, (rk, rm) in enumerate(right_rows)
                if rk == k and rm is not None and rm <= m
            ]
            pick = max(cand) if cand else None
        else:
            cand = [
                (-rm, j) for j, (rk, rm) in enumerate(right_rows)
                if rk == k and rm is not None and rm >= m
            ]
            pick = max(cand) if cand else None
        out[float(i)] = None if pick is None else float(100 + pick[1])
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
@given(left_rows=rows_strategy, right_rows=rows_strategy)
@SETTINGS
def test_asof_matches_bruteforce(spark, direction, left_rows, right_rows):
    # Right-side values are unique row ids, so equal-timestamp ties on the
    # RIGHT side may legitimately resolve to any tied row — compare the
    # picked timestamp class instead when the reference has ties.
    left = _df(spark, left_rows, 0)
    right = _df(spark, right_rows, 100)
    got = {
        r["v"]: r["v_matched"]
        for r in asof_join(
            left, right, "k", "ts", "ts", right_values=["v"],
            direction=direction,
        ).collect()
    }
    ref = _reference(left_rows, right_rows, direction)
    assert set(got) == set(ref)
    for lv, rv in ref.items():
        if rv is None:
            assert got[lv] is None
        else:
            # the engine may pick any right row TIED at the reference's
            # timestamp; assert timestamp equality, not row identity
            j_ref = int(rv - 100)
            j_got = int(got[lv] - 100)
            assert right_rows[j_got][0] == right_rows[j_ref][0]  # same key
            assert right_rows[j_got][1] == right_rows[j_ref][1]  # same instant


# --- salted (skew-resistant) variant --------------------------------------

from flowbyte_spark.operators.asof import salted_asof_join  # noqa: E402


@pytest.mark.parametrize("direction", ["backward", "forward"])
@given(left_rows=rows_strategy, right_rows=rows_strategy)
@SETTINGS
def test_asof_carries_the_nearest_row_wholesale(
    spark, direction, left_rows, right_rows
):
    # ROW semantics (round 15): every matched value must come from ONE
    # right row — the nearest — even when that row's OTHER fields are
    # NULL.  Before the whole-row struct carry, the per-column
    # last(ignorenulls) backfilled a nearest carrier's NULL field from
    # an OLDER row, tearing the match across two right rows (DuckDB
    # ASOF JOIN and pandas merge_asof attach the nearest row wholesale).
    from pyspark.sql import functions as F

    left = _df(spark, left_rows, 0)
    # v is a unique right-row id; every second right row carries w=NULL
    right = _df(spark, right_rows, 100).withColumn(
        "w", F.when(F.col("v").cast("long") % 2 == 1, F.col("v") * 10)
    )
    for fn, kw in [
        (asof_join, {}),
        (salted_asof_join, {"bucket_width_seconds": 60}),
    ]:
        got = {
            r["v"]: (r["v_matched"], r["w_matched"])
            for r in fn(
                left, right, "k", "ts", "ts",
                right_values=["v", "w"], direction=direction, **kw,
            ).collect()
        }
        for lv, (vm, wm) in got.items():
            if vm is None:
                assert wm is None, (lv, vm, wm)
            else:
                expected_w = vm * 10 if int(vm) % 2 == 1 else None
                assert wm == expected_w, (lv, vm, wm)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("width", [60, 300])  # every-instant buckets / 2 buckets
@given(left_rows=rows_strategy, right_rows=rows_strategy)
@SETTINGS
def test_salted_asof_matches_bruteforce(
    spark, direction, width, left_rows, right_rows
):
    """salted_asof_join must satisfy the SAME brute-force contract as
    asof_join for bucket widths that force cross-bucket carries (60 s =
    one bucket per instant) and straddles (300 s)."""
    left = _df(spark, left_rows, 0)
    right = _df(spark, right_rows, 100)
    got = {
        r["v"]: r["v_matched"]
        for r in salted_asof_join(
            left, right, "k", "ts", "ts", right_values=["v"],
            direction=direction, bucket_width_seconds=width,
        ).collect()
    }
    ref = _reference(left_rows, right_rows, direction)
    assert set(got) == set(ref)
    for lv, rv in ref.items():
        if rv is None:
            assert got[lv] is None
        else:
            j_ref = int(rv - 100)
            j_got = int(got[lv] - 100)
            assert right_rows[j_got][0] == right_rows[j_ref][0]
            assert right_rows[j_got][1] == right_rows[j_ref][1]


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_salted_asof_hot_key_row_identical(spark, direction):
    """One key holding 90% of both sides — the shape the salt exists for —
    plus NULL carrier values (invisible to the ignorenulls carry in BOTH
    plans): salted output must be row-identical to the unsalted join."""
    import random

    rnd = random.Random(7)
    # right timestamps unique per key so equal-time right-side ties (the
    # one legitimately ambiguous case) cannot occur
    right_ts = {k: rnd.sample(range(0, 7200), 120) for k in (0, 1, 2)}
    right_rows = [
        (k, s, None if i % 3 == 0 else float(k * 10000 + s))
        for k in right_ts
        for i, s in enumerate(right_ts[k])
    ]
    left_rows = [
        (0 if i % 10 else 1 + i % 2, rnd.randint(0, 7200), float(i))
        for i in range(500)
    ]
    left = spark.createDataFrame(
        [(k, T0 + timedelta(seconds=s), v) for k, s, v in left_rows],
        "k INT, ts TIMESTAMP, lv DOUBLE",
    )
    right = spark.createDataFrame(
        [(k, T0 + timedelta(seconds=s), v) for k, s, v in right_rows],
        "k INT, ts TIMESTAMP, v DOUBLE",
    )
    kw = dict(direction=direction)
    plain = asof_join(left, right, "k", "ts", "ts", ["v"], **kw).collect()
    salted = salted_asof_join(
        left, right, "k", "ts", "ts", ["v"], bucket_width_seconds=600, **kw
    ).collect()
    key = lambda r: (r.k, r.ts, r.lv, r.v_matched)
    assert sorted(map(key, salted)) == sorted(map(key, plain))
    assert len(plain) == 500


def test_salted_asof_plan_shape(spark):
    """No nested-loop/cartesian anywhere (the rewrite's whole point) and
    a bounded exchange count: union-sort carry + boundary rollup + merge
    join must stay a handful of keyed shuffles, independent of data."""
    from datetime import datetime

    from flowbyte_spark import plans

    left = spark.createDataFrame(
        [(1, T0, 1.0)], "k INT, ts TIMESTAMP, lv DOUBLE"
    )
    right = spark.createDataFrame(
        [(1, T0, 2.0)], "k INT, ts TIMESTAMP, v DOUBLE"
    )
    df = salted_asof_join(
        left, right, "k", "ts", "ts", ["v"], bucket_width_seconds=3600
    )
    plan = plans.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plans.shuffle_exchanges(df) <= 4, plan


def test_salted_asof_rejects_bool_and_bad_widths(spark):
    # ADVICE r9: bool is an int subclass, so bucket_width_seconds=True
    # silently degraded to 1-second buckets instead of failing loud.
    left = spark.createDataFrame([(1, T0, 1.0)], "k INT, ts TIMESTAMP, lv DOUBLE")
    right = spark.createDataFrame([(1, T0, 2.0)], "k INT, ts TIMESTAMP, v DOUBLE")
    for bad in (True, False, 0, -5, "AUTO", "3600", 1.5, None):
        with pytest.raises(ValueError, match="bucket_width_seconds"):
            salted_asof_join(
                left, right, "k", "ts", "ts", ["v"], bucket_width_seconds=bad
            )


# --- auto bucket-width heuristic (r8 VERDICT #6) ---------------------------

from flowbyte_spark.operators.asof import auto_bucket_width  # noqa: E402


@pytest.mark.parametrize("direction", ["backward", "forward"])
@given(left_rows=rows_strategy, right_rows=rows_strategy)
@SETTINGS
def test_salted_asof_auto_matches_manual(spark, direction, left_rows, right_rows):
    """bucket_width_seconds='auto' must be row-identical to a manual
    width (both satisfy the asof_join contract); a tiny
    target_rows_per_bucket forces multiple buckets so the auto path
    exercises the cross-bucket roll, not just the single-bucket case."""
    left = _df(spark, left_rows, 0)
    right = _df(spark, right_rows, 100)
    auto = salted_asof_join(
        left, right, "k", "ts", "ts", right_values=["v"],
        direction=direction, bucket_width_seconds="auto",
        target_rows_per_bucket=2,
    )
    manual = salted_asof_join(
        left, right, "k", "ts", "ts", right_values=["v"],
        direction=direction, bucket_width_seconds=60,
    )
    got_a = {r["v"]: r["v_matched"] for r in auto.collect()}
    got_m = {r["v"]: r["v_matched"] for r in manual.collect()}
    ref = _reference(left_rows, right_rows, direction)
    for got in (got_a, got_m):
        assert set(got) == set(ref)
        for lv, rv in ref.items():
            if rv is None:
                assert got[lv] is None
            else:
                j_ref = int(rv - 100)
                j_got = int(got[lv] - 100)
                assert right_rows[j_got][0] == right_rows[j_ref][0]
                assert right_rows[j_got][1] == right_rows[j_ref][1]


def test_auto_bucket_width_shapes(spark):
    # dense data -> narrow buckets; sparse -> wide; empty/degenerate -> 3600
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    dense = spark.createDataFrame(
        [(i % 3, base + dt.timedelta(seconds=i // 100), float(i)) for i in range(1000)],
        "k int, ts timestamp, v double",
    )
    w_dense = auto_bucket_width(dense, dense, "ts", "ts", target_rows_per_bucket=100)
    # span ~10 s, 2000 rows, target 100 -> width ~ 0.5 s -> clamped to 1
    assert w_dense == 1
    sparse = spark.createDataFrame(
        [(1, base + dt.timedelta(days=i), float(i)) for i in range(10)],
        "k int, ts timestamp, v double",
    )
    w_sparse = auto_bucket_width(sparse, sparse, "ts", "ts", target_rows_per_bucket=100)
    # span 9 days, 20 rows, target 100 -> width = span*5 (single bucket)
    assert w_sparse >= 9 * 86400
    empty = dense.where("k > 99")
    assert auto_bucket_width(empty, empty, "ts", "ts") == 3600
    const = spark.createDataFrame([(1, base, 1.0)] * 5, "k int, ts timestamp, v double")
    assert auto_bucket_width(const, const, "ts", "ts") == 3600


def test_salted_asof_rejects_bad_width(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame([(1, base, 1.0)], "k int, ts timestamp, v double")
    with pytest.raises(ValueError, match="positive int or 'auto'"):
        salted_asof_join(df, df, "k", "ts", "ts", ["v"], bucket_width_seconds=0)
    with pytest.raises(ValueError, match="positive int or 'auto'"):
        salted_asof_join(df, df, "k", "ts", "ts", ["v"], bucket_width_seconds="foo")
