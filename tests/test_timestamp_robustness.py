"""Timestamp-flavor robustness for the time-series operators.

Round 3's only wrong answer came from a timestamp FLAVOR change (naive
parquet → TIMESTAMP_NTZ) reaching ``range_join``'s internals.  The catalog
loader now normalizes fixtures, but the operators are public API and can be
handed arbitrary DataFrames — so ``asof_join`` and ``range_join`` must give
identical answers for TIMESTAMP (LTZ), TIMESTAMP_NTZ, and mixed inputs.
The session TZ is pinned UTC (session.py), which makes the two flavors
value-equivalent: same wall-clock in, same pairs out.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.operators.asof import asof_join, range_join

TS = "ts TIMESTAMP"
NTZ = "ts TIMESTAMP_NTZ"


def _trades(spark, ts_type):
    return spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0, 0), 100.0),
            (1, datetime(2024, 1, 1, 10, 5, 30), 101.0),
            (2, datetime(2024, 1, 1, 10, 1, 0), 200.0),
        ],
        f"k INT, {ts_type}, px DOUBLE",
    )


def _quotes(spark, ts_type):
    return spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 59, 0), 99.5),
            (1, datetime(2024, 1, 1, 10, 5, 30), 100.5),
            (2, datetime(2024, 1, 1, 10, 0, 59), 199.5),
            (2, datetime(2024, 1, 1, 10, 4, 0), 201.0),
        ],
        f"k INT, {ts_type}, bid DOUBLE",
    )


@pytest.mark.parametrize("lt,rt", [(TS, TS), (NTZ, NTZ), (TS, NTZ), (NTZ, TS)])
def test_range_join_same_answer_for_all_timestamp_flavors(spark, lt, rt):
    left = _trades(spark, lt)
    right = _quotes(spark, rt)
    got = sorted(
        (r["k"], r["px"], r["bid"])
        for r in range_join(
            left, right, "k", "ts", "ts", lower_seconds=0, upper_seconds=300
        ).collect()
    )
    # quote at/after the trade within 5 min, same key:
    #   trade(1,10:00) → quote(1,10:05:30)? delta=330s > 300 → no; none
    #   trade(1,10:05:30) → quote(1,10:05:30) delta=0 → yes
    #   trade(2,10:01) → quote(2,10:04) delta=180 → yes
    assert got == [(1, 101.0, 100.5), (2, 200.0, 201.0)]


@pytest.mark.parametrize("lt,rt", [(TS, TS), (NTZ, NTZ), (TS, NTZ), (NTZ, TS)])
def test_asof_join_same_answer_for_all_timestamp_flavors(spark, lt, rt):
    left = _trades(spark, lt)
    right = _quotes(spark, rt)
    got = {
        (r["k"], r["px"]): r["bid_matched"]
        for r in asof_join(
            left, right, "k", "ts", "ts", right_values=["bid"]
        ).collect()
    }
    assert got == {
        (1, 100.0): 99.5,     # 10:00 picks up 09:59 quote
        (1, 101.0): 100.5,    # equal-instant quote wins (ASOF convention)
        (2, 200.0): 199.5,    # 10:01 picks up 10:00:59
    }


def test_range_join_subsecond_precision_survives(spark):
    # unix_timestamp truncates micros; the operator must not (micros decide
    # in/out at the bound).  899.999999s is in a [0, 900] window; 900.000001
    # is out.
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 0, 0), "a")], f"k INT, {NTZ}, tag STRING"
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 14, 59, 999999), "in"),
            (1, datetime(2024, 1, 1, 0, 15, 0, 1), "out"),
        ],
        f"k INT, {NTZ}, tag STRING",
    )
    got = [
        r["tag_r"]
        for r in range_join(
            left, right, "k", "ts", "ts", lower_seconds=0, upper_seconds=900
        ).collect()
    ]
    assert got == ["in"]
