"""Property-based check: range_join vs a brute-force O(n·m) reference.

v34's round-3 regression was a type-flavor drift (NTZ vs LTZ) the fixture
suite never exercised; the catalog now guards the flavor, but the operator
itself had no generative coverage.  Hypothesis drives random keys,
timestamps (dense enough to force boundary hits), and window widths — in
both TIMESTAMP and TIMESTAMP_NTZ flavors — against the literal definition:
every (left, right) pair with equal key and delta within [lower, upper]
seconds.  Includes exact-boundary deltas (ts pool step = 1 s, widths in
seconds) so bucket-edge rows are generated, the class the integer-floor
bucket math must not drop.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flowbyte_spark.operators.asof import range_join

pytestmark = pytest.mark.filterwarnings("ignore")

T0 = datetime(2024, 1, 1)

# 2 keys x seconds 0..12: guaranteed key collisions and deltas that land
# exactly ON the window bounds for widths 1..4.  key/time may be None
# (round 14, the funnel/asof generator-blind-spot class): a NULL key or
# NULL time satisfies no join predicate, so such rows produce NO pairs —
# range_join gets this right by construction (NULL bucket keys never
# equi-join), and this generator keeps it pinned.
row = st.tuples(
    st.one_of(st.none(), st.integers(0, 1)),
    st.one_of(st.none(), st.integers(0, 12)),
)
rows_strategy = st.lists(row, min_size=1, max_size=6)
bounds_strategy = st.tuples(st.integers(0, 2), st.integers(1, 4)).map(
    lambda t: (min(t[0], t[1]), max(t[0], t[1]))
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows, id_base, flavor):
    return spark.createDataFrame(
        [
            (
                k,
                None if s is None else T0 + timedelta(seconds=s),
                id_base + i,
            )
            for i, (k, s) in enumerate(rows)
        ],
        f"k INT, ts {flavor}, rid INT",
    )


def _reference(left_rows, right_rows, lower, upper):
    # predicate semantics: None key or None time on either side means
    # `lk == rk and lower <= rs - ls <= upper` is unsatisfiable
    return {
        (i, 100 + j)
        for i, (lk, ls) in enumerate(left_rows)
        for j, (rk, rs) in enumerate(right_rows)
        if lk is not None and lk == rk
        and ls is not None and rs is not None
        and lower <= rs - ls <= upper
    }


@pytest.mark.parametrize("flavor", ["TIMESTAMP", "TIMESTAMP_NTZ"])
@given(left_rows=rows_strategy, right_rows=rows_strategy, bounds=bounds_strategy)
@SETTINGS
def test_range_join_matches_bruteforce(spark, flavor, left_rows, right_rows, bounds):
    lower, upper = bounds
    got = {
        (r["rid"], r["rid_r"])
        for r in range_join(
            _df(spark, left_rows, 0, flavor),
            _df(spark, right_rows, 100, flavor),
            "k",
            "ts",
            "ts",
            lower_seconds=lower,
            upper_seconds=upper,
        ).collect()
    }
    assert got == _reference(left_rows, right_rows, lower, upper)


def test_far_epoch_bucket_boundaries_exact(spark):
    # ADVICE r4: double division computed the bucket keys, so past
    # |epoch_µs| > 2^52 (~year 2112) a row 1 µs below a bucket boundary
    # could round into the wrong bucket and silently drop an in-range
    # pair.  Integer floor-div must pair these exactly, centuries out in
    # both directions.
    for year in (1700, 2500):
        t0 = datetime(year, 6, 1)
        width = 600
        # right row sits 1 µs before a left row + width boundary
        left = spark.createDataFrame(
            [(1, t0, 1)], "k INT, ts TIMESTAMP, rid INT"
        )
        right = spark.createDataFrame(
            [
                (1, t0 + timedelta(seconds=width, microseconds=-1), 100),
                (1, t0 + timedelta(seconds=width, microseconds=1), 101),
            ],
            "k INT, ts TIMESTAMP, rid INT",
        )
        got = {
            r["rid_r"]
            for r in range_join(
                left, right, "k", "ts", "ts", 0, width
            ).collect()
        }
        assert got == {100}, f"year {year}: got {got}"
