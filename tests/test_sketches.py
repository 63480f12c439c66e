"""operators/sketches.py: the Misra-Gries guarantees must hold for ANY
input distribution and partition layout — undercount-only within N/k,
and a superset of every item above N/k frequency.  (V136's oracle
differential lives in test_llm2_oracle.py.)"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from flowbyte_spark.operators.sketches import frequent_items

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    items=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=400
    ),
    k=st.integers(min_value=2, max_value=12),
    parts=st.integers(min_value=1, max_value=5),
)
@SETTINGS
def test_mg_bounds_hold(spark, items, k, parts):
    n = len(items)
    truth = Counter(str(i) for i in items)
    df = spark.createDataFrame(
        [(str(i),) for i in items], "term string"
    ).repartition(parts)
    est = {r.item: r.est for r in frequent_items(df, "term", k=k).collect()}
    for item, e in est.items():
        assert e <= truth[item], (item, e, truth[item])
        assert e >= truth[item] - n / k, (item, e, truth[item], n, k)
    for item, t in truth.items():
        if t > n / k:
            assert item in est, (item, t, n, k)


def test_mg_counter_cap(spark):
    # 50 distinct singletons through k=5: at most k survivors per
    # partition ever reach the merge.
    df = spark.createDataFrame(
        [(f"t{i}",) for i in range(50)], "term string"
    ).coalesce(1)
    out = frequent_items(df, "term", k=5).collect()
    assert len(out) <= 5


def test_mg_rejects_bad_k(spark):
    df = spark.createDataFrame([("a",)], "term string")
    with pytest.raises(ValueError, match="k must be"):
        frequent_items(df, "term", k=0)


def test_mg_null_items_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "term string"
    )
    out = {r.item: r.est for r in frequent_items(df, "term", k=4).collect()}
    assert out == {"a": 2}
