"""Oracle tests for V43-V44 (percentiles/stats, string battery)."""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize("name", ["v43_percentiles_stats", "v44_string_funcs"])
def test_battery_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)


@pytest.mark.parametrize(
    "name", ["v45_date_funcs", "v46_array_funcs", "v47_null_conditional"]
)
def test_battery2_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)


def test_v61_approx_percentiles_within_tolerance(spark, sf_dir):
    """The sketch's VALUES must land within 2% of V43's exact
    percentiles.  (v61 itself now emits the hash-gated rank-error
    contract, not the values — recompute them inline so this stronger
    value-level check survives the round-9 oracle conversion.)"""
    from pyspark.sql import functions as F

    from flowbyte_spark.catalog import load_table
    from flowbyte_spark.queries import QUERIES

    exact = {
        r.l_returnflag: (float(r.p50), float(r.p90), float(r.p99))
        for r in QUERIES["v43_percentiles_stats"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.approx_percentile(
        "l_extendedprice",
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
        F.lit(10000),
    )
    approx = {
        r.l_returnflag: tuple(float(v) for v in r.pcts)
        for r in li.groupBy("l_returnflag").agg(pct.alias("pcts")).collect()
    }
    assert set(exact) == set(approx)
    for flag in exact:
        for e, a in zip(exact[flag], approx[flag]):
            assert abs(a - e) / max(abs(e), 1.0) <= 0.02, (flag, e, a)


def test_v61_contract_matches_oracle(spark, sf_dir):
    assert_query_matches(spark, "v61_approx_percentiles", sf_dir)


@pytest.mark.parametrize(
    "name",
    [
        "v48_exists_subquery",
        "v49_scalar_subquery",
        "v50_window_battery",
        "v51_unpivot",
        "v52_string_agg",
        "v58_cross_join",
    ],
)
def test_battery3_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)
