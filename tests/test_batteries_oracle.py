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
