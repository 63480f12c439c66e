"""Oracle-differential tests for the relational suite (V01-V16).

Each query runs on Spark (engine API) and DuckDB (oracle SQL) over the same
sf0.01 parquet fixtures; canonicalized results must match exactly — the same
check the verify driver performs.
"""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_query_matches

RELATIONAL = [
    "v01_scan",
    "v02_project_filter",
    "v03_agg_q1",
    "v04_join_agg",
    "v05_q3_top10",
    "v06_left_join_coalesce",
    "v07_semi_anti",
    "v08_theta_join",
    "v09_rollup",
    "v10_window_rank",
    "v11_window_frames",
    "v12_set_ops",
    "v13_scalar_funcs",
    "v14_json_extract",
    "v15_time_bucket",
    "v16_count_distinct",
    "v62_full_outer_join",
    "v63_right_outer_join",
    "v77_q18_large_orders",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)
