"""Oracle tests for V33-V36 + tolerance check for V37 + plan-shape tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark import plans
from flowbyte_spark.catalog import load_table
from flowbyte_spark.queries import QUERIES
from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize(
    "name",
    ["v33_asof_join", "v34_range_join", "v35_pivot", "v36_grouping_sets"],
)
def test_extended_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)


def test_v37_approx_distinct_within_tolerance(spark, sf_dir):
    # v37 emits the hash-gated bound contract; recompute the estimate
    # inline so the direct value-level tolerance check survives too.
    from pyspark.sql import functions as F

    from flowbyte_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err <= 0.10, (
            f"{r.event_type}: approx {r.approx_users} vs exact "
            f"{r.exact_users} (err {rel_err:.2%})"
        )


def test_v37_contract_matches_oracle(spark, sf_dir):
    from tests.oracle_util import assert_query_matches

    assert_query_matches(spark, "v37_approx_distinct", sf_dir)


# ---------------------------------------------------------------------------
# Plan-shape assertions: the physical plan is part of the contract
# ---------------------------------------------------------------------------


def test_range_join_avoids_nested_loop(spark, sf_dir):
    from flowbyte_spark.operators.asof import range_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    joined = range_join(events, events, "user_id", "ts", "ts")
    assert not plans.uses_nested_loop_join(joined), (
        "bucketed range join must compile to hash joins:\n"
        + plans.physical_plan(joined)
    )


def test_dim_join_broadcasts(spark, sf_dir):
    df = QUERIES["v04_join_agg"](spark, sf_dir)
    assert plans.uses_broadcast_join(df)


@pytest.mark.parametrize(
    "name", ["v04_join_agg", "v05_q3_top10", "v08_theta_join", "v09_rollup"]
)
def test_large_build_side_degrades_to_smj(spark, sf_dir, name):
    """No hard-coded broadcast hints on scale-growing tables.

    A ``F.broadcast`` hint bypasses the planner's size check, so at 100x
    scale a hinted dim becomes a multi-GB forced build side and OOMs.  With
    size-based planning the same query degrades to a shuffled join when the
    build side exceeds the threshold.  Simulate "too big to broadcast" by
    disabling the threshold: a surviving hint would still produce
    BroadcastHashJoin; the hint-free plan must not.
    """
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = QUERIES[name](spark, sf_dir)
        plan = plans.physical_plan(df)
        assert "BroadcastHashJoin" not in plan, (
            f"{name} still forces broadcast with threshold disabled:\n{plan}"
        )
        assert (
            "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        ), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    df = QUERIES["v02_project_filter"](spark, sf_dir)
    assert plans.has_pushed_filter(df, "l_shipdate"), plans.pushed_filters(df)
    read_cols = plans.read_schema_columns(df)
    # 11-column table, 4 needed: pruning must hold
    assert set(read_cols) <= {
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }, read_cols


def test_asof_join_single_shuffle(spark, sf_dir):
    from flowbyte_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("p_value")
    )
    joined = asof_join(
        clicks, purchases, "user_id", "ts", "ts", ["p_value"]
    )
    # union-sort rewrite: no join node at all, exactly one hash exchange
    plan = plans.physical_plan(joined)
    assert "Join" not in plan, plan
    assert plans.shuffle_exchanges(joined) <= 1, plan
