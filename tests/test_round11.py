"""Round-11 plan/shape assertions.  (Oracle differentials live in
test_llm2_oracle.py per the POST_WINDOW_NEW tier-3 contract; property
differentials for the minmax operator live in test_incremental.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.queries import QUERIES


def test_v124_both_paths_fire_at_fixture_scale(spark, sf_dir):
    # The fixture must exercise BOTH legs: ≥1 group whose delete ties
    # an extremum (targeted recompute) and ≥1 that merges algebraically
    # — otherwise the oracle gate only proves one path.
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    state = orders.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    dels = (
        orders.where(F.col("o_orderkey") % 13 == 0)
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_totalprice").alias("dmn"),
            F.max("o_totalprice").alias("dmx"),
        )
    )
    j = state.join(dels, "o_orderpriority")
    hit = j.where(
        (F.col("dmn") == F.col("mn")) | (F.col("dmx") == F.col("mx"))
    ).count()
    total = state.count()
    assert 0 < hit < total, (hit, total)


def test_v124_recompute_leg_is_broadcast_semi(spark, sf_dir):
    # The post-delta fact read must be filtered through a broadcast
    # LEFT SEMI join on the unsafe keys — the targeted recompute, not a
    # second full-fact aggregation.
    df = QUERIES["v124_incremental_minmax"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    semi_lines = [
        ln for ln in plan.splitlines() if "LeftSemi" in ln
    ]
    assert semi_lines, plan
    assert any("BroadcastHashJoin" in ln for ln in semi_lines), plan
    assert "CartesianProduct" not in plan, plan
