"""Round-12 third batch (queries/round12c.py): plan-shape proofs for
the final six TPC-H shapes."""

from __future__ import annotations

import re

from flowbyte_spark import plans
from flowbyte_spark.queries import QUERIES


def test_v147_exists_plans_semi_join(spark, sf_dir):
    # EXISTS must plan as a semi join (one probe bit per order), never
    # an inner join + dedup.
    df = QUERIES["v147_q4_priority_check"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "LeftSemi" in plan, plan


def test_v149_filters_reach_scan_in_one_codegen_span(spark, sf_dir):
    # Q6 is the canonical scan-filter-agg: the discount/quantity
    # envelope must reach the parquet scan as PushedFilters, and the
    # whole query should stay inside whole-stage codegen (no Python,
    # no extra exchange beyond the final 1-row agg).
    df = QUERIES["v149_q6_forecast_revenue"](spark, sf_dir)
    pushed = plans.pushed_filters(df)
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed
    assert plans.shuffle_exchanges(df) <= 1, plans.physical_plan(df)
    # codegen markers only appear on the EXECUTED plan under AQE; the
    # one-line toString renders a codegen stage as the "*(n)" prefix
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"\*\(\d+\) HashAggregate", executed), executed
    assert re.search(r"\*\(\d+\) (Project|Filter|ColumnarToRow)", executed), (
        executed
    )


def test_v151_top20_plans_take_ordered(spark, sf_dir):
    # ORDER BY + LIMIT over the aggregate must be TakeOrderedAndProject
    # — a bounded per-partition heap + driver merge, not a global sort.
    df = QUERIES["v151_q10_returned_items"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_v150_dims_broadcast_into_fact(spark, sf_dir):
    # part/supplier/nation ride broadcast joins; only the
    # lineitem⋈orders edge (two facts) may shuffle.
    df = QUERIES["v150_q9_product_profit"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # no cartesian anywhere; the only permissible shuffle join is the
    # fact⋈fact orders edge (broadcast at fixture scale under AQE)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert re.findall(r"(?:SortMerge|ShuffledHash|BroadcastHash)Join", plan), (
        plan
    )


def test_v157_funnel_is_one_pass(spark, sf_dir):
    # The funnel walks three stages with pure array expressions over
    # ONE grouped collect — no self-joins, no window, and only the
    # groupBy(user) + final segment-agg shuffles.
    df = QUERIES["v157_funnel_analysis"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert not re.search(r"(SortMerge|ShuffledHash|BroadcastHash)Join", plan), (
        plan
    )
    assert plans.shuffle_exchanges(df) <= 3, plan
    assert len(re.findall(r"events\.parquet", plan)) == 1, plan


def test_pagerank_fixed_point_cycle_invariant(spark):
    # On a 2-cycle every round computes 0.15·scale + 0.85·scale exactly
    # (all divisions exact), so ranks must stay at scale forever.
    from flowbyte_spark.operators.components import pagerank_fixed_point

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    out = {
        r.node: r.rank
        for r in pagerank_fixed_point(edges, iterations=4).collect()
    }
    assert out == {"a": 1_000_000_000, "b": 1_000_000_000}


def test_pagerank_fixed_point_partition_invariant(spark):
    # The verifiability claim: integer arithmetic makes the result a
    # pure function of the graph — identical under any partitioning.
    from flowbyte_spark.operators.components import pagerank_fixed_point

    import random

    rnd = random.Random(7)
    edges_data = [
        (f"n{rnd.randrange(40)}", f"n{rnd.randrange(40)}")
        for _ in range(300)
    ]
    edges_data = [(s, d) for s, d in edges_data if s != d]
    e1 = spark.createDataFrame(edges_data, "src string, dst string")
    e2 = e1.repartition(13)
    r1 = sorted(map(tuple, pagerank_fixed_point(e1, iterations=3).collect()))
    r2 = sorted(map(tuple, pagerank_fixed_point(e2, iterations=3).collect()))
    assert r1 == r2


def test_pagerank_star_hub_ranks_highest(spark):
    # All spokes point at the hub: the hub must out-rank every spoke.
    from flowbyte_spark.operators.components import pagerank_fixed_point

    edges = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(10)]
        + [("hub", f"s{i}") for i in range(10)],
        "src string, dst string",
    )
    out = {
        r.node: r.rank
        for r in pagerank_fixed_point(edges, iterations=5).collect()
    }
    assert out["hub"] > max(v for k, v in out.items() if k != "hub")
