"""Round-12 second batch (queries/round12b.py): plan-shape proofs for
the TPC-H shapes the queries exist for, plus operator-level
differentials for the mergeable top-k state."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from flowbyte_spark import plans
from flowbyte_spark.operators.incremental import merge_topk_states, topk_state
from flowbyte_spark.operators.topk import top_k_per_group
from flowbyte_spark.queries import QUERIES


def test_v138_literal_sql_decorrelates(spark, sf_dir):
    # Catalyst capability proof: the literal correlated scalar-MIN with
    # a JOIN-CHAIN correlation decorrelates — no per-row subquery rerun
    # survives in the executed plan.  (The registered query uses the
    # single-scan form; see the next test for why.)
    from flowbyte_spark.catalog import load_table
    from flowbyte_spark.queries.round12b import _V138_SQL

    for t in ("lineitem", "supplier", "nation", "region", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"fb138t_{t}")
    df = spark.sql(
        _V138_SQL.format(
            lineitem="fb138t_lineitem",
            supplier="fb138t_supplier",
            nation="fb138t_nation",
            region="fb138t_region",
            part="fb138t_part",
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in plan, plan
    assert re.search(r"min\(unit_cost", plan), plan


def test_v138_registered_form_scans_lineitem_once(spark, sf_dir):
    # The literal SQL inlines the offers CTE twice (two lineitem scans,
    # doubled join tree — wrong at 100 TB).  The registered query is
    # the window-MIN rewrite: exactly ONE parquet scan of lineitem and
    # no subquery nodes.
    df = QUERIES["v138_q2_min_cost_supplier"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Subquery" not in plan, plan
    n_lineitem_scans = len(re.findall(r"lineitem\.parquet", plan))
    assert n_lineitem_scans == 1, plan


def test_v141_implied_conjuncts_reach_both_scans(spark, sf_dir):
    # The disjunctive OR-of-ANDs implies per-side conjuncts; the plan
    # we want at 100 TB pushes the brand IN-list into the part scan
    # and the quantity envelope into the lineitem scan.
    df = QUERIES["v141_q19_disjunctive_revenue"](spark, sf_dir)
    plan = plans.physical_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    joined = "\n".join(pushed)
    assert re.search(r"In\(p_brand", joined), plan
    assert re.search(
        r"GreaterThanOrEqual\(l_quantity,1.0", joined
    ) and re.search(r"LessThanOrEqual\(l_quantity,30.0", joined), plan


def test_v143_not_in_plans_broadcast_anti(spark, sf_dir):
    # The tiny exclusion list must broadcast; a shuffled anti join on a
    # 6-row build side would be the wrong plan at any scale.
    df = QUERIES["v143_q16_supplier_count"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan


def test_v142_scalar_max_probe_is_broadcast(spark, sf_dir):
    # The 1-row MAX side joins by broadcast — no global sort, no
    # single-partition window anywhere in the plan — and the revenue
    # view feeds both consumers from ONE materialization (zero
    # lineitem scans survive above the checkpoint).
    df = QUERIES["v142_q15_top_supplier"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        plan
    )
    assert "Window" not in plan, plan
    assert "lineitem.parquet" not in plan, plan


def test_v144_group_table_feeds_both_consumers_once(spark, sf_dir):
    # Same shape as v142: the pv aggregate is consumed by the global
    # total and the threshold filter; the registered form materializes
    # it once instead of replaying the fact scan per consumer.
    df = QUERIES["v144_q11_important_parts"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "lineitem.parquet" not in plan, plan


def _fact(spark, n=2000, groups=7, seed_mod=101):
    # deterministic synthetic fact: value collides across ids so
    # tie-breaks are exercised
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        F.col("id").alias("id"),
        ((F.col("id") * seed_mod) % 97).cast("double").alias("v"),
    )


def test_topk_state_merge_equals_full_recompute(spark):
    # The monoid law the 100 TB path rests on: merging per-load states
    # must equal top-k over the full fact, for any load partitioning.
    fact = _fact(spark)
    full = (
        top_k_per_group(
            fact, ["g"], [F.col("v").desc(), F.col("id").asc()], 5
        )
        .drop("rn")
        .select("g", "v", "id")
    )
    for n_loads in (1, 2, 5):
        states = [
            topk_state(
                fact.where(F.col("id") % n_loads == i), ["g"], "v", "id", 5
            )
            for i in range(n_loads)
        ]
        merged = merge_topk_states(states, ["g"], "v", "id", 5).select(
            "g", "v", "id"
        )
        assert sorted(merged.collect()) == sorted(full.collect()), n_loads


def test_topk_state_merge_handles_null_order_values(spark):
    # Round-15 measure-NULL sweep: NULL order values sort LAST under
    # desc (Spark default), so they enter a load's k-row state only when
    # the group has fewer than k real values — and the merge must keep
    # that semantics (the monoid law holds for any TOTAL order, which
    # (v desc nulls-last, id asc) is).  A NULL-heavy group whose real
    # values are spread across loads is the regression shape: a load
    # seeing only NULLs still emits them into its state, and the merge
    # must rank real values from other loads above them.
    fact = _fact(spark, n=400).withColumn(
        "v", F.when(F.col("id") % 3 == 0, F.col("v"))  # 2/3 of rows NULL
    )
    full = (
        top_k_per_group(
            fact, ["g"], [F.col("v").desc(), F.col("id").asc()], 5
        )
        .drop("rn")
        .select("g", "v", "id")
    )
    states = [
        topk_state(fact.where(F.col("id") % 3 == i), ["g"], "v", "id", 5)
        for i in range(3)  # load 1 and 2 carry ONLY NULL-v rows
    ]
    merged = merge_topk_states(states, ["g"], "v", "id", 5).select(
        "g", "v", "id"
    )
    key = lambda r: (r["g"], r["id"])
    assert sorted(merged.collect(), key=key) == sorted(full.collect(), key=key)


def test_topk_state_is_bounded_per_group(spark):
    # Each load's state holds at most k rows per group — the IO bound
    # that makes the per-load persist cheap.
    state = topk_state(_fact(spark), ["g"], "v", "id", 5)
    per_group = state.groupBy("g").count().agg(F.max("count")).collect()
    assert per_group[0][0] <= 5


def test_merge_topk_states_rejects_empty():
    import pytest

    with pytest.raises(ValueError):
        merge_topk_states([], ["g"], "v", "id", 5)
