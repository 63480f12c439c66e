"""V112-V114 (queries/relational4.py): oracle differentials plus the
plan-shape proofs the queries exist for — a bucketed join that plans
zero exchanges, a genuine null-aware anti join, and a decorrelated
scalar-aggregate subquery."""

from __future__ import annotations

import re

import pytest

from flowbyte_spark import plans
from flowbyte_spark.queries import QUERIES
from flowbyte_spark.queries.relational4 import bucketed_pair
from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize(
    "name",
    [
        "v112_bucketed_smb_join",
        "v113_null_aware_anti",
        "v114_correlated_max_order",
    ],
)
def test_round10_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)


def test_bucketed_pair_join_plans_zero_exchanges(spark, sf_dir):
    # The whole point of the bucketed layout: the fact⋈dim join itself
    # must not shuffle either side — scans report the bucket layout as
    # their output partitioning.
    orders, customer = bucketed_pair(spark, sf_dir)
    j = (
        orders.hint("merge")
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_mktsegment")
    )
    plan = plans.physical_plan(j)
    assert plans.shuffle_exchanges(j) == 0, plan
    assert "SortMergeJoin" in plan, plan


def test_v112_full_query_shuffles_only_for_agg_and_sort(spark, sf_dir):
    df = QUERIES["v112_bucketed_smb_join"](spark, sf_dir)
    plan = plans.physical_plan(df)
    # one hash exchange for the 5-group aggregate + one range exchange
    # for the orderBy — and emphatically none on the join key.
    assert plans.shuffle_exchanges(df) <= 2, plan
    assert "hashpartitioning(o_custkey" not in plan, plan
    assert "hashpartitioning(c_custkey" not in plan, plan


def test_v113_plans_null_aware_anti_join(spark, sf_dir):
    df = QUERIES["v113_null_aware_anti"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Spark 4 prints the isNullAwareAntiJoin flag as the trailing
    # positional boolean on the BroadcastHashJoin node.
    assert re.search(r"BroadcastHashJoin .*LeftAnti, BuildRight, true", plan), (
        plan
    )


def test_v113_null_poisoned_branch_is_empty(spark, sf_dir):
    rows = {
        r.variant: (r.n_rows, r.acct_sum)
        for r in QUERIES["v113_null_aware_anti"](spark, sf_dir).collect()
    }
    # one NULL in the NOT IN list makes the predicate never-TRUE:
    # zero rows, vacuous sum coalesced to 0.
    assert rows["null_poisoned"] == (0, 0.0)
    n_filtered, s_filtered = rows["null_filtered"]
    assert n_filtered > 0 and s_filtered != 0.0


def test_v114_subquery_is_decorrelated(spark, sf_dir):
    df = QUERIES["v114_correlated_max_order"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Decorrelation means NO per-row subquery execution survives: the
    # correlated MAX becomes a grouped aggregate joined back on the key.
    assert "Subquery" not in plan, plan
    assert re.search(r"max\(o_totalprice", plan), plan
