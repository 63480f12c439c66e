"""Data-quality tier (operators/{expectations,diff,profile}.py, V106-V108)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.operators import expectations as E
from flowbyte_spark.operators.diff import diff_summary, snapshot_diff
from flowbyte_spark.operators.profile import profile
from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize(
    "name",
    [
        "v106_data_expectations",
        "v107_snapshot_diff",
        "v108_table_profile",
        "v115_profile_approx",
    ],
)
def test_quality_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)


def test_expectations_unit(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (2, -5.0), (3, 999.0)],
        "k int, v double",
    )
    rows = {
        r.check: (r.n_violations, r.passed)
        for r in E.run_expectations(
            [
                E.check_unique(df, ["k"]),
                E.check_not_null(df, "v"),
                E.check_range(df, "v", 0.0, 100.0),
            ]
        ).collect()
    }
    assert rows["unique(k)"] == (2, False)       # both k=2 rows
    assert rows["not_null(v)"] == (1, False)
    assert rows["range(v,0.0,100.0)"] == (2, False)  # -5 and 999; NULL exempt
    parent = spark.createDataFrame([(1,), (3,)], "pk int")
    fk = E.check_foreign_key(df, parent, "k", "pk").collect()[0]
    assert fk.n_violations == 2  # the two k=2 orphans; NULL keys exempt


def test_expectations_empty_battery_fails(spark):
    with pytest.raises(ValueError, match="no checks"):
        E.run_expectations([])


def test_fused_scalar_checks_single_scan(spark, sf_dir):
    # The point of the fusion: N row-predicate rules = ONE pass over
    # the fact, one aggregate row melted executor-side.
    from flowbyte_spark import plans
    from flowbyte_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    df = E.fused_scalar_checks(
        orders,
        [
            E.not_null_rule("o_custkey"),
            E.range_rule("o_totalprice", 0.0, 300000.0),
            ("custom(o_orderkey>0)", F.col("o_orderkey") <= 0),
        ],
    )
    plan = plans.physical_plan(df)
    # one ReadSchema line per scan node (the node name itself prints
    # twice in formatted explain: tree + detail section)
    assert plan.count("ReadSchema") == 1, plan
    rows = {r.check: r.n_violations for r in df.collect()}
    expected_custom = orders.where(F.col("o_orderkey") <= 0).count()
    assert rows["custom(o_orderkey>0)"] == expected_custom
    # counts agree with the per-rule single checks
    single = {
        r.check: r.n_violations
        for c in (
            E.check_not_null(orders, "o_custkey"),
            E.check_range(orders, "o_totalprice", 0.0, 300000.0),
        )
        for r in c.collect()
    }
    for k, v in single.items():
        assert rows[k] == v, (k, rows[k], v)


def test_fused_scalar_checks_rejects_empty_rules(spark):
    with pytest.raises(ValueError, match="no rules"):
        E.fused_scalar_checks(spark.range(1), [])
    with pytest.raises(ValueError, match="at least one bound"):
        E.range_rule("x")


def test_expectations_vacuously_pass_on_empty_table(spark):
    # ADVICE r9: bare SUM over zero rows is NULL — every check must
    # coalesce so an empty table reports 0 violations / passed=True,
    # not a NULL that reads as a failure (or breaks a hash gate).
    df = spark.createDataFrame([], "k int, v double")
    parent = spark.createDataFrame([(1,)], "pk int")
    rows = E.run_expectations(
        [
            E.check_unique(df, ["k"]),
            E.check_not_null(df, "v"),
            E.check_range(df, "v", 0.0, 100.0),
            E.check_foreign_key(df, parent, "k", "pk"),
        ]
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.n_violations == 0, r
        assert r.passed is True, r


def test_snapshot_diff_unit(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (4, "d", 4.0)],
        "k int, s string, v double",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    # k=2: NULL -> 2.0 must count as updated (null-safe compare)
    assert got == {1: "unchanged", 2: "updated", 3: "deleted", 4: "inserted"}
    summ = {r.change_type: r.n_rows for r in diff_summary(old, new, ["k"]).collect()}
    assert summ == {"inserted": 1, "deleted": 1, "updated": 1, "unchanged": 1}


def test_snapshot_diff_null_key_pairs_across_snapshots(spark):
    # Round-15 measure/key-NULL sweep: a NULL-key row present in both
    # snapshots must classify as updated/unchanged, not split into one
    # deleted + one inserted (the raw-key full outer join never paired
    # the sides — struct-wrapped key is null-safe per field).
    old = spark.createDataFrame(
        [(None, 1.0), (1, 2.0)], "k int, v double"
    )
    new = spark.createDataFrame(
        [(None, 9.0), (1, 2.0)], "k int, v double"
    )
    rows = snapshot_diff(old, new, ["k"]).collect()
    got = {r.k: r.change_type for r in rows}
    assert len(rows) == 2
    assert got == {None: "updated", 1: "unchanged"}


def test_snapshot_diff_identical_yields_zero_churn(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, s string")
    summ = {r.change_type: r.n_rows for r in diff_summary(df, df, ["k"]).collect()}
    assert summ == {"inserted": 0, "deleted": 0, "updated": 0, "unchanged": 2}


def test_profile_unit(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "a", None), (3, None, -1.0)],
        "k int, s string, v double",
    )
    rows = {r.column: r for r in profile(df).collect()}
    assert rows["k"].n_rows == 3 and rows["k"].n_nulls == 0
    assert rows["k"].n_distinct == 3
    assert rows["k"].min_num == 1.0 and rows["k"].max_num == 3.0
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 1
    assert rows["s"].min_num is None and rows["s"].max_num is None
    assert rows["v"].min_num == -1.0 and rows["v"].max_num == 2.5
    # approx mode keeps the same schema and exact null counts
    arows = {r.column: r for r in profile(df, exact=False).collect()}
    assert arows["k"].n_nulls == 0 and arows["k"].n_distinct >= 1


def test_profile_rejects_unknown_columns(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile(df, ["nope"])
