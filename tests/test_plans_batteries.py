"""Plan-shape assertions for the V48-V57 operators: the physical plan,
not just the result, is part of the contract (SURVEY.md §4.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flowbyte_spark import plans
from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.split import hash_split, stratified_hash_sample
from flowbyte_spark.queries import QUERIES


def test_exists_subquery_is_semi_join_not_nested_loop(spark, sf_dir):
    df = QUERIES["v48_exists_subquery"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "LeftSemi" in plan, plan
    assert not plans.uses_nested_loop_join(df), plan
    # both filters reach their scans
    assert plans.has_pushed_filter(df, "o_orderdate"), plans.pushed_filters(df)
    assert plans.has_pushed_filter(df, "l_returnflag"), plans.pushed_filters(df)


def test_scalar_subquery_decorrelates_to_single_agg_join(spark, sf_dir):
    df = QUERIES["v49_scalar_subquery"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert not plans.uses_nested_loop_join(df), plan
    # lineitem scan is pruned to the three columns the query touches
    read = set(plans.read_schema_columns(df))
    assert read <= {"l_partkey", "l_quantity", "l_extendedprice"}, read


def test_window_battery_single_partition_exchange(spark, sf_dir):
    # every window frame shares the one o_custkey exchange; plus the final
    # presentation sort = 2 shuffles total
    df = QUERIES["v50_window_battery"](spark, sf_dir)
    assert plans.shuffle_exchanges(df) <= 2, plans.physical_plan(df)


def test_unpivot_is_expand_without_shuffle(spark, sf_dir):
    df = QUERIES["v51_unpivot"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert "Expand" in plan, plan
    # only the final presentation sort shuffles
    assert plans.shuffle_exchanges(df) <= 1, plan


def test_string_agg_broadcasts_dimension_join(spark, sf_dir):
    df = QUERIES["v52_string_agg"](spark, sf_dir)
    assert plans.uses_broadcast_join(df), plans.physical_plan(df)


def test_hash_split_is_narrow(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    df = hash_split(docs, "doc_id")
    assert plans.shuffle_exchanges(df) == 0, plans.physical_plan(df)


def test_stratified_sample_is_narrow_and_prunes_columns(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.5}, default_rate=0.1
    ).select("doc_id", "lang")
    assert plans.shuffle_exchanges(df) == 0, plans.physical_plan(df)
    read = set(plans.read_schema_columns(df))
    assert read <= {"doc_id", "lang"}, read


def test_pack_by_budget_one_exchange_per_partition_key(spark, sf_dir):
    from flowbyte_spark.operators.split import pack_by_budget

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("t")
    )
    df = pack_by_budget(docs, "doc_id", F.col("t"), 512, partition_cols=["lang"])
    assert plans.shuffle_exchanges(df) == 1, plans.physical_plan(df)


def test_paragraph_dedup_no_occurrence_join_no_sort(spark, sf_dir):
    """V78's plan contract: keep-first comes out of ONE aggregate (no join
    touches the exploded occurrence stream — only the small per-doc
    reassembly join), there is no range exchange (no global sort), and
    the shuffle count stays at the designed three (para agg, id agg,
    reassembly join alignment)."""
    from flowbyte_spark import plans
    from flowbyte_spark.queries import QUERIES

    df = QUERIES["v78_paragraph_dedup"](spark, sf_dir)
    plan = plans.physical_plan(df)
    assert plan.lower().count("sortmergejoin") <= 1, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert plans.shuffle_exchanges(df) <= 3, plan


def test_observed_metrics_single_pass(spark):
    """Observation metrics arrive with the consuming action — no second
    scan — and report the filter's kill accounting exactly."""
    from pyspark.sql import functions as F

    from flowbyte_spark import plans
    from flowbyte_spark.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    observed_df, obs = plans.observed(
        li,
        "scan_metrics",
        F.count(F.lit(1)).alias("rows_in"),
        F.sum((F.col("l_quantity") > 25).cast("long")).alias("rows_big"),
    )
    kept = observed_df.where(F.col("l_quantity") > 25)
    n_kept = kept.count()
    m = obs.get
    assert m["rows_in"] == li.count()
    assert m["rows_big"] == n_kept
