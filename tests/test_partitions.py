"""Partition-pruning proofs (operators/partitions.py, queries/scale_q.py).

The driver hash-gates v102/v103's VALUES; these tests prove the PLAN —
that the partitioned scan actually read only the selected partitions —
via FileSourceScan's post-execution ``numPartitions`` metric, plus the
value differential against DuckDB (the same comparison the driver runs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flowbyte_spark.operators.partitions import (
    dpp_join,
    file_scan_stats,
    plan_has_dynamic_pruning,
    write_partitioned,
)
from flowbyte_spark.queries.scale_q import partitioned_orders
from tests.oracle_util import canon, run_pair

SF = "/root/testdata/sf0.001"
N_YEARS = 7  # orders span 1995-2001 in the synthetic fixtures


def test_static_pruning_reads_one_partition(spark):
    scan = partitioned_orders(spark, SF)
    pruned = scan.where(F.col("o_year") == 1996).select("o_orderkey")
    pruned.collect()
    (st,) = file_scan_stats(pruned)
    assert st["num_partitions"] == 1, st
    assert "o_year" in (st["partition_filters"] or ""), st
    # control: the unpredicated scan reads every year directory
    full = scan.select("o_orderkey")
    full.collect()
    (st_full,) = file_scan_stats(full)
    assert st_full["num_partitions"] == N_YEARS, st_full
    assert st_full["num_output_rows"] > st["num_output_rows"]


def test_dpp_prunes_fact_partitions_at_runtime(spark):
    scan = partitioned_orders(spark, SF)
    dim = spark.createDataFrame(
        [(y, "EVEN" if y % 2 == 0 else "ODD") for y in range(1990, 2011)],
        "d_year int, d_parity string",
    )
    j = dpp_join(
        scan, dim.where(F.col("d_parity") == "EVEN"),
        F.col("o_year") == F.col("d_year"),
    ).groupBy("o_year").agg(F.count("*").alias("n"))
    assert plan_has_dynamic_pruning(j), "DPP expression missing from the plan"
    j.collect()
    (st,) = file_scan_stats(j)
    # even years in 1995-2001: 1996, 1998, 2000 -> 3 of 7 partitions
    assert st["num_partitions"] == 3, st
    assert "dynamicpruning" in (st["partition_filters"] or "").lower(), st


def test_dpp_would_not_fire_without_the_broadcast_pin(spark):
    # Document the trap the operator exists to close: at test scale the
    # tiny FACT gets broadcast, the dim exchange is not reusable, and
    # DPP silently never prunes.  If Spark's planner ever changes and
    # this starts pruning, dpp_join's pin becomes optional — revisit.
    scan = partitioned_orders(spark, SF)
    dim = spark.createDataFrame(
        [(y, "EVEN" if y % 2 == 0 else "ODD") for y in range(1990, 2011)],
        "d_year int, d_parity string",
    )
    j = scan.join(
        dim.where(F.col("d_parity") == "EVEN"),
        F.col("o_year") == F.col("d_year"),
    ).groupBy("o_year").agg(F.count("*").alias("n"))
    j.collect()
    (st,) = file_scan_stats(j)
    assert st["num_partitions"] == N_YEARS, st


def test_write_partitioned_rejects_empty_cols(spark):
    with pytest.raises(ValueError, match="at least one"):
        write_partitioned(spark.range(1), "/root/repo/.tmp/never", [])


@pytest.mark.parametrize("name", ["v102_partition_pruning", "v103_dpp_star_join"])
def test_oracle_differential(spark, name):
    spark_pdf, oracle_pdf = run_pair(spark, name, "/root/testdata/sf0.01")
    assert len(spark_pdf) > 0
    assert canon(spark_pdf) == canon(oracle_pdf)
