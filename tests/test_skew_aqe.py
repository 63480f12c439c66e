"""V120/V121 scale proofs: AQE's automatic skew-join split and Spark's
built-in Bloom runtime filter actually FIRE — plus the silent-disabler
controls (the v103 pattern: at fixture scale the default thresholds
mean both optimizations silently never trigger, which is exactly the
trap these tests pin)."""

from __future__ import annotations

from flowbyte_spark.queries import QUERIES
from flowbyte_spark.streaming import scoped_sql_conf

SKEW_CONFS = {
    # a partition is split when > factor * median AND > threshold; the
    # 256 MB default can never fire on a KB-scale fixture — and the
    # compressed hot partition is smaller than it looks (the constant
    # key column squeezes to ~2 KB per 48k rows), so size the threshold
    # from measured map-output bytes, not row math
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
}

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # the fact side must look big enough to be worth filtering — the
    # 10 GB default means the rule silently never fires at test scale
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # broadcast joins skip runtime filters (the BHJ reuses the build
    # side directly); force the shuffle path so injection is observable
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _final_plan(spark, name, sf_dir, confs):
    with scoped_sql_conf(spark, **confs):
        df = QUERIES[name](spark, sf_dir)
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()


def test_v120_aqe_splits_the_hot_partition(spark, sf_dir):
    plan = _final_plan(spark, "v120_skewed_join_agg", sf_dir, SKEW_CONFS)
    assert "skew=true" in plan, plan


def test_v120_default_threshold_silently_never_fires(spark, sf_dir):
    # Control (the disabler): with the 256 MB default threshold the
    # same hot partition passes through unsplit — proof the SKEW_CONFS
    # assertion above is measuring the optimization, not noise.
    plan = _final_plan(spark, "v120_skewed_join_agg", sf_dir, {})
    assert "skew=true" not in plan, plan


def test_v121_bloom_filter_is_injected(spark, sf_dir):
    plan = _final_plan(spark, "v121_bloom_filter_join", sf_dir, BLOOM_CONFS)
    assert "might_contain" in plan, plan


def test_v121_default_threshold_silently_never_fires(spark, sf_dir):
    # Control: the 10 GB application-side default means no injection at
    # fixture scale (and AQE broadcasts the dim anyway).
    plan = _final_plan(spark, "v121_bloom_filter_join", sf_dir, {})
    assert "might_contain" not in plan, plan
