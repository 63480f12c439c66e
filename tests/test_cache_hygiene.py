"""Executor-storage hygiene: the driver sweep and bench loop release every
operator-internal cache after materialization (the round-5 finding: leaked
caches let CacheManager plan-matching serve later iterations from the
first run's cache, and accumulated copies distort the heavy tail)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_tracked_caches_release_after_materialize(spark, sf_dir):
    from flowbyte_spark.operators import cache
    from flowbyte_spark.queries import QUERIES

    cache.release_persisted()
    base = _persistent_rdd_count(spark)
    # v22 persists the LSH signature table; v71 the DSIR bucket counts.
    for name in ("v22_minhash_lsh", "v71_dsir_importance"):
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        assert _persistent_rdd_count(spark) > base, (
            f"{name} should hold tracked caches while materializing"
        )
        released = cache.release_persisted()
        assert released > 0
        assert _persistent_rdd_count(spark) == base, (
            f"{name} left persistent RDDs behind after release"
        )


def test_release_is_idempotent_and_recompute_safe(spark, sf_dir):
    from flowbyte_spark.operators import cache
    from flowbyte_spark.catalog import load_table
    from flowbyte_spark.operators.importance import dsir_importance

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_importance(docs, "doc_id", "text", target=F.col("lang") == "en")
    n1 = out.count()
    cache.release_persisted()
    assert cache.release_persisted() == 0  # idempotent
    # Persist entries recompute transparently after release.
    assert out.count() == n1
