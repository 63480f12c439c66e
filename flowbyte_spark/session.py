"""SparkSession factory for the flowbyte-spark engine.

The reference opens a pyodbc/SQLAlchemy connection per call
(/root/reference/src/flowbyte/sql.py:36-58); the Spark-native analog is a
single long-lived SparkSession configured for columnar (Arrow) interchange
and adaptive execution.  All engine entry points accept an externally
created session too (the driver passes one in), so this factory is only a
convenience with good defaults.

Scale notes (100 TB design point):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast conversion replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` defaults to 32 locally but on a real
  cluster should be ~2-3x total cores; AQE coalesces the excess.
- Arrow on: every pandas/driver boundary (toPandas, pandas UDFs,
  applyInPandas) moves columnar batches instead of pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults applied when *we* build the session.  Most also make sense as
# --conf on a cluster submit; none are local-mode-only.
ENGINE_CONF: dict[str, str] = {
    # columnar interchange at every Python boundary
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # adaptive execution: coalesce shuffles, convert to broadcast at runtime,
    # split skewed partitions
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Join strategy (r16, guide §3.1/§9): allow shuffled hash join when
    # its size conditions hold instead of always sorting both sides —
    # the planner still prefers broadcast first, and AQE can convert a
    # planned sort-merge join to shuffled-hash at runtime under the
    # local-map threshold (64m = the advisory partition size, bounding
    # per-partition build memory; AQE skew-split applies to SHJ too).
    # MEASURED HONESTLY at sf0.1 (OPTIMIZATION_r16.md, r16 close): the
    # only bench query whose executed plan changes is v62 full outer
    # (SMJ -> SHJ x4, cannot broadcast), within noise of neutral; every
    # other join in the bench set is already broadcast or keeps its
    # plan, and earlier claimed subset "wins" on plan-identical queries
    # were ambient, disproven by plan-diff + order-alternating A/B.
    # Kept as the guide-§9 baseline for the scale shape (large-large
    # equi-joins where the no-sort build pays), not as a local win.
    # STATIC-PLANNING CAVEAT (ADVICE r16): prefer=false also lets the
    # static planner pick SHJ from plan-time SIZE ESTIMATES, which can
    # be badly wrong for post-filter/post-UDF intermediates — a
    # misestimated build side then hashes in memory where SMJ would
    # have sorted and spilled.  The 64m threshold below bounds only the
    # AQE conversion path, not static planning.  Acceptable here: every
    # bench-set join except v62 is broadcast or hint-pinned, and AQE
    # re-plans from RUNTIME sizes; deployments with estimate-hostile
    # inputs should flip prefer back to true and keep only the AQE
    # threshold.
    # Bucket-sorted SMB joins keep an explicit merge hint
    # (tests/test_bucketed.py) — on pre-sorted buckets the merge join
    # needs no sort AND no hash table, which is strictly better there.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    # deterministic cross-engine semantics (duckdb oracle runs naive-UTC)
    "spark.sql.session.timeZone": "UTC",
    # local-test-appropriate shuffle width; cluster deployments override
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # JVM sizing: in local mode the driver IS the executor, so the 1 GiB
    # JVM default starves 32 task threads (broadcast builds OOM first at
    # 10x bench scale).  Static conf — only takes effect when this factory
    # creates the JVM; a cluster submit sizes driver/executors itself.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    # JIT code cache: the default 240 MB fills after ~60 codegen-heavy
    # queries in one long-lived session; once full the JIT stops
    # compiling and whole stages run interpreted (measured: a 3 s query
    # degrading to 30-75 s late in the bench suite, CPU-bound, GC quiet).
    # Same flag a production long-running Spark app server would set.
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=512m",
    # ANSI off: the reference's pass-through surface is permissive T-SQL
    "spark.sql.ansi.enabled": "false",
    # fixtures carry TIMESTAMP(NANOS) parquet columns, which Spark has no
    # native type for; read as long and convert in the catalog loader
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # write micros, not INT96: INT96 is deprecated, reads back as ns in
    # Arrow/DuckDB footers, and round-trips through load_table only via
    # the INT96 guard there — micros round-trip cleanly everywhere
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # One BLAS thread per Python worker: the GEMM kernels
    # (applyInPandas/mapInPandas in similarity.py) already run one worker
    # per core, so a multithreaded OpenBLAS inside each would oversubscribe
    # cores² and thrash.  Executor-env only — driver-side numpy keeps its
    # own defaults.
    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
    "spark.executorEnv.OMP_NUM_THREADS": "1",
    "spark.executorEnv.MKL_NUM_THREADS": "1",
}


def _memcat_conf() -> dict[str, str]:
    """Register the bundled single-JVM v2 catalog (java/memcat — MERGE
    INTO / UPDATE / DELETE support for the CatalogTable seam's e2e tests)
    when its jar is present.  Static conf: only effective on sessions THIS
    factory creates; driver-owned sessions simply don't get the catalog.
    """
    jar = os.path.join(os.path.dirname(__file__), "jars", "flowbyte-memcat.jar")
    if not os.path.exists(jar):
        return {}
    return {
        "spark.jars": jar,
        "spark.sql.catalog.memcat": "flowbyte.memcat.MemoryCatalog",
    }


def _build_conf(extra_conf: dict[str, str] | None) -> dict[str, str]:
    """Layer ENGINE_CONF < memcat catalog < caller overrides — except
    ``spark.jars``, a comma-separated LIST conf: a caller supplying their
    own jars must not clobber the memcat jar (the catalog key would stay
    set but the class be unloadable at first use), so jar lists union."""
    memcat = _memcat_conf()
    conf = {**ENGINE_CONF, **memcat, **(extra_conf or {})}
    jar_lists = [
        d["spark.jars"] for d in (memcat, extra_conf or {}) if d.get("spark.jars")
    ]
    if jar_lists:
        seen: list[str] = []
        for j in ",".join(jar_lists).split(","):
            if j and j not in seen:
                seen.append(j)
        conf["spark.jars"] = ",".join(seen)
    return conf


def get_spark(
    app_name: str = "flowbyte-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` resolution order: explicit arg > $SPARK_GRAFT_MASTER >
    local[$SPARK_GRAFT_CPUS] > local[*].
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _build_conf(extra_conf).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Apply runtime-settable confs even when an existing session was reused
    # (getOrCreate ignores configs on reuse).
    for k, v in {**ENGINE_CONF, **(extra_conf or {})}.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session — keep the session's value
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply engine runtime confs to an externally created session.

    The verify driver owns session creation; this aligns timezone/Arrow/AQE
    behavior so results are identical to sessions built by :func:`get_spark`.
    """
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
