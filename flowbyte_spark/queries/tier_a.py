"""Tier-A verification queries V17-V18 (SURVEY.md §2.11): the reference's
own mutation operators — keyed merge, append, predicated delete — verified
against a DuckDB oracle that expresses the same net state in pure SQL.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.merge import update_by_keys
from flowbyte_spark.operators.mutate import ParquetTable
from flowbyte_spark.queries import register

# Scratch root for per-query checkpoint/sink/source staging.  The right
# medium is deployment-specific — durable shared storage on a cluster
# (checkpoints must survive the driver there), the fastest local medium
# for a single-node run — so it is env-parameterized.  Local default:
# the repo-local .tmp on DISK.  r16 defaulted to tmpfs (/dev/shm), which
# measured ~13% faster on the streaming subset on a roomy host — but the
# r16 driver run showed the streaming family 1.5-2x SLOWER (v132 5.6 ->
# 10.7 s, v133 -> 12.2 s; VERDICT r16 #1): tmpfs pages are RAM charged
# against the container's memory cgroup, where they compete with the
# local[32] JVM heap, and the 8-core run beating 32-core on exactly
# those rows is the contention signature.  There is no portable probe
# for "enough headroom" (this sandbox shows no cgroup cap at all and
# tmpfs still lost in the driver's), so the default is the medium that
# cannot invert; hosts with measured headroom opt in to tmpfs via
# SPARK_GRAFT_SCRATCH.  Security (ADVICE r16): a fixed path under
# world-writable /dev/shm could be pre-created by another local user —
# the repo-local default is user-owned, and explicitly chosen roots are
# created 0700 below.


def _default_scratch() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".tmp")


_SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH") or _default_scratch()


def _scratch_dir(prefix: str) -> str:
    """Fresh scratch dir; sweep siblings older than an hour."""
    os.makedirs(_SCRATCH, mode=0o700, exist_ok=True)
    cutoff = time.time() - 3600
    for old in glob.glob(os.path.join(_SCRATCH, f"{prefix}_*")):
        try:
            if os.path.getmtime(old) < cutoff:
                shutil.rmtree(old, ignore_errors=True)
        except OSError:
            pass
    return os.path.join(_SCRATCH, f"{prefix}_{uuid.uuid4().hex[:8]}")


# ---------------------------------------------------------------------------
# V17 — keyed merge: update_by_keys delta onto customer
# ---------------------------------------------------------------------------
@register(
    "v17_update_by_keys",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey <= 50 THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_custkey <= 50 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    ORDER BY c_custkey
    """,
)
def v17_update_by_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a 50-row delta via the set-based merge operator (the
    distributed twin of the reference's per-row UPDATE loop, sql.py:191-249)
    and return the post-merge table."""
    customer = load_table(spark, sf_dir, "customer")
    delta = (
        customer.where(F.col("c_custkey") <= 50)
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
            F.lit("UPDATED").alias("c_mktsegment"),
        )
    )
    merged = update_by_keys(customer, delta, ["c_custkey"])
    return merged.select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# V18 — append + predicated delete through the ParquetTable protocol
# ---------------------------------------------------------------------------
_V18_VALUES = [(1000 + i, f"NEW_NATION_{i}", i % 5) for i in range(10)]
_V18_VALUES_SQL = ", ".join(f"({k}, '{n}', {r})" for k, n, r in _V18_VALUES)


@register(
    "v18_insert_delete",
    oracle=f"""
    SELECT n_nationkey, n_name, n_regionkey FROM (
        SELECT n_nationkey, n_name, n_regionkey FROM nation
        UNION ALL
        SELECT * FROM (VALUES {_V18_VALUES_SQL}) v(n_nationkey, n_name, n_regionkey)
    ) t
    WHERE n_regionkey <> 4
    ORDER BY n_nationkey
    """,
)
def v18_insert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full mutation cycle on a real parquet table: copy nation into
    scratch, append 10 rows (sql.py:174-188 semantics), delete where
    n_regionkey = 4 (sql.py:321-332 semantics, F.expr-parsed predicate),
    read back.  Exercises the write-temp-then-swap protocol end to end."""
    nation = load_table(spark, sf_dir, "nation")
    path = _scratch_dir("v18_nation")
    table = ParquetTable(spark, path)
    table.overwrite(nation)
    # pandas + Arrow: one partition for 10 rows.  A list-backed
    # createDataFrame parallelizes into defaultParallelism Python-RDD
    # slices — 32 Python-worker round-trips to append 10 rows.
    import pandas as pd

    new_rows = spark.createDataFrame(
        pd.DataFrame(
            [{"n_nationkey": k, "n_name": n, "n_regionkey": r} for k, n, r in _V18_VALUES]
        )
    )
    # align delta types with the table schema (int32 region keys etc.)
    new_rows = new_rows.select(
        *[F.col(f.name).cast(f.dataType) for f in nation.schema.fields]
    )
    table.append(new_rows)
    table.delete_where("n_regionkey = 4")
    # Materialize to a stable scratch parquet and hand back a lazy read:
    # the mutation dir above is churned by the swap protocol, but this
    # snapshot sits untouched until the hourly sweep, so the caller can
    # collect whenever it likes without a driver-side collect here.
    out = _scratch_dir("v18_result")
    table.read().write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).orderBy("n_nationkey")
