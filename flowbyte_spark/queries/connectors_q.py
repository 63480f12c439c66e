"""Live-connector verification queries.

V83 exercises the JDBC source/sink END-TO-END against Apache Derby's
embedded engine (``derby*.jar`` ships inside pyspark's ``jars/`` — Spark
bundles it for the Hive metastore, so it is on every session's classpath
with no install): a fixture table is loaded through the same
``JDBCSource`` surface that fronts the reference's MSSQL role
(``/root/reference/src/flowbyte/sql.py:36-58`` connect, ``88-171``
get_data, ``174-188`` insert_data), written with a batched JDBC insert,
and read back as a PARTITIONED range read — num_partitions concurrent
tasks each issuing a bounded-range query, the distributed re-design of
the reference's client-side fetchmany loop (sql.py:113-116).

The oracle aggregates the same parquet fixture directly, so a wrong
write (lost rows, mangled types) or a wrong partitioned read (rows
dropped or double-read at range boundaries — the classic off-by-one in
stride math) breaks the value hash.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.functions import dec_sum
from flowbyte_spark.queries import register

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def embedded_derby_url(spark: SparkSession, db: str) -> str:
    """In-memory embedded-Derby JDBC URL; first call points Derby's log
    at the temp dir so ``derby.log`` never lands in the caller's CWD."""
    jvm = spark.sparkContext._jvm
    jvm.java.lang.System.setProperty(
        "derby.stream.error.file",
        os.path.join(tempfile.gettempdir(), "derby.log"),
    )
    return f"jdbc:derby:memory:{db};create=true"


@register(
    "v83_jdbc_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 2)
               AS total_bal,
           MIN(c_custkey) AS min_key,
           MAX(c_custkey) AS max_key
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def v83_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip ``customer`` through embedded Derby — batched JDBC
    write, then a 4-way partitioned range read over ``c_custkey`` — and
    aggregate the read-back side.  Matching the parquet-side oracle
    proves no row was lost, duplicated, or re-typed anywhere in the
    write → server → partitioned-read path."""
    from flowbyte_spark.sources.jdbc import JDBCSource

    src = JDBCSource(
        url=embedded_derby_url(spark, "v83"), driver=DERBY_DRIVER
    )
    customer = load_table(spark, sf_dir, "customer")
    src.insert_data(customer, None, "customer_rt", mode="overwrite")
    n = customer.count()
    back = src.get_data(
        spark,
        table="customer_rt",
        partition_column="c_custkey",
        lower_bound=0,
        upper_bound=n + 1,
        num_partitions=4,
        fetchsize=500,
    )
    return (
        back.where(F.col("c_acctbal") > 0)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dec_sum("c_acctbal", "total_bal"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )
