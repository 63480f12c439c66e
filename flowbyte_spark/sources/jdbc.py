"""JDBC source/sink — the Spark-native re-design of the reference's MSSQL
connector (/root/reference/src/flowbyte/sql.py:21-188).

Where the reference opens one ODBC cursor and pages through results on the
client (fetchmany loop, sql.py:113-116), Spark parallelizes the *server*
side: ``partition_column/num_partitions`` splits the query into concurrent
range reads, and ``fetchsize`` controls the per-task row buffer — the same
knobs, distributed.

Option/SQL construction is deterministic and unit-tested without a
database; the full read/write path is exercised END-TO-END against
embedded Apache Derby (``derby*.jar`` ships inside pyspark's ``jars/``,
so it is on every classpath) in ``tests/test_udfs_jdbc.py`` and the
``v83_jdbc_roundtrip`` driver query — batched insert, partitioned range
read, and database-side predicate pushdown all run for real.  Vendor
databases (MSSQL/Postgres) need only their driver jar on
``spark.jars``; the surface here is identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from flowbyte_spark import log
from flowbyte_spark.operators.casts import apply_casts, normalize_decimals


@dataclass
class JDBCSource:
    """Connection profile + read/write surface for a JDBC database."""

    url: str                       # jdbc:sqlserver://host;databaseName=db …
    user: str | None = None
    password: str | None = None
    driver: str | None = None      # e.g. com.microsoft.sqlserver.jdbc.SQLServerDriver
    options: dict[str, str] = field(default_factory=dict)

    def _base_options(self) -> dict[str, str]:
        opts = {"url": self.url, **self.options}
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.driver is not None:
            opts["driver"] = self.driver
        return opts

    # -- read (sql.py:88-171 equivalent) ------------------------------------

    def read_options(
        self,
        query: str | None = None,
        table: str | None = None,
        partition_column: str | None = None,
        lower_bound=None,
        upper_bound=None,
        num_partitions: int | None = None,
        fetchsize: int = 10000,
    ) -> dict[str, str]:
        """Build the option map for a (possibly partitioned) JDBC read.

        ``fetchsize`` defaults to the reference's chunksize default
        (sql.py:88).  Partitioned reads require column+bounds+count, same
        contract as Spark's own API — validated here so misconfiguration
        fails before any connection attempt.
        """
        if (query is None) == (table is None):
            raise ValueError("exactly one of query/table is required")
        opts = self._base_options()
        opts["fetchsize"] = str(fetchsize)
        if query is not None:
            opts["query"] = query
        else:
            opts["dbtable"] = table  # type: ignore[assignment]
        partition_args = [partition_column, lower_bound, upper_bound, num_partitions]
        if any(a is not None for a in partition_args):
            if any(a is None for a in partition_args):
                raise ValueError(
                    "partitioned read needs partition_column, lower_bound, "
                    "upper_bound and num_partitions together"
                )
            if query is not None:
                raise ValueError(
                    "partitioned reads require table=, not query= "
                    "(Spark wraps dbtable in the range predicates)"
                )
            opts.update(
                partitionColumn=str(partition_column),
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions),
            )
        return opts

    def get_data(
        self,
        spark: SparkSession,
        query: str | None = None,
        table: str | None = None,
        category_columns=None,
        bool_columns=None,
        float_columns=None,
        round_columns=None,
        **read_kwargs,
    ) -> DataFrame:
        """Read + apply the reference's cast directives and decimal policy
        (sql.py:122-141)."""
        opts = self.read_options(query=query, table=table, **read_kwargs)
        df = spark.read.format("jdbc").options(**opts).load()
        df = apply_casts(
            df,
            category_columns=category_columns,
            bool_columns=bool_columns,
            float_columns=float_columns,
            round_columns=round_columns,
        )
        return normalize_decimals(df)

    # -- write (sql.py:174-188 equivalent) -----------------------------------

    def write_options(
        self,
        table: str,
        batchsize: int = 10000,
        truncate: bool = False,
        isolation_level: str = "READ_COMMITTED",
    ) -> dict[str, str]:
        opts = self._base_options()
        opts.update(
            dbtable=table,
            batchsize=str(batchsize),
            truncate=str(truncate).lower(),
            isolationLevel=isolation_level,
        )
        return opts

    def insert_data(
        self,
        df: DataFrame,
        schema: str | None,
        table_name: str,
        chunksize: int = 10000,
        mode: str = "append",
    ) -> None:
        """Chunked append (sql.py:174-188): ``batchsize`` is the JDBC batch
        insert size — the executor-side equivalent of the reference's
        client-side chunk loop, but written from every partition in
        parallel."""
        table = f"{schema}.{table_name}" if schema else table_name
        opts = self.write_options(table, batchsize=chunksize)
        df.write.format("jdbc").options(**opts).mode(mode).save()
        log.success(f"wrote {table} via JDBC ({mode})")

    def overwrite_truncating(
        self, df: DataFrame, schema: str | None, table_name: str
    ) -> None:
        """Truncate-then-load (sql.py:292-302 semantics): JDBC overwrite
        with truncate=true issues TRUNCATE TABLE server-side instead of
        DROP+CREATE, preserving grants/indexes, then loads ``df``.  To only
        truncate, pass ``df.limit(0)``."""
        table = f"{schema}.{table_name}" if schema else table_name
        opts = self.write_options(table, truncate=True)
        df.write.format("jdbc").options(**opts).mode("overwrite").save()
        log.success(f"truncate-loaded {table} via JDBC")
