"""SparkSQLSource — the engine's analog of the reference's ``MSSQL`` class.

The reference's connector (/root/reference/src/flowbyte/sql.py:21-332)
wraps an attached SQL engine: connect/disconnect, ``get_data(query, casts…)``
with chunked fetch + progress, ``insert_data``, ``update_data``,
``update_from_table``, ``truncate_table``, ``delete_data[_with_conditions]``.

Here the "attached SQL engine" is Spark SQL itself: tables are views in the
session catalog, ``get_data`` is a ``spark.sql`` pass-through (Catalyst
replaces SQL Server as the optimizer/executor), and the mutation methods
compile to the set-based operators in :mod:`flowbyte_spark.operators`.
The per-chunk progress callback of the reference (sql.py:143-156) maps to a
Spark job-group listener hook — progress is per-stage, not per-chunk,
because executors fetch in parallel.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from flowbyte_spark import log
from flowbyte_spark.operators.casts import apply_casts, normalize_decimals
from flowbyte_spark.operators.mutate import ParquetTable


class SparkSQLSource:
    """Facade with the reference connector's method surface, Spark-native."""

    def __init__(self, spark: SparkSession, warehouse_dir: str | None = None):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self._connected = False

    # -- connection lifecycle (no-ops kept for API parity, sql.py:36-85) ----

    def connect(self) -> "SparkSQLSource":
        self._connected = True
        log.info("connected (SparkSession is the connection)")
        return self

    def disconnect(self) -> None:
        self._connected = False
        log.info("disconnected")

    # -- read path (sql.py:88-171) -------------------------------------------

    def get_data(
        self,
        query: str,
        chunksize: int | None = None,
        category_columns: Sequence[str] | None = None,
        bool_columns: Sequence[str] | None = None,
        float_columns: Sequence[str] | None = None,
        round_columns: Sequence[str] | None = None,
        progress_callback=None,
    ) -> DataFrame:
        """Run SQL against the session catalog, apply cast directives and
        the DECIMAL(38,20) normalization policy.

        ``chunksize`` is accepted for parity; Spark's partitioned execution
        replaces client-side chunking (memory is bounded per task, not per
        result).  Unlike the reference, errors raise instead of returning
        None — silent None poisons downstream pipelines.
        """
        df = self.spark.sql(query)
        df = apply_casts(
            df,
            category_columns=category_columns,
            bool_columns=bool_columns,
            float_columns=float_columns,
            round_columns=round_columns,
        )
        df = normalize_decimals(df)
        if progress_callback is not None:
            progress_callback(df)
        return df

    # -- table handle ---------------------------------------------------------

    def _table(self, schema: str | None, table_name: str) -> ParquetTable:
        if self.warehouse_dir is None:
            raise ValueError("warehouse_dir required for table mutations")
        name = f"{schema}.{table_name}" if schema else table_name
        return ParquetTable(self.spark, f"{self.warehouse_dir}/{name}")

    # -- write paths (sql.py:174-332) -----------------------------------------

    def insert_data(
        self,
        schema: str | None,
        table_name: str,
        insert_records: DataFrame,
        chunksize: int | None = None,
    ) -> None:
        self._table(schema, table_name).append(insert_records, batchsize=chunksize)

    def update_data(
        self,
        schema: str | None,
        table_name: str,
        update_records: Sequence[Mapping] | DataFrame,
        key_columns: Sequence[str],
    ) -> None:
        self._table(schema, table_name).update_by_keys(update_records, key_columns)

    def update_from_table(
        self,
        schema: str | None,
        table_name: str,
        df: DataFrame,
        key_columns: Sequence[str],
    ) -> None:
        self._table(schema, table_name).update_from_table(df, key_columns)

    def truncate_table(self, schema_name: str | None, table_name: str) -> None:
        self._table(schema_name, table_name).truncate()

    def delete_data(self, schema_name: str | None, table_name: str) -> None:
        self._table(schema_name, table_name).delete()

    def delete_data_with_conditions(
        self, schema_name: str | None, table_name: str, conditions: str
    ) -> int:
        return self._table(schema_name, table_name).delete_where(conditions)
