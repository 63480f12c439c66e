"""Mutable parquet tables: append / truncate / delete / overwrite / merge.

Capability parity with the reference's table-mutation surface
(/root/reference/src/flowbyte/sql.py:174-188 insert, :292-302 truncate,
:307-332 delete) on plain parquet storage — no transactional catalog
required.

The hard part (SURVEY.md §4.3.4) is that Spark cannot overwrite a path it
is lazily reading from.  ``ParquetTable`` therefore uses a
**write-temp-then-swap** protocol: materialize the new state into a
sibling temp directory, then atomically swap directories.  On HDFS/S3 the
swap maps to a rename/two-phase commit; on a transactional v2 catalog
(Delta/Iceberg) all of these operators would compile to native
``MERGE INTO`` / ``DELETE FROM`` instead — this class is the
plain-parquet fallback the fixtures need.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flowbyte_spark import log
from flowbyte_spark.operators.merge import update_by_keys, update_from_table
from flowbyte_spark.operators.table import Table


class ParquetTable(Table):
    """A directory-backed parquet table with SQL-ish mutation semantics."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- read ---------------------------------------------------------------

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def exists(self) -> bool:
        return os.path.exists(self.path)

    # -- write protocol -----------------------------------------------------

    def _swap_in(self, df: DataFrame) -> None:
        """Materialize ``df`` beside the table, then swap directories.

        The temp write EXECUTES the plan before the original data moves, so
        a plan that reads from this very table (delete/merge) is safe.
        """
        tmp = f"{self.path}.__tmp__{uuid.uuid4().hex[:8]}"
        bak = f"{self.path}.__bak__{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        had_old = os.path.exists(self.path)
        if had_old:
            os.rename(self.path, bak)
        try:
            os.rename(tmp, self.path)
        except Exception:
            if had_old:
                os.rename(bak, self.path)  # roll back
            raise
        if had_old:
            shutil.rmtree(bak, ignore_errors=True)

    def overwrite(self, df: DataFrame) -> None:
        self._swap_in(df)

    # -- Tier A operators ----------------------------------------------------

    def append(self, df: DataFrame, batchsize: int | None = None) -> None:
        """Append rows (reference: chunked insert, sql.py:174-188).

        The reference chunks to bound client memory; Spark writers are
        already bounded per-partition, so ``batchsize`` only controls an
        optional repartition (useful to cap output file count).
        """
        writer = df.write.mode("append")
        if batchsize:
            # Cap rows-per-file at the writer, not via repartition: the
            # latter needs a df.count() job (an extra full pass) just to
            # size the partition count.
            writer = writer.option("maxRecordsPerFile", int(batchsize))
        writer.parquet(self.path)
        log.success(f"appended into {self.path}")

    def truncate(self) -> None:
        """Remove all rows, keep the schema (reference: sql.py:292-302)."""
        empty = self.read().limit(0)
        self._swap_in(empty)
        log.success(f"truncated {self.path}")

    def delete(self) -> None:
        """Delete every row (reference: DELETE FROM without predicate,
        sql.py:307-317) — same net state as truncate on parquet."""
        self.truncate()

    def delete_where(self, condition: str) -> int:
        """Delete rows matching a SQL predicate string (reference:
        sql.py:321-332).

        The reference interpolates the raw condition into SQL (injection-
        prone); here the string must parse as a Catalyst boolean expression
        (``F.expr``) — fails closed on anything else.  Returns rows deleted.
        """
        from pyspark.sql import Observation

        current = self.read()
        pred = F.expr(condition)
        # Count the deleted rows ON the survivor-write pass (observe node
        # upstream of the filter) instead of a separate .count() — one scan
        # total, not two.
        obs = Observation(f"delete_where_{uuid.uuid4().hex[:8]}")
        observed = current.observe(
            obs, F.sum(F.when(pred, 1).otherwise(0)).alias("deleted")
        )
        self._swap_in(observed.where(~pred | pred.isNull()))
        deleted = int(obs.get["deleted"] or 0)
        log.success(f"deleted {deleted} rows from {self.path} where {condition}")
        return deleted

    def update_by_keys(
        self,
        update_records: DataFrame | Sequence[Mapping],
        key_columns: Sequence[str],
    ) -> None:
        """Keyed point-update, set-based (reference: sql.py:191-249)."""
        self._swap_in(update_by_keys(self.read(), update_records, key_columns))
        log.success(f"updated {self.path} on keys {list(key_columns)}")

    def update_from_table(
        self,
        source: DataFrame,
        key_columns: Sequence[str],
        *,
        compat_skip_first_column: bool = True,
    ) -> None:
        """Join-update from another table (reference: sql.py:253-289)."""
        self._swap_in(
            update_from_table(
                self.read(),
                source,
                key_columns,
                compat_skip_first_column=compat_skip_first_column,
            )
        )
        log.success(f"join-updated {self.path} on keys {list(key_columns)}")
