"""File-format sources/sinks.

The reference is ODBC-only (pyproject.toml lists no file-format deps);
file formats are an engine addition that Spark provides natively.  These
helpers add the engine's conventions: explicit format dispatch, partitioned
writes, and schema enforcement at ingest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_READERS = ("parquet", "csv", "json", "orc", "text", "binaryFile")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    """Read a table from files.

    CSV/JSON default to header+inferSchema unless a schema is given —
    explicit ``StructType`` is strongly preferred at scale (schema inference
    reads the data twice).
    """
    if fmt not in _READERS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_READERS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        options.setdefault("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    **options,
) -> None:
    """Write a table; ``partition_by`` produces hive-style partition dirs so
    downstream reads get partition pruning for free."""
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_with_quarantine(
    spark,
    path: str,
    fmt: str,
    schema: str,
    corrupt_col: str = "_corrupt_record",
    **options,
):
    """Read CSV/JSON keeping malformed rows VISIBLE instead of silently
    dropped: PERMISSIVE mode with an explicit corrupt-record column,
    split into ``(clean, quarantined)`` DataFrames.

    The ingestion contract a 100 TB crawl needs — FAILFAST dies on the
    first bad page and DROPMALFORMED silently shrinks the corpus;
    quarantining keeps the pipeline running AND the loss auditable
    (count the quarantine, sample it, re-parse later).  The corrupt
    column must be part of the declared schema (Spark only populates it
    when declared), and caching before the split avoids the known
    Spark behavior where a query selecting ONLY the corrupt column is
    disallowed.
    """
    from flowbyte_spark.operators.cache import persist_tracked

    full_schema = f"{schema}, {corrupt_col} STRING"
    df = persist_tracked(
        spark.read.format(fmt)
        .schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .options(**options)
        .load(path)
    )
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = df.where(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, quarantined
