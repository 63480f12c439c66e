"""Schema-evolution reader: one DataFrame over parquet epochs whose
schemas drifted (columns added, types widened) as tables evolve.

The reference's surface assumes a warehouse whose DDL is managed
elsewhere (its reads are `SELECT *` pass-throughs, sql.py:88); a lake
ingest owns the problem directly: yesterday's files lack the column
added today, and a naive reader either crashes or silently drops it.
Spark's ``mergeSchema`` unions the footers at planning time — per-file
schemas are reconciled per row group, absent columns read as NULL — so
the merge costs a footer pass, not a data rewrite.  ``conform`` then
pins the OUTPUT contract: exact column set, order, types and defaults,
so downstream code never depends on which epoch happened to be read.

Scale notes: schema merging lists every footer — on 100 TB tables keep
epochs in separately-listed directories (as here) or use a real table
format's schema log.  The data path is unchanged: pruning/pushdown
still reach each file with its own physical schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T


def read_evolved(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read parquet epochs with drifted schemas as ONE DataFrame
    (union of all epochs' columns; files missing a column yield NULL)."""
    if not paths:
        raise ValueError("no paths given")
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def conform(
    df: DataFrame,
    target_schema: T.StructType | str,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Project ``df`` onto the target contract: missing columns are
    added (``defaults`` or NULL), present ones cast to the target type,
    extras dropped, order pinned.  Casts are Spark ``cast`` semantics —
    pair with the quarantine reader when rejects must be captured."""
    if isinstance(target_schema, str):
        target_schema = T.StructType.fromDDL(target_schema)
    defaults = defaults or {}
    cols = []
    have = {f.name for f in df.schema.fields}
    for field in target_schema.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(
                F.lit(defaults.get(field.name))
                .cast(field.dataType)
                .alias(field.name)
            )
    return df.select(*cols)
