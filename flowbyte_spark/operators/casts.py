"""Per-column cast directives and decimal normalization.

Capability parity with the reference's ingest coercion surface
(/root/reference/src/flowbyte/sql.py:88, :122-141):

- ``category_columns`` — pandas ``category`` has no Spark analog; mapped to
  ``StringType`` (documented deviation: dictionary encoding happens inside
  Parquet/Tungsten anyway, so the *purpose* — compact storage of
  low-cardinality strings — is already served).
- ``bool_columns`` / ``float_columns`` — cast to BooleanType / DoubleType.
- ``round_columns`` — accepted but a no-op: the reference declares this
  parameter and never uses it (sql.py:88 vs the cast loop at sql.py:122-130).
  We keep the argument for API parity and emit a warning, matching the
  faithful capability ("per-column cast directive", not rounding).
- decimal normalization — every DecimalType column is force-cast to
  DECIMAL(38, 20), mirroring the reference's decimal128(38, 20) policy
  (sql.py:104-105, :133-141).

All casts are Catalyst ``Cast`` expressions — they execute inside
whole-stage codegen on the executors; nothing here touches the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from flowbyte_spark import log

# The reference's universal decimal policy: decimal128(38, 20)
DECIMAL_POLICY = DecimalType(38, 20)


def apply_casts(
    df: DataFrame,
    category_columns: Sequence[str] | None = None,
    bool_columns: Sequence[str] | None = None,
    float_columns: Sequence[str] | None = None,
    round_columns: Sequence[str] | None = None,
) -> DataFrame:
    """Apply the reference's cast directives to a DataFrame.

    Unknown column names fail fast (AnalysisException at planning time)
    rather than silently passing — deviating from the reference, which
    would raise deep inside Arrow.
    """
    for c in category_columns or []:
        df = df.withColumn(c, F.col(c).cast("string"))
    for c in bool_columns or []:
        df = df.withColumn(c, F.col(c).cast("boolean"))
    for c in float_columns or []:
        df = df.withColumn(c, F.col(c).cast("double"))
    if round_columns:
        log.warning(
            "round_columns is accepted for API parity but ignored "
            "(the reference declares and never applies it)"
        )
    return df


def normalize_decimals(df: DataFrame, precision: int = 38, scale: int = 20) -> DataFrame:
    """Force every decimal column to a uniform DECIMAL(precision, scale)."""
    target = DecimalType(precision, scale)
    for field in df.schema.fields:
        if isinstance(field.dataType, DecimalType):
            df = df.withColumn(field.name, F.col(field.name).cast(target))
    return df
