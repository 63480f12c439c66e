"""DuckDB-oracle differential harness used by the test suite.

Mirrors what the verify driver does: run the Spark query and the oracle SQL
over the same parquet fixtures, canonicalize (sort columns by name,
stringify values), and compare row multisets.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from flowbyte_spark.catalog import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 and 3 hash alike across engines
        return repr(v)
    return str(v)


def canon(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def run_pair(spark, name: str, sf_dir: str):
    from flowbyte_spark.operators import cache
    from flowbyte_spark.queries import ORACLE, QUERIES

    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    # materialize-then-release: free operator-internal caches so a full
    # suite run doesn't accumulate every query's tracked persists.
    cache.release_persisted()
    con = duckdb_conn(sf_dir)
    oracle_pdf = con.execute(ORACLE[name]).fetchdf()
    con.close()
    return spark_pdf, oracle_pdf


def assert_query_matches(spark, name: str, sf_dir: str) -> None:
    spark_pdf, oracle_pdf = run_pair(spark, name, sf_dir)
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    # dtype parity too: the driver's hash may not normalize 6 vs 6.0, so a
    # DuckDB HUGEINT/TINYINT result must be cast in the oracle SQL
    dtype_mism = [
        (c, str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype))
        for c in spark_pdf.columns
        if str(spark_pdf[c].dtype) != str(oracle_pdf[c].dtype)
    ]
    assert not dtype_mism, f"{name}: dtype mismatch {dtype_mism}"
    s, o = canon(spark_pdf), canon(oracle_pdf)
    if s != o:
        diff_s = [r for r in s if r not in o][:5]
        diff_o = [r for r in o if r not in s][:5]
        raise AssertionError(
            f"{name}: value mismatch ({len(s)} vs {len(o)} rows)\n"
            f"  spark-only rows: {diff_s}\n  oracle-only rows: {diff_o}"
        )
