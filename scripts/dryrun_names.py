"""Dry-run specific queries by NAME through the driver-identical
compare (scripts/driver_dryrun.py's harness, name-selected — for
re-verifying in-round-changed queries before they enter the window).

Usage: python scripts/dryrun_names.py v118_incremental_agg v153_... 
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _canon_rows(df):
    """Sorted stringified row multiset with NULLs canonicalized to None
    first — so Spark's None and DuckDB's nan/NaT stringify identically
    instead of producing spurious VALUE MISMATCH (ADVICE r15)."""
    import pandas as pd

    df = df.astype(object).where(pd.notna(df), None)
    return sorted(map(str, df.values.tolist()))


def main() -> None:
    import time

    import duckdb
    from pyspark.sql import SparkSession

    names = sys.argv[1:]
    assert names, "pass query names"
    SF = "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    from flowbyte_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF, t)}')"
        )
    failures = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            sp = qs[name](spark, SF).toPandas()
        except Exception as exc:
            failures.append((name, f"spark error: {exc}"))
            print(f"[{i+1}/{len(names)}] {name}: SPARK ERROR {exc}")
            continue
        status = "rows-only"
        if name in oracles:
            du = con.execute(oracles[name]).df()
            sp2 = sp[sorted(sp.columns)]
            du2 = du[sorted(du.columns)]
            if sorted(sp2.columns) != sorted(du2.columns):
                failures.append((name, "schema mismatch"))
                status = "SCHEMA MISMATCH"
            else:
                # Canonicalize NULLs BEFORE stringifying (ADVICE r15):
                # Spark-side pandas renders missing values as None,
                # DuckDB as nan/NaT — astype(str) would turn the same
                # NULL into different strings.
                a = _canon_rows(sp2)
                b = _canon_rows(du2)
                if a == b:
                    status = "match"
                elif len(a) != len(b):
                    failures.append(
                        (name, f"row count: {len(a)} vs {len(b)}")
                    )
                    status = "ROW COUNT MISMATCH"
                else:
                    first = next(
                        (f"{x!r} vs {y!r}" for x, y in zip(a, b) if x != y),
                        "length",
                    )
                    failures.append((name, f"values: {first}"))
                    status = "VALUE MISMATCH"
        print(
            f"[{i+1}/{len(names)}] {name}: {status} "
            f"({len(sp)} rows, {time.perf_counter()-t0:.1f} s)",
            flush=True,
        )
    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
