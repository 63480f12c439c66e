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
                a = sorted(map(str, sp2.astype(str).values.tolist()))
                b = sorted(map(str, du2.astype(str).values.tolist()))
                if a == b:
                    status = "match"
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
