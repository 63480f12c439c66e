"""Dry-run the driver's correctness sweep: first N window queries, in
registry order, through __spark_entry__'s wrapped callables on ONE
session (so cross-query session state — temp views, confs, lingering
caches — is exercised exactly as the driver will), each compared
against its DuckDB oracle at sf0.01 by sorted-column stringified row
multisets (the driver's comparison).

Usage: python scripts/driver_dryrun.py [N] [start]   (default N=50)
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF = "/root/testdata/sf0.01"


def main() -> None:
    import duckdb

    from pyspark.sql import SparkSession

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    # Driver-owned session shape: plain builder, hostile timezone.
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
    names = list(qs)[start : start + n]

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
            print(f"[{i+1:2d}/{len(names)}] {name}: SPARK ERROR {exc}")
            continue
        status = "rows-only"
        if name in oracles:
            du = con.execute(oracles[name]).df()
            sp2 = sp[sorted(sp.columns)]
            du2 = du[sorted(du.columns)]
            if sorted(sp2.columns) != sorted(du2.columns):
                failures.append(
                    (name, f"schema: {sorted(sp2.columns)} vs {sorted(du2.columns)}")
                )
                status = "SCHEMA MISMATCH"
            else:
                # NULL canonicalization before stringifying (ADVICE
                # r15, same fix as dryrun_names._canon_rows): Spark
                # None vs DuckDB nan/NaT must not read as a mismatch.
                import pandas as pd

                sp2 = sp2.astype(object).where(pd.notna(sp2), None)
                du2 = du2.astype(object).where(pd.notna(du2), None)
                a = sorted(map(str, sp2.values.tolist()))
                b = sorted(map(str, du2.values.tolist()))
                if a == b:
                    status = "match"
                else:
                    # Equal row counts with differing cells is the common
                    # mismatch shape (ADVICE r13) — show the first
                    # differing row pair, not just the counts.
                    first_diff = next(
                        (
                            f"spark={x!r} vs oracle={y!r}"
                            for x, y in zip(a, b)
                            if x != y
                        ),
                        "row sets differ only in length",
                    )
                    failures.append(
                        (
                            name,
                            f"values: {len(a)} vs {len(b)} rows; "
                            f"first diff: {first_diff}",
                        )
                    )
                    status = "VALUE MISMATCH"
        print(
            f"[{i+1:2d}/{len(names)}] {name}: {status} "
            f"({len(sp)} rows, {time.perf_counter()-t0:.1f} s)",
            flush=True,
        )
    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
