"""Measure the DuckDB baseline: run every oracle query at a scale factor,
median of 3 after warm-up — the comparison target for bench.py
(BASELINE.md: engine wall-clock <= 2x duckdb per query)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    import duckdb

    from flowbyte_spark.catalog import TABLES, table_path
    from flowbyte_spark.queries import ORACLE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    only = {q for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if q}

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        path = table_path(sf_dir, t)
        if os.path.isdir(path):  # Spark writes a directory of part files
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    timings: dict[str, float] = {}
    for name, sql in sorted(ORACLE.items()):
        if only and name not in only:
            continue
        try:
            con.execute(sql).fetchall()  # warm-up
            samples = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
        except Exception as exc:
            print(f"baseline: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    ok = {k: v for k, v in timings.items() if v >= 0}
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = sf_dir
    print(
        json.dumps(
            {
                "metric": "duckdb_baseline_sum_of_median_query_seconds",
                "value": round(sum(ok.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
