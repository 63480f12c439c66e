"""v33 as-of join soak: does the union-sort ASOF shape hold its wall as
the key count grows, and where does it cross DuckDB's NATIVE ASOF JOIN?

The growth axis is the realistic one for a 100 TB event store: more
users, same per-user series length.  Replica i shifts every user_id
(and event_id, to keep ids unique) by i*SHIFT, so the key count grows
with the factor while each key's sort run stays fixture-sized — the
union-sort implementation should scale in the shuffle (one exchange on
user_id, linear window scan per key), with NO growth in per-key work.

DuckDB runs its built-in ASOF LEFT JOIN on the same parquet — a native
specialized operator, the strongest honest twin available.  Signature
(row count, matched count, sum of matched purchase event ids) is
asserted across engines at every factor before walls are recorded.
Protocol: bench conventions — 2 warm-ups, median of 3, tracked-cache
release outside every timed region.

Usage: python scripts/v33_asof_soak.py [factor ...]   (default 1 4 10 25)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from flowbyte_spark.catalog import load_table  # noqa: E402
from flowbyte_spark.operators import cache  # noqa: E402
from flowbyte_spark.operators.asof import asof_join  # noqa: E402
from flowbyte_spark.session import get_spark  # noqa: E402

SHIFT = 10_000_000

DUCK_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(p_event_id) AS n_matched,
       SUM(p_event_id) AS sum_match_id
FROM (
    SELECT c.event_id, p.event_id AS p_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.ts <= c.ts
)
"""


def main() -> None:
    import duckdb

    spark = get_spark(app_name="v33-asof-soak")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(_REPO, ".tmp", "v33_soak")
    shutil.rmtree(base, ignore_errors=True)

    events = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "user_id", "event_type", "ts"
    )

    factors = tuple(int(a) for a in sys.argv[1:]) or (1, 4, 10, 25)
    rows = []
    for factor in factors:
        path = os.path.join(base, f"events_{factor}x")
        reps = [
            events.select(
                (F.col("event_id") + i * SHIFT).alias("event_id"),
                (F.col("user_id") + i * SHIFT).alias("user_id"),
                "event_type",
                "ts",
            )
            for i in range(factor)
        ]
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.repartition(32).write.parquet(path)
        n_events = spark.read.parquet(path).count()

        def spark_pass():
            ev = spark.read.parquet(path)
            clicks = ev.where(F.col("event_type") == "click")
            purchases = ev.where(F.col("event_type") == "purchase").select(
                "user_id", "ts", F.col("event_id").alias("p_event_id")
            )
            joined = asof_join(
                clicks,
                purchases,
                on="user_id",
                left_time="ts",
                right_time="ts",
                right_values=["p_event_id"],
                direction="backward",
            )
            sig = joined.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("p_event_id_matched").alias("n_matched"),
                F.sum("p_event_id_matched").alias("sum_match_id"),
            ).collect()[0]
            return tuple(sig)

        for _ in range(2):
            spark_pass()
            cache.release_persisted()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark_sig = spark_pass()
            walls.append(time.perf_counter() - t0)
            cache.release_persisted()
        t_spark = statistics.median(walls)

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        con.execute(DUCK_SQL).fetchone()  # warm-up
        dwalls = []
        for _ in range(3):
            t0 = time.perf_counter()
            duck_sig = con.execute(DUCK_SQL).fetchone()
            dwalls.append(time.perf_counter() - t0)
        t_duck = statistics.median(dwalls)
        con.close()

        assert tuple(spark_sig) == tuple(duck_sig), (spark_sig, duck_sig)
        rows.append((factor, n_events, t_spark, t_duck))
        print(
            f"{factor:3d}x  {n_events:>10,} events  "
            f"spark {t_spark:.2f} s  duck {t_duck:.2f} s  "
            f"ratio {t_spark / t_duck:.2f}x",
            flush=True,
        )

    print("\n| factor | events | spark s | duck s | ratio |")
    print("|---|---|---|---|---|")
    for factor, n, ts, td in rows:
        print(f"| {factor}x | {n:,} | {ts:.2f} | {td:.2f} | {ts/td:.2f}x |")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
