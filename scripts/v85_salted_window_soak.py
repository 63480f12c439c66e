"""Salted-window hot-key soak: the shape the two-phase rewrite exists
for, measured (the funnel-soak protocol applied to v85's operator).

One bot key owns ~95% of a 20M-row event stream spread over its time
range; the unsalted ``Window.partitionBy(key)`` puts that key's entire
history in ONE task (AQE cannot split window partitions), while
``salted_window_agg`` windows within (key, time bucket) and rolls
per-bucket totals — the hot key spreads across its range.  Run under
the round-14 struct-wrapped join keys, so this also re-validates that
form under heat.

Protocol: 32-way cached input, signature equality asserted first
(sum over every running value — order-independent), then N timed reps
per form, medians + spreads reported.  BASELINE.md records the rows.

Usage: python scripts/v85_salted_window_soak.py [rows_millions] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

_REPO = __file__.rsplit("/", 2)[0]
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flowbyte_spark.operators.skew import salted_window_agg  # noqa: E402
from flowbyte_spark.session import get_spark  # noqa: E402

BUCKET_SECONDS = 3600


def main() -> None:
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n = n_m * 1_000_000

    spark = get_spark(app_name="v85-salted-window-soak")
    spark.sparkContext.setLogLevel("ERROR")

    # ~95% of rows on key 0 (the bot), the rest across 1000 organic
    # keys; timestamps spread uniformly over ~14 days so the bot's
    # history spans ~340 hourly buckets.
    df = (
        spark.range(0, n, 1, 32)
        .select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000 + 1)
            .alias("k"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") % 1_209_600)
            ).alias("ts"),
            (F.col("id") % 997).cast("double").alias("v"),
            F.col("id"),
        )
        .persist()
    )
    df.count()  # materialize the cache

    def unsalted():
        w = (
            Window.partitionBy("k")
            .orderBy("ts", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.select(F.sum("v").over(w).alias("s")).agg(
            F.sum("s").alias("sig")
        )

    def salted():
        out = salted_window_agg(
            df,
            keys=["k"],
            order_by="ts",
            aggs={"s": ("sum", "v")},
            bucket_width_seconds=BUCKET_SECONDS,
            tiebreakers=["id"],
        )
        return out.select(F.sum("s").alias("sig"))

    sig_u = unsalted().collect()[0][0]
    sig_s = salted().collect()[0][0]
    assert abs(sig_u - sig_s) < 1e-6 * max(abs(sig_u), 1), (sig_u, sig_s)
    print(f"signatures agree: {sig_s:.1f}")

    results = {}
    for name, fn in (("unsalted", unsalted), ("salted", salted)):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().collect()
            walls.append(time.perf_counter() - t0)
        results[name] = walls
        print(
            f"{name:9s} walls {' '.join(f'{w:.1f}' for w in walls)}  "
            f"median {statistics.median(walls):.2f} s  "
            f"spread {max(walls)/min(walls):.1f}x",
            flush=True,
        )
    mu = statistics.median(results["unsalted"])
    ms = statistics.median(results["salted"])
    print(f"\n{n_m}M rows, hot key ~95%: salted/unsalted = {ms/mu:.2f}x")
    df.unpersist()


if __name__ == "__main__":
    main()
