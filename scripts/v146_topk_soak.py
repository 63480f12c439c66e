"""v146 top-k state soak: at what scale does merging per-load states
beat recomputing top-k from the full fact?

The claim (operators/incremental.py:topk_state, SCALE.md incremental
tier) is an IO statement: the merge path reads O(groups·k·loads) state
rows while the recompute reads the whole fact.  At fixture scale the
fact fits the page cache and the constant-heavy merge loses; this soak
inflates the fact on DISK (the states persisted per load, as the
pipeline would), drops nothing from the honest accounting, and records
both walls + rows-read.

Usage: python scripts/v146_topk_soak.py [factor]   (default 80x sf0.1
events ≈ 38M rows)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from flowbyte_spark.catalog import load_table  # noqa: E402
from flowbyte_spark.operators.incremental import (  # noqa: E402
    merge_topk_states,
    topk_state,
)
from flowbyte_spark.operators.topk import top_k_per_group  # noqa: E402
from flowbyte_spark.session import get_spark  # noqa: E402

K = 5
N_LOADS = 8


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    spark = get_spark(app_name="v146-topk-soak")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(_REPO, ".tmp", "v146_soak")
    fact_dir = os.path.join(base, "fact")
    state_dir = os.path.join(base, "states")
    shutil.rmtree(base, ignore_errors=True)

    events = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "event_type", "value"
    )
    # inflate with shifted ids + perturbed values; loads = id % N_LOADS
    rep = spark.range(factor).select(F.col("id").alias("rep"))
    fact = (
        events.crossJoin(F.broadcast(rep))
        .select(
            (F.col("event_id") + F.col("rep") * 10_000_000).alias(
                "event_id"
            ),
            "event_type",
            (F.col("value") + F.col("rep") * 0.001).alias("value"),
        )
    )
    fact.repartition(32).write.parquet(fact_dir)
    n = spark.read.parquet(fact_dir).count()
    print(f"fact rows: {n:,}")

    # persist one top-k state per load (what the pipeline stores)
    fact_df = spark.read.parquet(fact_dir)
    for i in range(N_LOADS):
        topk_state(
            fact_df.where(F.col("event_id") % N_LOADS == i),
            ["event_type"],
            "value",
            "event_id",
            K,
        ).coalesce(1).write.parquet(os.path.join(state_dir, f"load={i}"))

    def timed(label, df):
        t0 = time.perf_counter()
        rows = df.collect()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f} s ({len(rows)} rows)")
        return dt, sorted(tuple(r) for r in rows)

    # A: full recompute over the fact
    full = (
        top_k_per_group(
            spark.read.parquet(fact_dir),
            ["event_type"],
            [F.col("value").desc(), F.col("event_id").asc()],
            K,
        )
        .drop("rn")
        .select("event_type", "value", "event_id")
    )
    t_full, r_full = timed("full recompute", full)

    # B: merge of the persisted per-load states
    states = [
        spark.read.parquet(os.path.join(state_dir, f"load={i}")).select(
            "event_type", "value", "event_id"
        )
        for i in range(N_LOADS)
    ]
    merged = merge_topk_states(states, ["event_type"], "value", "event_id", K)
    t_merge, r_merge = timed(
        "state merge", merged.select("event_type", "value", "event_id")
    )

    assert r_full == r_merge, "merge != recompute — monoid law violated!"
    print(
        f"factor={factor} rows={n:,} loads={N_LOADS} k={K}: "
        f"recompute {t_full:.2f} s vs merge {t_merge:.2f} s "
        f"({t_full / t_merge:.1f}x)"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
