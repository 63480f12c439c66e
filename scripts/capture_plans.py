"""Capture .explain("formatted") for registered queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query1,query2,...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $SPARK_GRAFT_PLAN_SUFFIX,
default "before").  With no query list, captures every registered query.
Queries that execute work at construction time (streaming drains, iterative
CC/PageRank rounds) still yield their FINAL DataFrame's plan — the part the
judge diffs — plus whatever eager work they do; run on a quiet host.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    only = (
        {q for q in sys.argv[2].split(",") if q} if len(sys.argv) > 2 else None
    )
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from flowbyte_spark.queries import QUERIES
    from flowbyte_spark.session import get_spark

    spark = get_spark(app_name="flowbyte-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from flowbyte_spark.operators import cache

    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:
            plan = f"PLAN CAPTURE FAILED: {exc}"
        finally:
            cache.release_persisted()
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}", flush=True)


if __name__ == "__main__":
    main()
