"""v71 DSIR soak: does the fixture-scale ~2x ratio converge as the
corpus grows, or is it a stage-constant floor?  (VERDICT r13 task 3 —
the v80 treatment.)

Builds the documents corpus at 1x/4x/10x by verbatim replication under
shifted doc_ids (DSIR is per-document scoring over corpus-level bucket
counts: replicas multiply every bucket count by the factor, leaving
weights and per-doc scores identical, so the work profile scales
linearly and the aggregate signature is checkable).  Times the SAME
computation in both engines on the same parquet — one warm-up pass then
one timed pass each, release_persisted OUTSIDE the timed region (the
ADVICE r13 convention) — and asserts an aggregate signature
(docs scored, total grams, total quantized score) agrees before
recording walls.  BASELINE.md records the rows.

All factors write 32 input partitions, so every Spark pass takes the
operator's at-scale DOUBLE-SCAN path (partitions >= defaultParallelism
disables the narrow gram-stream cache) — the path a 100 TB corpus
takes; the fixture bench number additionally enjoys the cached path.

Usage: python scripts/v71_dsir_soak.py [factor ...]   (default 1 4 10)
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
from flowbyte_spark.operators.importance import dsir_importance  # noqa: E402
from flowbyte_spark.session import get_spark  # noqa: E402

N = 2
BUCKET_CHARS = 3
B = 16**BUCKET_CHARS
SHIFT = 10_000_000

# The v71 oracle (queries/llm.py) restated over the soak parquet,
# collapsed to the aggregate signature.
DUCK_SQL = f"""
WITH d AS (
    SELECT doc_id, lang = 'en' AS t, w
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
          FROM documents)
    WHERE len(w) >= {N}),
g AS (
    SELECT doc_id, t,
           substr(md5(unnest([array_to_string(w[i:i+{N - 1}], ' ')
                              for i in range(1, len(w) - {N - 2})])),
                  1, {BUCKET_CHARS}) AS bkt
    FROM d),
cnt AS (
    SELECT bkt,
           SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
           COUNT(*) AS cr
    FROM g GROUP BY bkt),
tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS rt FROM cnt),
wt AS (
    SELECT bkt,
           CAST(FLOOR((ln((ct + 1.0) / (tt + {B}))
                       - ln((cr + 1.0) / (rt + {B}))) * 10000
                      + 0.5) AS BIGINT) AS wq
    FROM cnt, tot),
scored AS (
    SELECT g.doc_id, COUNT(*) AS n_grams, SUM(wq) AS swq
    FROM g JOIN wt USING (bkt)
    GROUP BY g.doc_id)
SELECT COUNT(*) AS n_docs,
       SUM(n_grams) AS grams,
       SUM(swq) AS total_wq
FROM scored
"""


def main() -> None:
    import duckdb

    spark = get_spark(app_name="v71-dsir-soak")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(_REPO, ".tmp", "v71_soak")
    shutil.rmtree(base, ignore_errors=True)

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "lang"
    )

    factors = tuple(int(a) for a in sys.argv[1:]) or (1, 4, 10)
    rows = []
    for factor in factors:
        path = os.path.join(base, f"docs_{factor}x")
        reps = [
            docs.select(
                (F.col("doc_id") + i * SHIFT).alias("doc_id"),
                "text",
                "lang",
            )
            for i in range(factor)
        ]
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.repartition(32).write.parquet(path)
        n_docs = spark.read.parquet(path).count()

        def spark_pass():
            out = dsir_importance(
                spark.read.parquet(path),
                "doc_id",
                "text",
                target=F.col("lang") == "en",
                n=N,
                bucket_chars=BUCKET_CHARS,
            )
            sig = out.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_grams").alias("grams"),
                F.sum(F.round(F.col("score") * 10000).cast("long")).alias(
                    "total_wq"
                ),
            ).collect()[0]
            return tuple(sig)

        # bench.py convention: 2 warm-ups (one leaves this sub-second
        # operator mid-JIT — the first soak draft's 1x row read 2.95 s
        # of compilation, not query), median of 3 timed passes,
        # release_persisted outside every timed region.
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
            "CREATE VIEW documents AS SELECT * FROM "
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
        rows.append((factor, n_docs, t_spark, t_duck))
        print(
            f"{factor:3d}x  {n_docs:>9,} docs  "
            f"spark {t_spark:.2f} s  duck {t_duck:.2f} s  "
            f"ratio {t_spark / t_duck:.2f}x",
            flush=True,
        )

    print("\n| factor | docs | spark s | duck s | ratio |")
    print("|---|---|---|---|---|")
    for factor, n, ts, td in rows:
        print(f"| {factor}x | {n:,} | {ts:.2f} | {td:.2f} | {ts/td:.2f}x |")
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
