"""v80 ExactSubstr soak: does the fixture-scale 1.9-2.9x ratio converge
as the corpus grows, or is it a stage-constant floor?  (VERDICT r12
task 3 — the v70 treatment.)

Builds the documents corpus at 1x/4x/10x: replica i suffixes every
token with ``#i``, so window hashes are DISJOINT across replicas and
each copy carries exactly the original's duplication structure (the
shifted-node-id trick from the v160 soak, applied to token streams —
verbatim replication would instead make every window of copy 2+ a
duplicate and change the work profile).  Times the SAME computation in
both engines on the same parquet — one warm-up pass then one timed
pass each (the bench.py convention) — and asserts an aggregate
signature (docs, kept tokens, total tokens, output chars) agrees
before recording walls.  BASELINE.md records the rows.

Usage: python scripts/v80_substr_soak.py [factor ...]   (default 1 4 10)
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
from flowbyte_spark.operators import cache  # noqa: E402
from flowbyte_spark.operators.substrings import (  # noqa: E402
    exact_substring_dedup,
)
from flowbyte_spark.session import get_spark  # noqa: E402

K = 5
SHIFT = 10_000_000

# The v80 oracle (queries/llm2.py) restated over the soak parquet.
DUCK_SQL = f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
wins AS (
    SELECT doc_id, unnest(range(0, greatest(len(arr) - {K} + 1, 0))) AS pos, arr
    FROM docs),
keyed AS (
    SELECT doc_id, pos, md5(array_to_string(arr[pos+1 : pos+{K}], ' ')) AS wh
    FROM wins),
flagged AS (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn
    FROM keyed),
covered AS (
    SELECT DISTINCT doc_id, pos + unnest(range(0, {K})) AS cpos
    FROM flagged WHERE rn > 1),
toks AS (
    SELECT doc_id, unnest(arr) AS tok, unnest(range(0, len(arr))) AS pos
    FROM docs),
kept AS (
    SELECT t.doc_id, t.pos, t.tok FROM toks t
    LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
    WHERE c.doc_id IS NULL),
rebuilt AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_dedup,
           COUNT(*) AS n_kept
    FROM kept GROUP BY doc_id)
SELECT COUNT(*) AS n_docs,
       SUM(CAST(COALESCE(r.n_kept, 0) AS BIGINT)) AS kept,
       SUM(CAST(len(d.arr) AS BIGINT)) AS toks,
       SUM(CAST(length(COALESCE(r.text_dedup, '')) AS BIGINT)) AS chars
FROM docs d LEFT JOIN rebuilt r USING (doc_id)
"""


def main() -> None:
    import duckdb

    spark = get_spark(app_name="v80-substr-soak")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(_REPO, ".tmp", "v80_soak")
    shutil.rmtree(base, ignore_errors=True)

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )

    factors = tuple(int(a) for a in sys.argv[1:]) or (1, 4, 10)
    rows = []
    for factor in factors:
        path = os.path.join(base, f"docs_{factor}x")
        reps = [
            docs.select(
                (F.col("doc_id") + i * SHIFT).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda x: F.concat(x, F.lit(f"#{i}")),
                    ),
                    " ",
                ).alias("text"),
            )
            for i in range(factor)
        ]
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.repartition(32).write.parquet(path)
        n_docs = spark.read.parquet(path).count()

        def spark_pass():
            out = exact_substring_dedup(
                spark.read.parquet(path), "doc_id", "text", k=K
            )
            sig = out.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_kept").alias("kept"),
                F.sum("n_tokens").alias("toks"),
                F.sum(F.length("text_dedup")).alias("chars"),
            ).collect()[0]
            return tuple(sig)

        # release_persisted() sits OUTSIDE the timed region (ADVICE r13):
        # the DuckDB pass times only the query, so charging unpersist
        # overhead to the Spark wall would bias the cross-engine ratio.
        # It still runs between passes so the timed pass is a full
        # recompute, not a cache hit.
        spark_pass()
        cache.release_persisted()
        t0 = time.perf_counter()
        spark_sig = spark_pass()
        t_spark = time.perf_counter() - t0
        cache.release_persisted()

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count()}")
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{path}/*.parquet')"
        )
        con.execute(DUCK_SQL).fetchall()
        t0 = time.perf_counter()
        duck_sig = tuple(con.execute(DUCK_SQL).fetchall()[0])
        t_duck = time.perf_counter() - t0
        con.close()

        assert spark_sig == duck_sig, (factor, spark_sig, duck_sig)
        rows.append((factor, n_docs, t_spark, t_duck))
        print(
            f"factor={factor}: {n_docs:,} docs  "
            f"spark {t_spark:.2f} s  duck {t_duck:.2f} s  "
            f"ratio {t_spark / t_duck:.2f}x",
            flush=True,
        )

    shutil.rmtree(base, ignore_errors=True)
    print("rows:", rows)


if __name__ == "__main__":
    main()
