"""Inflate a fixture scale factor for bench-only scale runs.

Replicates the volume-bearing tables (lineitem, orders, documents,
embeddings) N times with shifted keys — and, for the content tables,
deterministically perturbed content so near-dup/ANN workloads keep a
realistic pair density instead of degenerating into N-way exact
duplicates — then copies the remaining tables verbatim.  Output feeds
`bench.py` / `baseline_duckdb.py` via SPARK_GRAFT_SF_DIR; it is NOT a
correctness fixture (the driver's oracle gate always runs on the
driver-generated sf dirs).

Usage: python scripts/inflate_sf.py [src_sf_dir] [out_dir] [factor]
Defaults: /root/testdata/sf0.1  .tmp/sf1x  10
"""

from __future__ import annotations

import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

KEY_SHIFT = 10_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, ".tmp", "sf1x")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from flowbyte_spark.catalog import TABLES, load_table, table_path
    from flowbyte_spark.session import get_spark

    spark = get_spark(app_name="inflate-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def replicas(df, mutate):
        """Union `factor` copies; replica 0 is the original (so fixed ids
        referenced by queries still exist), replicas 1.. are mutated."""
        parts = [df]
        for i in range(1, factor):
            parts.append(mutate(df, i))
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    def write(df, name):
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {df.count()} rows")

    li = load_table(spark, src, "lineitem")
    write(
        replicas(
            li,
            lambda df, i: df.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * KEY_SHIFT)
            ),
        ),
        "lineitem",
    )

    # orders inflates with shifted orderkeys but UNSHIFTED custkeys, so the
    # orders⋈customer dim join keeps 100% match rate at every factor — the
    # scan/join/sort shapes (V05, V13) scale with the fact side exactly as
    # production data would.
    orders = load_table(spark, src, "orders")
    write(
        replicas(
            orders,
            lambda df, i: df.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * KEY_SHIFT)
            ),
        ),
        "orders",
    )

    docs = load_table(spark, src, "documents")
    def mutate_doc(df, i):
        # prefix keeps replicas textually distinct: near-dup density stays
        # ~flat instead of every doc gaining factor-1 exact twins
        text = F.concat(F.lit(f"replica {i} "), F.col("text"))
        return df.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast("long").alias("n_chars"),
        )
    write(replicas(docs, mutate_doc), "documents")

    emb = load_table(spark, src, "embeddings")
    def mutate_emb(df, i):
        # deterministic +-0.05 per-component jitter: replicas stay near
        # their source vector (realistic near-dup structure) without being
        # bitwise-identical
        jitter = F.transform(
            F.col("embedding"),
            lambda x, j: (
                x
                + (
                    F.pmod(F.xxhash64(F.col("vec_id") * 31 + j + i), F.lit(2001))
                    - 1000
                ).cast("double")
                / 20000.0
            ).cast("float"),
        )
        return df.select(
            (F.col("vec_id") + F.lit(i * KEY_SHIFT)).alias("vec_id"),
            jitter.alias("embedding"),
            "label",
        )
    write(replicas(emb, mutate_emb), "embeddings")

    for t in TABLES:
        if t in ("lineitem", "orders", "documents", "embeddings"):
            continue
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.isdir(table_path(src, t)):
            shutil.copytree(table_path(src, t), dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(table_path(src, t), dst)
        print(f"{t}: copied")


if __name__ == "__main__":
    main()
