"""v127 crossover soak (VERDICT r11 #5): a fat-posting corpus where
sum_t df_t^2 explodes, so the prefix-filtered path must beat the full
inverted-index join on wall-clock, with candidate counts recorded."""

import time

from flowbyte_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark({"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

from flowbyte_spark.operators.tfidf import sparse_cosine_pairs  # noqa: E402

# Corpus: D docs of near-duplicate boilerplate.  Every doc carries the
# SAME B boilerplate tokens (df = D — the fat posting lists that blow
# up the full join: sum df^2 >= B * D^2), plus 8 pair-shared tokens
# (docs 2i/2i+1 are true near-dups) and 2 unique tokens.
D, B = 2000, 20
boiler = " ".join(f"b{j}" for j in range(B))
docs = (
    spark.range(D)
    .select(
        F.col("id"),
        F.concat_ws(
            " ",
            F.lit(boiler),
            *[
                F.format_string(f"t%d_{j}", (F.col("id") / 2).cast("long"))
                for j in range(8)
            ],
            *[F.format_string(f"u%d_{j}", F.col("id")) for j in range(2)],
        ).alias("text"),
    )
)
docs.write.mode("overwrite").parquet("/root/repo/.tmp/v127_fat_corpus")
docs = spark.read.parquet("/root/repo/.tmp/v127_fat_corpus")
n = docs.count()
THRESH = 0.7


def run(prefix: bool):
    return sparse_cosine_pairs(
        docs, "id", "text", threshold=THRESH, n_docs=n, prefix_filter=prefix
    )


# --- equality first (losslessness at fat df) -------------------------
full_pairs = {(r.id1, r.id2) for r in run(False).collect()}
pfx_pairs = {(r.id1, r.id2) for r in run(True).collect()}
print("pairs full:", len(full_pairs), "prefix:", len(pfx_pairs),
      "EQUAL:", full_pairs == pfx_pairs, flush=True)

# --- candidate counts -------------------------------------------------
from flowbyte_spark.operators.tfidf import prefix_index  # noqa: E402
from flowbyte_spark.functions import ensure_parallelism  # noqa: E402
from flowbyte_spark.functions.hashing import words  # noqa: E402

terms = (
    ensure_parallelism(docs)
    .select(F.col("id"), F.explode(words("text")).alias("term"))
    .groupBy("id", "term")
    .agg(F.count(F.lit(1)).alias("tf"))
)
doc_freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
fanout = doc_freq.agg(F.sum(F.col("df") * F.col("df"))).collect()[0][0]
idf = F.log((F.lit(float(n)) + 1.0) / (F.col("df") + 1.0)) + 1.0
w = terms.join(doc_freq, "term").select("id", "term", (F.col("tf") * idf).alias("w"))
norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
unit = w.join(norms, "id").select("id", "term", (F.col("w") / F.col("nrm")).alias("u"))
idx = prefix_index(unit, THRESH)
cand = (
    idx.select(F.col("id").alias("ia"), "term")
    .join(unit.select(F.col("id").alias("ib"), "term"), "term")
    .where(F.col("ia") != F.col("ib"))
    .select(F.least("ia", "ib").alias("id1"), F.greatest("ia", "ib").alias("id2"))
    .distinct()
    .count()
)
print(f"full-join fan-out sum(df^2): {fanout:,}; prefix candidates: {cand:,}",
      flush=True)
print("indexed postings:", idx.count(), "of", unit.count(), flush=True)

# --- walls (interleaved, fresh plans) ---------------------------------
run(True).count(); run(False).count()
tp, tf_ = [], []
for _ in range(3):
    t = time.time(); run(True).count(); tp.append(time.time() - t)
    t = time.time(); run(False).count(); tf_.append(time.time() - t)
tp.sort(); tf_.sort()
print("prefix wall", round(tp[1], 2), [round(x, 2) for x in tp], flush=True)
print("full   wall", round(tf_[1], 2), [round(x, 2) for x in tf_], flush=True)
