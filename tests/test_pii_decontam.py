"""Operator tests: PII scrubbing and benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.dedup import (
    benchmark_contamination,
    decontaminate,
)
from flowbyte_spark.operators.text import pii_scrub
from tests.conftest import SF_DIR_CORRECTNESS as SF


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, text STRING")


def test_pii_scrub_counts_and_redacts(spark):
    df = _docs(
        spark,
        [
            (1, "mail a@b.io and c.d+x@e-f.org, call +44-555-1234"),
            (2, "server at 192.168.0.1 backs 10.0.0.255"),
            (3, "nothing sensitive here"),
            (4, "edge: not-an-ip 999.1 and half@phone +1-23-4567"),
        ],
    )
    out = {r["id"]: r for r in pii_scrub(df, "text").collect()}
    assert out[1]["n_email"] == 2 and out[1]["n_phone"] == 1
    assert out[1]["scrubbed"] == "mail <EMAIL> and <EMAIL>, call <PHONE>"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["scrubbed"] == "server at <IP> backs <IP>"
    assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_ipv4"] == 0
    assert out[3]["scrubbed"] == "nothing sensitive here"
    # +1-23-4567 lacks the 3-digit middle group: not a phone match
    assert out[4]["n_phone"] == 0


def test_decontaminate_drops_exactly_contaminated(spark):
    docs = load_table(spark, SF, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    train = docs.where(F.col("doc_id") % 50 != 0)
    hits = benchmark_contamination(train, bench, "doc_id", "text", n=8)
    contaminated = {r["id"] for r in hits.collect()}
    assert contaminated, "fixture should contain planted benchmark overlap"
    clean = decontaminate(train, bench, "doc_id", "text", n=8)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    total = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert kept == total - contaminated
    # benchmark docs themselves were never part of train
    assert not kept & {r["doc_id"] for r in bench.select("doc_id").collect()}


def test_contamination_is_overlap_not_chance(spark):
    # disjoint vocabularies -> zero hits at n=3 even with shared unigrams
    bench = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            (10, "alpha beta other delta epsilon zeta"),  # no shared 3-gram? no: 'delta epsilon zeta' IS shared
            (11, "totally different words here entirely"),
        ],
    )
    hits = {r["id"]: r["n_matched"] for r in
            benchmark_contamination(train, bench, "id", "text", n=3).collect()}
    assert hits == {10: 1}
