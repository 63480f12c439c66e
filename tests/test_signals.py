"""Quality signals (operators/signals.py)."""

from __future__ import annotations

import zlib

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.signals import compression_ratio

SF = "/root/testdata/sf0.001"


def test_compression_ratio_matches_local_zlib(spark):
    docs = load_table(spark, SF, "documents")
    got = {
        r.id: (r.n_bytes, r.n_compressed, r.compression_ratio)
        for r in compression_ratio(docs, "doc_id", "text").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        raw = r.text.encode("utf-8")
        comp = zlib.compress(raw, 6)
        assert got[r.doc_id] == (len(raw), len(comp), len(comp) / len(raw))


def test_compression_ratio_separates_repetition_from_entropy(spark):
    import hashlib

    rows = [
        (1, "spam spam spam " * 200),                      # templated
        (2, "".join(hashlib.sha256(str(i).encode()).hexdigest()
             for i in range(50))),                           # high entropy
        (3, ""),                                            # empty
        (4, None),                                          # null
    ]
    out = {
        r.id: r
        for r in compression_ratio(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    assert out[1].compression_ratio < 0.05          # boilerplate collapses
    assert out[2].compression_ratio > 0.5           # entropy barely shrinks
    assert out[3].compression_ratio == 1.0 and out[3].n_bytes == 0
    # NULL text NULL-propagates — distinct from the real empty document
    # (r15 pandas-tier NULL audit: NULL must not score as perfect entropy)
    assert out[4].compression_ratio is None and out[4].n_bytes is None
    assert out[4].n_compressed is None
    # map-only: no shuffle
    from flowbyte_spark import plans

    df = compression_ratio(load_table(spark, SF, "documents"), "doc_id", "text")
    assert plans.shuffle_exchanges(df) == 0


def test_learned_quality_classifier_agrees_with_teacher(spark):
    """The LR student must rank teacher-passing docs above failing ones
    (AUC gate) and score map-only."""
    from flowbyte_spark.operators.signals import (
        quality_scores,
        train_quality_classifier,
    )
    from flowbyte_spark.operators.text import gopher_quality_gate

    docs = load_table(spark, SF, "documents")
    model = train_quality_classifier(docs, "doc_id")
    scored = quality_scores(model, docs, "doc_id")
    labels = {
        r.doc_id: bool(r.gopher_pass)
        for r in gopher_quality_gate(docs).select(
            "doc_id", "gopher_pass"
        ).collect()
    }
    scores = {r.doc_id: r.learned_quality for r in scored.collect()}
    assert set(scores) == set(labels)
    assert all(0.0 <= s <= 1.0 for s in scores.values())
    pos = [scores[i] for i, l in labels.items() if l]
    neg = [scores[i] for i, l in labels.items() if not l]
    assert pos and neg, "teacher labels degenerate on fixture"
    # AUC by direct comparison (small corpus)
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert auc >= 0.8, f"AUC {auc:.3f}"
    # deterministic across refits with the same seed
    model2 = train_quality_classifier(docs, "doc_id")
    scores2 = {
        r.doc_id: r.learned_quality
        for r in quality_scores(model2, docs, "doc_id").collect()
    }
    assert all(abs(scores[k] - scores2[k]) < 1e-4 for k in scores)


def test_catalyst_scores_equal_model_transform(spark):
    """The extracted-weights Catalyst scorer must reproduce Spark ML's
    own model.transform probabilities (checked on a FRESH SparkSession
    whose ObservationManager is unmaterialized, where the transform UDF
    closure still serializes)."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from flowbyte_spark.operators.signals import (
        FEATURE_COLS,
        quality_scores,
        train_quality_classifier,
    )
    from flowbyte_spark.operators.text import quality_features

    # Everything runs on a FRESH session: the model trained on the shared
    # session would pin it via its trainingSummary, and a prior test may
    # already have materialized that session's ObservationManager (the
    # round-8 flake) — which would make model.transform unserializable
    # here regardless of which session executes it.
    fresh = spark.newSession()
    docs = load_table(fresh, SF, "documents")
    model = train_quality_classifier(docs, "doc_id")
    got = {
        r.doc_id: r.learned_quality
        for r in quality_scores(model, docs, "doc_id").collect()
    }
    feats = quality_features(docs, "text").select(
        F.col("doc_id"),
        *[F.col(c).cast("double").alias(c) for c in FEATURE_COLS],
    ).na.fill(0.0, list(FEATURE_COLS))
    want = {
        r.doc_id: round(float(r.p), 6)
        for r in model.transform(feats).select(
            "doc_id", vector_to_array("probability")[1].alias("p")
        ).collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) <= 1e-6 for k in got)


def test_scoring_survives_observation_manager_materialization(spark):
    """Round-8 root cause of the order-dependent suite flake: ANY
    Observation use materializes SparkSession's lazy (non-serializable)
    ObservationManager, after which a task closure that captures the
    session — as model.transform's UDF did via the model's non-transient
    trainingSummary — dies with 'Task not serializable'.  The Catalyst
    scorer must keep working on a session in that state."""
    from pyspark.sql import functions as F

    from flowbyte_spark import plans
    from flowbyte_spark.operators.signals import (
        quality_scores,
        train_quality_classifier,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    observed_df, obs = plans.observed(
        li, "poison_probe", F.count(F.lit(1)).alias("n")
    )
    observed_df.count()
    assert obs.get["n"] > 0  # ObservationManager now materialized
    docs = load_table(spark, SF, "documents")
    model = train_quality_classifier(docs, "doc_id")
    scores = quality_scores(model, docs, "doc_id").collect()
    assert len(scores) == docs.count()
