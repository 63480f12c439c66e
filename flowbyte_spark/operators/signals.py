"""Auxiliary document-quality signals (round 6).

Separate module from operators/text.py on purpose: text.py's units back
seven driver-verified queries and the function-level change tracker
treats new module-level imports as whole-module changes — new signal
families land here so verified code stays byte-identical.

Current signals:

- :func:`compression_ratio` — deflate ratio per document, the
  machine-generated/boilerplate detector used by RefinedWeb (Penedo et
  al. 2023 §3: highly compressible pages are template/spam; nearly
  incompressible ones are binary junk or high-entropy noise).  zlib is
  per-row CPU with no columnar form, so this is an Arrow-batched
  ``mapInPandas`` stage (the UDF tier's documented placement), map-only,
  no shuffle.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RATIO_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_compressed", LongType()),
        StructField("compression_ratio", DoubleType()),
    ]
)


def compression_ratio(
    df: DataFrame, id_col: str, text_col: str, level: int = 6
) -> DataFrame:
    """``(id, n_bytes, n_compressed, compression_ratio)`` per document.

    ``compression_ratio`` = deflate(utf-8 bytes) / raw bytes — low means
    repetitive/templated text, ~1 means high-entropy.  Empty text yields
    ratio 1.0 (a real zero-length document: nothing to judge); NULL text
    NULL-propagates through every column (r15 pandas-tier NULL audit —
    the old ``t or ""`` coercion scored a MISSING document 1.0, a
    perfect-entropy quality signal, the same conflation class as the
    text.py lang_id/quality_features fixes).  Deterministic: zlib output
    at a fixed level is stable for a given input on a given zlib, and
    the RATIO is robust across zlib builds.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, nc, ratio = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ids.append(i)
                if t is None:
                    nb.append(None)
                    nc.append(None)
                    ratio.append(None)
                    continue
                raw = t.encode("utf-8")
                comp = zlib.compress(raw, level) if raw else b""
                nb.append(len(raw))
                nc.append(len(comp))
                ratio.append(len(comp) / len(raw) if raw else 1.0)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_bytes": pd.array(nb, dtype="Int64"),
                    "n_compressed": pd.array(nc, dtype="Int64"),
                    "compression_ratio": pd.array(ratio, dtype="Float64"),
                }
            ).astype({"id": "int64"})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, RATIO_SCHEMA
    )


# ---------------------------------------------------------------------------
# Learned quality scorer: logistic regression distilling a rule gate
# (the FineWeb-Edu recipe shape — a cheap teacher labels a sample, a
# smooth student scores the corpus; here the teacher is the Gopher rule
# gate and the student is Spark ML logistic regression, so training is
# distributed and scoring is one map-only model.transform pass).
# ---------------------------------------------------------------------------

FEATURE_COLS = (
    "alpha_ratio",
    "stop_ratio",
    "punct_ratio",
    "avg_word_len",
    "n_words",
)


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seed: int = 42,
    max_iter: int = 30,
    reg_param: float = 0.01,
):
    """Fit LR(features -> gopher_pass) over the corpus; returns the
    fitted pipeline model.  Features come from
    ``operators.text.quality_features``; labels from
    ``gopher_quality_gate`` — the heuristic teacher.  Training is
    Spark ML's distributed LBFGS (one treeAggregate per iteration);
    nothing is collected but the coefficient vector.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    from flowbyte_spark.operators.text import (
        gopher_quality_gate,
        quality_features,
    )

    labeled = gopher_quality_gate(quality_features(df, text_col)).select(
        F.col(id_col),
        *[F.col(c).cast("double").alias(c) for c in FEATURE_COLS],
        F.col("gopher_pass").cast("double").alias("label"),
    ).na.fill(0.0, list(FEATURE_COLS))
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=list(FEATURE_COLS), outputCol="raw_f"),
            StandardScaler(inputCol="raw_f", outputCol="features"),
            LogisticRegression(
                maxIter=max_iter, regParam=reg_param, labelCol="label"
            ),
        ]
    )
    return pipe.fit(labeled)


def quality_scores(
    model, df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """``(id, learned_quality)`` — the student's P(pass) per document.

    Map-only and PURE CATALYST: the fitted pipeline's scaler stds and LR
    weights (a dozen scalars) are extracted driver-side and the sigmoid
    is computed in whole-stage codegen — no ScalaUDF, no shuffle, and no
    model object in any task closure.

    Why not ``model.transform``: the transform UDF captures the
    ``LogisticRegressionModel`` INCLUDING its non-transient
    ``trainingSummary``, whose ``predictions`` DataFrame drags the whole
    ``SparkSession`` into the task closure.  That serializes only while
    the session's lazy ``ObservationManager`` field is still
    unmaterialized; after ANY ``Observation`` use on the session
    (``plans.observed``), every scoring task dies with ``Task not
    serializable: ObservationManager`` — root-caused in round 8 as the
    suite's order-dependent flake (tests/test_signals.py keeps a
    regression test composing the two).  Computing the score from
    extracted weights removes the model from the closure entirely — and
    is faster: sigmoid in codegen instead of a black-box UDF per row.
    """
    from flowbyte_spark.operators.text import quality_features

    scaler = model.stages[1]
    lr = model.stages[2]
    stds = scaler.std.toArray().tolist()
    coefs = lr.coefficients.toArray().tolist()
    intercept = float(lr.intercept)

    feats = quality_features(df, text_col)
    # mirror the training prep exactly: cast + na.fill(0.0), then the
    # scaler's x/std (std==0 scales to 0.0, matching StandardScalerModel)
    z = F.lit(intercept)
    for name, std, w in zip(FEATURE_COLS, stds, coefs):
        x = F.coalesce(F.col(name).cast("double"), F.lit(0.0))
        scaled = F.when(F.lit(std) != 0.0, x / F.lit(std)).otherwise(F.lit(0.0))
        z = z + F.lit(w) * scaled
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        F.col(id_col), F.round(prob, 6).alias("learned_quality")
    )
