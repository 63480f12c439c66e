"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Charter scope.  Images/audio/video travel as ``binary`` columns with a
``struct`` of metadata; compute-heavy steps (decode, resize, frame-sample,
feature-extract) run as Arrow-batched ``mapInPandas`` stages so payload
bytes move executor-side in columnar batches, never through the driver.

The decode kernels themselves are STUBBED — the runtime has no
image/audio libraries — behind :func:`_decode_stub`, which either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(test mode).  Everything Spark-side (schemas, batch iteration, partition
behavior, output contracts) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record shape: payload + metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _decode_stub(payload: bytes, kind: str, fake: bool) -> list[float]:
    """Placeholder for the real decode+featurize kernel.

    Real deployments plug Pillow/torchaudio/decord here; this container has
    none of them, so ``fake=True`` derives a deterministic pseudo-feature
    vector from a sha256 of the payload (stable across runs/engines), and
    ``fake=False`` raises — making the missing dependency explicit rather
    than silently wrong.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this environment; pass fake_decode=True for the deterministic stub"
        )
    digest = hashlib.sha256(kind.encode() + (payload or b"")).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def read_binary_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Ingest raw media files as (path, modificationTime, length, content)
    via Spark's binaryFile source — the standard way multimodal payloads
    enter the pipeline."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def extract_features(
    media: DataFrame,
    batch_size: int = 64,
    fake_decode: bool = False,
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas``.

    Arrow moves ``batch_size`` payloads per executor batch; each batch is
    decoded in-process and reduced to a feature vector + byte stats.  The
    per-partition generator never materializes more than one batch, so
    executor memory is bounded by batch_size × max payload, independent of
    partition row count — the property that matters at 100 TB.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "features": [
                        _decode_stub(p, k, fake_decode)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    media.sparkSession.conf.set(conf_key, str(batch_size))
    return media.mapInPandas(run, FEATURES_SCHEMA)


def with_media_column(
    df: DataFrame,
    payload_from: str,
    kind: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Wrap an existing column's bytes (e.g. utf-8 of a text column for
    tests) into the canonical media shape."""
    return df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(payload_from).cast("string"), "utf-8").alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
