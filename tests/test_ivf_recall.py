"""Recall gate for the IVF ANN path (VERDICT r4 #6).

v25's oracle hash-checks the fixture answer but says nothing about
approximation quality.  This measures recall@k of the kmeans-quantized
``nprobe`` path against exact ``cosine_topk`` on a seeded 10k-vector
corpus — clustered like real embeddings (mixture of Gaussians on the unit
sphere), not isotropic noise, which no inverted-file index can bucket.
Everything is seeded (corpus, k-means||, deterministic tie-breaks), so the
measured recall is a constant of the code, recorded in docs/SCALE.md.
"""

from __future__ import annotations

import numpy as np
import pytest

from flowbyte_spark.operators.cache import release_persisted
from flowbyte_spark.operators.similarity import cosine_topk, ivf_assign, ivf_topk

N = 10_000
DIM = 32
N_CLUSTERS = 20
K = 10
NUM_CENTROIDS = 16
NPROBE = 4
N_QUERIES = 8


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, N_CLUSTERS, size=N)
    vecs = centers[which] + 0.15 * rng.normal(size=(N, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id INT, emb ARRAY<DOUBLE>",
    ).repartition(8)
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


def test_ivf_recall_at_k(corpus):
    index = ivf_assign(
        corpus, "vec_id", "emb", NUM_CENTROIDS, centroid_mode="kmeans", seed=42
    )
    # persist the assignments: 8 queries probe the same inverted lists
    index = (index[0], index[1].persist())

    recalls = []
    for qid in range(0, N_QUERIES * 1250, 1250):  # spread across clusters
        exact = {
            r["id"]
            for r in cosine_topk(corpus, "vec_id", "emb", qid, k=K).collect()
        }
        approx = {
            r["id"]
            for r in ivf_topk(
                corpus, "vec_id", "emb", qid, k=K, nprobe=NPROBE, index=index
            ).collect()
        }
        recalls.append(len(exact & approx) / K)
    index[1].unpersist()
    release_persisted()

    mean_recall = sum(recalls) / len(recalls)
    # Documented gate: nprobe=4 of 16 centroids on clustered unit vectors.
    # Measured value recorded in docs/SCALE.md — update both together.
    assert mean_recall >= 0.9, f"recall@{K}={mean_recall:.3f} ({recalls})"
