"""Tests for V41/V42 oracles and the GEMM similarity fast path."""

from __future__ import annotations

import pytest

from flowbyte_spark.catalog import load_table
from flowbyte_spark.operators.similarity import cosine_topk, cosine_topk_gemm
from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize("name", ["v41_session_window", "v42_cube"])
def test_session_cube_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)


def test_gemm_topk_matches_catalyst_topk(spark):
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    exact = cosine_topk(emb, "vec_id", "embedding", 11, k=5).collect()
    fast = cosine_topk_gemm(emb, "vec_id", "embedding", 11, k=5).collect()
    assert [r.id for r in exact] == [r.id for r in fast]
    for a, b in zip(exact, fast):
        assert abs(a.sim - b.sim) <= 1e-4  # ulp-level associativity drift max


def test_gemm_topk_unknown_query_raises(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="not found"):
        cosine_topk_gemm(emb, "vec_id", "embedding", 10**9, k=5)