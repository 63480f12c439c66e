"""Oracle-differential tests for the LLM-data queries (V19-V31)."""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_query_matches

LLM = [
    "v19_dedup_exact",
    "v20_cosine_topk",
    "v21_dedup_content_hash",
    "v22_minhash_lsh",
    "v23_jaccard_pairs",
    "v24_simhash",
    "v25_ann_ivf",
    "v26_embedding_neardup",
    "v27_text_quality",
    "v28_lang_id",
    "v29_token_count",
    "v30_fingerprint",
    "v31_multimodal_features",
    "v68_pii_scrub",
    "v69_decontaminate",
    "v70_semantic_dedup",
    "v71_dsir_importance",
    "v74_domain_cap",
]


@pytest.mark.parametrize("name", LLM)
def test_llm_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)
