"""Oracle tests for V38-V40 (tf-idf, map/struct/json, math battery)."""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize(
    "name", ["v38_tfidf", "v39_map_struct_json", "v40_math_funcs"]
)
def test_functions_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)
