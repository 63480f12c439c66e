"""Oracle differentials for the round-9 multi-table join trees and the
stream-static join."""

from __future__ import annotations

import pytest

from tests.oracle_util import assert_query_matches


@pytest.mark.parametrize(
    "name",
    [
        "v109_q7_volume_shipping",
        "v110_q8_market_share",
        "v111_stream_static_join",
    ],
)
def test_round9_query_matches_oracle(spark, sf_dir, name):
    assert_query_matches(spark, name, sf_dir)
