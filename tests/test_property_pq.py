"""Property-based check: the Catalyst PQ kernels (encode + ADC ranking)
against an independent numpy reference on random corpora.

The v87 oracle pins one fixture; hypothesis here drives random vector
sets (including ties and duplicate vectors) through pq_codebooks /
pq_encode / pq_adc_topk and recomputes codes and quantized ADC sums
with plain numpy — catching slice off-by-ones, tie-break drift, and
quantization mismatches the fixed fixture can miss.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flowbyte_spark.operators.similarity import (
    PQ_QUANTUM,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)

pytestmark = pytest.mark.filterwarnings("ignore")

DIM, M, CODES = 8, 4, 4  # ds = 2
SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small integer-valued vectors: quantized distances collide constantly,
# so the lowest-code tie-break is exercised on almost every run
vec = st.lists(
    st.integers(min_value=0, max_value=3), min_size=DIM, max_size=DIM
)
corpus_strategy = st.lists(vec, min_size=CODES + 2, max_size=14)
# NULL-embedding rows interleaved at odd ids (round-16: the r15
# pandas-tier NULL audit's generator mandate) — they must be invisible
# to codebook selection, encoding, and the ADC ranking alike.
null_slots_strategy = st.lists(
    st.integers(min_value=0, max_value=15), max_size=3, unique=True
)


def _ref_codes(vecs: np.ndarray) -> np.ndarray:
    """codes[i, j] = argmin_c quantized ||sub_j(v_i) - sub_j(cb_c)||²,
    ties to the lowest code; codebook = rank-coded lowest-id vectors."""
    cb = vecs[:CODES]
    ds = DIM // M
    out = np.zeros((len(vecs), M), dtype=int)
    for i, v in enumerate(vecs):
        for j in range(M):
            best, best_c = None, None
            for c in range(CODES):
                d = v[j * ds : (j + 1) * ds] - cb[c, j * ds : (j + 1) * ds]
                dq = math.floor(float((d * d).sum()) * PQ_QUANTUM + 0.5)
                if best is None or dq < best:
                    best, best_c = dq, c
            out[i, j] = best_c
    return out


@given(corpus_strategy, null_slots_strategy)
@SETTINGS
def test_pq_encode_and_adc_match_numpy(spark, corpus, null_slots):
    vecs = np.array(corpus, dtype=float)
    # real vectors at even ids 2*i (id order == corpus order, so the
    # lowest-id codebook is still corpus[:CODES]); NULL rows at odd ids
    # interleave among them and must change nothing.
    rows = [(2 * i, [float(x) for x in v]) for i, v in enumerate(corpus)]
    rows += [(2 * s + 1, None) for s in null_slots]
    df = spark.createDataFrame(rows, "vec_id INT, emb ARRAY<DOUBLE>")
    cb = pq_codebooks(df, "vec_id", "emb", CODES)
    encoded = pq_encode(df, "vec_id", "emb", cb, m=M, dim=DIM).collect()
    got_codes = {(r.id, r.j): r.code for r in encoded}
    # NULL rows have no code — absent, not code-0 (the conflation class)
    assert {r.id for r in encoded} == {2 * i for i in range(len(corpus))}
    want = _ref_codes(vecs)
    for i in range(len(corpus)):
        for j in range(M):
            assert got_codes[(2 * i, j)] == want[i, j], (i, j, corpus)

    # ADC ranking vs reference for query 0
    ds = DIM // M
    qv = vecs[0]
    table = np.zeros((M, CODES), dtype=int)
    for j in range(M):
        for c in range(CODES):
            d = qv[j * ds : (j + 1) * ds] - vecs[c, j * ds : (j + 1) * ds]
            table[j, c] = math.floor(float((d * d).sum()) * PQ_QUANTUM + 0.5)
    ref = sorted(
        (sum(table[j, want[i, j]] for j in range(M)) / PQ_QUANTUM, 2 * i)
        for i in range(len(corpus))
        if i != 0
    )
    got = [
        (r.adist, r.id)
        for r in pq_adc_topk(
            df, "vec_id", "emb", 0, k=len(corpus), m=M, dim=DIM, codes=CODES
        ).collect()
    ]
    assert got == ref[: len(got)], corpus
