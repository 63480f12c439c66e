"""Byte-pair-encoding tokenizer: bounded driver-side training, Arrow-
batched distributed application (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the tokenizer family GPT
/ Llama vocabularies descend from).

Why it exists here: the charter's token-counting tier (`operators/
text.py:token_count`, v29) approximates with whitespace + a BPE-ish
regex; budget packing (v54) and temperature mixing consume those counts.
A REAL learned-merge tokenizer is what production pipelines budget with,
and its two halves map exactly onto the engine's two execution tiers:

- **train** is a classic frequency-table loop over a BOUNDED sample —
  driver-side numpy/dict work like the IVF/PQ codebooks (a few thousand
  word types regardless of corpus size), deterministic: merge ties break
  on the lexicographically smallest pair, so the learned vocabulary is a
  pure function of the sample;
- **apply** is embarrassingly parallel per document — an Arrow-batched
  ``mapInPandas`` stage with per-batch WORD-LEVEL memoization (each
  distinct word is segmented once per batch, the standard trick that
  makes Python BPE practical: fixture corpora repeat words constantly).

Scale shape: the merge list (≤vocab_size entries) broadcasts via task
closure; application is map-only (no shuffle); training reads
``sample_docs`` documents once.  Differential gate: the distributed
apply must equal the sequential reference in tests/test_bpe.py.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

END = "</w>"  # end-of-word marker (the original BPE formulation)


def _word_freqs(texts: list[str]) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        if t:
            freqs.update(t.split())
    return freqs


def train_bpe(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_merges: int = 200,
    sample_docs: int = 2000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a bounded, deterministic
    sample: the ``sample_docs`` LOWEST-``id_col`` rows.  ``id_col`` is
    required — ``limit()`` without an order takes whichever partitions
    finish first, which would silently break the pure-function-of-the-
    sample determinism contract (round-6 review finding).

    Classic algorithm: words split to characters + ``</w>``; repeatedly
    merge the most frequent adjacent symbol pair (ties: lexicographically
    smallest pair — deterministic).  Returns the ordered merge list.
    """
    src = df.select(
        F.col(id_col), F.col(text_col).alias("__bpe_text")
    ).orderBy(id_col)
    texts = [r["__bpe_text"] for r in src.limit(sample_docs).collect()]
    freqs = _word_freqs(texts)
    # word type -> current symbol tuple
    words: dict[tuple, int] = {
        tuple(w) + (END,): c for w, c in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pair_counts[(sym[i], sym[i + 1])] += c
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        best = min(p for p, n in pair_counts.items() if n == best_n)
        if best_n < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple, int] = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    LOWEST-RANK (earliest-learned) adjacent pair — the canonical BPE
    apply order, identical to training order."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


TOKENS_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bpe_tokens", LongType()),
        StructField("tokens", ArrayType(StringType())),
    ]
)


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    keep_tokens: bool = False,
) -> DataFrame:
    """``(id, n_bpe_tokens[, tokens])`` via Arrow-batched mapInPandas.

    Per-batch word-level memoization: each distinct word is segmented
    once per batch.  Map-only — no shuffle; the merge table rides the
    task closure (≤num_merges pairs).
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            ids, counts, toks = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                out: list[str] = []
                for w in (t or "").split():
                    seg = cache.get(w)
                    if seg is None:
                        seg = segment_word(w, ranks)
                        cache[w] = seg
                    out.extend(seg)
                ids.append(i)
                counts.append(len(out))
                toks.append(out if keep_tokens else [])
            yield pd.DataFrame(
                {"id": ids, "n_bpe_tokens": counts, "tokens": toks}
            ).astype({"id": "int64", "n_bpe_tokens": "int64"})

    src = df.select(F.col(id_col), F.col(text_col))
    out = src.mapInPandas(run, TOKENS_SCHEMA)
    return out if keep_tokens else out.select("id", "n_bpe_tokens")
