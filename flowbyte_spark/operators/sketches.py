"""Misra-Gries frequent-items sketch: heavy hitters in one pass with
bounded memory per partition.

Exact `groupBy(item).count()` shuffles EVERY distinct item — at 100 TB
of tokenized text that is a vocabulary-sized exchange dominated by the
long tail nobody asked about.  Misra-Gries keeps at most ``k`` counters
per partition (classic decrement-on-overflow), so the merge shuffles
``<= k * num_partitions`` partial rows regardless of vocabulary size,
and the deterministic guarantees survive the merge (Agarwal et al.,
"Mergeable Summaries", PODS'12):

- UNDERCOUNT ONLY, bounded: ``true - N/k <= est <= true`` for every
  item (each decrement step retires k+1 occurrences, at most N/(k+1)
  steps globally);
- SUPERSET of the heavy hitters: an item absent from partition p's
  summary has ``true_p <= n_p/k``, so an item absent everywhere has
  ``true <= N/k`` — every item with frequency above N/k survives.

Both bounds are CONTRACTS, hash-gated by v136 (the v37/v61 pattern:
the verified output is the bound check, which is deterministic, not the
estimate, which depends on partition layout).

The per-partition pass is an Arrow-batched ``mapInPandas`` (state — one
dict of <= k counters — lives across batches inside one task; this is
the documented place Python is allowed: per-partition imperative state
no Catalyst expression expresses).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def frequent_items(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Merged Misra-Gries summary of ``df[col]``: ``(item, est)`` with
    at most ``k`` counters per input partition before the merge.

    ``est`` sums the per-partition counters — mergeable-summary
    semantics: still undercount-only, still within ``N/k`` of truth,
    still a superset of every item above ``N/k`` frequency.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all: retires k+1 distinct occurrences
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "cnt": list(counters.values())}
        )

    partials = df.select(F.col(col).alias(col)).mapInPandas(
        mg, schema="item string, cnt long"
    )
    return partials.groupBy("item").agg(F.sum("cnt").alias("est"))
