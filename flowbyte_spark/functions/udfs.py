"""Vectorized UDF tier (SURVEY.md §2.10).

The engine's rule: built-in Catalyst expressions first (everything in
functions/ and operators/ obeys it); when Python is genuinely required,
Arrow-batched ``pandas_udf`` — never row-at-a-time ``F.udf`` in a hot
path (~10-100x slower: per-row pickling vs columnar Arrow transfer).

These are reference implementations of that tier, used by tests to prove
the pandas path produces bit-compatible results with the Catalyst path —
so pipelines can drop to Python for custom math (tokenizers, model
scoring) without changing semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


@F.pandas_udf(DoubleType())
def cosine_sim_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity over two array<float> columns.

    Arrow hands each batch as Series-of-ndarray; stacking them gives one
    (batch, dim) matrix op per batch — NumPy BLAS instead of per-row
    Python.  Semantics match functions.cosine_similarity (double
    accumulation).
    """
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(dots / norms)


@F.pandas_udf(LongType())
def token_count_pandas(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized via pandas str ops."""
    return text.str.split(" ").str.len().astype("int64")


def grouped_mean_embedding(df, group_col: str, vec_col: str):
    """Per-group mean embedding via applyInPandas (grouped-map UDF shape):
    the standard pattern for custom per-group math that Catalyst
    aggregates cannot express.  One shuffle on the group key; each group
    is a pandas DataFrame in executor memory."""
    dim_probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = dim_probe["d"] if dim_probe else 0

    def mean_vec(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "mean_embedding": [mat.mean(axis=0).tolist()],
                "n": [len(pdf)],
            }
        )

    out_schema = (
        f"{group_col} {df.schema[group_col].dataType.simpleString()}, "
        f"mean_embedding array<double>, n bigint"
    )
    _ = dim  # dim retained for schema documentation/debugging
    return df.groupBy(group_col).applyInPandas(mean_vec, out_schema)
