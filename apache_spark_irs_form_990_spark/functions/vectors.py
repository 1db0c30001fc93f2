"""Shared embedding-vector expression kernels (moved from
``operators/similarity.py`` so dedup/components/mining stop importing
private names across modules).

All dot products run in integer milli-units: float32 summation order
differs between engines (and between Spark partitionings), integer
sums cannot — the oracle-stability rationale documented in
``operators/dedup.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def milli_vec(col) -> Column:
    """array<float> embedding -> array<long> of exact milli-units."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * 1000).cast("long")
    )


def sq_norm(col) -> Column:
    """Exact integer squared norm of an array<long> vector."""
    return F.aggregate(
        F.transform(col, lambda x: x * x),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def dot(a, b) -> Column:
    """Exact integer dot product of two array<long> vectors (Catalyst
    higher-order form — fine for one-off scalar uses; batch scoring
    goes through ``pair_dot_udf``)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a_, x: a_ + x,
    )


def pair_dot_udf():
    """Arrow-batched exact int64 dot for scored candidate pairs (one
    einsum per batch instead of an interpreted per-pair aggregate)."""

    @F.pandas_udf("long")
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        A = np.vstack(a.to_numpy()).astype(np.int64)
        B_ = np.vstack(b.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("nd,nd->n", A, B_))

    return pair_dot


# DuckDB twin of the milli-unit cosine between pair sides a.v / b.v.
SQL_COS_AB = """CAST(list_sum(list_transform(range(1, 65),
                           i -> a.v[i] * b.v[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(a.v, x -> x * x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(b.v, x -> x * x)) AS DOUBLE)))"""


# The zero-norm convention (r7): real corpora contain zero embeddings
# (failed encoder outputs) and near-zero embeddings that QUANTIZE to
# the zero milli-int vector; a cosine against either divides by zero —
# a job-killing SparkArithmeticException under ANSI mode, found by
# tests/test_edge_embeddings.py. Convention: the milli embedding
# corpus excludes zero-norm vectors at construction (they have no
# direction, so no cosine relation is defined for them), identically
# on both engines.
SQL_NONZERO_V = "list_sum(list_transform(v, x -> x * x)) > 0"


def nonzero_milli(df, col: str = "v"):
    """Apply the zero-norm convention to a frame carrying a milli-int
    vector column: keep rows whose quantized squared norm is > 0."""
    return df.filter(sq_norm(F.col(col)) > 0)
