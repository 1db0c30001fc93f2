"""Shared text expression kernels (moved from ``operators/dedup.py``
so text_analysis/components/frontier modules stop importing private
names across modules)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles of a text column as an array, via one
    JVM-side transform over the token array (no Python). Guarded:
    sequence(0, k-1) with k<=0 would generate a DESCENDING sequence,
    not an empty one."""
    toks = F.split(col, " ")
    k = F.size(toks) - (n - 1)
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
