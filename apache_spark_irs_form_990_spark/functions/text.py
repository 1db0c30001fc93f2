"""Shared text expression kernels (moved from ``operators/dedup.py``
so text_analysis/components/frontier modules stop importing private
names across modules)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_utf8_codes(hh: str = "hh", n: str = "n") -> str:
    """DuckDB expression: the UTF-8 BYTE values of a text column as a
    BIGINT list, parsed pairwise from ``hex(encode(text))`` — the
    byte-exact oracle twin of the kernels' ``np.frombuffer(
    text.encode('utf-8'), uint8)``. The older ``ord(substr(text,i,1))``
    form folds CODE POINTS indexed over chars, which diverges from the
    byte kernels on any multibyte document ('é' -> 233 vs bytes
    195,169) and leaves positions past the char count as ord('')=-1.
    ``hh``/``n`` name columns holding ``hex(encode(text))`` and
    ``octet_length(encode(text))`` in the enclosing scope."""
    hexd = "'0123456789ABCDEF'"
    return (
        f"[CAST(16 * (strpos({hexd}, substr({hh}, 2 * i - 1, 1)) - 1)"
        f" + (strpos({hexd}, substr({hh}, 2 * i, 1)) - 1) AS BIGINT)"
        f" FOR i IN generate_series(1, {n})]"
    )


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
