"""Shared helpers for oracle-stable, codegen-fast numeric output.

Money columns in the testdata (`l_extendedprice`, `l_discount`, ...)
are doubles holding exact 2-decimal values. Naive ``round(sum(x), 2)``
is NOT oracle-stable: the engines sum in different orders and round
half-way cases differently (Spark HALF_UP on the binary value, DuckDB
scaled-multiply), so hashes diverge on boundary values.

The stable convention — **integer cents**: snap each value to an exact
``BIGINT`` of scaled units (``round(x*100)`` of a near-integer double is
deterministic in both engines), aggregate integers (exact and
order-independent under any partition/merge order), and divide once at
the end (IEEE division of exact integers is correctly rounded, hence
identical in both engines). Benchmarks at sf0.1: long-cents sums run at
double-sum speed (~1.8x faster than DECIMAL sums, which leave
whole-stage codegen's primitive path).

Overflow headroom: sum of price-cents(~1e7) x (100 - disc-cents) per
row is ~1e9; at ~6e9 lineitem rows (SF ~1000, the 100 TB posture) the
accumulated long stays ~1e18 < 2^63. For wider data, bump to
``decimal(38,4)`` sums.

Every helper has a SQL twin so the DuckDB oracle strings stay in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cents(col: str | Column, scale: int = 2) -> Column:
    """Exact integer representation of a `scale`-decimal double."""
    return F.round(_c(col) * (10**scale)).cast("long")


def sql_cents(col: str, scale: int = 2) -> str:
    return f"CAST(round({col} * {10**scale}) AS BIGINT)"


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent exact sum of a `scale`-decimal double, as double."""
    return (F.sum(cents(col, scale)).cast("double") / float(10**scale)).alias(alias)


def sql_dsum(col: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(sum({sql_cents(col, scale)}) AS DOUBLE) / {float(10 ** scale)} AS {alias}"
    )


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact-sum / count as double — order-independent mean."""
    return (
        F.sum(cents(col, scale)).cast("double") / float(10**scale) / F.count(F.lit(1))
    ).alias(alias)


def sql_davg(col: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(sum({sql_cents(col, scale)}) AS DOUBLE) / {float(10 ** scale)}"
        f" / count(*) AS {alias}"
    )


# Revenue expression: l_extendedprice * (1 - l_discount) in exact 1e-4
# units. price_cents * (100 - disc_cents) is an exact integer; one final
# division recovers the monetary value.
def revenue_cents() -> Column:
    return cents("l_extendedprice") * (100 - cents("l_discount"))


SQL_REVENUE_CENTS = (
    f"{sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')})"
)


def revenue_sum(alias: str) -> Column:
    return (F.sum(revenue_cents()).cast("double") / 1e4).alias(alias)


def sql_revenue_sum(alias: str) -> str:
    return f"CAST(sum({SQL_REVENUE_CENTS}) AS DOUBLE) / 10000.0 AS {alias}"
