"""Filter / predicate / projection operators (SURVEY.md §2 B2).

Generalizes the reference's one predicate (``tag == 'CityNm'``,
``/root/reference/CitiesCountJob.py:19``) and one projection
(``text.lower()``, ``:21``) to the full predicate surface. All of these
are plain Catalyst filters, so at scale they push down into the parquet
scan (check ``.explain``: ``PushedFilters: [EqualTo(...), ...]`` and a
pruned ``ReadSchema``) — the scan skips row groups via min/max stats
instead of reading 100 TB and filtering in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import (
    SQL_REVENUE_CENTS,
    cents,
    revenue_cents,
    sql_cents,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "filter_eq",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality predicate (reference A8)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


@register(
    "filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity AS qty
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_discount > 0.05
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicates — parquet row-group skipping via min/max stats."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(10, 20) & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_linenumber", F.col("l_quantity").alias("qty"))
    )


@register(
    "filter_in",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE event_type IN ('click', 'purchase')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "event_type")
    )


@register(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_name LIKE '%green%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern predicate; StartsWith/Contains push down, generic LIKE
    evaluates post-scan but stays inside codegen."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%green%"))
        .select("p_partkey", "p_name")
    )


@register(
    "filter_null",
    oracle="""
    SELECT event_id, props
    FROM events
    WHERE props IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics predicate (reference A15's null-safe intent)."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(
            F.col("props").isNotNull()
            & F.get_json_object("props", "$.k").isNotNull()
        ).select("event_id", "props")
    )


@register(
    "project_compute",
    oracle=f"""
    SELECT l_orderkey,
           l_linenumber,
           CAST({SQL_REVENUE_CENTS} AS DOUBLE) / 10000.0 AS net_price,
           CAST({SQL_REVENUE_CENTS} * (100 + {sql_cents('l_tax')}) AS DOUBLE)
               / 1000000.0 AS charged
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column projection (reference A9 generalized); pure codegen
    arithmetic, no Python in the row path. Integer-cents money math
    (see functions.money) so both engines emit bit-identical doubles."""
    li = load(spark, sf_dir, "lineitem")
    net = revenue_cents()
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (net.cast("double") / 1e4).alias("net_price"),
        ((net * (100 + cents("l_tax"))).cast("double") / 1e6).alias("charged"),
    )
