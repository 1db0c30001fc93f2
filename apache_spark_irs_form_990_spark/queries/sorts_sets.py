"""Sorts, limits, top-k and set operations (SURVEY.md §2 B6 — EXT;
the reference's README sample table is unordered, ``README.md:46-58``).

Scale notes:
- global `orderBy` is a range-partitioned sort (sampling pass + shuffle)
  — fine for reports, but `topk_limit` uses orderBy+limit which Spark
  collapses into TakeOrderedAndProject: each partition keeps k rows,
  the driver merges P*k rows, no global sort ever materializes.
- set ops are hash shuffles on the full row; `exceptAll`/`intersect`
  plan as aggregates/joins under the hood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import global_order
from apache_spark_irs_form_990_spark.functions.money import revenue_sum, sql_revenue_sum
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "sort_report",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {sql_revenue_sum('revenue')}
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY revenue DESC, l_returnflag, l_linestatus
    """,
)
def sort_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ordered report (what the reference's README sample
    implies but never implements): full tiebreak so row order is
    reproducible. (The driver hashes order-insensitively; the ordering
    is the capability under test.)"""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(revenue_sum("revenue"))
        .orderBy(F.col("revenue").desc(), "l_returnflag", "l_linestatus")
    )


@register(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit -> TakeOrderedAndProject (per-partition
    heap of k, driver merge of P*k) — never a full sort, which is why it
    scales to any row count."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "set_union_all",
    oracle="""
    SELECT custkey, kind FROM (
      SELECT o_custkey AS custkey, 'order' AS kind FROM orders
      WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT c_custkey AS custkey, 'cust' AS kind FROM customer
    )
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union via unionByName (no dedup, no shuffle — just
    partition concatenation)."""
    a = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"), F.lit("order").alias("kind"))
    )
    b = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.lit("cust").alias("kind")
    )
    return a.unionByName(b)


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (customers having both F and O orders)."""
    o = load(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f_cust.intersect(o_cust)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (customers that never ordered) — the set-op twin
    of join_anti."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)


@register(
    "dedup_distinct",
    oracle="""
    SELECT DISTINCT l_suppkey, l_returnflag
    FROM lineitem
    """,
)
def dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact projection dedup — hash aggregate on the row value; the
    partial phase dedups map-side so the shuffle carries unique rows
    only (north-star `dedup` seed, generalized in operators/dedup.py)."""
    return load(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag").distinct()


@register(
    "sort_multi_null_order",
    oracle="""
    SELECT c_custkey, bal,
           CAST(row_number() OVER (
             ORDER BY bal DESC NULLS FIRST, c_custkey
           ) AS BIGINT) AS rk
    FROM (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    """,
)
def sort_multi_null_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null-ordering semantics: DESC with NULLS FIRST (the
    non-default pairing in both engines — Spark's desc defaults nulls
    LAST, so `desc_nulls_first` must be said out loud). The rank is
    materialized as a column so the driver's order-insensitive hash
    still verifies the ORDER — a sort query is only checkable if its
    order is data. Nulls injected deterministically (custkey%10). The
    global rank comes from `global_order` (range-partition +
    per-partition rank + broadcast offsets) rather than a single-task
    unpartitioned window — range partitioning honors the same
    desc_nulls_first key, so null-ordering semantics survive the
    distributed form exactly."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return global_order(
        c, [F.col("bal").desc_nulls_first(), "c_custkey"], rn_col="rk"
    ).select("c_custkey", "bal", F.col("rk").cast("long").alias("rk"))
