"""Frontier extensions, part 22 — weighted median via cumulative
weights on the value domain (SURVEY.md §2 B11 continuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "agg_weighted_median",
    oracle=f"""
    WITH vals AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS q,
             sum({sql_cents('l_extendedprice')}) AS w
      FROM lineitem
      GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ),
    cum AS (
      SELECT l_returnflag, q, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY q
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM vals
    )
    SELECT l_returnflag,
           CAST(min(q) AS BIGINT) AS weighted_median_qty
    FROM cum
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted median quantity per return flag: the quantity
    below which half the REVENUE (not half the rows) sits — the
    'typical order size by dollar' that the unweighted percentile
    ([[agg_percentiles]]) misstates whenever big-ticket lines skew
    the money. Classic value-domain construction: collapse to
    (flag, quantity) cells with exact integer-cents weights, one
    cumulative window per flag over the bounded quantity domain, and
    the median is the first value whose cumulative weight crosses
    half the total — an exact integer predicate (2·cw ≥ tw), no
    interpolation, no floats anywhere. Data-sized work is ONE hash
    aggregate; the windows run on ≤ |flags|×|quantities| cells."""
    li = load(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    ).agg(F.sum(cents("l_extendedprice")).alias("w"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = vals.select(
        "l_returnflag",
        "q",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("q").alias("weighted_median_qty"))
    )
