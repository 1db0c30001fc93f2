"""Scan operators (SURVEY.md §2 B1): full scans and pruned scans.

The point at 100 TB is what the scan does NOT read: `scan_projection`
must show a 2-column ReadSchema in `.explain` (column pruning into the
parquet footer) and pushed filters (row-group skipping on min/max
stats). Catalyst does both automatically because the query is
declarative — the reference, reading whole XML files per URI, had no
pruning anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register("scan_parquet", oracle="SELECT * FROM supplier")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table parquet scan (reference A1/A13 read side)."""
    return load(spark, sf_dir, "supplier")


@register(
    "scan_projection",
    oracle="""
    SELECT l_orderkey, l_shipdate_yr FROM (
      SELECT l_orderkey, CAST(year(l_shipdate) AS INT) AS l_shipdate_yr
      FROM lineitem
      WHERE l_returnflag = 'R'
    )
    """,
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned scan: 3 of 11 columns read, equality filter pushed to the
    parquet reader. `.explain` shows ReadSchema with only
    l_orderkey/l_shipdate/l_returnflag and PushedFilters on
    l_returnflag."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            F.year("l_shipdate").cast("int").alias("l_shipdate_yr"),
        )
    )
