"""Data-layout sinks: partitioned and bucketed writes (SURVEY.md §4.2
"100 TB posture").

The reference writes flat managed tables (IRSSpark.py:183-188). At
100 TB, layout IS the optimization: directory partitioning turns
selective scans into partition pruning (read 1/N of the data before a
single row is decoded), and bucketing pre-shuffles fact tables on
their join key so repeated joins run with ZERO exchanges. Both are
write-time declarations — Catalyst exploits them automatically at read
time, which is exactly the Spark-first posture: declare layout, let
the planner use it.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.queries._helpers import revenue_sum, sql_revenue_sum
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


@register(
    "sink_partitioned_prune",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           count(*) AS n_purchases,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-pruned read.

    events is written ``partitionBy(event_type)``; the read-back filter
    on event_type resolves at PLANNING time against the directory
    listing (PartitionFilters in the scan, asserted in
    tests/test_plans.py) — the other partitions' files are never
    opened. At 100 TB this is the difference between scanning 20 TB and
    scanning 4 TB for the same query. Partition column choice follows
    the cardinality rule: low-cardinality (5 event types), high-skew
    columns partition; high-cardinality keys bucket instead.
    """
    out = os.path.join(tempfile.gettempdir(), f"spark990_part_events_{_sf_tag(sf_dir)}")
    load(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    e = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return (
        e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@register(
    "sink_bucketed_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           {sql_revenue_sum('revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed write + exchange-free sort-merge join.

    lineitem and orders are written ``bucketBy(8, orderkey)`` +
    ``sortBy(orderkey)`` as external tables; the subsequent join reads
    both bucket layouts and runs a sort-merge join with NO Exchange on
    either side (asserted in tests/test_plans.py) — the shuffle was
    paid once at write time and is amortized over every future join on
    that key. This is the layout for fact-fact joins at 100 TB, where a
    per-query lineitem shuffle is the single largest cost in the plan.
    The merge hint pins SMJ so the demo stays exchange-free even where
    AQE would broadcast the small side at test scale.
    """
    tag = _sf_tag(sf_dir)
    base = os.path.join(tempfile.gettempdir(), f"spark990_bucketed_{tag}")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        tbl = f"{name}_bkt_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load(spark, sf_dir, name)
            .write.mode("overwrite")
            .option("path", os.path.join(base, name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    li = spark.table(f"lineitem_bkt_{tag}")
    o = spark.table(f"orders_bkt_{tag}")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), revenue_sum("revenue"))
    )


@register(
    "scan_merge_schema",
    oracle="""
    SELECT n_nationkey,
           n_name,
           CASE WHEN n_nationkey < 13 THEN NULL
                ELSE n_regionkey END AS n_regionkey
    FROM nation
    """,
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet files written with
    DIFFERENT schemas (an old extract without n_regionkey, a new one
    with it) read back as ONE table via mergeSchema — missing columns
    null-fill. This is how a 100 TB lake absorbs schema change without
    rewriting history; the footer-merge cost is why it's opt-in, so
    pin the merged schema explicitly on hot paths."""
    n = load(spark, sf_dir, "nation")
    root = os.path.join(tempfile.gettempdir(), f"spark990_evolve_{_sf_tag(sf_dir)}")
    old = n.filter(F.col("n_nationkey") < 13).select("n_nationkey", "n_name")
    new = n.filter(F.col("n_nationkey") >= 13).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    old.write.mode("overwrite").parquet(os.path.join(root, "v=1"))
    new.write.mode("overwrite").parquet(os.path.join(root, "v=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(root, "v=1"), os.path.join(root, "v=2"))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "scan_dynamic_partition_prune",
    oracle="""
    SELECT e.event_type,
           count(*) AS n,
           count(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN (SELECT DISTINCT event_type FROM events
          WHERE event_type IN ('purchase', 'signup')) d
      ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
)
def scan_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP): the fact side is partitioned on
    event_type; the pruning predicate arrives only through a JOIN with
    a filtered dimension, so no static filter exists at planning time —
    Catalyst inserts a dynamicpruning subquery that runs the dim side
    first and prunes fact partitions at RUNTIME (asserted in
    tests/test_plans.py). At 100 TB this is how 'join to this month's
    dim rows' reads one partition instead of the whole fact table.
    """
    out = os.path.join(
        tempfile.gettempdir(), f"spark990_dpp_events_{_sf_tag(sf_dir)}"
    )
    ev = load(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .select("event_type")
        .distinct()
    )
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
