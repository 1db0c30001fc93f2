"""Frontier extensions, part 18 — F1-optimal threshold sweep, linear
weighted moving average, and dynamic partition overwrite
(SURVEY.md §2 B11 continuation).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "ml_f1_threshold_sweep",
    oracle="""
    WITH vals AS (
      SELECT n_chars AS v, count(*) AS cnt,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
      FROM documents GROUP BY n_chars
    ),
    sweep AS (
      SELECT v AS threshold,
             CAST(sum(pos) OVER (ORDER BY v DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
             CAST(sum(cnt - pos) OVER (ORDER BY v DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp,
             CAST(sum(pos) OVER () - sum(pos) OVER (ORDER BY v DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fn
      FROM vals
    )
    SELECT threshold, tp, fp, fn,
           round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 9) AS f1
    FROM sweep
    ORDER BY f1 DESC, threshold
    LIMIT 1
    """,
)
def ml_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-optimal decision threshold for `n_chars` classifying
    `lang='en'` ('predict positive when score ≥ t'): every distinct
    score is a candidate cut, TP/FP/FN come from running sums over
    the VALUE DOMAIN in descending score order, and the best F1 wins
    (tiebreak to the lower threshold). Completes the classifier-eval
    suite — ranking quality ([[ml_roc_auc]], [[ml_average_precision]],
    [[ml_gain_deciles]]) plus the operating POINT this query picks.
    F1 = 2TP/(2TP+FP+FN) is exact integers until one division,
    rounded to 9 for the argmax ordering."""
    docs = load(spark, sf_dir, "documents")
    vals = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
    )
    wcum = Window.orderBy(F.desc("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sweep = vals.select(
        F.col("v").alias("threshold"),
        F.sum("pos").over(wcum).alias("tp"),
        F.sum(F.col("cnt") - F.col("pos")).over(wcum).alias("fp"),
        (F.sum("pos").over(wall) - F.sum("pos").over(wcum)).alias("fn"),
    )
    f1 = F.round(
        (2 * F.col("tp")).cast("double")
        / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
        9,
    )
    return (
        sweep.select("threshold", "tp", "fp", "fn", f1.alias("f1"))
        .orderBy(F.desc("f1"), "threshold")
        .limit(1)
    )


@register(
    "win_weighted_moving_avg",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum({sql_cents('o_totalprice')}) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    framed AS (
      SELECT day, rev_c,
             list(rev_c) OVER (ORDER BY day
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
               AS frame,
             row_number() OVER (ORDER BY day) AS rn
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
           CAST(list_reduce([CAST(0 AS BIGINT)] ||
                  [frame[i] * i FOR i IN generate_series(1, 5)],
                  (a, b) -> a + b) AS DOUBLE) / 15.0 / 100.0 AS wma5
    FROM framed WHERE rn >= 5
    """,
)
def win_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted 5-day moving average (weights 1..5, newest
    heaviest — the WMA that reacts faster than the flat SMA of
    [[win_moving_avg]]/[[win_bollinger_bands]]): the window frame is
    collected as an ORDERED array (frame order = window order, both
    engines), the weighted sum folds exact integer cents against the
    integer weight ramp, and Σw = 15 divides once at the end — no
    per-row double accumulates. Full 5-day frames only. Frame-array
    collection is the house pattern of [[win_rolling_median]]."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(cents("o_totalprice")).alias("rev_c")
    )
    wday = Window.orderBy("day")
    framed = daily.select(
        "day",
        "rev_c",
        F.collect_list("rev_c").over(wday.rowsBetween(-4, 0)).alias("frame"),
        F.row_number().over(wday).alias("rn"),
    ).filter(F.col("rn") >= 5)
    wsum = F.aggregate(
        F.zip_with(
            F.col("frame"),
            F.sequence(F.lit(1), F.lit(5)).cast("array<bigint>"),
            lambda x, w: x * w,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return framed.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
        (wsum.cast("double") / 15.0 / 100.0).alias("wma5"),
    )


@register(
    "sink_dynamic_partition_overwrite",
    oracle="""
    SELECT event_type,
           CAST(CASE WHEN event_type = 'purchase'
                     THEN count(*) * 2 ELSE count(*) END AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def sink_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC partition overwrite: rewriting ONE partition of a
    hive-partitioned table replaces only that partition — the backfill
    primitive ('re-run yesterday') that static overwrite mode would
    turn into truncate-everything. The fixture writes events
    partitioned by type, overwrites just the `purchase` partition with
    a doubled copy, and re-aggregates: purchase counts double, every
    other partition is untouched — which is exactly what the oracle
    encodes, so a mode regression (full truncate) fails the hash
    immediately. `partitionOverwriteMode=dynamic` is set per-write,
    not session-wide."""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    dest = os.path.join(
        tempfile.gettempdir(), f"spark990_dynpart_{sf_tag}_{os.getpid()}"
    )
    e.write.mode("overwrite").partitionBy("event_type").parquet(dest)
    doubled = (
        e.filter(F.col("event_type") == "purchase")
        .union(e.filter(F.col("event_type") == "purchase"))
    )
    (
        doubled.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(dest)
    )
    back = spark.read.parquet(dest)
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
