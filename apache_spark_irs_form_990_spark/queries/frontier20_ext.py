"""Frontier extensions, part 20 — running totals with conditional
reset, and MASE seasonal-naive forecast error
(SURVEY.md §2 B11 continuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "win_running_total_reset",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS epoch
      FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(v_cents) OVER (PARTITION BY user_id, COALESCE(epoch, 0)
                 ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0
             AS accum_since_purchase
    FROM ordered
    WHERE event_id % 149 = 0
    """,
)
def win_running_total_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with CONDITIONAL RESET: per-user cumulative event
    value that restarts after every purchase — 'spend accumulated
    since the last conversion', the loyalty/abandonment accumulator
    plain running sums can't express. The trick is an EPOCH key: a
    prior-rows running count of purchases segments each user's
    timeline, and the inner running sum partitions on (user, epoch) —
    two stacked windows on ONE user_id exchange, the composition
    pattern of [[win_sessionize_batch]] with a predicate instead of a
    time gap as the breaker. Exact cents; output key-sampled 1/149."""
    ev = load(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = (
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(wseq.rowsBetween(Window.unboundedPreceding, -1))
    )
    ordered = ev.select(
        "user_id",
        "event_id",
        "ts",
        cents("value").alias("v_cents"),
        F.coalesce(epoch, F.lit(0)).alias("epoch"),
    )
    wacc = (
        Window.partitionBy("user_id", "epoch")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ordered.filter(F.col("event_id") % 149 == 0).select(
        "user_id",
        "event_id",
        (F.sum("v_cents").over(wacc).cast("double") / 100.0).alias(
            "accum_since_purchase"
        ),
    )


@register(
    "ts_mase_seasonal_naive",
    oracle=f"""
    WITH daily AS (
      SELECT row_number() OVER (ORDER BY day) AS t,
             CAST(rev_c AS BIGINT) AS x
      FROM (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum({sql_cents('o_totalprice')}) AS rev_c
        FROM orders GROUP BY 1
      )
    ),
    lagged AS (
      SELECT t, x,
             lag(x, 1) OVER (ORDER BY t) AS x1,
             lag(x, 7) OVER (ORDER BY t) AS x7
      FROM daily
    )
    SELECT CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(abs(x - x7)) AS DOUBLE) / count(*) / 100.0
             AS mae_seasonal_naive,
           CAST(sum(abs(x - x1)) AS DOUBLE) / count(*) / 100.0
             AS mae_naive,
           round(CAST(sum(abs(x - x7)) AS DOUBLE)
                 / CAST(sum(abs(x - x1)) AS BIGINT), 6) AS mase_ratio
    FROM lagged WHERE x7 IS NOT NULL
    """,
)
def ts_mase_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE-style forecast-accuracy baseline: the seasonal-naive
    forecast (same weekday last week, lag 7) scored against the plain
    naive (yesterday, lag 1) on daily revenue — the scale-free error
    ratio every forecasting bake-off reports first, and the bar any
    model ([[ts_brown_double_smoothing]], [[ts_ema_per_user]]) must
    beat before it earns compute. A ratio below 1 confirms the weekly
    cycle the periodogram ([[ts_periodogram_candidates]]) detects.
    Absolute errors are exact integer cents summed exactly; two lags
    ride one calendar-grid sort."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("x"))
        .select(F.row_number().over(Window.orderBy("day")).alias("t"), "x")
    )
    wt = Window.orderBy("t")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(wt).alias("x1"),
        F.lag("x", 7).over(wt).alias("x7"),
    ).filter(F.col("x7").isNotNull())
    mae7 = F.sum(F.abs(F.col("x") - F.col("x7")))
    mae1 = F.sum(F.abs(F.col("x") - F.col("x1")))
    return lagged.agg(
        F.count(F.lit(1)).alias("n_scored"),
        (mae7.cast("double") / F.count(F.lit(1)) / 100.0).alias(
            "mae_seasonal_naive"
        ),
        (mae1.cast("double") / F.count(F.lit(1)) / 100.0).alias("mae_naive"),
        F.round(mae7.cast("double") / mae1, 6).alias("mase_ratio"),
    )
