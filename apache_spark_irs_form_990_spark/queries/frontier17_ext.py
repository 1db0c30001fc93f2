"""Frontier extensions, part 17 — single change-point detection by
binary segmentation, tail expected shortfall (CVaR), and a
two-sample Poisson rate test (SURVEY.md §2 B11 continuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "ts_changepoint_single",
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
    pre AS (
      SELECT t, x,
             CAST(sum(x) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS ps,
             CAST(sum(x) OVER () AS BIGINT) AS total,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    scored AS (
      SELECT t AS split_t, n,
             round(CAST(ps AS DOUBLE) * ps / t
                   + CAST(total - ps AS DOUBLE) * (total - ps) / (n - t)
                   - CAST(total AS DOUBLE) * total / n, 4) AS sse_reduction
      FROM pre WHERE t < n
    )
    SELECT split_t, n AS n_days, sse_reduction
    FROM scored
    ORDER BY sse_reduction DESC, split_t
    LIMIT 1
    """,
)
def ts_changepoint_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection over daily revenue by binary
    segmentation: the split t maximizing the between-segment sum-of-
    squares reduction S₁²/t + S₂²/(n−t) − S²/n (the variance identity
    — within-SSE minimization needs only PREFIX SUMS of x, the x²
    terms cancel). One ordered prefix-sum window over the calendar
    grid scores every candidate split in closed form from exact
    integer cents; the argmax carries a split_t tiebreak. This is one
    round of the binary-segmentation recursion — production reruns it
    on each side until the reduction drops below a threshold —
    and the offline complement of the sequential [[ts_cusum_change]]
    detector."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("x"))
        .select(
            F.row_number().over(Window.orderBy("day")).alias("t"), "x"
        )
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = daily.select(
        "t",
        F.sum("x")
        .over(Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0))
        .alias("ps"),
        F.sum("x").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    ps, total, n, t = (
        F.col("ps").cast("double"),
        F.col("total").cast("double"),
        F.col("n"),
        F.col("t"),
    )
    reduction = F.round(
        ps * F.col("ps") / t
        + (total - ps) * (F.col("total") - F.col("ps")) / (n - t)
        - total * F.col("total") / n,
        4,
    )
    return (
        pre.filter(t < n)
        .select(
            F.col("t").alias("split_t"),
            F.col("n").alias("n_days"),
            reduction.alias("sse_reduction"),
        )
        .orderBy(F.desc("sse_reduction"), "split_t")
        .limit(1)
    )


@register(
    "agg_cvar_tail_mean",
    oracle=f"""
    WITH thr AS (
      SELECT quantile_cont(o_totalprice, 0.95) AS p95 FROM orders
    )
    SELECT round(thr.p95, 6) AS p95,
           count(*) AS n_tail,
           CAST(sum({sql_cents('o_totalprice')}) AS DOUBLE) / 100.0
             / count(*) AS cvar_95
    FROM orders, thr
    WHERE o_totalprice > thr.p95
    GROUP BY thr.p95
    """,
)
def agg_cvar_tail_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected shortfall (CVaR₉₅): the mean of order values beyond
    the 95th percentile — the tail-risk number that answers 'when it
    is bad, HOW bad', where the percentile alone ([[agg_percentiles]])
    only says where bad begins. Two-pass by construction: exact
    percentile, then the 1-row threshold broadcasts into a
    conditional exact-cents mean — the aggregate-then-rejoin shape of
    [[beh_power_users]]. At 100 TB the threshold pass swaps to
    `approx_percentile` (SCALE.md §7)."""
    o = load(spark, sf_dir, "orders")
    thr = o.agg(F.expr("percentile(o_totalprice, 0.95)").alias("p95"))
    tail = o.crossJoin(F.broadcast(thr)).filter(
        F.col("o_totalprice") > F.col("p95")
    )
    return tail.groupBy("p95").agg(
        F.count(F.lit(1)).alias("n_tail"),
        (
            F.sum(cents("o_totalprice")).cast("double") / 100.0
            / F.count(F.lit(1))
        ).alias("cvar_95"),
    ).select(
        F.round("p95", 6).alias("p95"), "n_tail", "cvar_95"
    )


@register(
    "stats_poisson_two_rate",
    oracle="""
    WITH counts AS (
      SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k1,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k2,
             CAST(count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
                  AS BIGINT) AS n_days
      FROM events
    )
    SELECT k1, k2, n_days,
           round(CAST(k1 AS DOUBLE) / n_days, 6) AS rate1_per_day,
           round(CAST(k2 AS DOUBLE) / n_days, 6) AS rate2_per_day,
           round((CAST(k1 AS DOUBLE) - k2)
                 / sqrt(CAST(k1 AS DOUBLE) + k2), 6) AS z_rate_diff
    FROM counts
    """,
)
def stats_poisson_two_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate comparison (clicks vs purchases over the
    same observation window): the conditional test statistic
    z = (k₁−k₂)/√(k₁+k₂) — equal exposure makes the rate difference a
    pure count contrast, the incident-rate companion to the
    proportion z-test ([[beh_ab_test_z]]). One aggregate pass; counts
    and the day-domain exposure are exact integers, the statistic one
    closed-form expression."""
    e = load(spark, sf_dir, "events")
    counts = e.agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "k1"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k2"),
        F.count_distinct(F.to_date("ts")).alias("n_days"),
    )
    k1, k2 = F.col("k1").cast("double"), F.col("k2")
    return counts.select(
        "k1",
        "k2",
        "n_days",
        F.round(k1 / F.col("n_days"), 6).alias("rate1_per_day"),
        F.round(F.col("k2").cast("double") / F.col("n_days"), 6).alias(
            "rate2_per_day"
        ),
        F.round((k1 - k2) / F.sqrt(k1 + k2), 6).alias("z_rate_diff"),
    )
