"""Temporal analytics — tie-aware ranking, linear interpolation,
cohort LTV curves, survivorship dedup, Pareto concentration and
week-over-week seasonally-aligned comparison (SURVEY.md §2 B11
continuation).

All EXT relative to the reference. Conventions as the sibling modules:
exact integer state under every window/aggregate, single-division
ratios, full-column tiebreaks, aggregate-then-window so unpartitioned
windows only ever see collapsed report-size inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import (
    SQL_REVENUE_CENTS,
    cents,
    revenue_cents,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "win_rank_dense_ties",
    oracle="""
    WITH daily AS (
      SELECT strftime(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)),
                      '%Y-%m') AS month,
             CAST(o_orderdate AS VARCHAR) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT month, day, n,
           CAST(rank() OVER (PARTITION BY month ORDER BY n DESC) AS BIGINT)
             AS rnk,
           CAST(dense_rank() OVER (PARTITION BY month ORDER BY n DESC)
                AS BIGINT) AS drnk
    FROM daily
    """,
)
def win_rank_dense_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rank` vs `dense_rank` over a genuinely tie-bearing ordering
    (daily order counts within a month — many days share a count):
    rank leaves gaps after ties, dense_rank does not, and both assign
    identical values to all tied rows, so NO tiebreak column is needed
    for determinism — unlike row_number, which is why every other
    ranking query here tiebreaks explicitly. The window runs on the
    per-day aggregate (≤31 rows per month partition), not on orders."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        ),
        F.col("o_orderdate").cast("string").alias("day"),
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("month").orderBy(F.col("n").desc())
    return daily.select(
        "month",
        "day",
        "n",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
    )


@register(
    "ts_interpolate_linear",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                           AS DATE) AS day
      FROM bounds
    ),
    joined AS (
      SELECT s.user_id, s.day,
             CAST(date_diff('day', DATE '1970-01-01', s.day) AS BIGINT) AS d,
             dl.v
      FROM spine s LEFT JOIN daily dl
        ON s.user_id = dl.user_id AND s.day = dl.day
    ),
    filled AS (
      SELECT user_id, day, d, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM joined
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE) / 100.0
                ELSE (CAST(pv AS DOUBLE)
                      + CAST((nv - pv) * (d - pd) AS DOUBLE) / (nd - pd))
                     / 100.0 END AS value_filled,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS interpolated
    FROM filled
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across calendar gaps: each user's daily
    value series is densified to a full spine (as `ts_resample_daily`)
    and missing days take the straight line between the surrounding
    observed days — the step up from LOCF (`win_forward_fill`) when
    the series is a level, not an event count. Four ignore-nulls
    windows (prev/next value and their day numbers) share ONE
    (user, day) sort; the interpolated value is
    `pv + (nv−pv)·(d−pd)/(nd−pd)` — exact integer cents and day
    deltas, one multiply, one divide, bit-identical. Interior gaps
    always have both neighbors because the spine spans min..max of
    observed days."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(cents("value")).cast("long").alias("v"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
    )
    joined = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.datediff("day", F.lit("1970-01-01").cast("date")).cast("long").alias("d"),
        "v",
    )
    order = Window.partitionBy("user_id").orderBy("d")
    back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    observed_d = F.when(F.col("v").isNotNull(), F.col("d"))
    filled = joined.select(
        "user_id",
        "day",
        "d",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(observed_d, ignorenulls=True).over(back).alias("pd"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(observed_d, ignorenulls=True).over(fwd).alias("nd"),
    )
    interp = (
        F.col("pv").cast("double")
        + ((F.col("nv") - F.col("pv")) * (F.col("d") - F.col("pd"))).cast("double")
        / (F.col("nd") - F.col("pd"))
    ) / 100.0
    return filled.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.when(F.col("v").isNotNull(), F.col("v").cast("double") / 100.0)
        .otherwise(interp)
        .alias("value_filled"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("interpolated"),
    )


@register(
    "beh_cohort_ltv",
    oracle="""
    WITH first_week AS (
      SELECT user_id,
             date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort
      FROM events GROUP BY user_id
    ),
    purchases AS (
      SELECT e.user_id,
             CAST(date_diff('day', f.cohort,
                            date_trunc('week', CAST(e.ts AS TIMESTAMP)))
                  AS BIGINT) // 7 AS week_k,
             CAST(round(e.value * 100) AS BIGINT) AS v_cents
      FROM events e JOIN first_week f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
    ),
    grid AS (
      SELECT f.cohort, p.week_k,
             CAST(sum(p.v_cents) AS BIGINT) AS rev_cents,
             CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_buyers
      FROM purchases p JOIN first_week f ON p.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_k,
           CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
           n_buyers,
           CAST(CAST(sum(rev_cents) OVER (PARTITION BY cohort ORDER BY week_k
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS DOUBLE) / 100.0 AS cum_revenue
    FROM grid
    """,
)
def beh_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users bucket by first-seen week,
    purchase revenue lands in (cohort, weeks-since-cohort) cells, and
    a running sum per cohort draws the cumulative LTV curve —
    `beh_retention_cohort`'s revenue sibling. The first-event aggregate
    and the purchase join share the user_id exchange; the cumulative
    window runs per cohort on the collapsed grid (≤ weeks² rows).
    Week arithmetic stays on Monday-truncated dates in BOTH engines
    (`date_trunc('week')` is ISO in each), and day deltas between
    aligned weeks divide exactly by 7."""
    e = load(spark, sf_dir, "events")
    first_week = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_week, "user_id")
        .select(
            "user_id",
            "cohort",
            F.expr(
                "CAST(datediff(date_trunc('week', ts), cohort) AS BIGINT) DIV 7"
            ).alias("week_k"),
            cents("value").alias("v_cents"),
        )
    )
    grid = purchases.groupBy("cohort", "week_k").agg(
        F.sum("v_cents").cast("long").alias("rev_cents"),
        F.count_distinct("user_id").cast("long").alias("n_buyers"),
    )
    cum = (
        F.sum("rev_cents")
        .over(
            Window.partitionBy("cohort")
            .orderBy("week_k")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long")
    )
    return grid.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "week_k",
        (F.col("rev_cents").cast("double") / 100.0).alias("revenue"),
        "n_buyers",
        (cum.cast("double") / 100.0).alias("cum_revenue"),
    )


@register(
    "dedup_survivorship_policy",
    oracle="""
    WITH fp AS (
      SELECT doc_id, n_chars,
             md5(lower(array_to_string(string_split(text, ' ')[1:8], ' ')))
               AS fp
      FROM documents
    )
    SELECT fp,
           CAST(count(*) AS BIGINT) AS n_members,
           arg_max(doc_id, n_chars * 10000000000 - doc_id) AS survivor_doc_id,
           arg_max(n_chars, n_chars * 10000000000 - doc_id)
             AS survivor_n_chars,
           CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM fp
    GROUP BY fp
    HAVING count(*) >= 2
    """,
)
def dedup_survivorship_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship on top of blocked dedup: documents
    group by a case-folded 8-token-prefix fingerprint (the blocking
    key that actually yields duplicate groups on this corpus — the
    full-text fingerprint of `dedup_exact_normalized` has none) and
    each group elects a survivor by policy "longest text wins, ties to
    the oldest (smallest) doc_id" — encoded as the single integer
    ordering key `n_chars · 10¹⁰ − doc_id`, so the argmax is
    total-ordered without relying on cross-engine struct-comparison
    semantics. Only fingerprints and per-row longs shuffle; groups
    with no duplicates drop out in HAVING."""
    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "n_chars",
        F.md5(
            F.lower(F.array_join(F.slice(F.split("text", " "), 1, 8), " "))
        ).alias("fp"),
    )
    key = F.col("n_chars") * F.lit(10000000000).cast("long") - F.col("doc_id")
    return (
        fp.groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.max_by("doc_id", key).alias("survivor_doc_id"),
            F.max_by("n_chars", key).alias("survivor_n_chars"),
            F.sum(F.col("n_chars").cast("long")).cast("long").alias("total_chars"),
        )
        .filter(F.col("n_members") >= 2)
    )


@register(
    "agg_pareto_cumshare",
    oracle=f"""
    WITH b AS (
      SELECT p.p_brand,
             CAST(sum({SQL_REVENUE_CENTS}) AS BIGINT) AS rev_units
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    t AS (SELECT CAST(sum(rev_units) AS BIGINT) AS tot FROM b),
    r AS (
      SELECT p_brand, rev_units, tot,
             CAST(sum(rev_units) OVER (ORDER BY rev_units DESC, p_brand
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_units
      FROM b, t
    )
    SELECT p_brand,
           CAST(rev_units AS DOUBLE) / 10000.0 AS revenue,
           CAST(rev_units AS DOUBLE) / tot AS share,
           CAST(cum_units AS DOUBLE) / tot AS cum_share,
           CASE WHEN cum_units * 5 <= tot * 4 THEN 1 ELSE 0 END AS in_top80
    FROM r
    """,
)
def agg_pareto_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (ABC) concentration analysis: brands ranked by revenue
    with individual and cumulative share, flagging the set that makes
    up the first 80% of revenue. The cumulative window orders by
    (revenue DESC, brand) — full tiebreak — over the ~25-row brand
    aggregate; the 80% flag is the cross-multiplied integer predicate
    `cum·5 ≤ tot·4`, so no float threshold wobbles the boundary row.
    The fact join broadcasts `part`-derived brand lookups at test
    scale and shuffles once at warehouse scale."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.sum(revenue_cents()).cast("long").alias("rev_units"))
    )
    t = b.agg(F.sum("rev_units").cast("long").alias("tot"))
    cum = (
        F.sum("rev_units")
        .over(
            Window.orderBy(F.col("rev_units").desc(), "p_brand").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("long")
    )
    r = b.crossJoin(F.broadcast(t)).withColumn("cum_units", cum)
    return r.select(
        "p_brand",
        (F.col("rev_units").cast("double") / 10000.0).alias("revenue"),
        (F.col("rev_units").cast("double") / F.col("tot")).alias("share"),
        (F.col("cum_units").cast("double") / F.col("tot")).alias("cum_share"),
        F.when(F.col("cum_units") * 5 <= F.col("tot") * 4, 1)
        .otherwise(0)
        .alias("in_top80"),
    )


@register(
    "ts_wow_same_dow",
    oracle="""
    WITH d AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day, n,
           CAST(n - lag(n, 7) OVER (ORDER BY day) AS BIGINT) AS wow_diff,
           CAST(n AS DOUBLE) / lag(n, 7) OVER (ORDER BY day) AS wow_ratio
    FROM d
    """,
)
def ts_wow_same_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week comparison against the SAME weekday (lag 7 over
    the daily series), the seasonally-honest growth number — lag 1
    compares Monday to Sunday and reads weekend dips as crashes.
    Post-aggregation lag on #days rows; diff is exact integers, ratio
    one IEEE division. First seven days emit NULLs (no prior same-dow
    observation) rather than a fabricated baseline."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    prev = F.lag("n", 7).over(Window.orderBy("day"))
    return d.select(
        F.col("day").cast("string").alias("day"),
        "n",
        (F.col("n") - prev).cast("long").alias("wow_diff"),
        (F.col("n").cast("double") / prev).alias("wow_ratio"),
    )


@register(
    "ts_downsample_minmax",
    oracle="""
    WITH ev AS (
      SELECT event_id,
             epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS bucket_us,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT bucket_us, event_id, cents,
             row_number() OVER (PARTITION BY bucket_us
                                ORDER BY cents ASC, event_id) AS rn_min,
             row_number() OVER (PARTITION BY bucket_us
                                ORDER BY cents DESC, event_id) AS rn_max
      FROM ev
    )
    SELECT bucket_us, 'min' AS kind, cents, event_id
    FROM ranked WHERE rn_min = 1
    UNION ALL
    SELECT bucket_us, 'max' AS kind, cents, event_id
    FROM ranked WHERE rn_max = 1
    """,
)
def ts_downsample_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max DOWNSAMPLING for monitoring charts (the M4 scheme): per
    time bucket keep only the extreme points — the two samples that
    bound everything a pixel column can render — so a billion-point
    series plots from 2·buckets rows with zero visual loss of spikes
    (mean-based downsampling erases exactly the anomalies you chart
    for). Unlike LTTB (sequential, selected-point dependency) the
    min/max rule has no cross-bucket dependency: both extremes come
    from ONE window spec pair sharing ONE exchange on the bucket key,
    embarrassingly parallel at any scale. Ties break on event_id so
    the selected representative is deterministic cross-engine; values
    ride as exact cents."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("bucket_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w_min = Window.partitionBy("bucket_us").orderBy(
        F.col("cents").asc(), F.col("event_id")
    )
    w_max = Window.partitionBy("bucket_us").orderBy(
        F.col("cents").desc(), F.col("event_id")
    )
    ranked = ev.withColumn("rn_min", F.row_number().over(w_min)).withColumn(
        "rn_max", F.row_number().over(w_max)
    )
    return (
        ranked.filter(F.col("rn_min") == 1)
        .select("bucket_us", F.lit("min").alias("kind"), "cents", "event_id")
        .unionByName(
            ranked.filter(F.col("rn_max") == 1).select(
                "bucket_us", F.lit("max").alias("kind"), "cents", "event_id"
            )
        )
    )
