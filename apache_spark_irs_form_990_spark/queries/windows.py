"""Window-function operators (SURVEY.md §2 B5 — all EXT).

One shuffle per distinct (partitionBy, orderBy) pair; Spark evaluates
all frames sharing a window spec in a single Window physical operator.
At 100 TB the partition key choice is the scale story: user_id /
suppkey partitions are numerous and small (good parallelism); a
windows-over-everything spec (no partitionBy) would funnel the table
through one task and is deliberately absent here.

Determinism note for oracle hashing: every orderBy carries a unique
tiebreak column (event_id / l_orderkey+l_linenumber) so rank/lag/lead
values are reproducible across engines and partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "win_rank_topn_per_group",
    oracle="""
    SELECT *
    FROM (
      SELECT l_suppkey,
             l_orderkey,
             l_linenumber,
             l_extendedprice,
             row_number() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             ) AS rn
      FROM lineitem
    )
    WHERE rn <= 3
    """,
)
def win_rank_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 priciest line items per supplier — the canonical top-N
    pattern. Spark pushes a per-partition rank limit into the sort
    (WindowGroupLimit) so each group only keeps N rows pre-shuffle."""
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_running_sum",
    oracle=f"""
    SELECT user_id,
           event_id,
           CAST(sum({sql_cents('value')}) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0 AS running_value
    FROM events
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user sum in event-time order. Integer-cents inside
    the frame so the running value is exact at every prefix (a running
    double sum would hash-diverge on merge order)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            (F.sum(cents("value")).over(w).cast("double") / 100.0).alias(
                "running_value"
            ),
        )
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT user_id,
           event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           )) AS prev_ts_us,
           lead(event_type) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS next_type
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic offsets: previous event time + next event type per user.
    Timestamps emitted as epoch-microsecond BIGINTs (engine-neutral)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            F.unix_micros(F.lag("ts").over(w)).alias("prev_ts_us"),
            F.lead("event_type").over(w).alias("next_type"),
        )
    )


@register(
    "win_moving_avg",
    oracle=f"""
    SELECT user_id,
           event_id,
           CAST(sum({sql_cents('value')}) OVER w AS DOUBLE) / 100.0
             / count(*) OVER w AS moving_avg
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY CAST(ts AS TIMESTAMP), event_id
      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
    )
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row sliding mean per user, exact-cents sum / frame count (avg()
    over doubles would be frame-order-sensitive)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            (
                F.sum(cents("value")).over(w).cast("double")
                / 100.0
                / F.count(F.lit(1)).over(w)
            ).alias("moving_avg"),
        )
    )


@register(
    "win_sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 1800000000
                       OR lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    numbered AS (
      SELECT user_id, event_id, us,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS BIGINT)
               AS session_no
      FROM marked
    )
    SELECT user_id, session_no,
           min(us) AS session_start_us,
           max(us) AS session_end_us,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def win_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (30 min): the lag→flag→
    running-sum composition that turns an event log into sessions with
    plain window functions — the batch twin of the streaming
    `session_window` (stream_queries.py), and the form you backfill
    history with while the stream handles live data.

    One shuffle on user_id serves both windows and the final groupBy
    (same partitioning, Catalyst reuses the exchange). event_id breaks
    timestamp ties so session numbering is deterministic.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    marked = e.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_no",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
        F.count("*").alias("n_events"),
    )


@register(
    "win_pct_of_total",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           n,
           CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY o_orderstatus) AS DOUBLE)
             AS pct_of_status
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders
      GROUP BY 1, 2
    )
    """,
)
def win_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each group's share of its partition total —
    aggregate first (tiny frame), THEN window over the aggregate;
    windowing the raw fact would shuffle every row to compute the same
    ratios. Unframed sum over an unordered partition is deterministic
    (whole-partition frame). Integer counts divide exactly in both
    engines."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus")
    return counts.select(
        "o_orderstatus",
        "o_orderpriority",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
            "pct_of_status"
        ),
    )


@register(
    "win_minmax_scale",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round((o_totalprice - min(o_totalprice) OVER w)
                 / (max(o_totalprice) OVER w - min(o_totalprice) OVER w),
                 6) AS price_scaled
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority)
    """,
)
def win_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling to [0,1] — the normalization
    step before distance-based models. One unordered window produces
    both extrema (Spark evaluates min and max in a single Window
    operator over the same partition spec); the scaled value is a
    single double expression on stored 2-decimal values, identical in
    both engines, rounded only for output stability."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    lo = F.min("o_totalprice").over(w)
    hi = F.max("o_totalprice").over(w)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round((F.col("o_totalprice") - lo) / (hi - lo), 6).alias("price_scaled"),
    )


@register(
    "win_rolling_corr",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS x,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id)
                  AS BIGINT) AS y
      FROM events
    ),
    framed AS (
      SELECT user_id, event_id,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx, sum(y) OVER w AS sy,
             sum(x * y) OVER w AS sxy,
             sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
      FROM seq
      WINDOW w AS (PARTITION BY user_id ORDER BY y
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           CASE WHEN n > 1
                 AND n * sxx - sx * sx > 0
                 AND n * syy - sy * sy > 0
                THEN (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                            * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
                ELSE NULL END AS trend_corr
    FROM framed
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling correlation of value against time-order over a 10-row
    trailing frame — the windowed trend detector (+1 steadily rising,
    -1 falling). All five moments accumulate as exact integers inside
    ONE window spec (Spark evaluates the six aggregates in a single
    Window operator over one sort); the closed form divides once per
    row — identical doubles on both engines, no rounding. Degenerate
    frames (size 1, zero variance) yield NULL explicitly."""
    e = load(spark, sf_dir, "events")
    w_rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("x"),
        F.row_number().over(w_rn).cast("long").alias("y"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("y")
        .rowsBetween(-9, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    num = n * sxy.cast("double") - sx.cast("double") * sy
    varx = n * sxx.cast("double") - sx.cast("double") * sx
    vary = n * syy.cast("double") - sy.cast("double") * sy
    corr = F.when(
        (n > 1) & (varx > 0) & (vary > 0), num / F.sqrt(varx * vary)
    ).otherwise(F.lit(None))
    return seq.select("user_id", "event_id", corr.alias("trend_corr"))


@register(
    "win_max_drawdown",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ),
    run AS (
      SELECT user_id, event_id, cents,
             max(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS peak
      FROM seq
    )
    SELECT user_id, event_id,
           CAST(peak AS BIGINT) AS peak_cents,
           CASE WHEN peak > 0
                THEN CAST(peak - cents AS DOUBLE) / peak
                ELSE NULL END AS drawdown
    FROM run
    """,
)
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak and drawdown: each observation against the highest
    value seen so far in its key's history — the risk metric shape
    (peak-to-trough decline). One running-max window over exact cents;
    the drawdown ratio divides two exact integers, so the double is
    engine-identical unrounded. Zero/negative peaks yield NULL rather
    than a meaningless ratio."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    seq = e.select("user_id", "event_id", "ts", cents.alias("cents"))
    peak = F.max("cents").over(w)
    run = seq.select("user_id", "event_id", "cents", peak.alias("peak"))
    dd = F.when(
        F.col("peak") > 0,
        (F.col("peak") - F.col("cents")).cast("double") / F.col("peak"),
    ).otherwise(F.lit(None))
    return run.select(
        "user_id",
        "event_id",
        F.col("peak").cast("long").alias("peak_cents"),
        dd.alias("drawdown"),
    )
