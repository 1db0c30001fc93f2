"""Data-quality profiling and activity analytics (SURVEY.md §2 B11).

Operators a data platform runs ABOUT its tables, not just on them:
column profiling, key-uniqueness audits, rolling active users, running
distinct counts, and corpus rank-frequency (Zipf) fit. The reference's
only self-observability is three accumulators (`IRSSpark.py:119-125`);
this module is that idea grown into first-class, oracle-checked
queries.

Determinism notes: string renderings of profiled min/max values avoid
double→string formatting (engines disagree on it) by going through
exact integer cents; the Zipf regression sums ln() values as exact
integer micro-nats (same trick as `functions.money.cents`) because 200-term
double sums are summation-order-dependent, integer sums are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "profile_table_stats",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           count(*) FILTER (WHERE o_orderkey IS NULL) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_repr,
           CAST(max(o_orderkey) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*) FILTER (WHERE o_custkey IS NULL),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) FILTER (WHERE o_orderstatus IS NULL),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) FILTER (WHERE o_totalprice IS NULL),
           count(DISTINCT o_totalprice),
           CAST(CAST(round(min(o_totalprice) * 100) AS BIGINT) AS VARCHAR),
           CAST(CAST(round(max(o_totalprice) * 100) AS BIGINT) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*) FILTER (WHERE o_orderdate IS NULL),
           count(DISTINCT o_orderdate),
           CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR),
           CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*) FILTER (WHERE o_orderpriority IS NULL),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: null count, distinct count, min/max for every
    column of `orders`, one output row per column. The oracle states it
    as six UNION'd scans; the Spark plan is ONE scan — a single
    aggregate computes all 24 metrics (multi-distinct plans via Expand)
    and a stack() unpivots the wide row to long form. That one-pass
    shape is what makes profiling affordable to run after every load
    at 100 TB. Value renderings dodge double→string formatting (min/max
    of doubles go through integer cents; timestamps through DATE)."""
    o = load(spark, sf_dir, "orders")
    wide = o.agg(
        # o_orderkey
        F.count_if(F.col("o_orderkey").isNull()).alias("nn_orderkey"),
        F.count_distinct("o_orderkey").alias("nd_orderkey"),
        F.min("o_orderkey").cast("string").alias("min_orderkey"),
        F.max("o_orderkey").cast("string").alias("max_orderkey"),
        # o_custkey
        F.count_if(F.col("o_custkey").isNull()).alias("nn_custkey"),
        F.count_distinct("o_custkey").alias("nd_custkey"),
        F.min("o_custkey").cast("string").alias("min_custkey"),
        F.max("o_custkey").cast("string").alias("max_custkey"),
        # o_orderstatus
        F.count_if(F.col("o_orderstatus").isNull()).alias("nn_status"),
        F.count_distinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderstatus").alias("min_status"),
        F.max("o_orderstatus").alias("max_status"),
        # o_totalprice (exact-cents string rendering)
        F.count_if(F.col("o_totalprice").isNull()).alias("nn_price"),
        F.count_distinct("o_totalprice").alias("nd_price"),
        F.round(F.min("o_totalprice") * 100).cast("long").cast("string").alias("min_price"),
        F.round(F.max("o_totalprice") * 100).cast("long").cast("string").alias("max_price"),
        # o_orderdate (date-string rendering)
        F.count_if(F.col("o_orderdate").isNull()).alias("nn_date"),
        F.count_distinct("o_orderdate").alias("nd_date"),
        F.min(F.to_date("o_orderdate")).cast("string").alias("min_date"),
        F.max(F.to_date("o_orderdate")).cast("string").alias("max_date"),
        # o_orderpriority
        F.count_if(F.col("o_orderpriority").isNull()).alias("nn_prio"),
        F.count_distinct("o_orderpriority").alias("nd_prio"),
        F.min("o_orderpriority").alias("min_prio"),
        F.max("o_orderpriority").alias("max_prio"),
    )
    return wide.select(
        F.expr(
            """stack(6,
            'o_orderkey',      nn_orderkey, nd_orderkey, min_orderkey, max_orderkey,
            'o_custkey',       nn_custkey,  nd_custkey,  min_custkey,  max_custkey,
            'o_orderstatus',   nn_status,   nd_status,   min_status,   max_status,
            'o_totalprice',    nn_price,    nd_price,    min_price,    max_price,
            'o_orderdate',     nn_date,     nd_date,     min_date,     max_date,
            'o_orderpriority', nn_prio,     nd_prio,     min_prio,     max_prio
            ) AS (column_name, n_nulls, n_distinct, min_repr, max_repr)"""
        )
    )


@register(
    "audit_key_uniqueness",
    oracle="""
    SELECT 'orders' AS table_name, 'o_orderkey' AS key_cols,
           count(*) AS n_rows,
           count(DISTINCT o_orderkey) AS n_keys,
           count(*) - count(DISTINCT o_orderkey) AS n_excess_rows
    FROM orders
    UNION ALL
    SELECT 'lineitem', 'l_orderkey,l_linenumber',
           count(*),
           count(DISTINCT (l_orderkey, l_linenumber)),
           count(*) - count(DISTINCT (l_orderkey, l_linenumber))
    FROM lineitem
    """,
)
def audit_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: rows vs distinct keys (and the
    excess, i.e. duplicate rows under the declared key) for the two
    fact tables. The constraint check an engine without enforced
    constraints must run as a query — cheap enough here to gate every
    load: one aggregate per table, distinct-count collapses map-side.
    Composite keys hash as structs, no string concatenation (which
    would false-merge keys like ('a','bc') and ('ab','c'))."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    a = o.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("o_orderkey").alias("n_keys"),
    ).select(
        F.lit("orders").alias("table_name"),
        F.lit("o_orderkey").alias("key_cols"),
        "n_rows",
        "n_keys",
        (F.col("n_rows") - F.col("n_keys")).alias("n_excess_rows"),
    )
    b = li.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct(F.struct("l_orderkey", "l_linenumber")).alias("n_keys"),
    ).select(
        F.lit("lineitem").alias("table_name"),
        F.lit("l_orderkey,l_linenumber").alias("key_cols"),
        "n_rows",
        "n_keys",
        (F.col("n_rows") - F.col("n_keys")).alias("n_excess_rows"),
    )
    return a.unionByName(b)


@register(
    "win_cumulative_distinct",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_types_seen
    FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS rn
      FROM events
    )
    """,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) — how many distinct event types each
    user has exhibited as of every event. Plain windows can't frame a
    distinct aggregate; the standard rewrite marks each (user, type)'s
    FIRST occurrence (row_number = 1) and running-sums the marks. Two
    window passes over compatible partitionings ((user,type) then
    (user)) — the second sort reuses nothing but is linear; no
    self-join, no state explosion, which is what makes the pattern
    usable for billions of users."""
    e = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("rn", F.row_number().over(w_first))
        .withColumn(
            "n_types_seen",
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).over(w_run),
        )
        .select("user_id", "event_id", "n_types_seen")
    )


@register(
    "beh_dau_wau",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM user_days),
    wau AS (
      SELECT day + CAST(off AS INTEGER) AS day, count(DISTINCT user_id) AS wau
      FROM user_days, (SELECT unnest(generate_series(0, 6)) AS off)
      GROUP BY day + CAST(off AS INTEGER)
    ),
    dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM user_days GROUP BY day)
    SELECT CAST(w.day AS VARCHAR) AS day,
           coalesce(d.dau, 0) AS dau,
           w.wau
    FROM wau w
    LEFT JOIN dau d ON w.day = d.day
    JOIN bounds b ON w.day BETWEEN b.d0 AND b.d1
    """,
)
def beh_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-7-day active users (DAU/WAU) per calendar
    day. Rolling DISTINCT over a range frame isn't directly
    expressible, and the naive day×history self-join is quadratic; the
    scalable rewrite EXPLODES each (user, day) into the 7 window
    endpoints it contributes to (constant 7x amplification of the
    deduplicated user-day table — tiny vs raw events), then counts
    distinct users per endpoint. Days outside the observed range are
    clipped via a broadcast 1-row bounds join."""
    e = load(spark, sf_dir, "events")
    user_days = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    bounds = user_days.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    contrib = user_days.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
    ).select("user_id", F.date_add(F.col("day"), F.col("off")).alias("day"))
    wau = contrib.groupBy("day").agg(F.count_distinct("user_id").alias("wau"))
    dau = user_days.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    return (
        wau.join(dau, "day", "left")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("day").between(F.col("d0"), F.col("d1")))
        .select(
            F.col("day").cast("string").alias("day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
        )
    )


@register(
    "text_zipf_slope",
    oracle="""
    WITH freq AS (
      SELECT token, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> ''
      GROUP BY token
      ORDER BY n DESC, token
      LIMIT 200
    ),
    pts AS (
      SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY n DESC, token)
                               AS DOUBLE)) * 1000000) AS BIGINT) AS x,
             CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS y
      FROM freq
    )
    SELECT count(*) AS n_points,
           round((count(*) * CAST(sum(x * y) AS DOUBLE)
                  - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
                 / (count(*) * CAST(sum(x * x) AS DOUBLE)
                    - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE)),
                 6) AS zipf_slope
    FROM pts
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(frequency) on ln(rank) over the
    top-200 tokens — natural corpora sit near -1, generated/degenerate
    text drifts off, making the slope a cheap corpus-health signal.
    Each ln() is snapped to exact integer MICRO-NATS before summing:
    the regression's four sums then aggregate exactly in any order
    (double sums of 200 terms are order-dependent; integer sums are
    not), and the closed-form slope is one engine-identical double
    expression, rounded to 6."""
    d = load(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(200)
    )
    w = Window.partitionBy().orderBy(F.col("n").desc(), "token")
    micro = lambda c: F.round(F.log(c) * 1_000_000).cast("long")  # noqa: E731
    pts = freq.select(
        micro(F.row_number().over(w).cast("double")).alias("x"),
        micro(F.col("n").cast("double")).alias("y"),
    )
    cnt = F.count("*")
    sx = F.sum("x").cast("double")
    sy = F.sum("y").cast("double")
    sxy = F.sum(F.col("x") * F.col("y")).cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    return pts.agg(
        cnt.alias("n_points"),
        F.round((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx), 6).alias(
            "zipf_slope"
        ),
    )


@register(
    "agg_median_abs_dev",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           any_value(m.med_qty) AS med_qty,
           quantile_cont(abs(l.l_quantity - m.med_qty), 0.5) AS mad_qty,
           count(*) AS n
    FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def agg_median_abs_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust spread measure
    that outliers can't drag the way stddev lets them. Two passes over
    the same grouping key: per-group median, broadcast back, then the
    median of absolute deviations; both exact interpolated percentiles
    over integer-valued doubles, so cross-engine identical. At 100 TB
    swap the exact percentile for approx_percentile and keep the
    two-pass shape."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.any_value("med_qty").alias("med_qty"),
            F.expr("percentile(abs(l_quantity - med_qty), 0.5)").alias("mad_qty"),
            F.count("*").alias("n"),
        )
    )


@register(
    "win_outlier_zscore",
    oracle="""
    WITH stats AS (
      SELECT o_orderpriority,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*) AS mean_price,
             sqrt(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                           * CAST(round(o_totalprice * 100) AS BIGINT))
                       AS DOUBLE) / 10000.0 / count(*)
                  - pow(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                             AS DOUBLE) / 100.0 / count(*), 2)) AS std_price
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
           round((o.o_totalprice - s.mean_price) / s.std_price, 6) AS z
    FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
    WHERE abs((o.o_totalprice - s.mean_price) / s.std_price) > 3.0
    """,
)
def win_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging per group: rows more than 3 population
    standard deviations from their group mean. Mean and variance come
    from exact integer cents moments (Σx, Σx² as BIGINTs) evaluated in
    ONE unordered window over the group partition — no join back, one
    shuffle; the z expression is the identical double formula on both
    engines, rounded to 6 only for output (the >3 cut uses the raw
    value; 3.0 sits far from any accumulation boundary).

    Overflow note: squared cents (~2.5e15 each) overflow int64 within
    ~4k rows, so Σx² accumulates in DECIMAL(38,0) — exact like the
    BIGINT path (DuckDB's HUGEINT sum is exact too), then one cast to
    double of the same exact integer on both engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    c = F.round(F.col("o_totalprice") * 100).cast("long")
    c_dec = c.cast("decimal(38,0)")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(c).over(w).cast("double") / 100.0
    s2 = F.sum(c_dec * c_dec).over(w).cast("double") / 10000.0
    mean = s1 / n
    std = F.sqrt(s2 / n - F.pow(mean, F.lit(2)))
    z = (F.col("o_totalprice") - mean) / std
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice", z.alias("zraw"))
        .filter(F.abs(F.col("zraw")) > 3.0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.round("zraw", 6).alias("z"),
        )
    )


@register(
    "audit_snapshot_diff",
    oracle="""
    WITH snap_a AS (
      SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    snap_b AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0
                  THEN CAST(round(o_totalprice * 100) AS BIGINT) + 100
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS v
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, CAST(round(o_totalprice * 100) AS BIGINT)
      FROM orders WHERE o_orderkey % 17 = 0
    )
    SELECT CASE
             WHEN a.k IS NULL THEN 'added'
             WHEN b.k IS NULL THEN 'removed'
             WHEN a.v <> b.v THEN 'changed'
             ELSE 'unchanged'
           END AS status,
           count(*) AS n_rows
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k
    GROUP BY status
    """,
)
def audit_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-diff audit: classify every key across two snapshots as
    added / removed / changed / unchanged — the reconciliation query
    behind replication checks and CDC validation. One full-outer join
    on the key (both sides shuffle once on the same key), value
    comparison in exact cents, and a 4-row rollup. Snapshot B is
    derived deterministically (drop %13 keys, bump %7 values, add %17
    under new keys) so every class is populated and the expected
    counts are provable."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    snap_a = o.select(F.col("o_orderkey").alias("ka"), cents.alias("va"))
    kept = o.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("kb"),
        F.when(F.col("o_orderkey") % 7 == 0, cents + 100)
        .otherwise(cents)
        .alias("vb"),
    )
    added = o.filter(F.col("o_orderkey") % 17 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("kb"), cents.alias("vb")
    )
    snap_b = kept.unionByName(added)
    joined = snap_a.join(snap_b, snap_a.ka == snap_b.kb, "full_outer")
    status = (
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(F.col("va") != F.col("vb"), "changed")
        .otherwise("unchanged")
    )
    return joined.groupBy(status.alias("status")).agg(
        F.count("*").alias("n_rows")
    )
