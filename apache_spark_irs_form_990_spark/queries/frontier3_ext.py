"""Frontier extensions, part 3 — log-scale histograms, activity
heatmap grids, interval-sweep concurrency, clustered-write sinks,
multi-touch attribution, rank-movement reports, Cramér's V effect
size, and language-ID confusion (SURVEY.md §2 B11 continuation).

All EXT relative to the reference. House determinism conventions:
exact BIGINT accumulation, one IEEE division at the end, per-cell
micro-integer snapping where doubles must sum order-independently,
full-column tiebreaks on every ordering.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import global_order
from apache_spark_irs_form_990_spark.operators.text_analysis import (
    text_langid_vote,
    _LANG_MARKERS,
)
from apache_spark_irs_form_990_spark.functions.money import (
    cents,
    revenue_cents,
    sql_cents,
    SQL_REVENUE_CENTS,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "agg_histogram_log2",
    oracle=f"""
    SELECT length(bin({sql_cents('o_totalprice')})) AS log2_bucket,
           count(*) AS n,
           CAST(min({sql_cents('o_totalprice')}) AS DOUBLE) / 100.0 AS min_price,
           CAST(max({sql_cents('o_totalprice')}) AS DOUBLE) / 100.0 AS max_price
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-scale histogram of order value — the bucket scheme that
    actually works for long-tailed money distributions, where
    fixed-width bins (`agg_histogram_bins`) put 99% of rows in bin 0.
    The bucket is ⌊log₂(cents)⌋+1 computed EXACTLY as the bit length
    of the integer cents (`length(bin(x))` — identical semantics in
    both engines), so no floating log call can straddle a power-of-2
    boundary differently per engine. Map-side bucketing, ~40-bucket
    reduce side at any corpus size."""
    o = load(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    return (
        o.select(
            F.length(F.bin(c)).alias("log2_bucket"), c.alias("c")
        )
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min("c").cast("double") / 100.0).alias("min_price"),
            (F.max("c").cast("double") / 100.0).alias("max_price"),
        )
    )


@register(
    "ts_dow_hour_grid",
    oracle="""
    SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
           count(*) AS n,
           CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_dow_hour_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap (the 7×24 grid every
    traffic dashboard opens with), with each cell's share of total
    volume. One hash aggregate over the events scan into a 168-cell
    grid; the share normalizer is an unordered window over the GRID,
    not a second pass over the data. ISO day numbering as in
    [[ts_seasonality_dow]] (`weekday`+1 / `isodow`)."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(
        (F.weekday("ts") + 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return agg.select(
        "dow",
        "hod",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).alias("share"),
    )


@register(
    "beh_concurrent_sessions_peak",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    lagd AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER
                         (PARTITION BY user_id ORDER BY ts)) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM ev
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagd
    ),
    iv AS (SELECT user_id, sid, min(ts) AS s, max(ts) AS e
           FROM sess GROUP BY user_id, sid),
    deltas AS (SELECT s AS ts, 1 AS d FROM iv
               UNION ALL SELECT e, -1 FROM iv),
    run AS (
      SELECT ts, d,
             CAST(sum(d) OVER (ORDER BY ts, d DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      FROM deltas
    )
    SELECT CAST(max(c) AS BIGINT) AS peak_concurrency,
           strftime(min(CASE WHEN c = peak THEN ts END),
                    '%Y-%m-%d %H:%M:%S') AS first_peak_ts
    FROM (SELECT ts, c, max(c) OVER () AS peak FROM run)
    """,
)
def beh_concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of concurrently-open sessions (30-minute-gap
    sessionization) and the first instant it is reached — the classic
    interval-sweep: +1 at each session start, −1 at each end, running
    sum, global max. Starts order before ends at the same instant
    (`d DESC`), so boundary-touching sessions count as concurrent;
    rows tied on (ts, d) are interchangeable (the multiset of running
    sums is tie-order invariant), so the (peak, first-ts) projection
    is order-stable without further tiebreaks. The sessionize windows
    shuffle once by user; the sweep's global running sum — formerly a
    single-task unpartitioned window over 2·|sessions| delta rows —
    comes from `global_order` (range-partition on the sweep key,
    per-partition running sums, broadcast offsets), and the peak
    rides back as a broadcast 1-row max instead of a second global
    window."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    wu = Window.partitionBy("user_id").orderBy("ts")
    lagd = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
                > 1800000000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = lagd.select(
        "user_id",
        "ts",
        F.sum("new_s")
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    iv = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    deltas = iv.select(F.col("s").alias("ts"), F.lit(1).alias("d")).union(
        iv.select(F.col("e").alias("ts"), F.lit(-1).alias("d"))
    )
    run = global_order(
        deltas,
        [F.col("ts"), F.col("d").desc()],
        running={"c": F.col("d")},
        rn_col="_rn",
    ).select("ts", "d", "c")
    peak = run.agg(F.max("c").alias("peak"))
    return (
        run.crossJoin(F.broadcast(peak))
        .select(
            "ts", "c", "peak"
        )
        .agg(
            F.max("c").alias("peak_concurrency"),
            F.date_format(
                F.min(F.when(F.col("c") == F.col("peak"), F.col("ts"))),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("first_peak_ts"),
        )
    )


@register(
    "sink_sorted_clustering",
    oracle=f"""
    SELECT count(*) AS n,
           CAST(sum({SQL_REVENUE_CENTS}) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-03-01'
      AND l_shipdate < TIMESTAMP '1994-06-01'
    """,
)
def sink_sorted_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered-write round-trip: lineitem re-written to parquet
    SORTED WITHIN PARTITIONS by `l_shipdate`, then read back through a
    date-range filter and aggregated. Sorting by the dominant filter
    column packs each parquet row-group into a narrow min/max range,
    so the read-back scan prunes whole row groups from the statistics
    alone — the cheap, format-native substitute for an index, and the
    single highest-leverage layout decision for a 100 TB fact table
    queried by time range. The oracle checks the round-trip loses no
    rows (same filter+aggregate on the original table)."""
    li = load(spark, sf_dir, "lineitem")
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    dest = os.path.join(
        tempfile.gettempdir(), f"spark990_clustered_{sf_tag}"
    )
    (
        li.repartition(4)
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(dest)
    )
    back = spark.read.parquet(dest).filter(
        (F.col("l_shipdate") >= F.lit("1994-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1994-06-01").cast("timestamp"))
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(revenue_cents()).cast("double") / 1e4).alias("revenue"),
    )


@register(
    "beh_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t_ts
      FROM events WHERE event_type <> 'purchase'
    ),
    touch AS (
      SELECT p.pid, t.event_type
      FROM p JOIN t ON p.user_id = t.user_id
                   AND t.t_ts <= p.p_ts
                   AND epoch_us(p.p_ts) - epoch_us(t.t_ts) < 604800000000
    ),
    credited AS (
      SELECT event_type,
             1000000 // (count(*) OVER (PARTITION BY pid)) AS micro
      FROM touch
    )
    SELECT event_type,
           count(*) AS n_touches,
           CAST(sum(micro) AS DOUBLE) / 1000000.0 AS credit
    FROM credited
    GROUP BY event_type
    """,
)
def beh_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution: every purchase
    distributes one unit of credit equally across that user's
    non-purchase events in the preceding 7 days; credit totals per
    event type. The complement of [[beh_first_touch_attribution]] —
    position-agnostic instead of first-wins. Per-touch credit is an
    exact integer micro-share (`1000000 div n`, floor division
    identical in both engines), so the per-type sums are
    order-independent; one division renders the total. The time-bound
    user join is the data-sized step (both sides share the user_id
    exchange, the 7-day bound caps the fan-out); the per-purchase
    touch count is an unordered window on the join output."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_type", F.col("ts").alias("t_ts")
    )
    touch = p.join(
        t,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (
            F.unix_micros("p_ts") - F.unix_micros("t_ts")
            < 604800000000
        ),
    ).select("pid", "event_type")
    credited = touch.select(
        "event_type",
        F.expr(
            "1000000 div count(*) OVER (PARTITION BY pid)"
        ).alias("micro"),
    )
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        (F.sum("micro").cast("double") / 1000000.0).alias("credit"),
    )


@register(
    "win_rank_delta_mom",
    oracle=f"""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
             p_brand,
             sum({SQL_REVENUE_CENTS}) AS rev_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT month, p_brand,
             CAST(rev_c AS DOUBLE) / 10000.0 AS revenue,
             CAST(row_number() OVER (PARTITION BY month
                    ORDER BY rev_c DESC, p_brand) AS BIGINT) AS rnk
      FROM monthly
    )
    SELECT month, p_brand, revenue, rnk,
           lag(rnk) OVER (PARTITION BY p_brand ORDER BY month) AS prev_rnk,
           lag(rnk) OVER (PARTITION BY p_brand ORDER BY month) - rnk
             AS rank_delta
    FROM ranked
    """,
)
def win_rank_delta_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue leaderboard movement month-over-month: each
    brand's rank within the month, its previous-month rank, and the
    delta (positive = climbed). Two window families over ONE monthly
    aggregate — rank partitioned by month, lag partitioned by brand —
    the aggregate-then-window shape that keeps both sorts on the
    (months × brands) grid instead of the fact table. Rank is
    `row_number` with a full (revenue DESC, brand) tiebreak over
    exact integer cents, so the leaderboard is deterministic; first
    months rank against NULL prev (no delta)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "month"
            ),
            "p_brand",
        )
        .agg(F.sum(revenue_cents()).alias("rev_c"))
    )
    wrank = Window.partitionBy("month").orderBy(F.desc("rev_c"), "p_brand")
    ranked = monthly.select(
        "month",
        "p_brand",
        (F.col("rev_c").cast("double") / 1e4).alias("revenue"),
        F.row_number().over(wrank).cast("long").alias("rnk"),
    )
    wlag = Window.partitionBy("p_brand").orderBy("month")
    return ranked.select(
        "month",
        "p_brand",
        "revenue",
        "rnk",
        F.lag("rnk").over(wlag).alias("prev_rnk"),
        (F.lag("rnk").over(wlag) - F.col("rnk")).alias("rank_delta"),
    )


@register(
    "stats_cramers_v",
    oracle="""
    WITH grid AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS prio, count(*) AS o
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT seg, prio, o,
             sum(o) OVER (PARTITION BY seg)  AS r,
             sum(o) OVER (PARTITION BY prio) AS c,
             sum(o) OVER ()                  AS n
      FROM grid
    ),
    cells AS (
      SELECT n,
             CAST(round(
               (CAST(n * o - r * c AS DOUBLE) * CAST(n * o - r * c AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
               * 1000000) AS BIGINT) AS chi2_micro
      FROM m
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           round(CAST(sum(chi2_micro) AS DOUBLE) / 1000000.0, 6) AS chi2,
           round(sqrt(CAST(sum(chi2_micro) AS DOUBLE) / 1000000.0
                      / (CAST(max(n) AS BIGINT) * 4)), 6) AS cramers_v
    FROM cells
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for market-segment × order-priority —
    the normalized [0,1] companion to the raw χ² grid
    ([[stats_chi2_cells]] reports cells; this reports the one-number
    strength). χ² is assembled as Σ(n·o − r·c)²/(n·r·c) with margins
    from unordered windows over the 25-cell grid; each cell's term is
    snapped to an exact micro-integer before the (order-sensitive)
    sum, and min(r−1, c−1) = 4 for the 5×5 domain. The only
    data-sized work is the customer⋈orders count grid — one broadcast
    join, one hash aggregate."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    grid = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wseg = Window.partitionBy("seg")
    wprio = Window.partitionBy("prio")
    wall = Window.partitionBy()
    m = grid.select(
        "o",
        F.sum("o").over(wseg).alias("r"),
        F.sum("o").over(wprio).alias("c"),
        F.sum("o").over(wall).alias("n"),
    )
    diff = (F.col("n") * F.col("o") - F.col("r") * F.col("c")).cast("double")
    cells = m.select(
        "n",
        F.round(
            diff
            * diff
            / (
                F.col("n").cast("double")
                * F.col("r").cast("double")
                * F.col("c").cast("double")
            )
            * 1000000
        )
        .cast("long")
        .alias("chi2_micro"),
    )
    chi2 = F.sum("chi2_micro").cast("double") / 1000000.0
    return cells.agg(
        F.max("n").cast("long").alias("n"),
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (F.max("n").cast("long") * 4)), 6
        ).alias("cramers_v"),
    )


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH markers(lang, token) AS (
      VALUES {", ".join(f"('{lang}', '{tok}')" for lang, toks in _LANG_MARKERS.items() for tok in toks)}
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    votes AS (
      SELECT t.doc_id, m.lang, count(*) AS hits
      FROM toks t JOIN markers m ON t.token = m.token
      GROUP BY t.doc_id, m.lang
    ),
    pred AS (
      SELECT doc_id, lang AS lang_pred FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, lang) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT d.lang AS lang_true, p.lang_pred, count(*) AS n
    FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY 1, 2
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-vote language identifier
    ([[text_langid_vote]]) against the labeled `lang` column — the
    eval loop that decides whether the cheap classifier's precision
    justifies skipping the expensive one. Reuses the production
    predictor verbatim (same function), joins predictions back to
    labels, and counts (true, predicted) pairs; docs with zero marker
    hits are absent from both sides by construction. The join is
    doc_id-keyed on the prediction output (domain: docs with hits),
    aggregated to a |langs|² grid."""
    pred = text_langid_vote(spark, sf_dir).select("doc_id", "lang_pred")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_true")
    )
    return (
        pred.join(docs, "doc_id")
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
