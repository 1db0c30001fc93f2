"""Frontier extensions, part 14 — grid-bucketed geospatial k-NN, the
Wald–Wolfowitz runs test, a dataset-card summary, and a table row
inventory (SURVEY.md §2 B11 continuation).

House determinism conventions throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import TABLES, load


# Deterministic synthetic coordinates: users scattered on a pseudo-random
# but exact integer grid (milli-degrees), same formula both engines.
_GEO_LAT_MILLI = "((user_id * 37213) % 160000) - 80000"
_GEO_LON_MILLI = "((user_id * 91019) % 360000) - 180000"


@register(
    "geo_cell_knn",
    oracle=f"""
    WITH pts AS (
      SELECT DISTINCT user_id,
             {_GEO_LAT_MILLI} AS lat_m,
             {_GEO_LON_MILLI} AS lon_m
      FROM events
    ),
    cells AS (
      SELECT user_id, lat_m, lon_m,
             (lat_m + 80000) // 10000 AS cy,
             (lon_m + 180000) // 10000 AS cx
      FROM pts
    ),
    probes AS (SELECT * FROM cells WHERE user_id % 97 = 0),
    cand AS (
      SELECT p.user_id AS q_user, c.user_id AS n_user,
             (p.lat_m - c.lat_m) * (p.lat_m - c.lat_m)
               + (p.lon_m - c.lon_m) * (p.lon_m - c.lon_m) AS d2
      FROM probes p
      JOIN cells c
        ON c.cy BETWEEN p.cy - 1 AND p.cy + 1
       AND c.cx BETWEEN p.cx - 1 AND p.cx + 1
       AND c.user_id <> p.user_id
    )
    SELECT q_user, n_user, CAST(d2 AS BIGINT) AS d2_milli
    FROM (
      SELECT q_user, n_user, d2,
             row_number() OVER (PARTITION BY q_user
                                ORDER BY d2, n_user) AS rn
      FROM cand
    ) WHERE rn <= 5
    """,
)
def geo_cell_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed geospatial k-NN: users on a deterministic integer
    milli-degree grid, probes matched only against the 3×3 cell
    neighborhood around them, then exact re-rank to the 5 nearest —
    the geohash/S2 pattern that turns an O(n²) all-pairs distance
    search into Σ(cell×neighborhood) candidate pairs, the spatial
    sibling of [[sim_cosine_ann_ivf]]'s coarse-quantize-then-probe.
    Cell ids are computed on the SHIFTED non-negative grid so integer
    division agrees across engines (floor vs truncate differ on
    negatives). Distances stay in EXACT integer milli-degrees² (planar — the
    haversine refinement is [[fn_geo_haversine]]'s expression, applied
    after candidate pruning in production). The 10000-milli-degree
    cell is chosen so a 3×3 neighborhood bounds the true 5-NN for
    probes here; a production system widens the probe ring when the
    k-th candidate exceeds the ring's guarantee radius."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select("user_id").distinct().select(
        "user_id",
        F.expr(_GEO_LAT_MILLI).alias("lat_m"),
        F.expr(_GEO_LON_MILLI).alias("lon_m"),
    )
    cells = pts.select(
        "*",
        F.floor((F.col("lat_m") + 80000) / 10000).alias("cy"),
        F.floor((F.col("lon_m") + 180000) / 10000).alias("cx"),
    )
    probes = cells.filter(F.col("user_id") % 97 == 0).select(
        F.col("user_id").alias("q_user"),
        F.col("lat_m").alias("q_lat"),
        F.col("lon_m").alias("q_lon"),
        F.col("cy").alias("q_cy"),
        F.col("cx").alias("q_cx"),
    )
    cand = cells.join(
        F.broadcast(probes),
        (F.col("cy") >= F.col("q_cy") - 1)
        & (F.col("cy") <= F.col("q_cy") + 1)
        & (F.col("cx") >= F.col("q_cx") - 1)
        & (F.col("cx") <= F.col("q_cx") + 1)
        & (F.col("user_id") != F.col("q_user")),
    ).select(
        "q_user",
        F.col("user_id").alias("n_user"),
        (
            (F.col("q_lat") - F.col("lat_m")) * (F.col("q_lat") - F.col("lat_m"))
            + (F.col("q_lon") - F.col("lon_m"))
            * (F.col("q_lon") - F.col("lon_m"))
        ).alias("d2"),
    )
    w = Window.partitionBy("q_user").orderBy("d2", "n_user")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_user", "n_user", F.col("d2").cast("long").alias("d2_milli"))
    )


@register(
    "stats_runs_test_wald",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum({sql_cents('o_totalprice')}) AS rev_c
      FROM orders GROUP BY 1
    ),
    signs AS (
      SELECT day,
             CASE WHEN rev_c > lag(rev_c) OVER (ORDER BY day)
                  THEN 1 ELSE 0 END AS up,
             lag(rev_c) OVER (ORDER BY day) AS prev
      FROM daily
    ),
    seq AS (SELECT day, up FROM signs WHERE prev IS NOT NULL),
    flagged AS (
      SELECT up, lag(up) OVER (ORDER BY day) AS prev_up FROM seq
    ),
    runs AS (
      SELECT CAST(sum(up) AS BIGINT) AS n_up,
             CAST(sum(1 - up) AS BIGINT) AS n_down,
             CAST(1 + sum(CASE WHEN prev_up IS NOT NULL AND up <> prev_up
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
      FROM flagged
    )
    SELECT n_up, n_down, n_runs,
           round((n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
                 / sqrt(2.0 * n_up * n_down
                        * (2.0 * n_up * n_down - n_up - n_down)
                        / ((n_up + n_down) * (n_up + n_down)
                           * (n_up + n_down - 1.0))), 6) AS z_runs
    FROM runs
    """,
)
def stats_runs_test_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the up/down sequence of daily
    revenue: too FEW runs means trending/sticky days, too MANY means
    oscillation — the nonparametric randomness check that validates
    the independence assumption behind control charts and A/B
    analysis ([[ts_cusum_change]] assumes what this tests). The
    up/down signs, run count and z closed form are all exact integers
    until the single final expression; the windows run on the
    calendar-bounded daily grid."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(cents("o_totalprice")).alias("rev_c")
    )
    wday = Window.orderBy("day")
    signs = daily.select(
        "day",
        F.when(F.col("rev_c") > F.lag("rev_c").over(wday), 1)
        .otherwise(0)
        .alias("up"),
        F.lag("rev_c").over(wday).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    flagged = signs.select(
        "up", F.lag("up").over(Window.orderBy("day")).alias("prev_up")
    )
    runs = flagged.agg(
        F.sum("up").alias("n_up"),
        F.sum(1 - F.col("up")).alias("n_down"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev_up").isNotNull()
                    & (F.col("up") != F.col("prev_up")),
                    1,
                ).otherwise(0)
            )
        ).alias("n_runs"),
    )
    nu, nd, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    mu = 2.0 * nu * nd / (nu + nd) + 1.0
    var = (
        2.0
        * nu
        * nd
        * (2.0 * nu * nd - nu - nd)
        / ((nu + nd) * (nu + nd) * (nu + nd - 1.0))
    )
    return runs.select(
        "n_up",
        "n_down",
        "n_runs",
        F.round((r - mu) / F.sqrt(var), 6).alias("z_runs"),
    )


@register(
    "pipeline_dataset_card",
    oracle="""
    WITH norm AS (
      SELECT doc_id, lang, source, n_chars,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    )
    SELECT count(*) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_unique_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) - count(DISTINCT fp) AS DOUBLE) / count(*)
             AS dup_rate,
           CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE) / count(*)
             AS mean_tokens_per_doc
    FROM norm
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATASET CARD in one pass: corpus size (docs, tokens, chars),
    composition breadth (languages, sources), normalized-duplicate
    rate, and mean document length — the single-row summary a model
    card's 'training data' section quotes, computed with the same
    fingerprint as the dedup operators so the dup_rate here IS what
    [[dedup_exact_normalized]] would remove. One scan, one aggregate
    with three exact distinct counts (Expand strategy,
    [[agg_distinct_multi]]); every number exact."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    n_tokens = F.size(
        F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    )
    norm = d.select(
        "lang", "source", "n_chars", fp.alias("fp"), n_tokens.alias("n_tokens")
    )
    return norm.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_unique_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_chars").alias("n_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        (
            (F.count(F.lit(1)) - F.count_distinct("fp")).cast("double")
            / F.count(F.lit(1))
        ).alias("dup_rate"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias(
            "mean_tokens_per_doc"
        ),
    )


@register(
    "audit_table_inventory",
    oracle="""
    SELECT 'region' AS table_name, count(*) AS n_rows FROM region
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'part', count(*) FROM part
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'events', count(*) FROM events
    UNION ALL SELECT 'documents', count(*) FROM documents
    UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    """,
)
def audit_table_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse row inventory: every table's row count in one report —
    the trivial-looking governance query that catches truncated loads
    and backfill drift before anything downstream does (paired with
    [[audit_referential_integrity]] for edge health and
    [[audit_snapshot_diff]] for content drift). Parquet count(*) is
    served from row-group metadata: ten footer reads, no data I/O."""
    parts = [
        load(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in TABLES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
