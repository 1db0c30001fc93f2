"""Frontier extensions, part 10 — a full k-means Lloyd round, URL
canonicalization dedup, training-step data lineage, event-time disorder
auditing, and A/B minimum-detectable-effect sizing
(SURVEY.md §2 B10/B11 continuation).

House determinism conventions: exact integer accumulation (milli-int
distances, nano-int centroid sums), one IEEE division at the end,
full-column tiebreaks, deterministic seeds everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import global_order
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "sim_kmeans_lloyd_round",
    oracle="""
    WITH seeds AS (
      SELECT vec_id AS cid,
             [CAST(x AS DOUBLE) FOR x IN embedding] AS c
      FROM embeddings WHERE vec_id < 8
    ),
    dists AS (
      SELECT e.vec_id, s.cid, e.embedding AS emb,
             CAST(round(list_reduce(
               [CAST(0.0 AS DOUBLE)] ||
                 [(CAST(e.embedding[j] AS DOUBLE) - s.c[j])
                  * (CAST(e.embedding[j] AS DOUBLE) - s.c[j])
                  FOR j IN generate_series(1, 64)],
               (a, b) -> a + b) * 1000000) AS BIGINT) AS d2_micro
      FROM embeddings e, seeds s
    ),
    -- the embedding is CARRIED INLINE through the per-vec_id window,
    -- exactly as the Spark dataflow carries x — no re-join back to
    -- embeddings. A re-join on the non-unique vec_id (even DISTINCT
    -- (vec_id, embedding)) keeps 2 rows for a duplicated vec_id whose
    -- payloads differ, where the window keeps 1 (ADVICE r7): mirror
    -- the dataflow, not the schema.
    assigned AS (
      SELECT vec_id, cid, emb FROM (
        SELECT vec_id, cid, emb,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d2_micro, cid) AS rn
        FROM dists
      ) WHERE rn = 1
    ),
    sums AS (
      SELECT a.cid, j,
             sum(CAST(round(CAST(a.emb[j] AS DOUBLE) * 1000000000)
                      AS BIGINT)) AS s_nano,
             count(*) AS n
      FROM assigned a, generate_series(1, 64) AS g(j)
      GROUP BY a.cid, j
    ),
    shift AS (
      SELECT s.cid, s.n,
             CAST(round(
               (CAST(s.s_nano AS BIGINT) / 1000000000.0 / s.n - sd.c[s.j])
               * (CAST(s.s_nano AS BIGINT) / 1000000000.0 / s.n - sd.c[s.j])
               * 1000000000) AS BIGINT) AS comp_shift_nano
      FROM (SELECT cid, j, s_nano, n FROM sums) s
      JOIN seeds sd ON sd.cid = s.cid
    )
    SELECT cid AS cluster_id,
           CAST(max(n) AS BIGINT) AS n_members,
           round(sqrt(CAST(sum(comp_shift_nano) AS DOUBLE) / 1000000000.0), 6)
             AS centroid_shift
    FROM shift
    GROUP BY cid
    """,
)
def sim_kmeans_lloyd_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration of k-means (k=8, seeds = the first 8
    vectors by vec_id — deterministic init): assign every embedding to
    its nearest seed (exact micro-integer squared distances, ties to
    the lower centroid id), recompute each centroid as the member
    mean (nano-integer component sums — order-independent on any
    partitioning), and report cluster sizes plus how far each centroid
    moved. This is the training loop that produces IVF codebooks
    ([[sim_cosine_ann_ivf]] consumes one); at 100 TB the assign step
    is a broadcast-k scan (no shuffle), the recompute is ONE
    (cluster, dim)-keyed aggregate of longs, and rounds repeat until
    max(centroid_shift) converges. The whole round is exact-integer
    end-to-end except the final per-centroid mean and the shift's
    closed-form sqrt."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("x"),
    )
    seeds = (
        emb.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("x").alias("c"))
    )
    d2_micro = F.round(
        F.aggregate(
            F.zip_with(F.col("x"), F.col("c"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        * 1000000
    ).cast("long")
    dists = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "cid", "x", d2_micro.alias("d2_micro")
    )
    wmin = Window.partitionBy("vec_id").orderBy("d2_micro", "cid")
    assigned = (
        dists.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "x")
    )
    sums = (
        assigned.select(
            "cid",
            F.posexplode("x").alias("pos", "xj"),
        )
        .select(
            "cid",
            (F.col("pos") + 1).alias("j"),
            F.round(F.col("xj") * 1000000000).cast("long").alias("nano"),
        )
        .groupBy("cid", "j")
        .agg(F.sum("nano").alias("s_nano"), F.count(F.lit(1)).alias("n"))
    )
    seed_long = seeds.select(
        "cid", F.posexplode("c").alias("pos", "cj")
    ).select("cid", (F.col("pos") + 1).alias("j"), "cj")
    shift = sums.join(F.broadcast(seed_long), ["cid", "j"]).select(
        "cid",
        "n",
        F.round(
            (
                (F.col("s_nano").cast("bigint") / 1000000000.0 / F.col("n")
                 - F.col("cj"))
                * (F.col("s_nano").cast("bigint") / 1000000000.0 / F.col("n")
                   - F.col("cj"))
            )
            * 1000000000
        )
        .cast("long")
        .alias("comp_shift_nano"),
    )
    return shift.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.max("n").cast("long").alias("n_members"),
        F.round(
            F.sqrt(F.sum("comp_shift_nano").cast("double") / 1000000000.0), 6
        ).alias("centroid_shift"),
    )


@register(
    "text_url_canonicalize",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.Example.COM/docs/'
               || CAST(doc_id % 50 AS VARCHAR)
               || '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)
               || '&utm_campaign=x#frag' || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(url), '#.*$', ''),
                 'utm_[a-z]+=[^&]*&?', '', 'g'),
               '[?&]$', '') AS curl
      FROM urls
    )
    SELECT curl, count(*) AS n_aliases, min(doc_id) AS first_doc
    FROM canon
    GROUP BY curl
    HAVING count(*) > 1
    """,
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the crawl-frontier rule that
    collapses tracking-parameter and fragment variants of the same
    page: lowercase, strip `#fragment`, strip `utm_*` parameters,
    trim dangling separators, then group aliases. Synthetic URLs are
    constructed so ~20 docs alias each canonical page via distinct
    utm/fragment decorations. Pure codegen regex chain (the same
    shape as [[text_pii_scrub]]) followed by one digest-sized
    aggregate; at crawl scale this runs map-side in the frontier
    dedup before any fetch is scheduled."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".Example.COM/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("&utm_campaign=x#frag"),
        F.col("doc_id").cast("string"),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(url), r"#.*$", ""),
            r"utm_[a-z]+=[^&]*&?",
            "",
        ),
        r"[?&]$",
        "",
    )
    return (
        d.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).alias("n_aliases"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_aliases") > 1)
    )


@register(
    "pipeline_step_data_trace",
    oracle="""
    WITH ordered AS (
      SELECT doc_id, source,
             row_number() OVER (ORDER BY md5('epoch7|' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS position
      FROM documents
    )
    SELECT CAST((position - 1) // 32 AS BIGINT) AS step,
           CAST(position AS BIGINT) AS position,
           doc_id, source
    FROM ordered
    WHERE (position - 1) // 32 IN (4, 5)
    ORDER BY position
    """,
)
def pipeline_step_data_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-step data lineage: given the deterministic epoch-7
    shuffle order ([[pipeline_epoch_shuffle]]) and batch size 32,
    return exactly the documents the model consumed at steps 4-5 —
    the query you run when a loss spike at step N demands 'show me
    that batch'. Reproducible data ordering is what makes this
    answerable at all (with `rand()` shuffling the answer changes
    per run/partitioning); the position→step map is pure integer
    arithmetic on the rank. The rank — formerly one unpartitioned
    window, a single-task sort — comes from `global_order` over the
    md5 epoch key (range-partition + per-partition rank + broadcast
    offsets), the DataFrame expression of the epoch manifest a 100 TB
    pipeline writes at shuffle time."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("epoch7|"), F.col("doc_id").cast("string")))
    ordered = global_order(
        d.select("doc_id", "source", key.alias("_ekey")),
        ["_ekey", "doc_id"],
        rn_col="position",
    ).drop("_ekey")
    return (
        ordered.withColumn(
            "step", F.floor((F.col("position") - 1) / 32).cast("bigint")
        )
        .filter(F.col("step").isin(4, 5))
        .select(
            "step",
            F.col("position").cast("bigint").alias("position"),
            "doc_id",
            "source",
        )
        .orderBy("position")
    )


@register(
    "audit_event_disorder",
    oracle="""
    WITH arr AS (
      SELECT event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             max(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY event_type ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS max_seen
      FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN tus < max_seen THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(max(CASE WHEN tus < max_seen THEN max_seen - tus END)
                AS BIGINT) AS max_disorder_micros
    FROM arr
    GROUP BY event_type
    """,
)
def audit_event_disorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder audit: treating event_id as arrival order,
    count events whose timestamp is EARLIER than the running maximum
    already seen for their type, and the worst lag — the measurement
    that SIZES a streaming watermark (`withWatermark` delay should
    cover ~max_disorder, B8 queries use 10-60 min). One running-max
    window per type over integer epoch-micros; exact integer lags, no
    tolerance. A pipeline that never measures this either drops late
    data silently or holds state forever."""
    e = load(spark, sf_dir, "events")
    tus = F.unix_micros("ts")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = e.select(
        "event_type",
        tus.alias("tus"),
        F.max(tus).over(w).alias("max_seen"),
    )
    late = F.when(F.col("tus") < F.col("max_seen"), 1).otherwise(0)
    return arr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(late).alias("n_out_of_order"),
        F.max(
            F.when(
                F.col("tus") < F.col("max_seen"),
                F.col("max_seen") - F.col("tus"),
            )
        ).alias("max_disorder_micros"),
    )


@register(
    "stats_ab_mde",
    oracle="""
    WITH base AS (
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM events
    )
    SELECT n, conv,
           CAST(conv AS DOUBLE) / n AS base_rate,
           round((1.959963985 + 0.841621234)
                 * sqrt(2.0 * (CAST(conv AS DOUBLE) / n)
                        * (1.0 - CAST(conv AS DOUBLE) / n)
                        / (CAST(n AS DOUBLE) / 2.0)), 6)
             AS mde_abs
    FROM base
    """,
)
def stats_ab_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test power analysis: the minimum detectable absolute effect
    (MDE) for a 50/50 split of the observed traffic at α=0.05
    (two-sided) and 80% power — the go/no-go sizing check run BEFORE
    launching an experiment ([[beh_ab_test_z]] is the after). Closed
    form (z_{α/2}+z_β)·√(2p(1−p)/n_arm) over two exact integers from
    one aggregate pass; the z constants are fixed literals, so both
    engines evaluate the identical expression tree."""
    e = load(spark, sf_dir, "events")
    base = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    p = F.col("conv").cast("double") / F.col("n")
    return base.select(
        "n",
        "conv",
        p.alias("base_rate"),
        F.round(
            (F.lit(1.959963985) + F.lit(0.841621234))
            * F.sqrt(
                2.0 * p * (1.0 - p) / (F.col("n").cast("double") / 2.0)
            ),
            6,
        ).alias("mde_abs"),
    )
