"""Robust statistics, argmax builtins, key minting, indexed series,
k-NN classification and word-shape profiling (SURVEY.md §2 B11
continuation).

All EXT relative to the reference. Shared determinism conventions
(exact integer state, single-division ratios, full-column tiebreaks)
as the sibling modules; the k-NN query reuses the integer milli-unit
vector snapping proven by `operators/similarity.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.vectors import (
    nonzero_milli,
    dot,
    milli_vec,
    sq_norm,
)
from apache_spark_irs_form_990_spark.functions.money import (
    SQL_REVENUE_CENTS,
    cents,
    revenue_cents,
    sql_cents,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "agg_trimmed_mean",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(round(value * 100) AS BIGINT),
                                         event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(v_cents) AS BIGINT) AS sum_cents,
           CAST(sum(v_cents) AS DOUBLE) / 100.0 / count(*) AS trimmed_mean
    FROM v
    WHERE 10 * rn > n AND 10 * rn <= 9 * n
    GROUP BY event_type
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of event value per type — the robust
    location estimate that survives fat tails where the plain mean
    does not. Trim bounds are rank-based with the cross-multiplied
    integer predicate `10·rn > n ∧ 10·rn ≤ 9·n` (no float percentile,
    no interpolation ambiguity); ranks order by (cents, event_id) so
    ties trim identically on both engines. One window pass assigns
    rank and group size together (same partition spec → one exchange +
    sort), then the kept rows collapse in an exact-integer mean."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(cents("value"), "event_id")
    v = e.select(
        "event_type",
        cents("value").alias("v_cents"),
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    kept = v.filter((10 * F.col("rn") > F.col("n")) & (10 * F.col("rn") <= 9 * F.col("n")))
    return kept.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("v_cents").cast("long").alias("sum_cents"),
        (F.sum("v_cents").cast("double") / 100.0 / F.count("*")).alias(
            "trimmed_mean"
        ),
    )


@register(
    "agg_max_by_min_by",
    oracle=f"""
    SELECT o_orderpriority,
           arg_max(o_orderkey,
                   {sql_cents('o_totalprice')} * 10000000000 + o_orderkey)
             AS most_expensive_order,
           arg_min(o_orderkey,
                   {sql_cents('o_totalprice')} * 10000000000 + o_orderkey)
             AS cheapest_order,
           CAST(max({sql_cents('o_totalprice')}) AS DOUBLE) / 100.0
             AS max_price,
           CAST(min({sql_cents('o_totalprice')}) AS DOUBLE) / 100.0
             AS min_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`max_by` / `min_by` builtin surface (DuckDB spells them
    `arg_max`/`arg_min`): the order carrying the extreme total price
    per priority class. The ordering key is the UNIQUE composite
    integer `price_cents · 10¹⁰ + orderkey` — o_totalprice alone has
    duplicates, and an argmax over a tied ordering is
    engine-nondeterministic; the composite stays under 2^63 until
    orderkeys reach 10¹⁰ (SF ~600k). Single partial+final aggregate,
    4 longs of state per group."""
    o = load(spark, sf_dir, "orders")
    key = cents("o_totalprice") * F.lit(10000000000).cast("long") + F.col(
        "o_orderkey"
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("most_expensive_order"),
        F.min_by("o_orderkey", key).alias("cheapest_order"),
        (F.max(cents("o_totalprice")).cast("double") / 100.0).alias("max_price"),
        (F.min(cents("o_totalprice")).cast("double") / 100.0).alias("min_price"),
    )


@register(
    "fn_surrogate_key",
    oracle="""
    WITH k AS (
      SELECT md5(concat_ws('|', CAST(o_custkey AS VARCHAR),
                           CAST(o_orderdate AS VARCHAR),
                           CAST(o_orderkey AS VARCHAR))) AS sk
      FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT sk) AS BIGINT) AS n_keys,
           CAST(count(*) - count(DISTINCT sk) AS BIGINT) AS n_collisions,
           min(sk) AS first_key,
           max(sk) AS last_key
    FROM k
    """,
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key minting + collision audit: a stable md5 key over
    the pipe-joined business-key columns (the standard warehouse
    pattern for dimension keys that survive reloads), then a one-pass
    audit that row count equals distinct-key count. md5 hex is
    identical across engines (both lowercase), making the minted keys
    themselves oracle-hashable — min/max key pin actual values into
    the hash, not just counts. Key generation is map-side codegen; the
    audit is one distinct-count aggregate."""
    o = load(spark, sf_dir, "orders")
    sk = F.md5(
        F.concat_ws(
            "|",
            F.col("o_custkey").cast("string"),
            F.col("o_orderdate").cast("string"),
            F.col("o_orderkey").cast("string"),
        )
    )
    k = o.select(sk.alias("sk"))
    return k.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count_distinct("sk").cast("long").alias("n_keys"),
        (F.count("*") - F.count_distinct("sk")).cast("long").alias("n_collisions"),
        F.min("sk").alias("first_key"),
        F.max("sk").alias("last_key"),
    )


@register(
    "win_index_to_base",
    oracle=f"""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', CAST(l_shipdate AS TIMESTAMP)),
                      '%Y-%m') AS month,
             CAST(sum({SQL_REVENUE_CENTS}) AS BIGINT) AS rev_units
      FROM lineitem GROUP BY 1
    )
    SELECT month,
           CAST(rev_units AS DOUBLE) / 10000.0 AS revenue,
           CAST(rev_units AS DOUBLE) * 100.0
             / first_value(rev_units) OVER (ORDER BY month
                                            ROWS UNBOUNDED PRECEDING)
             AS index_base100
    FROM monthly
    """,
)
def win_index_to_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-to-base-100 series: each month's revenue relative to the
    first month (=100) — the normalized report form that makes growth
    comparable across series of different magnitude. The base comes
    from `first_value` over the month-ordered frame; like every
    aggregate-then-window query here, the unpartitioned window runs on
    the #months aggregate, not the fact table. The index is the chain
    `units · 100.0 / base_units` over two exact integers — one
    multiply, one divide, bit-identical."""
    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month")
    ).agg(F.sum(revenue_cents()).alias("rev_units"))
    base = F.first("rev_units").over(
        Window.orderBy("month").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return monthly.select(
        "month",
        (F.col("rev_units").cast("double") / 10000.0).alias("revenue"),
        (F.col("rev_units").cast("double") * 100.0 / base).alias("index_base100"),
    )


@register(
    "sim_knn_classify",
    oracle="""
    WITH m AS (
      SELECT vec_id, label, v FROM (
        SELECT vec_id, label,
                    list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        FROM embeddings
      ) WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    pairs AS (
      SELECT t.vec_id AS test_id, t.label AS true_label,
             r.label AS nn_label,
             CAST(list_sum(list_transform(range(1, 65),
                           i -> t.v[i] * r.v[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(t.v, x -> x * x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(r.v, x -> x * x)) AS DOUBLE)))
               AS cosine,
             r.vec_id AS train_id
      FROM m t JOIN m r ON t.vec_id % 5 = 0 AND r.vec_id % 5 != 0
    ),
    top5 AS (
      SELECT test_id, true_label, nn_label
      FROM (SELECT *, row_number() OVER (PARTITION BY test_id
                                         ORDER BY cosine DESC, train_id) AS rn
            FROM pairs)
      WHERE rn <= 5
    ),
    votes AS (
      SELECT test_id, true_label, nn_label, CAST(count(*) AS BIGINT) AS n_votes
      FROM top5 GROUP BY 1, 2, 3
    )
    SELECT test_id, true_label,
           nn_label AS predicted_label, n_votes,
           CASE WHEN nn_label = true_label THEN 1 ELSE 0 END AS correct
    FROM (SELECT *, row_number() OVER (PARTITION BY test_id
                                       ORDER BY n_votes DESC, nn_label) AS vr
          FROM votes)
    WHERE vr = 1
    """,
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote classification over the embedding table:
    vectors with `vec_id % 5 = 0` are the held-out test set, the rest
    vote with their labels weighted by presence in the cosine top-5.
    Exact integer milli-unit dot products (the similarity-module
    convention) make the cosine ranking bit-identical; ties break on
    train id at the k-cutoff and on smallest label in the vote. Scale
    path: replace the bounded cross join with the LSH-bucketed
    candidate pairs of `sim_cosine_ann_lsh` and keep the identical
    vote tail."""
    m = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", milli_vec(F.col("embedding")).alias("v")
    ).transform(nonzero_milli)
    m = m.withColumn("n", sq_norm(F.col("v")))
    t = m.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("test_id"),
        F.col("label").alias("true_label"),
        F.col("v").alias("tv"),
        F.col("n").alias("tn"),
    )
    r = m.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("train_id"),
        F.col("label").alias("nn_label"),
        F.col("v").alias("rv"),
        F.col("n").alias("rn_norm"),
    )
    cosine = dot(F.col("tv"), F.col("rv")).cast("double") / (
        F.sqrt(F.col("tn").cast("double")) * F.sqrt(F.col("rn_norm").cast("double"))
    )
    pairs = t.crossJoin(F.broadcast(r)).select(
        "test_id", "true_label", "nn_label", "train_id", cosine.alias("cosine")
    )
    wk = Window.partitionBy("test_id").orderBy(F.col("cosine").desc(), "train_id")
    top5 = pairs.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= 5)
    votes = top5.groupBy("test_id", "true_label", "nn_label").agg(
        F.count("*").cast("long").alias("n_votes")
    )
    wv = Window.partitionBy("test_id").orderBy(F.col("n_votes").desc(), "nn_label")
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "test_id",
            "true_label",
            F.col("nn_label").alias("predicted_label"),
            "n_votes",
            F.when(F.col("nn_label") == F.col("true_label"), 1)
            .otherwise(0)
            .alias("correct"),
        )
    )


@register(
    "text_word_shape",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    m AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(length(w) AS BIGINT)) AS BIGINT) AS sum_len,
             CAST(count(*) FILTER (WHERE length(w) >= 6) AS BIGINT)
               AS n_long,
             CAST(sum(CAST(length(w) AS BIGINT)
                      - CAST(length(regexp_replace(w, '[aeiouy]', '', 'g'))
                             AS BIGINT)) AS BIGINT) AS n_vowels
      FROM tok GROUP BY lang
    )
    SELECT lang, n_tokens,
           CAST(sum_len AS DOUBLE) / n_tokens AS avg_word_len,
           CAST(n_long AS DOUBLE) / n_tokens AS long_word_share,
           CAST(n_vowels AS DOUBLE) / sum_len AS vowel_density
    FROM m
    """,
)
def text_word_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-shape profile per language: mean token length, share of
    long (≥6-char) tokens, and vowel density — the LIX/Flesch-style
    complexity inputs that survive a corpus with no sentence
    punctuation (this one). Vowel counts use the strip-diff trick
    (length minus length-after-removing-vowels, same as
    `text_char_classes`) so no per-char explode happens; everything
    aggregates as exact integers in one pass over the token stream,
    with three single-division ratios at the end."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("w"))
    wlen = F.length("w").cast("long")
    m = tok.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(wlen).cast("long").alias("sum_len"),
        F.count_if(F.length("w") >= 6).cast("long").alias("n_long"),
        F.sum(
            wlen - F.length(F.regexp_replace("w", "[aeiouy]", "")).cast("long")
        )
        .cast("long")
        .alias("n_vowels"),
    )
    return m.select(
        "lang",
        "n_tokens",
        (F.col("sum_len").cast("double") / F.col("n_tokens")).alias("avg_word_len"),
        (F.col("n_long").cast("double") / F.col("n_tokens")).alias(
            "long_word_share"
        ),
        (F.col("n_vowels").cast("double") / F.col("sum_len")).alias("vowel_density"),
    )
