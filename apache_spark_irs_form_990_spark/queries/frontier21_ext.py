"""Frontier extensions, part 21 — join-key skew auditing and k-NN
label-noise candidates (SURVEY.md §2 B11 continuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.queries.robust_ext import sim_knn_classify
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "audit_join_key_skew",
    oracle="""
    WITH fanout AS (
      SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1
    ),
    stats AS (
      SELECT k, c,
             sum(c) OVER () AS total,
             count(*) OVER () AS n_keys,
             quantile_cont(c, 0.99) OVER () AS p99
      FROM fanout
    )
    SELECT k AS hot_key, CAST(c AS BIGINT) AS fanout,
           round(CAST(c AS DOUBLE) * n_keys / total, 6) AS x_mean,
           round(p99, 6) AS p99_fanout
    FROM stats
    ORDER BY c DESC, k
    LIMIT 10
    """,
)
def audit_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew audit: the fanout distribution of a join key
    BEFORE the join runs — hottest 10 keys, each as a multiple of the
    mean, against the p99 fanout. This is the measurement that decides
    between letting AQE's skew-join split handle it and reaching for
    explicit salting ([[join_skew_salted]] /
    [[agg_skew_salted_twostage]]) — SCALE.md §1's 'two tools' rule
    needs this number to pick one. One count aggregate (key-domain
    sized); the corpus totals and the exact p99 come back as a
    broadcast 1-row cross join rather than unordered windows — the
    per-key count table is |keys|-sized and must never collapse into
    a single window task. The hot-multiple is an exact cross-ratio."""
    li = load(spark, sf_dir, "lineitem")
    fanout = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = fanout.agg(
        F.sum("c").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.expr("percentile(c, 0.99)").alias("p99"),
    )
    stats = fanout.crossJoin(F.broadcast(tot))
    return (
        stats.select(
            F.col("k").alias("hot_key"),
            F.col("c").alias("fanout"),
            F.round(
                F.col("c").cast("double") * F.col("n_keys") / F.col("total"), 6
            ).alias("x_mean"),
            F.round("p99", 6).alias("p99_fanout"),
        )
        .orderBy(F.desc("fanout"), "hot_key")
        .limit(10)
    )


@register(
    "ml_label_noise_candidates",
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
    ),
    pred AS (
      SELECT test_id, true_label, nn_label AS predicted_label, n_votes
      FROM (SELECT *, row_number() OVER (PARTITION BY test_id
                                         ORDER BY n_votes DESC, nn_label) AS vr
            FROM votes)
      WHERE vr = 1
    )
    SELECT test_id, true_label, predicted_label, n_votes
    FROM pred
    WHERE predicted_label <> true_label AND n_votes >= 3
    """,
)
def ml_label_noise_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise candidates by neighborhood disagreement: held-out
    vectors whose 5-NN vote is a solid majority (≥3/5) for a DIFFERENT
    label than their own — the confident-learning-style shortlist a
    labeling team reviews first, because a clean point deep inside
    another class's neighborhood is usually a mislabel. Reuses the
    [[sim_knn_classify]] predictor verbatim and filters to confident
    disagreements; at 100 TB the candidate pairs come from the LSH
    buckets ([[sim_cosine_ann_lsh]]) instead of the bounded cross
    join, vote tail unchanged."""
    pred = sim_knn_classify(spark, sf_dir)
    return pred.filter(
        (F.col("predicted_label") != F.col("true_label"))
        & (F.col("n_votes") >= 3)
    ).select("test_id", "true_label", "predicted_label", "n_votes")
