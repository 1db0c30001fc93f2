"""Frontier extensions, part 19 — SCD2 point-in-time lookup, moving-
average type-token ratio (lexical diversity), and Cohen's d effect
size (SURVEY.md §2 B11 continuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.queries.analytics_ext import (
    win_scd2_intervals,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load

_SQL_SCD2 = """
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id)
                 AS prev_type
        FROM events
      )
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    intervals AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
             epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER (
                 PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             )) AS valid_to_us
      FROM changes
    )
"""


@register(
    "join_scd2_asof_lookup",
    oracle=f"""
    WITH {_SQL_SCD2},
    probes AS (
      SELECT event_id AS probe_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS probe_us
      FROM events
      WHERE event_type = 'purchase' AND event_id % 89 = 0
    )
    SELECT p.probe_id, p.user_id, p.probe_us,
           i.event_type AS state_at_probe
    FROM probes p
    JOIN intervals i
      ON i.user_id = p.user_id
     AND i.valid_from_us <= p.probe_us
     AND (i.valid_to_us IS NULL OR p.probe_us < i.valid_to_us)
    """,
)
def join_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against SCD2 history: for a sample of
    purchase events, find the state interval ([[win_scd2_intervals]],
    reused verbatim) containing each probe's timestamp — 'what was
    this entity's state when X happened', the query bitemporal
    warehouses exist to answer. The containment join is user-keyed
    with a range residual, so both sides share one user_id exchange;
    half-open intervals [from, to) make each probe match EXACTLY one
    interval (the open current interval catches the tail). At 100 TB
    the interval side is the compacted history table — orders of
    magnitude smaller than the event log it came from."""
    intervals = win_scd2_intervals(spark, sf_dir).select(
        F.col("user_id").alias("i_user"),
        F.col("event_type").alias("state_at_probe"),
        "valid_from_us",
        "valid_to_us",
    )
    ev = load(spark, sf_dir, "events")
    probes = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 89 == 0)
    ).select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        F.unix_micros("ts").alias("probe_us"),
    )
    return probes.join(
        intervals,
        (F.col("user_id") == F.col("i_user"))
        & (F.col("valid_from_us") <= F.col("probe_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("probe_us") < F.col("valid_to_us"))
        ),
    ).select("probe_id", "user_id", "probe_us", "state_at_probe")


@register(
    "text_mattr_diversity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, len(t) AS n_tokens,
             CAST(list_reduce([CAST(0 AS BIGINT)] ||
               [CAST(len(list_distinct(list_slice(t, i, i + 19))) AS BIGINT)
                FOR i IN generate_series(1, len(t) - 19)],
               (a, b) -> a + b) AS BIGINT) AS sum_distinct,
             len(t) - 19 AS n_windows
      FROM toks WHERE len(t) >= 20
    )
    SELECT lang,
           count(*) AS n_docs,
           round(CAST(sum(sum_distinct) AS DOUBLE) / 20.0
                 / CAST(sum(n_windows) AS BIGINT), 6) AS mattr_20
    FROM scored
    GROUP BY lang
    """,
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR-20 lexical diversity per language: the moving-average
    type-token ratio — mean distinct-token share over every sliding
    20-token window — which, unlike raw TTR, does not collapse as
    documents get longer (the length-robust quality signal next to
    [[text_repetition_score]] and [[text_hapax_ratio]]). The window
    slide is pure JVM array work (sequence → slice → array_distinct →
    size) inside the scan; per-doc sums are exact integers, and the
    corpus MATTR is one division of exact sums. Docs under 20 tokens
    are excluded on both engines."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.filter(F.split("text", " "), lambda x: x != F.lit("")).alias("t"),
    ).filter(F.size("t") >= 20)
    win_distinct = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 19),
            lambda i: F.size(F.array_distinct(F.slice(F.col("t"), i, 20))).cast(
                "long"
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = toks.select(
        "lang",
        win_distinct.alias("sum_distinct"),
        (F.size("t") - 19).cast("long").alias("n_windows"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("sum_distinct").cast("double")
            / 20.0
            / F.sum("n_windows"),
            6,
        ).alias("mattr_20"),
    )


@register(
    "stats_cohens_d",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS s2
      FROM events
      WHERE event_type IN ('purchase', 'click')
      GROUP BY 1
    ),
    w AS (
      SELECT max(CASE WHEN grp = 1 THEN n END) AS n1,
             max(CASE WHEN grp = 1 THEN s1 END) AS sa1,
             max(CASE WHEN grp = 1 THEN CAST(s2 AS DOUBLE) END) AS sq1,
             max(CASE WHEN grp = 0 THEN n END) AS n2,
             max(CASE WHEN grp = 0 THEN s1 END) AS sa2,
             max(CASE WHEN grp = 0 THEN CAST(s2 AS DOUBLE) END) AS sq2
      FROM m
    )
    SELECT n1, n2,
           round((CAST(sa1 AS DOUBLE) / n1 - CAST(sa2 AS DOUBLE) / n2)
                 / sqrt(((sq1 - CAST(sa1 AS DOUBLE) * sa1 / n1)
                         + (sq2 - CAST(sa2 AS DOUBLE) * sa2 / n2))
                        / (n1 + n2 - 2)) , 6) AS cohens_d
    FROM w
    """,
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size between purchase and click event values:
    the standardized mean difference (pooled-SD denominator) that
    turns [[stats_welch_t_test]]'s 'significant?' into 'how big?' —
    the number meta-analyses and power calculations
    ([[stats_ab_mde]]) actually consume. Exact integer cents moments
    per group (second moment in HUGEINT/double — squared cents exceed
    int64), one closed-form expression with identical association on
    both engines."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    c = F.round(F.col("value") * 100).cast("long")
    cd = c.cast("decimal(19,0)")
    m = e.groupBy(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("s1"),
        F.sum((cd * cd).cast("decimal(38,0)")).alias("s2"),
    )
    w = m.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("s1"))).alias("sa1"),
        F.max(F.when(F.col("grp") == 1, F.col("s2").cast("double"))).alias(
            "sq1"
        ),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == 0, F.col("s1"))).alias("sa2"),
        F.max(F.when(F.col("grp") == 0, F.col("s2").cast("double"))).alias(
            "sq2"
        ),
    )
    sa1d, sa2d = F.col("sa1").cast("double"), F.col("sa2").cast("double")
    pooled = (
        (F.col("sq1") - sa1d * F.col("sa1") / F.col("n1"))
        + (F.col("sq2") - sa2d * F.col("sa2") / F.col("n2"))
    ) / (F.col("n1") + F.col("n2") - 2)
    return w.select(
        "n1",
        "n2",
        F.round(
            (sa1d / F.col("n1") - sa2d / F.col("n2")) / F.sqrt(pooled), 6
        ).alias("cohens_d"),
    )
