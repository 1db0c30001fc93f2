"""Frontier extensions, part 6 — Holt double-exponential smoothing,
OHLC candle resampling, the SCALAR_ITER pandas-UDF tier, duplicate-
cluster size profiling, and Luhn checksum validation
(SURVEY.md §2 B11 continuation).

House determinism conventions throughout; the Holt fold additionally
uses EXACT binary-fraction smoothing constants (0.5 / 0.25 / 0.75) so
the recursive IEEE sequence is bit-identical cross-engine with no
rounding at all, mirroring [[ts_ema_per_user]].
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from apache_spark_irs_form_990_spark.operators.components import (
    dedup_cluster_components,
    _SQL_CORPUS,
)
from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "ts_brown_double_smoothing",
    oracle="""
    WITH folded AS (
      SELECT user_id, count(*) AS n_events,
             list_reduce(
               list_transform(
                 list(CAST(value AS DOUBLE)
                      ORDER BY CAST(ts AS TIMESTAMP), event_id),
                 v -> {'s2': v, 's1': v}),
               (acc, x) -> {
                 's2': 0.5 * (0.5 * x.s1 + 0.5 * acc.s1) + 0.5 * acc.s2,
                 's1': 0.5 * x.s1 + 0.5 * acc.s1
               }) AS st
      FROM events
      GROUP BY user_id
    )
    SELECT user_id, n_events,
           st.s1 AS s1, st.s2 AS s2,
           2.0 * st.s1 - st.s2 AS level,
           st.s1 - st.s2 AS trend,
           (2.0 * st.s1 - st.s2) + (st.s1 - st.s2) AS forecast_next
    FROM folded
    """,
)
def ts_brown_double_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing per user (α=0.5): s1 =
    EMA(x), s2 = EMA(s1), level = 2s1−s2, trend = s1−s2 (α/(1−α)=1),
    one-step forecast = level + trend — the trend-aware recursive
    smoother one rung above [[ts_ema_per_user]] that window frames
    cannot express. State is a 2-field STRUCT folded over the
    time-ordered value array; the struct is ordered (s2, s1) with s1's
    update written out INSIDE s2's expression, so no field expression
    reads a field assigned earlier in the same step — making the fold
    well-defined under both accumulator semantics (snapshot, as
    Spark's `aggregate` does, and sequential field mutation, as
    DuckDB's `list_reduce` empirically does — Holt's coupled
    level/trend recursion cannot be ordered this way, which is why
    Brown's form is the oracle-checkable one). α is an exact binary
    fraction: identical IEEE sequence, bit-identical output, zero
    rounding."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "ts", "event_id", F.col("value").cast("double").alias("v")
                    )
                )
            ),
            lambda s: s.getField("v"),
        ).alias("vals"),
    )
    st = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.struct(
            F.element_at(F.col("vals"), 1).alias("s2"),
            F.element_at(F.col("vals"), 1).alias("s1"),
        ),
        lambda acc, x: F.struct(
            (
                F.lit(0.5)
                * (F.lit(0.5) * x + F.lit(0.5) * acc.getField("s1"))
                + F.lit(0.5) * acc.getField("s2")
            ).alias("s2"),
            (F.lit(0.5) * x + F.lit(0.5) * acc.getField("s1")).alias("s1"),
        ),
    )
    s1, s2 = st.getField("s1"), st.getField("s2")
    return per_user.select(
        "user_id",
        "n_events",
        s1.alias("s1"),
        s2.alias("s2"),
        (F.lit(2.0) * s1 - s2).alias("level"),
        (s1 - s2).alias("trend"),
        ((F.lit(2.0) * s1 - s2) + (s1 - s2)).alias("forecast_next"),
    )


@register(
    "ts_ohlc_daily",
    oracle=f"""
    SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_trades,
           CAST(min({{'t': CAST(ts AS TIMESTAMP), 'e': event_id,
                      'v': {sql_cents('value')}}}).v AS DOUBLE) / 100.0 AS open,
           CAST(max({sql_cents('value')}) AS DOUBLE) / 100.0 AS high,
           CAST(min({sql_cents('value')}) AS DOUBLE) / 100.0 AS low,
           CAST(max({{'t': CAST(ts AS TIMESTAMP), 'e': event_id,
                      'v': {sql_cents('value')}}}).v AS DOUBLE) / 100.0 AS close
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) candles over purchase values —
    the financial-resampling shape. Open and close are argmin/argmax
    over the (ts, event_id) timeline via lexicographic STRUCT min/max
    (the [[agg_argmin_struct]] trick: the tiebreak and the payload
    ride inside the comparator), so the whole candle is ONE aggregate
    pass — no window, no self-join, 4 longs + 2 structs of state per
    day. Values are exact integer cents; one division renders each."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    v = cents("value")
    open_s = F.min(F.struct(F.col("ts"), F.col("event_id"), v.alias("v")))
    close_s = F.max(F.struct(F.col("ts"), F.col("event_id"), v.alias("v")))
    return e.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_trades"),
        (open_s.getField("v").cast("double") / 100.0).alias("open"),
        (F.max(v).cast("double") / 100.0).alias("high"),
        (F.min(v).cast("double") / 100.0).alias("low"),
        (close_s.getField("v").cast("double") / 100.0).alias("close"),
    )


@register(
    "udf_scalar_iter_norm",
    oracle="""
    SELECT doc_id,
           substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 40)
             AS norm_prefix,
           length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
             AS norm_len
    FROM documents
    WHERE doc_id % 41 = 0
    """,
)
def udf_scalar_iter_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALAR_ITER pandas-UDF tier — the batch-iterator flavor
    whose point is amortizing expensive per-worker setup (a model, a
    tokenizer, a compiled regex table) ONCE before the batch loop,
    where a plain scalar pandas UDF would pay it per call. Here the
    'expensive init' is a compiled regex; each Arrow batch streams
    through the same normalization the SQL twin expresses natively —
    which is also the audit: UDF output hash-matches the built-in
    expression chain. Completes the Python surface matrix (scalar,
    scalar-iter, grouped-agg, grouped-map, flat-map, arrow-batch,
    UDTF) generalizing the reference's `process_record` hook
    (IRSSpark.py:260-268)."""
    import re

    @pandas_udf("string")
    def norm_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ws = re.compile(r"\s+")  # per-worker init, amortized across batches
        for s in batches:
            yield s.map(lambda t: ws.sub(" ", t.lower()).strip())

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 41 == 0)
    norm = norm_iter(F.col("text"))
    return docs.select(
        "doc_id",
        F.substring(norm, 1, 40).alias("norm_prefix"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@register(
    "dedup_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE corpus AS ({_SQL_CORPUS}),
    shingled0 AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_distinct([
                 array_to_string(list_slice(t, i, i + 2), ' ')
                 FOR i IN generate_series(1, len(t) - 2)
               ])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
      )
    ),
    -- mirrors dedup_cluster_components' document-frequency cap (r3)
    shingled AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               count(*) OVER (PARTITION BY shingle) AS df
        FROM shingled0
      ) WHERE df <= 100
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id),
    pairs AS (
      SELECT id_a, id_b
      FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM shingled a JOIN shingled b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      )
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.6
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach(id, comp) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
    ),
    labels AS (
      SELECT id AS doc_id, min(comp) AS component_id FROM reach GROUP BY id
    ),
    clusters AS (
      SELECT component_id, count(*) AS cluster_size
      FROM labels GROUP BY component_id
    )
    SELECT cluster_size,
           count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM clusters
    GROUP BY cluster_size
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution — the corpus-health report
    on top of [[dedup_cluster_components]]: how many clusters of each
    size exist and how many documents they hold. Size 1 = unique
    corpus; a fat tail of large clusters means template spam and
    predicts the dedup ratio before the expensive rewrite pass runs.
    Reuses the components operator verbatim, then two tiny aggregates
    over the |docs|-row label table (cluster sizes, then the
    histogram) — at 100 TB both are digest-keyed hash aggregates."""
    labels = dedup_cluster_components(spark, sf_dir)
    clusters = labels.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
    )


_LUHN_SQL_TERMS = " + ".join(
    (
        f"CASE WHEN 2 * CAST(substr(s, {i}, 1) AS INT) > 9 "
        f"THEN 2 * CAST(substr(s, {i}, 1) AS INT) - 9 "
        f"ELSE 2 * CAST(substr(s, {i}, 1) AS INT) END"
        if i % 2 == 1
        else f"CAST(substr(s, {i}, 1) AS INT)"
    )
    for i in range(1, 13)
)


@register(
    "fn_luhn_check",
    oracle=f"""
    WITH nums AS (
      SELECT lpad(CAST(o_orderkey * 7919 % 1000000000000 AS VARCHAR),
                  12, '0') AS s
      FROM orders
    )
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN ({_LUHN_SQL_TERMS}) % 10 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(CAST(sum(CASE WHEN ({_LUHN_SQL_TERMS}) % 10 = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / count(*) AS valid_rate
    FROM nums
    """,
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn checksum validation over synthetic 12-digit account numbers
    (orderkey-derived, deterministic) — the classic ingest gate for
    card/account fields. Spark side uses the `luhn_check` BUILT-IN;
    the oracle re-derives the checksum arithmetically (explicit
    double-every-second-digit sum), so this query cross-checks two
    independent IMPLEMENTATIONS of the spec, not one expression
    twice. Map-side codegen end-to-end; 3-long aggregate state."""
    o = load(spark, sf_dir, "orders")
    s = F.lpad(
        ((F.col("o_orderkey") * 7919) % 1000000000000).cast("string"), 12, "0"
    )
    valid = F.expr("luhn_check(s)")
    return (
        o.select(s.alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(valid, 1).otherwise(0)).alias("n_valid"),
            (
                F.sum(F.when(valid, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("valid_rate"),
        )
    )
