"""Frontier extensions, part 8 — GROUP BY ALL surface, built-in data
masking, URL parsing builtins, error-safe aggregates, and distributed
power iteration for the leading principal component
(SURVEY.md §2 B11 continuation).

The power iteration is the flagship here: a distributed linear-algebra
primitive (the training loop behind PCA whitening and IVF codebook
refinement) run as three DataFrame rounds with every cross-row sum
integerized, so the DuckDB oracle — three unrolled CTE rounds of the
same arithmetic — matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load, register_views


@register(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, year(l_shipdate)
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`GROUP BY ALL` — every non-aggregate select item becomes a
    grouping key, the modern SQL ergonomic both engines share. Parser
    sugar only: Catalyst resolves it to the explicit key list and
    plans the identical partial+final hash aggregate, which is what
    the explicit-form oracle checks."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               count(*) AS n
        FROM lineitem
        GROUP BY ALL
        """
    )


@register(
    "fn_mask_builtin",
    oracle="""
    SELECT regexp_replace(regexp_replace(regexp_replace(c_name,
             '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_name,
           count(*) AS n
    FROM customer
    GROUP BY 1
    """,
)
def fn_mask_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column masking with the `mask()` BUILT-IN (upper→X, lower→x,
    digit→n, other preserved) — the data-governance primitive for
    sharing table shapes without values, complementing the regex
    redaction of [[text_pii_scrub]]. The oracle re-implements the
    masking spec independently with regex chains, so the builtin's
    character-class semantics are cross-checked, not assumed. Masked
    shapes aggregate to a tiny name-pattern census — which is also the
    practical use: verifying every value matches the expected shape
    before export."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(F.expr("mask(c_name)").alias("masked_name"))
        .groupBy("masked_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fn_parse_url_builtin",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang
               || '&n=' || CAST(n_chars AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM urls
    WHERE doc_id % 67 = 0
    """,
)
def fn_parse_url_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the `parse_url` BUILT-IN (HOST / PATH /
    QUERY-parameter extraction) against an independent regex oracle —
    the builtin-vs-spec cross-check pattern of [[fn_luhn_check]]
    applied to the crawl-pipeline workhorse ([[text_url_domain_stats]]
    does the corpus-level regex version; this checks the JVM builtin a
    production pipeline would actually use, since parse_url handles
    encoding corner cases regexes miss). URLs are constructed
    deterministically from document columns; output is a 1/67 key
    sample."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    return (
        d.filter(F.col("doc_id") % 67 == 0)
        .select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            F.expr("parse_url(url, 'HOST')").alias("host"),
            F.expr("parse_url(url, 'PATH')").alias("path"),
            F.expr("parse_url(url, 'QUERY', 'lang')").alias("lang_param"),
        )
    )


@register(
    "fn_try_aggregates",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(sum({sql_cents('o_totalprice')}) AS BIGINT) AS try_sum_cents,
           CAST(CAST(sum({sql_cents('o_totalprice')}) AS BIGINT) AS DOUBLE)
             / count(*) / 100.0 AS try_avg_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def fn_try_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe aggregates `try_sum`/`try_avg` — ANSI-mode's answer
    to the reference's swallow-everything `except:` (A15): overflow
    yields NULL for that group instead of killing the job, and the
    pipeline's quarantine logic sees it. At this scale no overflow
    occurs, so the oracle is the plain exact-cents aggregate —
    asserting the try-variants are zero-cost on the happy path (same
    partial+final plan, same exact results). Completes the try-family
    row (try_cast / try_divide / try_to_number elsewhere)."""
    o = load(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    return (
        o.select("o_orderstatus", c.alias("c"))
        .groupBy("o_orderstatus")
        .agg(
            F.expr("try_sum(c)").alias("try_sum_cents"),
            (
                F.expr("try_sum(c)").cast("double")
                / F.count(F.lit(1))
                / 100.0
            ).alias("try_avg_price"),
        )
    )


_DIMS = 64
_PI_ROUNDS = 3

# One oracle round: w = snap6(X·v); u_j = Σ_i snap9(x_ij · w_i); v' = u/‖u‖.
# {v} is the name of the previous round's CTE holding `v` (a 64-list).
_PI_SQL_ROUND = """
    w{k} AS (
      -- embedding carried through (NOT re-joined on vec_id): a
      -- duplicated vec_id row would otherwise join 2x2 and weight the
      -- dup 4x where the Spark dataflow weights it 2x
      SELECT e.vec_id, e.embedding,
             CAST(round(list_reduce(
               [CAST(0.0 AS DOUBLE)] ||
                 [CAST(e.embedding[j] AS DOUBLE) * {v}.v[j]
                  FOR j IN generate_series(1, 64)],
               (a, b) -> a + b) * 1000000) AS BIGINT) AS wmic
      FROM embeddings e, {v}
    ),
    u{k} AS (
      SELECT j,
             sum(CAST(round(CAST(w.embedding[j] AS DOUBLE)
                            * (CAST(w.wmic AS DOUBLE) / 1000000.0)
                            * 1000000000) AS BIGINT)) AS unano
      FROM w{k} w, generate_series(1, 64) AS g(j)
      GROUP BY j
    ),
    n{k} AS (
      SELECT sqrt(list_reduce(
               [CAST(0.0 AS DOUBLE)] ||
                 list((CAST(unano AS BIGINT) / 1000000000.0)
                      * (CAST(unano AS BIGINT) / 1000000000.0) ORDER BY j),
               (a, b) -> a + b)) AS nrm
      FROM u{k}
    ),
    v{k} AS (
      SELECT list(CAST(unano AS BIGINT) / 1000000000.0 / n{k}.nrm
                  ORDER BY j) AS v
      FROM u{k}, n{k}
      GROUP BY n{k}.nrm
    )
"""


@register(
    "sim_power_iteration_pc1",
    oracle="WITH v0 AS (SELECT [CAST(0.125 AS DOUBLE) FOR _ IN generate_series(1, 64)] AS v),\n"
    + ",\n".join(
        _PI_SQL_ROUND.format(k=k, v=f"v{k-1}") for k in range(1, _PI_ROUNDS + 1)
    )
    + f"""
    SELECT CAST(j AS INT) AS dim, round(v[j], 6) AS pc1
    FROM v{_PI_ROUNDS}, generate_series(1, 64) AS g(j)
    """,
)
def sim_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading principal direction of the (uncentered) embedding Gram
    matrix by POWER ITERATION — v ← XᵀXv / ‖XᵀXv‖, three rounds from
    the deterministic start v₀ = (1/8,…,1/8) (1/√64, an exact binary
    fraction). This is distributed linear algebra as DataFrame ops:
    each round is (1) per-vector dot products x·v — a fold over the
    array, no shuffle; (2) the d-dimensional weighted sum Σᵢ wᵢxᵢ — a
    posexplode + 64-group hash aggregate, the ONLY data-sized shuffle,
    carrying one long per (vector, dim); (3) normalization on the
    64-row result. Cross-row sums are integerized per term (micro for
    dots, nano for components) so any partitioning yields identical
    bits; within-array folds are fixed-order. At 100 TB the same three
    rounds train IVF codebooks ([[sim_cosine_ann_ivf]]) and PCA
    whitening, with v broadcast and X scanned once per round. Oracle:
    the identical arithmetic unrolled as DuckDB CTEs."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("x"),
    )
    v_df = spark.createDataFrame(
        [([0.125] * _DIMS,)], "v array<double>"
    )
    for _ in range(_PI_ROUNDS):
        withv = emb.crossJoin(F.broadcast(v_df))
        w = withv.select(
            "vec_id",
            "x",
            F.round(
                F.aggregate(
                    F.zip_with(F.col("x"), F.col("v"), lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, p: acc + p,
                )
                * 1000000
            )
            .cast("long")
            .alias("wmic"),
        )
        terms = w.select(
            F.posexplode("x").alias("pos", "xj"),
            (F.col("wmic").cast("double") / 1000000.0).alias("wp"),
        ).select(
            (F.col("pos") + 1).alias("j"),
            F.round(F.col("xj") * F.col("wp") * 1000000000)
            .cast("long")
            .alias("nano"),
        )
        u = terms.groupBy("j").agg(F.sum("nano").alias("unano"))
        v_row = u.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "unano"))),
                lambda s: s.getField("unano").cast("bigint") / 1000000000.0,
            ).alias("u")
        )
        v_df = v_row.select(
            F.transform(
                "u",
                lambda uj: uj
                / F.sqrt(
                    F.aggregate(
                        F.transform("u", lambda a: a * a),
                        F.lit(0.0),
                        lambda acc, s: acc + s,
                    )
                ),
            ).alias("v")
        ).localCheckpoint()
    return v_df.select(
        F.posexplode("v").alias("pos", "comp")
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round("comp", 6).alias("pc1"),
    )
