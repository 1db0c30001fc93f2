"""End-to-end corpus preparation pipeline (north star showcase).

The LLM-data operators (dedup.py, text_analysis.py) are graded
individually; this module composes them the way a training-data
pipeline actually runs them — dedup THEN quality-filter THEN corpus
stats, as ONE declarative plan. Catalyst fuses the stages: the quality
predicates and the stats projection all evaluate in the same
whole-stage-codegen pass over the dedup window's output; nothing
materializes between "stages" because there are no stages at the
physical level. That is the argument for building data pipelines on a
query engine rather than chaining batch scripts over intermediate
files — at 100 TB, every avoided materialization is hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "pipeline_corpus_prep",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text, lang
      FROM documents WHERE doc_id % 3 = 0
    ),
    dedup AS (
      SELECT doc_id, text, lang FROM (
        SELECT doc_id, text, lang,
               row_number() OVER (PARTITION BY sha256(text)
                                  ORDER BY doc_id) AS rn
        FROM corpus
      ) WHERE rn = 1
    ),
    quality AS (
      SELECT * FROM dedup
      WHERE length(text) BETWEEN 50 AND 5000
        AND CAST(length(text) AS DOUBLE)
            / len(string_split(text, ' ')) < 12.0
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS DOUBLE) / count(*) AS avg_chars
    FROM quality
    GROUP BY lang
    """,
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup → quality-filter → per-language corpus stats, one plan.

    Dedup is the window formulation (row_number over content hash,
    keep first by doc_id) rather than groupBy-min + semi-join: ONE
    shuffle on the 32-byte hash instead of two over the full corpus,
    and the survivor's full row rides along for free — at 100 TB that
    halves the dominant cost. Quality gates are the cheap built-in
    signals (length window, mean token length); the stats aggregate
    uses exact integer sums. (Duplicates synthesized as in
    dedup_exact_hash: every 3rd doc re-appears under doc_id+1e6.)
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dupes = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
    )
    corpus = docs.unionByName(dupes)

    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    dedup = (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    toks = F.split(F.col("text"), " ")
    quality = dedup.filter(
        F.length("text").between(50, 5000)
        & (F.length("text").cast("double") / F.size(toks) < 12.0)
    )

    return quality.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(toks).cast("long")).alias("n_tokens"),
        (F.sum(F.length("text").cast("long")).cast("double") / F.count(F.lit(1))).alias(
            "avg_chars"
        ),
    )


@register(
    "pipeline_pretrain_mix",
    oracle="""
    WITH gated AS (
      SELECT doc_id, text, lang, source,
             string_split(text, ' ') AS toks
      FROM documents
      WHERE n_chars >= 200
        AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) >= 0.3
    ),
    dedup AS (
      SELECT doc_id, lang, source, len(toks) AS n_tokens FROM (
        SELECT *,
               row_number() OVER (
                 PARTITION BY md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g'))
                 ORDER BY doc_id
               ) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    per_source AS (
      SELECT source,
             count(*) AS n_kept,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM dedup GROUP BY source
    ),
    totals AS (
      SELECT CAST(sum(n_kept) AS DOUBLE) AS total_kept,
             count(*) AS n_sources
      FROM per_source
    )
    SELECT p.source, p.n_kept, p.n_tokens,
           round(CAST(p.n_kept AS DOUBLE) / t.total_kept, 6) AS share,
           round(t.total_kept / (t.n_sources * CAST(p.n_kept AS DOUBLE)), 6)
               AS uniform_mix_weight
    FROM per_source p, totals t
    """,
)
def pipeline_pretrain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining-mix recipe as ONE fused plan: quality gates
    (length + lexical diversity) → normalization-aware dedup (first
    doc_id survives per folded fingerprint) → per-source token
    accounting → uniform-mixing weights (sample source s with weight ∝
    total/n_s to flatten the domain distribution). The gates and the
    fingerprint evaluate in the same codegen pass; the dedup window is
    the single data-sized shuffle; everything after runs on |sources|
    rows with the 2-row totals broadcast back. This is the complement
    of `pipeline_corpus_prep` (which grades dedup→filter→stats): here
    the product is the SAMPLING PLAN a trainer consumes."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    gated = d.filter(
        (F.col("n_chars") >= 200)
        & (F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= 0.3)
    )
    fp = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " "))
    w = Window.partitionBy(fp).orderBy("doc_id")
    dedup = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.size(toks).cast("long").alias("n_tokens"))
    )
    per_source = dedup.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    # totals via an unpartitioned window over the |sources|-row frame:
    # a cross join against a separate totals aggregate would duplicate
    # the whole corpus subtree (verified: neither plan-time reuse nor
    # AQE dedups it) — the window keeps ONE lineage, one corpus shuffle.
    wt = Window.partitionBy()
    total_kept = F.sum("n_kept").over(wt).cast("double")
    n_sources = F.count(F.lit(1)).over(wt)
    return per_source.select(
        "source",
        "n_kept",
        "n_tokens",
        F.round(F.col("n_kept").cast("double") / total_kept, 6).alias("share"),
        F.round(
            total_kept / (n_sources * F.col("n_kept").cast("double")), 6
        ).alias("uniform_mix_weight"),
    )


def _cascade_oracle() -> str:
    from apache_spark_irs_form_990_spark.operators.dedup import band_signatures_sql

    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT doc_id + 1000000,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '')
      FROM documents WHERE doc_id % 5 = 0
    ),
    fps AS (
      SELECT doc_id, text,
             min(doc_id) OVER (PARTITION BY sha256(text)) AS keeper
      FROM corpus
    ),
    survivors AS (SELECT doc_id, text FROM fps WHERE doc_id = keeper),
    {band_signatures_sql("survivors", "s")},
    near_removed AS (
      SELECT DISTINCT b.doc_id
      FROM ssig a JOIN ssig b
        ON a.band = b.band AND a.band_min = b.band_min AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) >= 2
    ),
    c AS (
      SELECT (SELECT count(*) FROM corpus) AS n_raw,
             (SELECT count(*) FROM survivors) AS n_exact,
             (SELECT count(*) FROM near_removed) AS n_near_rm
    )
    SELECT 'raw' AS stage, n_raw AS n_docs, CAST(0 AS BIGINT) AS n_removed FROM c
    UNION ALL
    SELECT 'exact_hash', n_exact, n_raw - n_exact FROM c
    UNION ALL
    SELECT 'near_minhash', n_exact - n_near_rm, n_near_rm FROM c
    """


@register("pipeline_dedup_cascade", oracle=_cascade_oracle())
def pipeline_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup CASCADE a production corpus actually runs, as one
    declarative plan with a funnel report: exact sha-256 dedup first
    (cheap, catches byte-identical re-uploads), MinHash band dedup
    second on the exact survivors only (catches near-dups; >= 2 of 4
    shared chunked-md5 bands = duplicate, lower doc_id survives).
    Output is the three-stage funnel (stage, n_docs, n_removed) — the
    shrinkage report every dedup run ships with.

    Ordering is the scale argument: the exact stage costs one
    32-byte-key shuffle and removes the easy mass BEFORE the
    shingle/signature work runs, so the expensive near-dup stage sees
    only survivors. Both injected dup classes are deterministic
    (byte-identical copies at doc_id%4 -> +3e6; two-word truncations
    at doc_id%5 -> +1e6). Counts ride the frames as 1-row aggregates
    (no corpus re-scan per stage: survivors feed both the count and
    the signature stage); the three report rows assemble from one
    broadcast-joined scalar row."""
    from apache_spark_irs_form_990_spark.operators.dedup import band_signatures

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    exact_dupes = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), "text"
    )
    near_dupes = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    corpus = docs.unionByName(exact_dupes).unionByName(near_dupes)

    keeper = Window.partitionBy(F.sha2(F.encode("text", "utf-8"), 256))
    survivors = (
        corpus.withColumn("keeper", F.min("doc_id").over(keeper))
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "text")
        # heavy-once: the signature stage and the survivor count both
        # read this frame; materialize it instead of re-running the
        # exact-dedup window twice.
        .localCheckpoint()
    )
    sig = band_signatures(survivors)
    a, b = sig.alias("a"), sig.alias("b")
    near_removed = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_min") == F.col("b.band_min"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("id_b")
        .distinct()
    )
    counts = (
        corpus.agg(F.count("*").alias("n_raw"))
        .crossJoin(survivors.agg(F.count("*").alias("n_exact")))
        .crossJoin(near_removed.agg(F.count("*").alias("n_near_rm")))
    )
    return counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("raw").alias("stage"),
                    F.col("n_raw").alias("n_docs"),
                    F.lit(0).cast("long").alias("n_removed"),
                ),
                F.struct(
                    F.lit("exact_hash").alias("stage"),
                    F.col("n_exact").alias("n_docs"),
                    (F.col("n_raw") - F.col("n_exact")).alias("n_removed"),
                ),
                F.struct(
                    F.lit("near_minhash").alias("stage"),
                    (F.col("n_exact") - F.col("n_near_rm")).alias("n_docs"),
                    F.col("n_near_rm").alias("n_removed"),
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_docs", "s.n_removed")


def _dsir_oracle() -> str:
    return """
    WITH toks AS MATERIALIZED (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    src AS MATERIALIZED (
      SELECT token, CAST(count(*) AS BIGINT) AS cs FROM toks GROUP BY token
    ),
    tgt AS (
      SELECT token, CAST(count(*) AS BIGINT) AS ct FROM toks
      WHERE lang = 'en' GROUP BY token
    ),
    tot AS (
      SELECT (SELECT count(*) FROM toks WHERE lang = 'en') AS nt,
             (SELECT count(*) FROM toks) AS ns,
             (SELECT count(*) FROM src) AS vocab
    ),
    lr AS (
      SELECT s.token,
             CAST(round(ln(COALESCE(t.ct, 0) + 1) * 1000000) AS BIGINT)
             - CAST(round(ln(s.cs + 1) * 1000000) AS BIGINT) AS lr_micro
      FROM src s LEFT JOIN tgt t ON s.token = t.token
    ),
    doc_scores AS (
      SELECT k.doc_id, any_value(k.lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(l.lr_micro) AS BIGINT)
             + CAST(count(*) AS BIGINT)
               * (CAST(round(ln(tot.ns + tot.vocab) * 1000000) AS BIGINT)
                  - CAST(round(ln(tot.nt + tot.vocab) * 1000000) AS BIGINT))
               AS logweight_micro
      FROM toks k JOIN lr l ON k.token = l.token, tot
      GROUP BY k.doc_id, tot.ns, tot.nt, tot.vocab
    )
    SELECT doc_id, lang, n_tokens, logweight_micro
    FROM doc_scores
    ORDER BY logweight_micro DESC, doc_id
    LIMIT 25
    """


@register("pipeline_dsir_weights", oracle=_dsir_oracle())
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): score every raw document by how much more
    likely a TARGET-domain unigram LM finds it than the SOURCE (raw
    corpus) LM, log w(x) = sum over tokens of ln p_tgt - ln p_src with
    add-1 smoothing; the top-weighted docs are the ones to resample
    into a pretraining mix (here target = the 'en' slice standing in
    for "high-quality domain", source = the whole corpus; output = the
    top-25 with their exact log-weights, the ranking a weighted
    sampler like [[sample_weighted_reservoir]] would consume).

    Every transcendental is confined to ln of INTEGERS (counts + 1,
    totals + vocab), integerized to micro-nats before any sum — so a
    doc's log-weight is an exact BIGINT: sum of per-token table
    lookups plus n_tokens times a constant-folded normalizer term
    (ln(Ns+V) - ln(Nt+V)), and the top-25 ordering is deterministic
    integer comparison. tests/test_weighted_sample.py checks Spark and
    DuckDB agree on round(ln(k)*1e6) across the fixture's full integer
    count domain. Scale shape: two hash-aggs over the token stream
    build the LMs (the heavy one, `src`, is reused by `lr` — one
    shuffle on the token key), scoring is one more token-keyed join +
    doc-keyed agg, and the normalizer scalars ride a broadcast 1-row
    crossjoin; nothing is ever quadratic and no vector/array
    materializes. The paper's hashed-ngram variant drops in by
    replacing `token` with the md5-bucket expression of
    `ml_feature_hash_bucket`."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    ).localCheckpoint()

    def ln_micro(col):
        return F.round(F.log(col) * 1000000).cast("long")

    src = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cs"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    lr = src.join(tgt, "token", "left").select(
        "token",
        (
            ln_micro(F.coalesce(F.col("ct"), F.lit(0)) + 1)
            - ln_micro(F.col("cs") + 1)
        ).alias("lr_micro"),
    )
    tot = (
        toks.agg(
            F.count(F.when(F.col("lang") == "en", 1)).alias("nt"),
            F.count(F.lit(1)).alias("ns"),
            F.count_distinct(F.col("token")).alias("vocab"),
        )
        .select(
            (
                ln_micro(F.col("ns") + F.col("vocab"))
                - ln_micro(F.col("nt") + F.col("vocab"))
            ).alias("norm_micro")
        )
    )
    return (
        toks.join(lr, "token")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_micro").cast("long").alias("sum_lr"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (F.col("sum_lr") + F.col("n_tokens") * F.col("norm_micro")).alias(
                "logweight_micro"
            ),
        )
        .orderBy(F.col("logweight_micro").desc(), "doc_id")
        .limit(25)
    )
