"""Text analysis over `documents` (SURVEY.md §2 B10 north star):
tokenization stats, quality scoring, language profiling, heuristic
language-ID, and document fingerprinting.

Everything is built-in expressions (split/explode/regexp/aggregate) —
no Python in the row path — because these run over every document of a
100 TB corpus: the scalar throughput IS the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import global_order
from apache_spark_irs_form_990_spark.functions.money import sql_cents
from apache_spark_irs_form_990_spark.functions.text import sql_utf8_codes
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "text_tokenize_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           CAST(list_sum(list_transform(string_split(text, ' '),
                t -> length(t))) AS BIGINT) AS sum_token_chars,
           length(text) AS n_chars_computed
    FROM documents
    """,
)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + per-doc token stats, entirely inside
    the array expression layer (one scan, zero shuffles, zero Python)."""
    toks = F.split(F.col("text"), " ")
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_token_chars"),
        F.length("text").cast("long").alias("n_chars_computed"),
    )


@register(
    "text_token_count_bpe",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
             AS n_bpe_ish,
           len(string_split(text, ' ')) AS n_ws
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex
    (letter runs / digit runs / single punctuation) — the cheap
    pre-tokenizer count used for corpus budgeting before a real BPE
    pass."""
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias("n_bpe_ish"),
        F.size(F.split("text", " ")).cast("long").alias("n_ws"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(text) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_token_len,
           CAST(len(list_filter(string_split(text, ' '),
                t -> t IN ('the','a','of','and','to','in','is','it',
                           'der','die','das','und','el','la','de','le',
                           'les','et'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio,
           CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1 ELSE 0 END
             AS length_ok
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals per doc: length, mean token length, stopword
    ratio, length-window flag — the standard cheap filters before
    expensive model-based scoring of a pretraining corpus."""
    toks = F.split(F.col("text"), " ")
    stop = F.array(
        *[
            F.lit(s)
            for s in (
                "the", "a", "of", "and", "to", "in", "is", "it",
                "der", "die", "das", "und", "el", "la", "de", "le",
                "les", "et",
            )
        ]
    )
    n_tok = F.size(toks)
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        (F.length("text").cast("double") / n_tok).alias("avg_token_len"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
            .cast("double")
            / n_tok
        ).alias("stopword_ratio"),
        F.when(F.length("text").between(50, 5000), 1).otherwise(0).alias("length_ok"),
    )


@register(
    "text_lang_profile",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
           count(DISTINCT source) AS n_sources,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile (counts exact; avg via integer sum)."""
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            F.countDistinct("source").alias("n_sources"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Real systems use charset n-gram models; the *shape* (token
# join + per-lang vote + argmax) is identical.
_LANG_MARKERS = {
    "en": ("the", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "los", "las", "una", "que"),
    "fr": ("le", "les", "des", "une", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3"),
}


@register(
    "text_langid_vote",
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
    )
    SELECT doc_id, lang AS lang_pred, hits FROM (
      SELECT doc_id, lang, hits,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lang) AS rn
      FROM votes
    ) WHERE rn = 1
    """,
)
def text_langid_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: tokens join a broadcast marker lexicon,
    votes aggregate per (doc, lang), argmax wins (deterministic
    tiebreak on lang). Docs with zero marker hits get no row — they'd
    be routed to a heavier classifier downstream."""
    markers = F.broadcast(
        load(spark, sf_dir, "documents")
        .sparkSession.createDataFrame(
            [(lang, tok) for lang, toks in _LANG_MARKERS.items() for tok in toks],
            "lang string, token string",
        )
    )
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    votes = (
        toks.join(markers, "token")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), "lang")
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("lang_pred"), "hits")
    )


@register(
    "text_fingerprint_shingle",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           min(sha256(shingle)) AS min_shingle_fp,
           count(DISTINCT shingle) AS n_shingles
    FROM (
      SELECT doc_id,
             unnest([array_to_string(list_slice(t, i, i + 2), ' ')
                     FOR i IN generate_series(1, len(t) - 2)]) AS shingle
      FROM toks
    )
    GROUP BY doc_id
    """,
)
def text_fingerprint_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min SHA-256 over 3-token shingles (the
    1-hash MinHash) + shingle cardinality. SHA-256 hex is identical
    across engines, so this is the rare hash-based op with an exact
    oracle twin."""
    from apache_spark_irs_form_990_spark.functions.text import shingles

    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", F.explode(shingles(F.col("text"))).alias("shingle")
        )
        .groupBy("doc_id")
        .agg(
            F.min(F.sha2("shingle", 256)).alias("min_shingle_fp"),
            F.countDistinct("shingle").alias("n_shingles"),
        )
    )


@register(
    "text_pii_scrub",
    oracle="""
    WITH enriched AS (
      SELECT doc_id,
             concat(text, ' contact: user', CAST(doc_id AS VARCHAR),
                    '@example.com or +1-555-01', CAST(doc_id % 100 AS VARCHAR))
               AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[a-z0-9]+@[a-z]+\\.[a-z]+', '[EMAIL]', 'g'),
             '\\+1-[0-9]{3}-[0-9]+', '[PHONE]', 'g') AS scrubbed,
           CAST(length(text) - length(
             regexp_replace(
               regexp_replace(text, '[a-z0-9]+@[a-z]+\\.[a-z]+', '[EMAIL]', 'g'),
               '\\+1-[0-9]{3}-[0-9]+', '[PHONE]', 'g')) AS BIGINT) AS chars_removed
    FROM enriched
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex redaction of emails and phone numbers —
    the compliance pass every training corpus runs before anything
    else. Pure regexp_replace (JVM regex, codegen'd, replace-all);
    the patterns here use only syntax with identical semantics in
    Java and RE2-style engines. PII is synthesized deterministically
    onto each doc so the redaction is verifiable end-to-end."""
    d = load(spark, sf_dir, "documents")
    enriched = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-01"),
            (F.col("doc_id") % 100).cast("string"),
        ).alias("text"),
    )
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[a-z0-9]+@[a-z]+\.[a-z]+", "[EMAIL]"),
        r"\+1-[0-9]{3}-[0-9]+",
        "[PHONE]",
    )
    return enriched.select(
        "doc_id",
        scrub.alias("scrubbed"),
        (F.length("text") - F.length(scrub)).cast("long").alias("chars_removed"),
    )


@register(
    "text_repetition_score",
    oracle="""
    WITH tri AS (
      SELECT doc_id,
             [array_to_string(list_slice(t, i, i + 2), ' ')
              FOR i IN generate_series(1, len(t) - 2)] AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CASE WHEN len(grams) > 0
                THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                           / len(grams)
                ELSE 0.0 END AS repetition
    FROM tri
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-trigram ratio per document — the degenerate-text signal
    (Gopher/CCNet-style): boilerplate, keyword stuffing, and model-loop
    output all show high repeated-n-gram mass while natural prose stays
    near zero. Pure array expressions (shingle → distinct → ratio),
    partition-local, no shuffle — it composes into pipeline_corpus_prep
    as just another quality predicate."""
    from apache_spark_irs_form_990_spark.functions.text import shingles

    d = load(spark, sf_dir, "documents")
    grams = shingles(F.col("text"))
    n = F.size(grams)
    nd = F.size(F.array_distinct(grams))
    return d.select(
        "doc_id",
        n.cast("long").alias("n_trigrams"),
        nd.cast("long").alias("n_distinct"),
        F.when(n > 0, 1.0 - nd.cast("double") / n).otherwise(0.0).alias("repetition"),
    )


@register(
    "text_url_domain_stats",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             concat('https://', 'host', CAST(doc_id % 7 AS VARCHAR),
                    '.example.', CASE WHEN doc_id % 2 = 0 THEN 'com' ELSE 'org' END,
                    '/p/', CAST(doc_id AS VARCHAR), '?ref=', lang) AS url,
             n_chars
      FROM documents
    ),
    parsed AS (
      SELECT doc_id,
             regexp_extract(url, '^https?://([^/]+)', 1) AS host,
             regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
             regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref_param,
             regexp_extract(url, '\\.([a-z]+)(/|$)', 1) AS tld,
             n_chars
      FROM urls
    )
    SELECT host, tld,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT ref_param) AS n_langs
    FROM parsed
    GROUP BY host, tld
    """,
)
def text_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parse + domain-mix statistics — the CommonCrawl-style
    per-domain accounting (docs and bytes per host) that drives
    domain filtering and sampling weights for a web corpus. URLs are
    synthesized deterministically onto each doc (no URL column in the
    testdata); host/path/query extraction is pure regexp_extract with
    patterns whose semantics match across regex engines. The domain
    aggregate shuffles host-keyed pre-aggregated rows only."""
    d = load(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("https://host"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example."),
            F.when(F.col("doc_id") % 2 == 0, "com").otherwise("org"),
            F.lit("/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref="),
            F.col("lang"),
        ).alias("url"),
        "n_chars",
    )
    parsed = urls.select(
        "doc_id",
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", r"^https?://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", r"[?&]ref=([^&]*)", 1).alias("ref_param"),
        F.regexp_extract("url", r"\.([a-z]+)(/|$)", 1).alias("tld"),
        "n_chars",
    )
    return parsed.groupBy("host", "tld").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct("ref_param").alias("n_langs"),
    )


@register(
    "text_contamination_check",
    oracle="""
    WITH bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
    ),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 != 0
    ),
    bench_grams AS (
      SELECT DISTINCT unnest([array_to_string(list_slice(t, i, i + 7), ' ')
                      FOR i IN generate_series(1, len(t) - 7)]) AS gram
      FROM (SELECT string_split(text, ' ') AS t FROM bench)
    ),
    corpus_grams AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(list_slice(t, i, i + 7), ' ')
                     FOR i IN generate_series(1, len(t) - 7)])) AS gram
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
    )
    SELECT c.doc_id, count(*) AS n_overlapping_8grams
    FROM corpus_grams c JOIN bench_grams b ON c.gram = b.gram
    GROUP BY c.doc_id
    """,
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    8-gram with the eval set (every 97th doc stands in as the
    benchmark) — the standard n-gram contamination check run before
    training on web data. The eval gram set is tiny and broadcasts;
    the corpus grams stream through the broadcast join, so cost is one
    corpus scan regardless of corpus size. Output: contaminated doc →
    overlapping-gram count (the removal/reporting input)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    def grams(df, distinct_only: bool):
        toks = F.split(F.col("text"), " ")
        k = F.size(toks) - 7
        idx = F.when(k > 0, F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")
        )
        g = df.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 8))
                    )
                )
            ).alias("gram"),
        )
        return g.select("gram").distinct() if distinct_only else g

    bench_grams = grams(bench, distinct_only=True)
    corpus_grams = grams(corpus, distinct_only=False)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlapping_8grams"))
    )


@register(
    "text_filter_funnel",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           count(*) FILTER (WHERE n_chars >= 200) AS pass_len,
           count(*) FILTER (WHERE n_chars >= 200
                              AND len(string_split(text, ' ')) >= 40)
               AS pass_len_tok,
           count(*) FILTER (WHERE n_chars >= 200
                              AND len(string_split(text, ' ')) >= 40
                              AND CAST(len(list_distinct(string_split(text, ' ')))
                                       AS DOUBLE)
                                  / len(string_split(text, ' ')) >= 0.3)
               AS pass_all
    FROM documents
    GROUP BY lang
    """,
)
def text_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-filter funnel accounting: per language, how many documents
    survive each successive quality gate (length → token count →
    lexical diversity). The observability primitive for corpus prep —
    when a pipeline drops 40% of a language, this table says WHICH gate
    did it. All four counts are conditional aggregates over ONE scan
    (cumulative conjunctions as count_if), so the cost is one pass
    regardless of how many gates the funnel grows."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    g1 = F.col("n_chars") >= 200
    g2 = g1 & (F.size(toks) >= 40)
    g3 = g2 & (
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= 0.3
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count_if(g1).alias("pass_len"),
        F.count_if(g2).alias("pass_len_tok"),
        F.count_if(g3).alias("pass_all"),
    )


@register(
    "text_tfidf_top_term",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM tok WHERE token <> '' GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, count(DISTINCT doc_id) AS doc_freq
      FROM tok WHERE token <> '' GROUP BY token
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents)
    SELECT doc_id, token AS top_token,
           CAST(tf AS BIGINT) AS tf, score
    FROM (
      SELECT t.doc_id, t.token, t.tf,
             round(t.tf * ln(n.nd / d.doc_freq), 6) AS score,
             row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY round(t.tf * ln(n.nd / d.doc_freq), 6) DESC, t.token
             ) AS rn
      FROM tf t JOIN df d ON t.token = d.token, n
    ) WHERE rn = 1
    """,
)
def text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document most-distinctive term by TF-IDF — the keyword
    extraction primitive. Term frequencies and document frequencies
    come from the same exploded token pass (two aggregations); IDF
    joins back by token (broadcastable: vocabulary ≪ corpus); corpus
    size is a broadcast 1-row scalar. Scores round to 6 decimals
    before the per-doc argmax so a sub-ulp ln() divergence can neither
    change a hash nor flip the winner; rank ties break on the token
    string."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_tab = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("doc_freq"))
    nd = d.agg(F.count("*").cast("double").alias("nd"))
    scored = (
        tf.join(df_tab, "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("nd") / F.col("doc_freq")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_token"), "tf", "score")
    )


@register(
    "text_char_classes",
    oracle="""
    SELECT lang,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')))
                AS BIGINT) AS n_alpha,
           CAST(sum(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                AS BIGINT) AS n_digit,
           CAST(sum(length(text) - length(replace(text, ' ', ''))) AS BIGINT)
               AS n_space,
           CAST(sum(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')))
                AS DOUBLE) / sum(length(text)) AS alpha_ratio
    FROM documents
    GROUP BY lang
    """,
)
def text_char_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class census per language: alphabetic / digit /
    whitespace counts and the alpha ratio — the cheapest corpus
    health features (binary-junk and boilerplate shift these hard).
    Counting by length-difference after class-stripping keeps the
    whole thing in codegen'd string built-ins: no explode, no UDF,
    one aggregate over exact integer counts."""
    d = load(spark, sf_dir, "documents")
    ln = F.length("text")
    n_alpha = ln - F.length(F.regexp_replace("text", "[a-z]", ""))
    n_digit = ln - F.length(F.regexp_replace("text", "[0-9]", ""))
    n_space = ln - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return d.groupBy("lang").agg(
        F.sum(ln).cast("long").alias("n_chars"),
        F.sum(n_alpha).cast("long").alias("n_alpha"),
        F.sum(n_digit).cast("long").alias("n_digit"),
        F.sum(n_space).cast("long").alias("n_space"),
        (F.sum(n_alpha).cast("double") / F.sum(ln)).alias("alpha_ratio"),
    )


@register(
    "text_chunk_sliding",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(t, i * 25 + 1, i * 25 + 50), ' ')
               AS chunk_text,
           CAST(len(list_slice(t, i * 25 + 1, i * 25 + 50)) AS BIGINT)
               AS n_tokens
    FROM toks,
         (SELECT unnest(generate_series(0, 1000)) AS i)
    WHERE i * 25 < len(t)
    """,
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 50-token chunks with stride 25 (50%
    overlap) — how long documents become training/embedding inputs.
    Chunk indices come from a per-doc `sequence(0, ceil)` explode, all
    JVM-side array slicing: the 2x token amplification (overlap factor)
    happens map-side with no shuffle at all; downstream embedding/
    dedup stages see (doc_id, chunk_idx) keys. The final partial chunk
    is kept (standard for training data; filter `n_tokens = 50` for
    fixed-shape batches)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.floor((n - 1) / 25).cast("int"))
    return (
        d.select("doc_id", toks.alias("t"), F.explode(idx).alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice("t", F.col("chunk_idx") * 25 + 1, 50)).alias(
                "chunk_text"
            ),
            F.size(F.slice("t", F.col("chunk_idx") * 25 + 1, 50))
            .cast("long")
            .alias("n_tokens"),
        )
    )


@register(
    "text_pack_bins",
    oracle="""
    WITH sized AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    placed AS (
      SELECT doc_id, n_tok,
             CAST(floor((sum(n_tok) OVER (ORDER BY doc_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) - n_tok) / 2048.0)
                  AS BIGINT) AS bin_id
      FROM sized
    )
    SELECT bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM placed
    GROUP BY bin_id
    """,
)
def text_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-cut): documents in deterministic
    doc_id order are laid head-to-tail and cut into 2048-token bins —
    each doc's bin is its preceding cumulative token count div the
    budget, the exact assignment a concatenating data loader produces.
    The global running sum — formerly one unpartitioned window, a
    single-task sort over the corpus — comes from `global_order`
    (range-partition on doc_id, per-partition running sums, broadcast
    partition offsets): the same exact cumulative token counts,
    computed partition-parallel, so the GLOBAL packing contract is
    kept without the one-task plan. Then a per-bin rollup. Exact
    integers end to end."""
    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    placed = global_order(
        sized, ["doc_id"], running={"cum_tok": F.col("n_tok")}, rn_col="_rn"
    ).select(
        "doc_id",
        "n_tok",
        F.floor((F.col("cum_tok") - F.col("n_tok")) / 2048)
        .cast("long")
        .alias("bin_id"),
    )
    return placed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "text_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    clean AS (SELECT doc_id, token FROM tok WHERE token <> ''),
    per_doc AS (
      SELECT doc_id, count(*) AS n_tok FROM clean GROUP BY doc_id
    ),
    firsts AS (
      SELECT min_doc, count(*) AS n_new FROM (
        SELECT token, min(doc_id) AS min_doc FROM clean GROUP BY token
      ) GROUP BY min_doc
    )
    SELECT p.doc_id,
           CAST(sum(p.n_tok) OVER w AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(f.n_new, 0)) OVER w AS BIGINT) AS cum_vocab
    FROM per_doc p
    LEFT JOIN firsts f ON f.min_doc = p.doc_id
    WINDOW w AS (ORDER BY p.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law): cumulative distinct
    vocabulary vs cumulative tokens in doc_id order — the
    diminishing-returns signal for corpus collection (flattening curve
    = new data adds few new types). Running COUNT(DISTINCT) at corpus
    scale uses the first-occurrence trick globally: each token charges
    its min(doc_id), new-type counts aggregate per doc, and the two
    running sums over the |docs|-sized frame — formerly one
    unpartitioned window — come from one `global_order` pass
    (range-partition on doc_id, per-partition running sums, broadcast
    partition offsets), yielding the identical curve partition-
    parallel. The exploded token table is touched exactly twice
    (per-doc counts, per-token minima), never held in window state."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    per_doc = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    firsts = (
        tok.groupBy("token")
        .agg(F.min("doc_id").alias("min_doc"))
        .groupBy("min_doc")
        .agg(F.count("*").alias("n_new"))
    )
    joined = per_doc.join(
        firsts, per_doc.doc_id == firsts.min_doc, "left"
    ).select("doc_id", "n_tok", F.coalesce("n_new", F.lit(0)).alias("n_new"))
    return global_order(
        joined,
        ["doc_id"],
        running={"cum_tokens": F.col("n_tok"), "cum_vocab": F.col("n_new")},
        rn_col="_rn",
    ).select("doc_id", "cum_tokens", "cum_vocab")


@register(
    "text_js_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    clean AS (SELECT source, token FROM tok WHERE token <> ''),
    st AS (SELECT source, token, count(*) AS n_st FROM clean GROUP BY source, token),
    s_tot AS (SELECT source, count(*) AS n_s FROM clean GROUP BY source),
    g_tok AS (SELECT token, count(*) AS n_t FROM clean GROUP BY token),
    g_tot AS (SELECT count(*) AS n FROM clean),
    grid AS (
      SELECT s.source, t.token, s.n_s, t.n_t, g.n,
             coalesce(st.n_st, 0) AS n_st
      FROM s_tot s
      CROSS JOIN g_tok t
      CROSS JOIN g_tot g
      LEFT JOIN st ON st.source = s.source AND st.token = t.token
    ),
    terms AS (
      SELECT source,
             CAST(round(1000000000 * (
               0.5 * (CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0 END
                      + CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0 END)
             )) AS BIGINT) AS nano
      FROM (
        SELECT source,
               CAST(n_st AS DOUBLE) / n_s AS p,
               CAST(n_t - n_st AS DOUBLE) / (n - n_s) AS q,
               (CAST(n_st AS DOUBLE) / n_s
                + CAST(n_t - n_st AS DOUBLE) / (n - n_s)) / 2.0 AS m
        FROM grid
      )
    )
    SELECT source, CAST(sum(nano) AS DOUBLE) / 1e9 AS js_nats
    FROM terms GROUP BY source
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift detector: Jensen-Shannon divergence between
    each source's token distribution and the rest of the corpus (0 =
    indistinguishable; ln 2 = disjoint vocabularies) — the drift gate
    before admitting a new source into a training mix. The vocab x
    sources grid is tiny (bounded by vocabulary, not corpus), every
    p/q is a ratio of exact integers, and each JS term snaps to
    integer NANO-NATS before summing so the per-source total is
    order-independent — the Zipf/entropy integerization rule applied
    to a two-distribution functional."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    st = tok.groupBy("source", "token").agg(F.count("*").alias("n_st"))
    s_tot = tok.groupBy("source").agg(F.count("*").alias("n_s"))
    g_tok = tok.groupBy("token").agg(F.count("*").alias("n_t"))
    g_tot = tok.agg(F.count("*").alias("n"))
    grid = (
        s_tot.crossJoin(F.broadcast(g_tok))
        .crossJoin(F.broadcast(g_tot))
        .join(st, ["source", "token"], "left")
        .withColumn("n_st", F.coalesce("n_st", F.lit(0)))
    )
    p = F.col("n_st").cast("double") / F.col("n_s")
    q = (F.col("n_t") - F.col("n_st")).cast("double") / (
        F.col("n") - F.col("n_s")
    )
    m = (p + q) / 2.0
    term = 0.5 * (
        F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    nano = F.round(F.lit(1_000_000_000) * term).cast("long")
    return (
        grid.select("source", nano.alias("nano"))
        .groupBy("source")
        .agg((F.sum("nano").cast("double") / 1e9).alias("js_nats"))
    )


_RK_B, _RK_M = 257, 1_000_000_007
_RK_W = 16       # rolling-hash window (chars)
_WINNOW_W = 8    # winnowing window (hashes)
_RK_POWS = [pow(_RK_B, _RK_W - 1 - j, _RK_M) for j in range(_RK_W)]


def _winnow_oracle() -> str:
    pw = "[" + ", ".join(str(p) for p in _RK_POWS) + "]"
    W, M, K = _RK_W, _RK_M, _WINNOW_W
    # The coefficient vector is HOISTED into a CTE column (r6): as an
    # inline literal inside the per-position lambda, DuckDB rebuilds
    # the 16-element list for every (i, j) evaluation — ~80M list
    # constructions at sf0.1, 48 s; referencing it as a column is
    # 4.3 s for identical rows (the same class of fix as the kcore
    # MATERIALIZED hints: oracle-side pathology, not hash semantics).
    return f"""
    WITH coef AS (SELECT {pw} AS pows),
    codes AS (
      -- byte-exact (r8): hex-pair parsing of the UTF-8 bytes, not
      -- ord(char) over chars — the kernel hashes
      -- np.frombuffer(text.encode('utf-8'), uint8), so on multibyte
      -- text both the byte VALUES and the window COUNT (n - W + 1
      -- windows over BYTE length) differ from the old char form
      SELECT doc_id, n, {sql_utf8_codes()} AS c
      FROM (SELECT doc_id, octet_length(encode(text)) AS n,
                   hex(encode(text)) AS hh
            FROM documents WHERE len(text) >= {W})
    ),
    hs AS (
      SELECT doc_id, n - {W - 1} AS nh,
             [list_sum(list_transform(range(1, {W + 1}),
                       j -> c[i + j - 1] * pows[j])) % {M}
              FOR i IN generate_series(1, n - {W - 1})] AS h
      FROM (SELECT doc_id, n, c, (SELECT pows FROM coef) AS pows
            FROM codes)
    ),
    sel AS (
      SELECT doc_id,
             CAST(unnest(list_distinct(
               [h[i] FOR i IN generate_series(1, nh)
                IF h[i] = list_min(list_slice(h, greatest(i - {K - 1}, 1),
                                              least(i + {K - 1}, nh)))]))
                  AS BIGINT) AS fp
      FROM hs
    )
    SELECT fp, count(DISTINCT doc_id) AS n_docs
    FROM sel GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
    """


@register("text_rolling_winnow_fingerprints", oracle=_winnow_oracle())
def text_rolling_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting with LOCAL-MIN winnowing
    (the symmetric variant of Schleimer-Wilkerson-Aiken): every
    16-char window gets a polynomial Rabin-Karp hash (base 257 mod
    1e9+7, exact int64), and a window hash is SELECTED iff it is the
    minimum of the 15-hash neighborhood centred on it. Expected
    fingerprint density is ~2/(2K-1) of windows regardless of document
    length, and selection is position-stable (a copied passage selects
    the same hashes in both documents, away from its edges). Unlike
    true per-window-min winnowing this variant has no HARD
    one-per-K-window guarantee — a monotone hash run longer than the
    neighborhood selects nothing inside it (probability ~1/15! per
    position for i.i.d. hashes; accepted here for a selection rule
    that is one vectorized sliding-min in the kernel AND one list
    comprehension in the SQL twin). The corpus query reports
    fingerprints shared by >= 2 documents — the copied-passage
    detector (plagiarism / boilerplate / licence blocks) that
    whole-document hashing cannot see and shingle-set Jaccard only
    scores in aggregate.

    Plan shape: hashing + winnowing run INSIDE the scan task (one
    numpy sliding-window pass per Arrow batch — true rolling reuse is
    an O(n) kernel detail the vectorized form trades for SIMD); each
    doc emits only its ~n/4 selected fingerprints, and the single
    shuffle groups 8-byte fingerprints. The DuckDB twin recomputes
    the identical polynomial and neighborhood-min selection, so the
    whole cascade is hash-exact end-to-end."""
    import numpy as np
    import pandas as pd

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.length("text") >= _RK_W
    )
    pw = np.array(_RK_POWS, dtype=np.int64)
    W, M, K = _RK_W, _RK_M, _WINNOW_W

    def run(batches):
        for pdf in batches:
            out_doc, out_fp = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(
                    np.int64
                )
                wins = np.lib.stride_tricks.sliding_window_view(arr, W)
                h = (wins * pw).sum(axis=1) % M
                padded = np.pad(h, K - 1, constant_values=M)
                mins = np.lib.stride_tricks.sliding_window_view(
                    padded, 2 * K - 1
                ).min(axis=1)
                fps = np.unique(h[h == mins])
                out_doc.extend([doc_id] * len(fps))
                out_fp.extend(int(x) for x in fps)
            yield pd.DataFrame({"doc_id": out_doc, "fp": out_fp})

    sel = docs.mapInPandas(run, schema="doc_id long, fp long")
    return (
        sel.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
