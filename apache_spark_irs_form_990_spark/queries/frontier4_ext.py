"""Frontier extensions, part 4 — the training-data-pipeline deep cuts:
temperature-scaled domain sampling, BPE merge-pair counting, vocabulary
coverage curves, wide-row denormalization, quantile normalization,
embedding int8-quantization auditing, and output-shard balance
(SURVEY.md §2 B10/B11 continuation — BASELINE.json north-star family).

House determinism conventions: exact BIGINT accumulation, micro/nano
integer snapping before any order-sensitive double sum, one IEEE
division at the end, full-column tiebreaks on orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import revenue_cents, SQL_REVENUE_CENTS
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "pipeline_sample_temperature",
    oracle="""
    WITH src AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total FROM src),
    powed AS (
      SELECT source, chars,
             CAST(round(pow(CAST(chars AS DOUBLE) / total, 0.7) * 1000000)
                  AS BIGINT) AS w_micro
      FROM src CROSS JOIN tot
    )
    SELECT source, chars,
           round(CAST(w_micro AS DOUBLE)
                 / (sum(w_micro) OVER ()), 6) AS sample_weight
    FROM powed
    """,
)
def pipeline_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling weights — the mT5/XLM-R
    recipe for balancing a multilingual/multi-domain corpus:
    wᵢ ∝ pᵢ^α with α = 0.7, where pᵢ is the domain's share of corpus
    characters. Upsamples the tail, damps the head, and is THE knob
    between 'natural distribution' (α=1) and 'uniform' (α=0). The
    corpus-sized work is one aggregate of n_chars per source; the
    power law runs on the |domains| grid with pow() outputs snapped to
    exact micro-integers before the normalizing sum (pow is the one
    libm call, identical input doubles both sides), and the final
    weight is one division rounded to 6 decimals."""
    docs = load(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    tot = src.agg(F.sum("chars").alias("total"))
    powed = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "chars",
        F.round(
            F.pow(F.col("chars").cast("double") / F.col("total"), 0.7) * 1000000
        )
        .cast("long")
        .alias("w_micro"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return powed.select(
        "source",
        "chars",
        F.round(
            F.col("w_micro").cast("double") / F.sum("w_micro").over(wall), 6
        ).alias("sample_weight"),
    )


@register(
    "text_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    pairs AS (
      SELECT unnest([w[i:i+1] FOR i IN generate_series(1, len(w) - 1)]) AS pair
      FROM words WHERE len(w) >= 2
    )
    SELECT pair, count(*) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 30
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first iteration of BPE tokenizer training: count adjacent
    character pairs inside every word across the corpus; the top pair
    is the next merge rule. Pure JVM string work — word explode, then
    a `sequence`+`transform` slide over each word's characters (no
    Python), one hash aggregate over a |alphabet|² domain, top-30 by
    (count DESC, pair). At 100 TB this is exactly the map-reduce shape
    real BPE trainers run per merge round; successive rounds re-run it
    over the re-segmented corpus."""
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.filter(F.split("text", " "), lambda x: F.length(x) >= 2)
        ).alias("w")
    )
    pairs = words.select(
        F.explode(
            F.transform(
                # guarded: a 1-char word would make sequence(1, 0) DESCEND
                F.when(
                    F.length("w") - 1 >= 1,
                    F.sequence(F.lit(1), F.length("w") - 1),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(30)
    )


@register(
    "text_vocab_coverage_curve",
    oracle="""
    WITH vocab AS (
      SELECT tok, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
      GROUP BY tok
    ),
    ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, tok) AS rnk,
             sum(cnt) OVER () AS total
      FROM vocab
    )
    SELECT CAST(max(rnk) AS BIGINT) AS vocab_size,
           CAST(CAST(sum(CASE WHEN rnk <= 5 THEN cnt END) AS BIGINT) AS DOUBLE)
             / CAST(max(total) AS BIGINT) AS cov_5,
           CAST(CAST(sum(CASE WHEN rnk <= 10 THEN cnt END) AS BIGINT) AS DOUBLE)
             / CAST(max(total) AS BIGINT) AS cov_10,
           CAST(CAST(sum(CASE WHEN rnk <= 20 THEN cnt END) AS BIGINT) AS DOUBLE)
             / CAST(max(total) AS BIGINT) AS cov_20,
           CAST(CAST(sum(CASE WHEN rnk <= 50 THEN cnt END) AS BIGINT) AS DOUBLE)
             / CAST(max(total) AS BIGINT) AS cov_50
    FROM ranked
    """,
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of all token occurrences
    covered by the top-K vocabulary entries, K ∈ {5,10,20,50} — the
    plot that sizes a tokenizer's vocab (where the curve flattens, stop
    paying embedding rows). One token-count aggregate (data-sized);
    only the TOP-50 rows are ever ranked — a TakeOrderedAndProject
    (limit 50 on the count order) feeds a 50-row window, so no
    vocabulary-sized frame reaches a single task (the former full-vocab
    row_number did exactly that; vocab_size and the coverage
    denominator now come from 1-row aggregates instead of max(rnk) /
    a global window sum). Coverages are exact-integer ratios, one
    division each. A K beyond the vocab size degenerates to coverage
    1.0 on both engines."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.filter(F.split("text", " "), lambda x: x != F.lit(""))
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = vocab.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("cnt").cast("long").alias("total"),
    )
    # 50-row frame: limit feeds the rank window, so the single window
    # task holds 50 rows by construction (plan-lint whitelisted).
    top50 = vocab.orderBy(F.desc("cnt"), "tok").limit(50)
    ranked = top50.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), "tok"))
        .alias("rnk"),
    )
    cov = lambda k: (  # noqa: E731
        F.sum(F.when(F.col("rnk") <= k, F.col("cnt"))).cast("double")
        / F.max("total").cast("long")
    )
    return ranked.crossJoin(F.broadcast(totals)).agg(
        F.max("vocab_size").cast("long").alias("vocab_size"),
        cov(5).alias("cov_5"),
        cov(10).alias("cov_10"),
        cov(20).alias("cov_20"),
        cov(50).alias("cov_50"),
    )


@register(
    "pipeline_denormalize_wide",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           o_orderpriority, c_mktsegment,
           cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           p_brand,
           CAST({SQL_REVENUE_CENTS} AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN part     ON l_partkey  = p_partkey
    WHERE l_orderkey % 199 = 0
    """,
)
def pipeline_denormalize_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature denormalization — the star schema flattened into wide
    training rows (fact + every dimension attribute in one pass), the
    standard prep job before feature-store export or gradient-boosted
    training. One fact scan, ONE fact-sized shuffle (lineitem⋈orders);
    customer/nation/supplier/part all broadcast, so adding dimensions
    widens rows without adding exchanges. The key-sample predicate
    (orderkey % 199) bounds output here; production writes the full
    width partitioned by date. Scale note: at 100 TB the orders join
    is the candidate for bucketed co-location
    ([[sink_bucketed_join]])."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.filter(F.col("l_orderkey") % 199 == 0)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(p, li.l_partkey == p.p_partkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_orderpriority",
            "c_mktsegment",
            "cust_nation",
            "supp_nation",
            "p_brand",
            (revenue_cents().cast("double") / 1e4).alias("revenue"),
        )
    )


@register(
    "win_quantile_normalize",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS r,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    )
    SELECT c_custkey, c_mktsegment,
           CAST(r AS DOUBLE) / (n + 1) AS q_norm
    FROM ranked
    WHERE c_custkey % 53 = 0
    """,
)
def win_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile normalization: each customer's account
    balance mapped to its rank-uniform position r/(n+1) within its
    market segment — the rank-based feature transform that is immune
    to outliers and distribution shape (and the inverse-CDF first step
    of quantile matching). `row_number` with a full (value, key)
    tiebreak makes every rank deterministic; the output is an exact
    integer ratio, one IEEE division. One window shuffle on the group
    key; output key-sampled 1/53 (the full transform is data-sized)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("c_mktsegment").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    return ranked.filter(F.col("c_custkey") % 53 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("r").cast("double") / (F.col("n") + 1)).alias("q_norm"),
    )


@register(
    "ml_embedding_quantize_audit",
    oracle="""
    WITH q AS (
      SELECT label,
             -- zero vector guard: max|x| = 0 makes the scale infinite;
             -- its quantization error is exactly 0 by definition
             CASE WHEN list_max(
                    list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0
             THEN
             CAST(list_sum(list_transform(embedding, x ->
               CAST(round(abs(CAST(x AS DOUBLE)
                 - round(CAST(x AS DOUBLE) * (127.0 / list_max(
                     list_transform(embedding, y -> abs(CAST(y AS DOUBLE))))))
                   / (127.0 / list_max(
                     list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))))
               ) * 1000000000) AS BIGINT))) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS err_nano,
             len(embedding) AS dim
      FROM embeddings
    )
    SELECT label,
           count(*) AS n_vecs,
           round(CAST(sum(err_nano) AS DOUBLE) / 1000000000.0
                 / sum(dim), 6) AS avg_elem_err
    FROM q
    GROUP BY label
    """,
)
def ml_embedding_quantize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric-quantization audit for the embedding store: each
    vector is quantized with its own scale 127/max|x|, dequantized,
    and the mean absolute reconstruction error per element reported by
    label — the go/no-go number before swapping a 4-byte-float ANN
    index for a 1-byte one (4× memory, ~4× scan throughput). All
    arithmetic runs inside array higher-order functions at the scan
    (no shuffle carries vectors); per-element errors are snapped to
    exact nano-integers so the per-label sums are order-independent,
    and the group count is the only reduce-side state."""
    e = load(spark, sf_dir, "embeddings")
    absd = F.transform("embedding", lambda y: F.abs(y.cast("double")))
    scale = 127.0 / F.array_max(absd)
    err_nano = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.round(
                F.abs(
                    x.cast("double")
                    - F.round(x.cast("double") * scale) / scale
                )
                * 1000000000
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    q = e.select(
        "label",
        # zero-vector guard mirroring the oracle: err is 0 by definition
        F.when(F.array_max(absd) > 0, err_nano)
        .otherwise(F.lit(0).cast("long"))
        .alias("err_nano"),
        F.size("embedding").alias("dim"),
    )
    return q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(
            F.sum("err_nano").cast("double") / 1000000000.0 / F.sum("dim"), 6
        ).alias("avg_elem_err"),
    )


@register(
    "pipeline_shard_balance",
    oracle="""
    WITH sharded AS (
      SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             n_chars
      FROM documents
    ),
    per AS (
      SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM sharded GROUP BY shard
    )
    SELECT CAST(count(*) AS BIGINT) AS n_shards,
           CAST(min(n_docs) AS BIGINT) AS min_docs,
           CAST(max(n_docs) AS BIGINT) AS max_docs,
           CAST(CAST(max(chars) AS BIGINT) AS DOUBLE)
             / CAST(min(chars) AS BIGINT) AS char_skew_ratio
    FROM per
    """,
)
def pipeline_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard balance audit: documents assigned to 16 shards by
    md5 prefix (the deterministic assignment a corpus writer uses so
    re-runs land identically), then per-shard doc and character loads
    summarized as a skew ratio. A char_skew_ratio near 1 means
    downstream training jobs read balanced files; a big one means one
    data-loader worker stalls the epoch. Hash sharding is map-side;
    the audit aggregates to |shards| rows — at 100 TB this is the
    cheap pre-write check that the shard count divides the corpus
    evenly BEFORE committing to a layout."""
    docs = load(spark, sf_dir, "documents")
    per = (
        docs.select(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias(
                "shard"
            ),
            "n_chars",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.min("n_docs").alias("min_docs"),
        F.max("n_docs").alias("max_docs"),
        (F.max("chars").cast("double") / F.min("chars")).alias(
            "char_skew_ratio"
        ),
    )
