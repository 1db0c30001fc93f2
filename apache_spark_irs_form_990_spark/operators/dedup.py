"""Deduplication operators over `documents` (SURVEY.md §2 B10; north
star: LLM-training-data pipelines).

Five strategies, cheapest-first — the decision ladder a 100 TB corpus
dedup actually uses:

1. exact content-hash (`dedup_exact_hash`) — one shuffle on a 32-byte
   key, no token work;
2. n-gram Jaccard on shared shingles (`dedup_near_jaccard`) — exact
   near-dup pairs; candidate generation by shingle co-occurrence, so
   cost scales with shared-shingle pairs, not n^2;
3. MinHash+LSH (`dedup_near_minhash`) — the sub-quadratic scale path:
   shingle -> minhash signature -> banded bucket join;
4. SimHash (`dedup_simhash`) — constant-size per-doc fingerprint with
   hamming-proximity banding;
5. embedding cosine (`dedup_near_embedding`) — semantic near-dups.

The testdata documents are all-distinct (FIXTURES.md), so the exact /
near paths synthesize duplicates deterministically (self-union; word
truncation) on both the Spark and oracle sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.text import shingles
from apache_spark_irs_form_990_spark.functions.vectors import (
    SQL_COS_AB,
    dot,
    pair_dot_udf,
    sq_norm,
)
from apache_spark_irs_form_990_spark.operators.similarity import (
    _bounded_rows,
    _cent_assign_argmax,
    _cent_assign_rows,
    banded_lsh_pairs,
    banded_lsh_pairs_sql,
    emb_milli_corpus,
    emb_milli_corpus_sql,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "dedup_exact_hash",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
      WHERE doc_id % 3 = 0
    )
    SELECT sha256(text) AS fp,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM corpus
    GROUP BY sha256(text)
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash. Grouping on sha2(text) instead of
    text means the shuffle key is 32 bytes regardless of document size
    — at 100 TB that is the difference between shuffling hashes and
    shuffling the corpus. keep_doc_id = min gives a deterministic
    canonical survivor. (Duplicates synthesized: every 3rd doc
    re-appears under doc_id+1e6.)"""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    corpus = docs.unionByName(dupes)
    return (
        corpus.groupBy(F.sha2("text", 256).alias("fp"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


# per-(band, band_min) occupancy cap for the PAIRWISE banding form
# (r9, VERDICT r8 task 3): buckets above this skip pair enumeration —
# a 5k-doc identical cluster is 12.5M pairs/bucket (HOTBAND_r08
# measured 44k -> 50M total), and the registered megacluster path is
# dedup_minhash_star_links (occ-1 hub edges). 256 is >10x the max
# occupancy any test SF produces (21 at sf0.1), so the cap changes
# nothing until an adversarial input needs it.
_BAND_OCC_CAP = 256


def band_signatures(df: DataFrame) -> DataFrame:
    """Chunked-md5 MinHash band signatures of a (doc_id, text) frame:
    (doc_id, band, band_min) with 4 bands, each band's hash one 32-bit
    (8-hex) chunk of a single md5 per distinct 3-shingle — the shared
    signature kernel of `dedup_minhash_banding_md5`,
    `dedup_incremental_minhash`, and `pipeline_dedup_cascade`.

    Shape: map-side explode + one groupBy(doc_id) min-aggregate. The
    explode/md5/substring/min path is whole-stage-codegen'd end to
    end, which benches ~2.5x faster than the "shuffle-free" in-row
    higher-order forms (array_min over a transform, or a 4-least
    fold): HOF lambdas evaluate interpreted with per-element array
    allocation, and Catalyst's projection collapse re-inlines the
    md5 transform once per band. The partial min aggregate combines
    map-side, so the exchange carries ~one row per doc anyway — the
    codegen win beats the shuffle saving at every scale tested.
    `band_signatures_stateless` is the semantically-identical in-row
    form for unbounded streams, where a pre-join aggregate is not an
    option at any price."""
    shingled = df.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text")))).alias("shingle"),
    )
    md5h = F.md5(F.col("shingle"))
    sigw = shingled.groupBy("doc_id").agg(
        *[
            F.min(F.substring(md5h, 1 + 8 * b, 8)).alias(f"m{b}")
            for b in range(4)
        ]
    )
    return sigw.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"m{b}") for b in range(4)])).alias(
            "band", "band_min"
        ),
    )


def band_signatures_stateless(df: DataFrame) -> DataFrame:
    """`band_signatures` as a PURE PROJECTION — no aggregation, so it
    runs unmodified on an unbounded stream (`stream_dedup_near_static_
    index` banding its micro-batches before the stream-static join).
    The per-band minimum is an array_min over the in-row shingle-hash
    array: min over the multiset equals min over its distinct support,
    so the result is row-for-row identical to the batch kernel
    (asserted by tests). Batch ops prefer `band_signatures` — the
    codegen'd explode/groupBy form benches materially faster than
    this interpreted higher-order form."""
    hashed = df.select(
        "doc_id",
        F.transform(shingles(F.col("text")), lambda s: F.md5(s)).alias("hs"),
    ).filter(F.size("hs") > 0)
    sigw = hashed.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col("hs"), lambda x: F.substring(x, 1 + 8 * b, 8))
            ).alias(f"m{b}")
            for b in range(4)
        ],
    )
    return sigw.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"m{b}") for b in range(4)])).alias(
            "band", "band_min"
        ),
    )


def band_signatures_sql(src: str, pfx: str) -> str:
    """DuckDB twin of `band_signatures` as CTE text: defines
    ``{pfx}sh``, ``{pfx}w``, ``{pfx}sig`` over an existing CTE
    ``src(doc_id, text)``; the signature table is ``{pfx}sig``."""
    return f"""{pfx}sh AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM {src})
    ),
    {pfx}w AS (
      SELECT doc_id,
             min(substr(md5(shingle),  1, 8)) AS m0,
             min(substr(md5(shingle),  9, 8)) AS m1,
             min(substr(md5(shingle), 17, 8)) AS m2,
             min(substr(md5(shingle), 25, 8)) AS m3
      FROM {pfx}sh GROUP BY doc_id
    ),
    {pfx}sig AS (
      SELECT doc_id, 0 AS band, m0 AS band_min FROM {pfx}w
      UNION ALL SELECT doc_id, 1, m1 FROM {pfx}w
      UNION ALL SELECT doc_id, 2, m2 FROM {pfx}w
      UNION ALL SELECT doc_id, 3, m3 FROM {pfx}w
    )"""


@register(
    "dedup_near_jaccard",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- near-duplicate: same doc with the last 2 words dropped
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '') AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
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
    shingled AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               count(*) OVER (PARTITION BY shingle) AS df
        FROM shingled0
      ) WHERE df <= 100
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingled GROUP BY doc_id),
    pair_overlap AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      FROM shingled a JOIN shingled b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
    FROM pair_overlap
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.6
    """,
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (threshold 0.6) over the
    DISCRIMINATING shingle space: shingles appearing in more than 100
    documents are dropped before the inverted-index self-join (a
    corpus-common shingle contributes k^2 candidate pairs and no
    near-dup signal — the posting-list cap that keeps this exact
    method sub-quadratic at 100 TB; round 2 shipped it uncapped).
    The cap is a count-over-window on the shingle partition — ONE
    pass over the posting lists whose exchange pre-partitions them on
    exactly the key the pair self-join needs (a groupBy+semi-join cap
    would re-execute the shingle subtree per consumer: 16 parquet
    scans vs this form's 8). Jaccard is computed consistently over
    the kept shingle space on both sides (sizes and overlaps), so the
    statistic stays an exact set Jaccard — of the capped universe."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near)
    # distinct per (doc_id, shingle): under a duplicated doc_id row the
    # per-row array_distinct is not enough — multiplicity inflates both
    # sizes.n and shared, corrupting (or zeroing the denominator of)
    # the Jaccard. Set semantics = union of the doc's rows' shingles.
    shingled0 = (
        corpus.select(
            "doc_id",
            F.explode(F.array_distinct(shingles(F.col("text")))).alias("shingle"),
        )
    ).distinct()
    w_df = Window.partitionBy("shingle")
    shingled = (
        shingled0.withColumn("df", F.count("*").over(w_df))
        .filter(F.col("df") <= 100)
        .drop("df")
    )
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    overlap = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("shared").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("shared")
    )
    return (
        overlap.join(sa, F.col("id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("id_b") == F.col("sb.doc_id"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.6)
    )


_MINHASH_K, _MINHASH_R = 12, 3  # B = K // R = 4 bands


def _minhash_oracle() -> str:
    """Generate the DuckDB twin of dedup_near_minhash: the K=12
    minhashes (four 8-hex chunks of each of THREE seeded md5s — one
    hash evaluation yields four independent 32-bit hash functions),
    4-band bucket join, and agreement-fraction re-rank, all in
    portable SQL (md5 is bit-identical across engines)."""
    K, R = _MINHASH_K, _MINHASH_R
    mins = ",\n             ".join(
        f"min(substr(md5('{s // 4}|' || shingle), {1 + 8 * (s % 4)}, 8)) AS h{s}"
        for s in range(K)
    )
    bands = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5(h{i0} || h{i1} || h{i2}) AS bucket"
        " FROM sig".format(b=b, i0=b * R, i1=b * R + 1, i2=b * R + 2)
        for b in range(K // R)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(K)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '') AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    shingled AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
    ),
    sig AS (
      SELECT doc_id, {mins}
      FROM shingled GROUP BY doc_id
    ),
    bands AS (
      {bands}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                  AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST({agree} AS DOUBLE) / {K} AS est_jaccard
    FROM cand
    JOIN sig sa ON id_a = sa.doc_id
    JOIN sig sb ON id_b = sb.doc_id
    WHERE ({agree}) >= {K} * 0.5
    """


@register("dedup_near_minhash", oracle=_minhash_oracle())
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup candidates — the sub-quadratic
    scale path (shingle -> K minhashes -> B bands -> bucket join).

    Built from deterministic primitives with no MLlib model state: the
    K=12 "permutations" are the four 8-hex chunks of each of THREE
    seeded md5s (one md5 evaluation = four independent 32-bit hash
    functions — r3 cut the per-shingle hash work 4x this way) — md5 is
    defined identically in every engine, which is what gives this an
    exact cross-engine oracle (same technique as
    dedup_minhash_banding_md5). Signatures band into B=4 bands of R=3;
    docs sharing any band bucket become candidates, then exact
    signature agreement estimates Jaccard. Every step is a DataFrame
    op, so the whole pipeline shuffles only (band, bucket) keys —
    never document pairs — until the final candidate join. (In a
    single-engine production deployment, swap md5 for xxhash64 — same
    plan shape, ~5x cheaper hash.)
    """
    K, R = _MINHASH_K, _MINHASH_R
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near)
    shingled = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text")))).alias("shingle"),
    )
    # K permutations = 8-hex chunks of ceil(K/4) seeded md5s; min per
    # doc and chunk (one md5 evaluation -> four 32-bit hash functions).
    sig = shingled.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.md5(F.concat(F.lit(f"{s // 4}|"), F.col("shingle"))),
                    1 + 8 * (s % 4),
                    8,
                )
            ).alias(f"h{s}")
            for s in range(K)
        ]
    )
    # band signature = hash of R consecutive minhashes
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bidx).alias("band"),
                        F.md5(
                            F.concat(
                                *[F.col(f"h{bidx * R + r}") for r in range(R)]
                            )
                        ).alias("bucket"),
                    )
                    for bidx in range(K // R)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    # estimate similarity = fraction of agreeing minhashes
    siga = sig.alias("sa")
    sigb = sig.alias("sb")
    agree = sum(
        F.when(F.col(f"sa.h{i}") == F.col(f"sb.h{i}"), 1).otherwise(0)
        for i in range(K)
    )
    return (
        cand.join(siga, F.col("id_a") == F.col("sa.doc_id"))
        .join(sigb, F.col("id_b") == F.col("sb.doc_id"))
        .select(
            "id_a",
            "id_b",
            (agree.cast("double") / K).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= 0.5)
    )


def _simhash_oracle() -> str:
    """DuckDB twin of dedup_simhash: the 32 fingerprint bits come from
    the first 8 hex nibbles of md5(token) (4 bits per nibble), so both
    engines derive the identical per-token hash."""
    BITS = 32
    votes = ",\n             ".join(
        "sum(CASE WHEN ((n[{arr}] >> {sh}) & 1) = 1 THEN 1 ELSE -1 END)"
        " AS v{i}".format(arr=i // 4 + 1, sh=i % 4, i=i)
        for i in range(BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for i in range(BITS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    nb AS (
      SELECT doc_id,
             [strpos('0123456789abcdef', substr(md5(token), j, 1)) - 1
              FOR j IN generate_series(1, 8)] AS n
      FROM tok
    ),
    votes AS (
      SELECT doc_id, {votes}
      FROM nb GROUP BY doc_id
    ),
    fp AS (
      SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
    ),
    halves AS (
      SELECT doc_id, simhash, 0 AS part, simhash & 65535 AS key FROM fp
      UNION ALL
      SELECT doc_id, simhash, 1, (simhash >> 16) & 65535 FROM fp
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM halves a
    JOIN halves b ON a.part = b.part AND a.key = b.key
                 AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 32-bit token-weighted fingerprint per doc, then
    hamming distance <= 3 among candidates sharing a 16-bit half
    (the pigeonhole banding: hamming<=3 over 32 bits guarantees one of
    the two halves matches... for <=1 per half; with 2 halves this
    catches distance<=1 exactly and most <=3 — the standard
    recall/cost trade, stated honestly).

    Fully JVM-side: per-token hash -> per-bit +/-1 vote -> groupBy sum
    -> sign -> bits to int. One shuffle per doc for the vote, one
    half-key join for candidates; no Python, no pairs before banding.
    The per-token hash is the first 8 hex nibbles of md5(token)
    (32 bits), identical in every engine — which is what turned this
    from a rows-only check into an exact cross-engine oracle. (Swap
    md5 for xxhash64 in a single-engine deployment: same plan,
    cheaper hash.)"""
    BITS = 32
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    md5h = F.md5("token")
    nib = [
        F.conv(F.substring(md5h, j + 1, 1), 16, 10).cast("int")
        for j in range(8)
    ]
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(nib[i // 4], i % 4).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(BITS)
        ]
    )
    fp = votes.select(
        "doc_id",
        sum(
            (F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(0))
            for i in range(BITS)
        ).cast("long").alias("simhash"),
    )
    half_lo = F.col("simhash").bitwiseAND(F.lit((1 << 16) - 1))
    half_hi = F.shiftright(F.col("simhash"), 16).bitwiseAND(F.lit((1 << 16) - 1))
    halves = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("part"), half_lo.alias("key")),
                F.struct(F.lit(1).alias("part"), half_hi.alias("key")),
            )
        ).alias("h"),
    ).select("doc_id", "simhash", "h.part", "h.key")
    a = halves.alias("a")
    b = halves.alias("b")
    xor = F.expr("a.simhash ^ b.simhash")
    return (
        a.join(
            b,
            (F.col("a.part") == F.col("b.part"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(xor).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


_SQL_MILLI_EMB = """m0 AS (
      SELECT vec_id, v FROM (
        SELECT vec_id,
                    list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        FROM embeddings
      ) WHERE list_sum(list_transform(v, x -> x * x)) > 0
    )"""


def _near_embedding_oracle() -> str:
    return f"""
    WITH {_SQL_MILLI_EMB},
    m AS (SELECT * FROM m0),
    corpus AS MATERIALIZED (
      {emb_milli_corpus_sql((60,))}
    ),
    {banded_lsh_pairs_sql("corpus")},
    scored AS (
      SELECT c.id_a, c.id_b, {SQL_COS_AB} AS cosine
      FROM cand c
      JOIN corpus a ON a.vec_id = c.id_a
      JOIN corpus b ON b.vec_id = c.id_b
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.95
    """


def _scored_cand(corpus: DataFrame) -> DataFrame:
    """Exact milli-int cosine for each banded-LSH candidate pair of a
    (vec_id, v) corpus: (id_a, id_b, cosine). The pair join is keyed on
    (band, bucket); scoring is two equi-joins on vec_id."""
    corpus_n = corpus.withColumn("n", sq_norm(F.col("v")))
    cand = banded_lsh_pairs(corpus)
    a = corpus_n.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = corpus_n.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    cosine = pair_dot_udf()(F.col("va"), F.col("vb")).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return cand.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", cosine.alias("cosine")
    )


@register("dedup_near_embedding", oracle=_near_embedding_oracle())
def dedup_near_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine >= 0.95) with BUCKETED
    candidate generation: banded hyperplane LSH (similarity.py,
    8 bands x 8 planes) proposes pairs, exact integer-milli cosine
    confirms — the two-stage cascade a 100 TB semantic dedup runs
    (candidate recall ~99% at this threshold; audited by
    `dedup_embedding_recall_audit` against the exact twin).

    Near-duplicates are synthesized deterministically (every 5th
    vector re-appears under vec_id+1e6 with dims >= 60 zeroed, cosine
    ~0.97 to its original — the embedding analogue of the truncated-
    text duplicates used by the text dedup family); without injection
    the raw fixture has no pairs above 0.51. Round 2 registered the
    unbucketed all-pairs form, which survives capped as
    `dedup_near_embedding_exact`."""
    corpus = emb_milli_corpus(spark, sf_dir, keeps=(60,))
    return _scored_cand(corpus).filter(F.col("cosine") >= 0.95)


@register(
    "dedup_near_embedding_exact",
    oracle=f"""
    WITH {_SQL_MILLI_EMB},
    m AS (SELECT * FROM m0 WHERE vec_id < 300),
    corpus AS MATERIALIZED (
      {emb_milli_corpus_sql((60,))}
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {SQL_COS_AB} AS cosine
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.95
    """,
)
def dedup_near_embedding_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs ground truth for embedding near-dup on a BOUNDED
    slice (base vec_id < 300 plus its injected near-dups; the filter
    pushes to the scan). Exists to audit the bucketed default's recall
    (`dedup_embedding_recall_audit`) — at 100 TB exact truth runs on a
    sample, never the corpus."""
    corpus = emb_milli_corpus(spark, sf_dir, keeps=(60,), cap=300)
    corpus = corpus.withColumn("n", sq_norm(F.col("v")))
    a, b = corpus.alias("a"), corpus.alias("b")
    cosine = dot(F.col("a.v"), F.col("b.v")).cast("double") / (
        F.sqrt(F.col("a.n").cast("double")) * F.sqrt(F.col("b.n").cast("double"))
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.95)
    )


@register(
    "dedup_embedding_recall_audit",
    oracle=f"""
    WITH {_SQL_MILLI_EMB},
    m AS (SELECT * FROM m0 WHERE vec_id < 300),
    corpus AS MATERIALIZED (
      {emb_milli_corpus_sql((60,))}
    ),
    {banded_lsh_pairs_sql("corpus")},
    truth AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE {SQL_COS_AB} >= 0.95
    ),
    hit AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
    SELECT (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM cand) AS n_candidates,
           (SELECT count(*) FROM hit) AS n_hits,
           CAST((SELECT count(*) FROM hit) AS DOUBLE)
             / (SELECT count(*) FROM cand) AS precision,
           CAST((SELECT count(*) FROM hit) AS DOUBLE)
             / (SELECT count(*) FROM truth) AS recall
    """,
)
def dedup_embedding_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the banded-LSH candidate generator against
    exact cosine>=0.95 ground truth on the bounded vec_id < 300 slice
    (same injected corpus as `dedup_near_embedding`). This is how the
    (bands, planes) parameters of the bucketed default get justified
    before trusting it on the full corpus — the dedup_lsh_recall_audit
    pattern applied to the embedding family. Single-row output."""
    corpus = emb_milli_corpus(spark, sf_dir, keeps=(60,), cap=300)
    corpus_n = corpus.withColumn("n", sq_norm(F.col("v")))
    cand = banded_lsh_pairs(corpus)
    a, b = corpus_n.alias("a"), corpus_n.alias("b")
    cosine = dot(F.col("a.v"), F.col("b.v")).cast("double") / (
        F.sqrt(F.col("a.n").cast("double")) * F.sqrt(F.col("b.n").cast("double"))
    )
    truth = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cosine >= 0.95)
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
    )
    hit = cand.intersect(truth)
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_truth.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            "n_truth",
            "n_candidates",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_candidates")).alias(
                "precision"
            ),
            (F.col("n_hits").cast("double") / F.col("n_truth")).alias("recall"),
        )
    )


@register(
    "dedup_fuzzy_levenshtein",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)),
                             ' '), '') AS text,
             lang
      FROM documents WHERE doc_id % 7 = 0
    ),
    blocked AS (
      SELECT doc_id, text, lang, string_split(text, ' ')[1] AS blk
      FROM corpus
    )
    SELECT id_a, id_b, edit_dist FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
      FROM blocked a
      JOIN blocked b
        ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE abs(len(a.text) - len(b.text)) <= 25
    ) WHERE edit_dist <= 25
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy dedup with BLOCKING: candidate pairs come
    only from docs sharing (lang, first token) — the classic record-
    linkage move that keeps an O(n²·len²) metric affordable by never
    materializing cross-block pairs. Within blocks, exact
    levenshtein (identical definition in both engines) gates at <=25.

    At 100 TB, first-token blocking is too coarse AND any pairwise
    rescore is k^2 in duplicate-cluster size: the at-scale plan is
    [[dedup_fuzzy_star_rescore]] (MinHash-banded recall, edit-distance
    precision against bucket HUBS only — bands x n bounded), with
    [[dedup_fuzzy_cascade]] as the pairwise sample-scale truth that
    [[dedup_star_vs_pairwise_audit]] prices the star election against.

    Per-pair cost discipline (r5 — this was the registry's slowest
    Spark-side query at 186 s, all of it O(len_a*len_b) dynamic
    programming on ~1 KB texts): (1) a LENGTH prefilter in the join
    condition — |len_a - len_b| > 25 forces distance > 25, so those
    pairs never reach the DP — and (2) the THRESHOLDED levenshtein
    (Spark 3.5+): with threshold k the DP computes only the 2k+1-wide
    diagonal band, O(len*k) instead of O(len^2), returning -1 when the
    distance exceeds k. Both are pure necessary-condition/banded
    optimizations: every kept row's distance is exact, so the result
    (and the unchanged DuckDB oracle) is bit-identical."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
        "lang",
    )
    corpus = docs.unionByName(near).withColumn(
        "blk", F.split(F.col("text"), " ").getItem(0)
    )
    a, b = corpus.alias("a"), corpus.alias("b")
    banded_dist = F.levenshtein(
        F.col("a.text"), F.col("b.text"), threshold=25
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.abs(F.length(F.col("a.text")) - F.length(F.col("b.text")))
                <= 25
            ),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            banded_dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


@register(
    "dedup_paragraph_reassembly",
    oracle="""
    WITH chunked AS (
      SELECT doc_id, u.pos, u.chunk
      FROM (
        SELECT doc_id,
               unnest([{'pos': i, 'chunk': array_to_string(
                          list_slice(t, (i * 10) + 1, (i + 1) * 10), ' ')}
                       FOR i IN generate_series(0, CAST(ceil(len(t) / 10.0)
                                                        AS BIGINT) - 1)]) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      )
    ),
    first_seen AS (
      SELECT *, min(doc_id) OVER (PARTITION BY chunk) AS owner
      FROM chunked
    ),
    kept AS (SELECT * FROM first_seen WHERE doc_id = owner)
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY pos) AS dedup_text,
           count(*) AS n_kept_chunks
    FROM kept
    GROUP BY doc_id
    """,
)
def dedup_paragraph_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level dedup with document reassembly (CCNet-style):
    documents split into fixed 10-word chunks; a chunk survives only
    in the FIRST document that contains it (min doc_id over the
    corpus-wide chunk hash); surviving chunks re-join in original
    order. This removes boilerplate shared across documents (headers,
    license blocks, navigation text) while keeping each document's
    unique content — dedup below document granularity, which document-
    hash dedup can't do.

    Plan: explode is partition-local; ONE shuffle on the chunk key
    (hash-sized at scale: group on xxhash64(chunk), not the text —
    here the chunk text itself keys so the oracle can mirror it);
    reassembly groups by doc_id (second shuffle, row count already
    reduced). Docs whose every chunk was seen elsewhere drop entirely
    — the aggregate, not a null-fill, decides survival.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    n_chunks = F.ceil(F.size("t") / 10.0).cast("long")
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    chunked = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(
                        " ", F.slice(F.col("t"), (i * 10 + 1).cast("int"), 10)
                    ).alias("chunk"),
                ),
            )
        ).alias("u"),
    ).select("doc_id", "u.pos", "u.chunk")
    w = Window.partitionBy("chunk")
    kept = chunked.withColumn("owner", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("owner")
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                    lambda s: s.getField("chunk"),
                ),
                " ",
            ).alias("dedup_text"),
            F.count("*").alias("n_kept_chunks"),
        )
    )


@register(
    "dedup_minhash_banding_md5",
    # f-string: the occupancy cap must interpolate _BAND_OCC_CAP, the
    # same single source of truth the Spark-side `_occ` guard reads —
    # a hardcoded literal here desynchronizes silently when the cap is
    # tuned (r9 self-review finding)
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '') AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    shingled AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
    ),
    sigw AS (
      SELECT doc_id,
             min(substr(md5(shingle),  1, 8)) AS m0,
             min(substr(md5(shingle),  9, 8)) AS m1,
             min(substr(md5(shingle), 17, 8)) AS m2,
             min(substr(md5(shingle), 25, 8)) AS m3
      FROM shingled GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id, 0 AS band, m0 AS band_min FROM sigw
      UNION ALL SELECT doc_id, 1, m1 FROM sigw
      UNION ALL SELECT doc_id, 2, m2 FROM sigw
      UNION ALL SELECT doc_id, 3, m3 FROM sigw
    ),
    occ AS (
      SELECT band, band_min, count(*) AS _occ
      FROM sig GROUP BY band, band_min
    ),
    cold AS (
      SELECT s.doc_id, s.band, s.band_min
      FROM sig s JOIN occ o
        ON o.band = s.band AND o.band_min = s.band_min
      WHERE o._occ <= {_BAND_OCC_CAP}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS n_shared_bands
    FROM cold a
    JOIN cold b ON a.band = b.band AND a.band_min = b.band_min
              AND a.doc_id < b.doc_id
    GROUP BY id_a, id_b
    """,
)
def dedup_minhash_banding_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding with a cross-engine-exact signature — the
    deterministic twin of `dedup_near_minhash`. The 4 band hashes are
    the four 32-bit (8-hex) chunks of ONE md5 per shingle — the
    standard split-one-wide-hash trick — so each shingle is hashed
    once (round 2 hashed it four times behind a 4x row explode), and
    the signature groupBy shuffles doc-count rows, not doc-count x
    bands. md5 is defined identically in both engines, so the full
    LSH pipeline — shingle → chunk minima → per-band bucket join →
    candidate pairs — hash-matches the DuckDB oracle exactly.

    Scale shape: the banded self-join is keyed on (band, band_min) —
    only same-bucket docs ever meet, so cost is Σ bucket², not n².
    Same near-dupe injection as the Jaccard exact baseline (doc_id%5
    with last two words dropped) so candidate quality is comparable
    across the three near-dup operators.

    HOT-BUCKET OCCUPANCY CAP (r9, VERDICT r8 task 3): identical-text
    clusters make ONE bucket per band sized like the cluster, and the
    pairwise enumeration of that bucket is quadratic in cluster size —
    the r8 hot-band sweep planted a 5,000-doc identical cluster and
    measured this form going 44k -> 50M candidate pairs (3.2 -> 29 s
    at toy scale; a 1M-doc boilerplate cluster in a real crawl would
    be 5e11 pairs — a dead job). Buckets with occupancy > 256 are
    therefore EXCLUDED from pair enumeration (the `_occ` guard, same
    contract as `banded_lsh_pairs`' hot-bucket cap): pairwise output
    is the declared result ONLY for clusters the pairwise form can
    afford, and megaclusters belong to [[dedup_minhash_star_links]],
    whose hub topology emits occ-1 edges and spans the same component.
    [[dedup_banding_occupancy_audit]] prices what the cap dropped
    (capped pair mass + the star mass that replaces it) from the same
    signature table; at every test SF max occupancy is ~21, so the
    cap is invisible to the oracles until an adversarial input needs
    it — HOTBAND_r09.json shows the planted megacluster bounded."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near)
    # heavy-once: materialize the tiny signature table (4 rows x ~16
    # bytes per doc) so the self-join's two sides don't each re-run
    # the shingle explode + hash — the in-query analogue of the
    # persisted signature index `dedup_incremental_minhash` probes.
    sig = band_signatures(corpus).localCheckpoint()
    occ = sig.groupBy("band", "band_min").agg(
        F.count(F.lit(1)).alias("_occ")
    )
    # the occupancy frame is value-keyed (not a fixed small bucket
    # space), so it is data-sized: plain shuffle join, NOT broadcast
    cold = sig.join(
        occ.filter(F.col("_occ") <= _BAND_OCC_CAP).select("band", "band_min"),
        ["band", "band_min"],
    )
    a, b = cold.alias("a"), cold.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_min") == F.col("b.band_min"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


@register(
    "dedup_banding_occupancy_audit",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '') AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    {band_signatures_sql("corpus", "c")},
    occ AS (
      SELECT band, band_min, count(*) AS occ
      FROM csig GROUP BY band, band_min
    )
    SELECT CAST({_BAND_OCC_CAP} AS INT) AS occ_cap,
           count(*) AS n_buckets,
           CAST(max(occ) AS BIGINT) AS max_occ,
           CAST(sum(CASE WHEN occ > {_BAND_OCC_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hot_buckets,
           CAST(sum((occ * (occ - 1)) // 2) AS BIGINT) AS total_pair_mass,
           CAST(sum(CASE WHEN occ <= {_BAND_OCC_CAP}
                    THEN (occ * (occ - 1)) // 2 ELSE 0 END)
                AS BIGINT) AS kept_pair_mass,
           CAST(sum(CASE WHEN occ > {_BAND_OCC_CAP}
                    THEN (occ * (occ - 1)) // 2 ELSE 0 END)
                AS BIGINT) AS capped_pair_mass,
           CAST(sum(CASE WHEN occ > {_BAND_OCC_CAP}
                    THEN occ - 1 ELSE 0 END)
                AS BIGINT) AS hot_star_mass
    FROM occ
    """,
)
def dedup_banding_occupancy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE PRICE OF THE HOT-BUCKET CAP, as data (r9, VERDICT r8 task
    3 — the [[dedup_semdedup_cap_audit]] pricing pattern applied to
    the banding truth side): from the same signature table
    [[dedup_minhash_banding_md5]] pairs on, one row reporting bucket
    occupancy structure and the exact pair mass the occupancy cap
    keeps vs drops — `capped_pair_mass` is what the pairwise form
    REFUSES to enumerate (quadratic in megacluster size) and
    `hot_star_mass` is what [[dedup_minhash_star_links]] pays instead
    (linear: occ-1 hub edges spanning the same component).

    At every test SF the row reads n_hot_buckets=0 / capped_pair_mass
    =0 (max occupancy ~21 vs the 256 cap) — the cap is provably
    invisible on well-behaved corpora. Under the planted 5,000-doc
    hot-band cluster the same computation shows ~50M of the ~50.1M
    total pair mass capped, with a ~20k star mass replacing it
    (HOTBAND_r09.json runs this audit on both corpora). Cost: the
    audit itself is one groupBy over the signature table plus one
    aggregate over the bucket-occupancy frame — linear, safe to run
    on exactly the adversarial inputs the pairwise form is not."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    occ = (
        band_signatures(docs.unionByName(near))
        .groupBy("band", "band_min")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    hot = F.col("occ") > _BAND_OCC_CAP
    pair_mass = F.expr("(occ * (occ - 1)) div 2")
    return occ.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("occ").alias("max_occ"),
        F.sum(F.when(hot, 1).otherwise(0)).alias("n_hot_buckets"),
        F.sum(pair_mass).alias("total_pair_mass"),
        F.sum(F.when(~hot, pair_mass).otherwise(0)).alias("kept_pair_mass"),
        F.sum(F.when(hot, pair_mass).otherwise(0)).alias("capped_pair_mass"),
        F.sum(F.when(hot, F.col("occ") - 1).otherwise(0)).alias(
            "hot_star_mass"
        ),
    ).select(
        F.lit(_BAND_OCC_CAP).cast("int").alias("occ_cap"),
        "n_buckets",
        "max_occ",
        "n_hot_buckets",
        "total_pair_mass",
        "kept_pair_mass",
        "capped_pair_mass",
        "hot_star_mass",
    )


@register(
    "dedup_incremental_minhash",
    oracle="""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    batch AS (
      SELECT doc_id + 5000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '') AS text
      FROM documents WHERE doc_id % 10 = 0
    ),
    cs AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
    ),
    bs AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM batch)
    ),
    csw AS (
      SELECT doc_id,
             min(substr(md5(shingle),  1, 8)) AS m0,
             min(substr(md5(shingle),  9, 8)) AS m1,
             min(substr(md5(shingle), 17, 8)) AS m2,
             min(substr(md5(shingle), 25, 8)) AS m3
      FROM cs GROUP BY doc_id
    ),
    bsw AS (
      SELECT doc_id,
             min(substr(md5(shingle),  1, 8)) AS m0,
             min(substr(md5(shingle),  9, 8)) AS m1,
             min(substr(md5(shingle), 17, 8)) AS m2,
             min(substr(md5(shingle), 25, 8)) AS m3
      FROM bs GROUP BY doc_id
    ),
    csig AS (
      SELECT doc_id, 0 AS band, m0 AS band_min FROM csw
      UNION ALL SELECT doc_id, 1, m1 FROM csw
      UNION ALL SELECT doc_id, 2, m2 FROM csw
      UNION ALL SELECT doc_id, 3, m3 FROM csw
    ),
    bsig AS (
      SELECT doc_id, 0 AS band, m0 AS band_min FROM bsw
      UNION ALL SELECT doc_id, 1, m1 FROM bsw
      UNION ALL SELECT doc_id, 2, m2 FROM bsw
      UNION ALL SELECT doc_id, 3, m3 FROM bsw
    )
    SELECT b.doc_id AS new_id, c.doc_id AS corpus_id,
           count(*) AS n_shared_bands
    FROM bsig b JOIN csig c
      ON b.band = c.band AND b.band_min = c.band_min
    GROUP BY new_id, corpus_id
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup incremental ingest — the nightly-crawl shape for
    non-exact duplicates: today's batch (every 10th doc, truncated by
    two words, re-id'd at +5e6 — a near-dup of its original) is banded
    with the same chunked-md5 MinHash signature as the corpus, and
    candidates come from an ASYMMETRIC batch⋈corpus signature join —
    the corpus never self-joins, so a day's ingest costs
    |batch_sigs| ⋈ |corpus_sigs| on (band, band_min), not corpus².
    At 100 TB the corpus side is a persisted signature index (4 rows x
    ~16 bytes per doc) that each nightly batch probes; this query is
    the probe. Complements `pipeline_incremental_dedup` (exact
    fingerprints) one level up the dedup ladder."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    batch = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )

    bsig = band_signatures(batch).alias("b")
    csig = band_signatures(docs).alias("c")
    return (
        bsig.join(
            csig,
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.band_min") == F.col("c.band_min")),
        )
        .groupBy(
            F.col("b.doc_id").alias("new_id"),
            F.col("c.doc_id").alias("corpus_id"),
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


@register(
    "dedup_exact_normalized",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             upper(text) || '  '
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS norm_fp,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_variants
    FROM corpus
    GROUP BY norm_fp
    HAVING count(*) > 1
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup: case-fold, trim, collapse
    whitespace runs, THEN fingerprint — catches the trivially-mutated
    copies (re-encoded, re-wrapped, upper-cased) that byte-exact
    `dedup_exact_hash` misses but near-dup LSH is overkill for. In a
    corpus pipeline this runs between the two: one map-side
    normalization + one groupBy on the fingerprint. Variants are
    injected deterministically (doc_id%7: upper-cased + trailing
    whitespace) so the operator provably collapses them; min(doc_id)
    is the canonical-survivor rule."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
    )
    corpus = docs.unionByName(mutated)
    norm = F.md5(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    )
    return (
        corpus.groupBy(norm.alias("norm_fp"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_variants"),
        )
        .filter(F.col("n_variants") > 1)
    )


def _minhash_jaccard_audit_oracle() -> str:
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '')
      FROM documents WHERE doc_id % 5 = 0
    ),
    {band_signatures_sql("corpus", "a")},
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             count(*) AS n_shared_bands
      FROM asig a JOIN asig b
        ON a.band = b.band AND a.band_min = b.band_min
       AND a.doc_id < b.doc_id
      GROUP BY id_a, id_b
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.id_a, c.id_b, count(*) AS n_common
      FROM cand c
      JOIN sh x ON x.doc_id = c.id_a
      JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      GROUP BY c.id_a, c.id_b
    )
    SELECT c.id_a, c.id_b, c.n_shared_bands,
           CAST((coalesce(m.n_common, 0) * 1000000)
                // (sa.n + sb.n - coalesce(m.n_common, 0)) AS BIGINT)
             AS jacc_micro
    FROM cand c
    LEFT JOIN common m ON m.id_a = c.id_a AND m.id_b = c.id_b
    JOIN sizes sa ON sa.doc_id = c.id_a
    JOIN sizes sb ON sb.doc_id = c.id_b
    """


@register("dedup_minhash_jaccard_audit", oracle=_minhash_jaccard_audit_oracle())
def dedup_minhash_jaccard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ESTIMATOR CALIBRATION for the MinHash banding path: for every
    candidate pair the bands propose, compute the EXACT shingle-set
    Jaccard (integer micro-units, floor division) next to the band
    agreement count — the table you regress to answer "what Jaccard
    does k-of-4 shared bands actually correspond to on THIS corpus?"
    before trusting the banding threshold at full scale. Completes the
    audit family (`dedup_lsh_recall_audit` measures recall of the
    candidate set; this measures what the band signal MEANS).

    Scale shape: the expensive exact Jaccard runs on CANDIDATE PAIRS
    ONLY — the shared-shingle join is gated through the banded
    candidate set (two semi-structured equi-joins keyed on doc_id +
    shingle), never all-pairs; cost is O(candidates x shingles/doc),
    the same asymptotics as the banding pass itself."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near).localCheckpoint()
    sig = band_signatures(corpus)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_min") == F.col("b.band_min"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )
    sh = corpus.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text")))).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    # shared-shingle count per candidate pair: both joins are
    # equi-joins — the second keyed on (id_b, shingle) so only
    # matching shingles ever meet, never the per-pair cross product
    common = (
        cand.select("id_a", "id_b")
        .join(sh.select(F.col("doc_id").alias("id_a"), "shingle"), "id_a")
        .join(
            sh.select(F.col("doc_id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        cand.join(common, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared_bands",
            F.floor(
                (F.coalesce(F.col("n_common"), F.lit(0)) * 1000000)
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("n_common"), F.lit(0)))
            ).cast("long").alias("jacc_micro"),
        )
    )


@register(
    "dedup_minhash_star_links",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)), ' '), '') AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    shingled AS (
      SELECT doc_id,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 2), ' ')
               FOR i IN generate_series(1, len(t) - 2)
             ])) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM corpus)
    ),
    sigw AS (
      SELECT doc_id,
             min(substr(md5(shingle),  1, 8)) AS m0,
             min(substr(md5(shingle),  9, 8)) AS m1,
             min(substr(md5(shingle), 17, 8)) AS m2,
             min(substr(md5(shingle), 25, 8)) AS m3
      FROM shingled GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id, 0 AS band, m0 AS band_min FROM sigw
      UNION ALL SELECT doc_id, 1, m1 FROM sigw
      UNION ALL SELECT doc_id, 2, m2 FROM sigw
      UNION ALL SELECT doc_id, 3, m3 FROM sigw
    ),
    hubs AS (
      SELECT band, band_min, min(doc_id) AS hub_id
      FROM sig GROUP BY band, band_min
    )
    SELECT h.hub_id, s.doc_id, count(*) AS n_shared_bands
    FROM sig s
    JOIN hubs h ON s.band = h.band AND s.band_min = h.band_min
    WHERE s.doc_id <> h.hub_id
    GROUP BY h.hub_id, s.doc_id
    """,
)
def dedup_minhash_star_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-TOPOLOGY near-dup edges — the O(bucket) alternative to the
    all-pairs bucket self-join of [[dedup_minhash_banding_md5]]
    (SCALE.md §11 finding 2): each bucket member links only to the
    bucket's MINIMUM doc_id (the hub), so a k-member bucket emits k−1
    edges instead of k(k−1)/2, and total edge volume is bounded by
    bands × n regardless of duplicate-cluster size. A star spans the
    same connected component as the clique, so survivorship
    (keep-min) and component clustering are unchanged — what is lost
    is only the explicit pairwise list, which is why this is the
    registered MEGACLUSTER path while the banding query remains the
    pairwise default for the small clusters real SFs contain. Same
    corpus injection and md5-chunk signatures as the banding twin, so
    the two results are directly comparable."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    sig = band_signatures(docs.unionByName(near)).localCheckpoint()
    hubs = sig.groupBy("band", "band_min").agg(F.min("doc_id").alias("hub_id"))
    return (
        sig.join(hubs, ["band", "band_min"])
        .filter(F.col("doc_id") != F.col("hub_id"))
        .groupBy("hub_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


@register(
    "dedup_fuzzy_cascade",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)),
                             ' '), '') AS text
      FROM documents WHERE doc_id % 7 = 0
    ),
    {band_signatures_sql("corpus", "c")},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM csig a JOIN csig b
        ON a.band = b.band AND a.band_min = b.band_min
       AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
    FROM cand c
    JOIN corpus a ON a.doc_id = c.id_a
    JOIN corpus b ON b.doc_id = c.id_b
    WHERE abs(len(a.text) - len(b.text)) <= 25
      AND levenshtein(a.text, b.text) <= 25
    """,
)
def dedup_fuzzy_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PAIRWISE two-stage fuzzy-dedup cascade — the SAMPLE-SCALE
    TRUTH side of [[dedup_star_vs_pairwise_audit]], NOT the at-scale
    plan. Its precision stage rescores every banded candidate pair,
    which is inherently k^2 in duplicate-cluster size: its own
    scale-step records 65.3 s at sf1 (~21x for the 10x step,
    candidates 43k -> 1.77M, SCALE_STEP_r06.json). The registered
    100 TB plan is [[dedup_fuzzy_star_rescore]] (hub edges bound DP
    work at bands x n — 10.9 s on the same sf1 step), with
    [[dedup_fuzzy_star_components]] recovering full transitive
    clusters over the same O(occ) edges. Run THIS form only on a
    bounded sample to price the star election's recall, exactly as
    the audit does (sample-then-trust protocol in its docstring).

    Mechanics (r5): recall stage = MinHash-banded candidates (the
    shared `band_signatures` kernel — sub-quadratic, shuffles only
    (band, band_min) keys), precision stage = exact edit distance
    gated at <= 25 on candidates only, with the r5 cost discipline
    (length prefilter in the join condition, THRESHOLDED banded
    levenshtein — both pure necessary-condition optimizations, so
    kept rows are exact and the oracle needs neither). Same injected
    %7-truncated near-dup corpus as the blocking variant, so the two
    recall strategies are directly comparable: first-token blocking
    scales with block sizes (quadratic within a block); banding scales
    with true near-dup cluster sizes (SCALE.md §11 finding 2)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near).localCheckpoint()
    sig = band_signatures(corpus)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_min") == F.col("b.band_min"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ta = corpus.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    tb = corpus.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    banded_dist = F.levenshtein(F.col("ta"), F.col("tb"), threshold=25).cast(
        "long"
    )
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(F.abs(F.length("ta") - F.length("tb")) <= 25)
        .select("id_a", "id_b", banded_dist.alias("edit_dist"))
        .filter(F.col("edit_dist") >= 0)
    )


@register(
    "dedup_fuzzy_star_rescore",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)),
                             ' '), '') AS text
      FROM documents WHERE doc_id % 7 = 0
    ),
    {band_signatures_sql("corpus", "c")},
    hubs AS (
      SELECT band, band_min, min(doc_id) AS hub_id
      FROM csig GROUP BY band, band_min
    ),
    star AS (
      SELECT DISTINCT h.hub_id, s.doc_id
      FROM csig s
      JOIN hubs h ON s.band = h.band AND s.band_min = h.band_min
      WHERE s.doc_id <> h.hub_id
    ),
    confirmed AS (
      SELECT st.doc_id,
             min(st.hub_id) AS min_hub,
             count(*) AS n_dup_hubs
      FROM star st
      JOIN corpus m ON m.doc_id = st.doc_id
      JOIN corpus h ON h.doc_id = st.hub_id
      WHERE abs(len(m.text) - len(h.text)) <= 25
        AND levenshtein(m.text, h.text) <= 25
      GROUP BY st.doc_id
    )
    SELECT c.doc_id,
           coalesce(cf.min_hub, c.doc_id) AS keeper_id,
           CAST(coalesce(cf.n_dup_hubs, 0) AS BIGINT) AS n_dup_hubs
    FROM corpus c
    LEFT JOIN confirmed cf ON cf.doc_id = c.doc_id
    """,
)
def dedup_fuzzy_star_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MEGACLUSTER-SAFE fuzzy-dedup cascade (r6, VERDICT r5 task 1)
    — [[dedup_fuzzy_cascade]] recomposed so the expensive precision
    stage runs on STAR-LINK hub edges instead of pairwise banded
    candidates. The cascade's registered pairwise form rescores every
    candidate pair, which is inherently k^2 in duplicate-cluster size
    (SCALE_STEP_r05.json measured 3.38 s -> 50.76 s across the 10x
    sf0.1 -> sf1 step as candidates grew 43k -> 1.77M); here each doc
    rescores only against its buckets' HUBS ([[dedup_minhash_star_links]]
    topology: hub = bucket-min doc_id), so total DP work is bounded by
    bands x n regardless of cluster size — O(occ), not O(occ^2).

    Semantics: for a true near-dup cluster every member shares a band
    minimum with the cluster's minimum doc — all members link to (and
    edit-distance-confirm against) the same hub, so keep-min
    SURVIVORSHIP is unchanged vs the pairwise form (the star spans the
    same component; SCALE.md §12's argument, now executable). Output
    is the per-document golden-record election the pipeline actually
    consumes: (doc_id, keeper_id = min confirmed hub else self,
    n_dup_hubs), one row per corpus doc — singletons keep themselves
    with n_dup_hubs = 0. Same %7-truncated injected corpus and the
    same |len delta| <= 25 prefilter + thresholded banded-DP
    levenshtein(.., 25) cost discipline as the pairwise cascade, so
    the two registered forms are directly comparable in the
    scale-step sweep."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near).localCheckpoint()
    sig = band_signatures(corpus)
    hubs = sig.groupBy("band", "band_min").agg(F.min("doc_id").alias("hub_id"))
    star = (
        sig.join(hubs, ["band", "band_min"])
        .filter(F.col("doc_id") != F.col("hub_id"))
        .select("hub_id", "doc_id")
        .distinct()
    )
    tm = corpus.select("doc_id", F.col("text").alias("t_m"))
    th = corpus.select(
        F.col("doc_id").alias("hub_id"), F.col("text").alias("t_h")
    )
    banded_dist = F.levenshtein(F.col("t_m"), F.col("t_h"), threshold=25)
    confirmed = (
        star.join(tm, "doc_id")
        .join(th, "hub_id")
        .filter(F.abs(F.length("t_m") - F.length("t_h")) <= 25)
        .filter(banded_dist >= 0)
        .groupBy("doc_id")
        .agg(
            F.min("hub_id").alias("min_hub"),
            F.count(F.lit(1)).alias("n_dup_hubs"),
        )
    )
    return (
        corpus.select("doc_id")
        .join(confirmed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("min_hub", F.col("doc_id")).alias("keeper_id"),
            F.coalesce("n_dup_hubs", F.lit(0)).cast("long").alias("n_dup_hubs"),
        )
    )


@register(
    "dedup_star_vs_pairwise_audit",
    oracle=f"""
    WITH corpus AS MATERIALIZED (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)),
                             ' '), '') AS text
      FROM documents WHERE doc_id % 7 = 0
    ),
    {band_signatures_sql("corpus", "c")},
    sig AS MATERIALIZED (SELECT * FROM csig),
    hubs AS (
      SELECT band, band_min, min(doc_id) AS hub_id
      FROM sig GROUP BY band, band_min
    ),
    star AS (
      SELECT DISTINCT h.hub_id, s.doc_id
      FROM sig s
      JOIN hubs h ON s.band = h.band AND s.band_min = h.band_min
      WHERE s.doc_id <> h.hub_id
    ),
    star_keep AS (
      SELECT st.doc_id, min(st.hub_id) AS keeper_id
      FROM star st
      JOIN corpus m ON m.doc_id = st.doc_id
      JOIN corpus h ON h.doc_id = st.hub_id
      WHERE abs(len(m.text) - len(h.text)) <= 25
        AND levenshtein(m.text, h.text) <= 25
      GROUP BY st.doc_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.band_min = b.band_min
       AND a.doc_id < b.doc_id
    ),
    pair_edges AS MATERIALIZED (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN corpus a ON a.doc_id = c.id_a
      JOIN corpus b ON b.doc_id = c.id_b
      WHERE abs(len(a.text) - len(b.text)) <= 25
        AND levenshtein(a.text, b.text) <= 25
    ),
    pair_keep AS (
      SELECT id_b AS doc_id, min(id_a) AS keeper_id
      FROM pair_edges GROUP BY id_b
    ),
    elected AS (
      SELECT c.doc_id,
             coalesce(s.keeper_id, c.doc_id) AS star_keeper,
             coalesce(p.keeper_id, c.doc_id) AS pair_keeper
      FROM corpus c
      LEFT JOIN star_keep s ON s.doc_id = c.doc_id
      LEFT JOIN pair_keep p ON p.doc_id = c.doc_id
    )
    SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN star_keeper < doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_star_dups,
           CAST(sum(CASE WHEN pair_keeper < doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pair_dups,
           CAST(sum(CASE WHEN star_keeper = pair_keeper THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           CAST(sum(CASE WHEN star_keeper = pair_keeper THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS agree_rate
    FROM elected
    """,
)
def dedup_star_vs_pairwise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHAT DOES THE STAR SHORTCUT COST? — the audit that closes the
    loop on [[dedup_fuzzy_star_rescore]] the way the recall-audit
    family does for every other approximation in the registry: both
    cascades run on the SAME banded signatures, each elects a
    keep-min keeper per doc (star: min edit-confirmed hub; pairwise:
    min edit-confirmed smaller partner — the one-hop keep-min rule on
    each edge set), and the single output row reports duplicate
    counts per strategy plus the per-doc keeper agreement rate. The
    two disagree only when a cluster member confirms against some
    smaller partner but NOT against its buckets' hubs (metric
    non-transitivity at the edit-distance gate) — rare on truncation
    near-dups, and this query is the standing measurement of exactly
    how rare. At 100 TB the pairwise side is the one that blows up
    (O(occ²) DP rescores), so run this audit on a hash-bucketed
    sample to justify the O(occ) star plan, then deploy the star
    form — the same sample-then-trust protocol as
    `dedup_lsh_recall_audit`."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near).localCheckpoint()
    sig = band_signatures(corpus).localCheckpoint()
    tm = corpus.select("doc_id", F.col("text").alias("t_m"))
    th = corpus.select(
        F.col("doc_id").alias("hub_id"), F.col("text").alias("t_h")
    )
    hubs = sig.groupBy("band", "band_min").agg(F.min("doc_id").alias("hub_id"))
    star = (
        sig.join(hubs, ["band", "band_min"])
        .filter(F.col("doc_id") != F.col("hub_id"))
        .select("hub_id", "doc_id")
        .distinct()
    )
    star_keep = (
        star.join(tm, "doc_id")
        .join(th, "hub_id")
        .filter(F.abs(F.length("t_m") - F.length("t_h")) <= 25)
        .filter(F.levenshtein(F.col("t_m"), F.col("t_h"), threshold=25) >= 0)
        .groupBy("doc_id")
        .agg(F.min("hub_id").alias("star_min"))
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_min") == F.col("b.band_min"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    ta = corpus.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    tb = corpus.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    pair_keep = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(F.abs(F.length("ta") - F.length("tb")) <= 25)
        .filter(F.levenshtein(F.col("ta"), F.col("tb"), threshold=25) >= 0)
        .groupBy(F.col("id_b").alias("doc_id"))
        .agg(F.min("id_a").alias("pair_min"))
    )
    elected = (
        corpus.select("doc_id")
        .join(star_keep, "doc_id", "left")
        .join(pair_keep, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("star_min", F.col("doc_id")).alias("star_keeper"),
            F.coalesce("pair_min", F.col("doc_id")).alias("pair_keeper"),
        )
    )
    return elected.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("star_keeper") < F.col("doc_id")).cast("long")).alias(
            "n_star_dups"
        ),
        F.sum((F.col("pair_keeper") < F.col("doc_id")).cast("long")).alias(
            "n_pair_dups"
        ),
        F.sum((F.col("star_keeper") == F.col("pair_keeper")).cast("long")).alias(
            "n_agree"
        ),
        (
            F.sum(
                (F.col("star_keeper") == F.col("pair_keeper")).cast("long")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("agree_rate"),
    )


_SEMDEDUP_K = 32  # coarse cells; k scales with n at corpus scale
_SEMDEDUP_CAP = 64  # per-cell survivor-candidate index cap (house C)
_SEMDEDUP_TAU = 0.95


def _semdedup_oracle() -> str:
    K, C = _SEMDEDUP_K, _SEMDEDUP_CAP
    return f"""
    WITH {_SQL_MILLI_EMB},
    m AS (SELECT * FROM m0),
    corpus AS MATERIALIZED (
      {emb_milli_corpus_sql((60,))}
    ),
    cents AS (SELECT vec_id AS cid, v AS cv FROM m WHERE vec_id < {K}),
    assign_pairs AS (
      SELECT c0.vec_id, c.cid, c0.v,
             CAST(list_sum(list_transform(range(1, 65),
                    i -> c0.v[i] * c.cv[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(c0.v, x -> x * x))
                          AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(c.cv, x -> x * x))
                            AS DOUBLE))) AS cent_cos
      FROM corpus c0, cents c
    ),
    ranked AS MATERIALIZED (
      SELECT vec_id, cell, v, cent_cos,
             row_number() OVER (PARTITION BY cell
                                ORDER BY cent_cos, vec_id) AS rn
      FROM (
        SELECT vec_id, cid AS cell, v, cent_cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cent_cos DESC, cid) AS arn
        FROM assign_pairs
      ) WHERE arn = 1
    ),
    drops AS (
      SELECT DISTINCT a.vec_id
      FROM ranked a JOIN ranked b
        ON a.cell = b.cell AND b.rn < a.rn AND b.rn <= {C}
      WHERE {SQL_COS_AB} >= {_SEMDEDUP_TAU}
    )
    SELECT r.cell,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(d.vec_id) AS BIGINT) AS n_dropped,
           CAST(count(*) FILTER (WHERE r.vec_id >= 1000000) AS BIGINT)
             AS n_injected,
           CAST(count(d.vec_id) FILTER (WHERE r.vec_id >= 1000000) AS BIGINT)
             AS n_injected_dropped
    FROM ranked r LEFT JOIN drops d ON r.vec_id = d.vec_id
    GROUP BY r.cell
    ORDER BY r.cell
    """


def _semdedup_stored_index(ranked: DataFrame) -> dict:
    """Driver-side {cell: (vec_ids, cent_cos, rns, M, norms)} numpy
    view of the top-`_SEMDEDUP_CAP` priority members per cell — the
    stored side of the SemDeDup comparison, bounded by K x C rows
    (<= 2048) BY CONSTRUCTION of the rn <= C filter; bound enforced
    via `_bounded_rows` (guide §5). Rows per cell sorted by rn
    ascending. ``ranked`` must be materialized (localCheckpoint) by
    the caller so this collect replays no lineage."""
    rows = _bounded_rows(
        ranked.filter(F.col("rn") <= _SEMDEDUP_CAP).select(
            "cell", "rn", "vec_id", "cent_cos", "v"
        ),
        _SEMDEDUP_K * _SEMDEDUP_CAP,
        "semdedup stored index",
    )
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(
            (r["rn"], r["vec_id"], r["cent_cos"], list(r["v"]))
        )
    idx = {}
    for cell, lst in by_cell.items():
        lst.sort()
        M = np.array([v for _, _, _, v in lst], dtype=np.int64)
        idx[cell] = (
            np.array([t[1] for t in lst], dtype=np.int64),
            np.array([t[2] for t in lst], dtype=np.float64),
            np.array([t[0] for t in lst], dtype=np.int64),
            M,
            np.sqrt((M * M).sum(axis=1).astype(np.float64)),
        )
    return idx


def _semdedup_drop_flags(ranked: DataFrame) -> DataFrame:
    """(vec_id, cell, dropped): per ranked member, whether some
    HIGHER-PRIORITY member of its own cell within the top-C index is
    `_SEMDEDUP_TAU`-close.

    r12 OPTIMIZED (guide §2.3, §4.2 — the r11 `_cosine_topk_pairs`
    pattern): the <= K x C-row stored index rides as a task-closure
    numpy constant and ONE Arrow map pass over the ranked frame
    scores each member against its own cell's prefix (srn < rn) by
    exact int64 matmul, replacing the per-cell capped self-join +
    ArrowEvalPython pair-dot + distinct + left-join chain (3
    Exchanges on the |corpus|-sized side). Arithmetic bit-identical:
    same int64 dots, same double division order, same >= comparison."""
    idx = _semdedup_stored_index(ranked)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vid = pdf["vec_id"].to_numpy()
            V = np.vstack(pdf["v"].to_numpy()).astype(np.int64)
            vn = np.sqrt((V * V).sum(axis=1).astype(np.float64))
            assert vn.all(), "zero-norm corpus vector (NaN cosine)"
            arn = pdf["rn"].to_numpy()
            dropped = np.zeros(len(pdf), dtype=bool)
            for cell, rows_i in pdf.groupby("cell", sort=False).indices.items():
                st = idx.get(cell)
                if st is None:
                    continue
                _, _, srn, M, sn = st
                cos = (V[rows_i] @ M.T).astype(np.float64) / (
                    vn[rows_i][:, None] * sn[None, :]
                )
                mask = srn[None, :] < arn[rows_i][:, None]
                dropped[rows_i] = ((cos >= _SEMDEDUP_TAU) & mask).any(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": vid,
                    "cell": pdf["cell"].to_numpy(),
                    "dropped": dropped,
                }
            )

    return ranked.select("vec_id", "cell", "rn", "v").mapInPandas(
        score, "vec_id long, cell bigint, dropped boolean"
    )


@register("dedup_semantic_ivf_cells", oracle=_semdedup_oracle())
def dedup_semantic_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup with IVF-CELL blocking (Abbas et
    al. 2023, arXiv:2303.09540): cluster the embedding corpus into k
    coarse cells, then look for near-duplicates (cosine >= 0.95) only
    WITHIN a cell — the blocking key is the cluster assignment, the
    alternative candidate generator to [[dedup_near_embedding]]'s
    banded LSH. Per the paper's keep rule, within a duplicate
    relationship the vector with the LOWEST centroid similarity
    survives (it carries the most non-redundant signal for training);
    here that is a deterministic priority rank per cell (cent_cos
    ascending, vec_id tiebreak), and a vector is dropped iff some
    higher-priority member of its own cell is 0.95-close — the greedy
    one-pass form of the paper's per-cluster pruning, identically
    mirrored in SQL.

    The comparison side is CAPPED at the top-64 priority members per
    cell (the `_flat_index` house pattern, planned as a per-cell
    WindowGroupLimit): each vector scores against <= 64 stored
    candidates, so total work is |corpus| x C — linear — instead of
    the within-cell occ^2 the raw paper form costs. SemDeDup's own
    scale contract (k proportional to n keeps occupancy bounded)
    stacks on top: at 100 TB, k ~ n/avg_occ cells, assignment is one
    broadcast-codebook pass, and no shuffle ever carries a payload
    bigger than (cell, rank) per vector. k=32 here enacts that
    contract at fixture scale (occupancy ~75 vs cap 64), so the
    measured recall limiter is the METHOD's true one — planted pairs
    whose two sides argmax into different cells (~35% at sf0.1), not
    the cap. Same injected corpus as `dedup_near_embedding` (every
    5th vector re-embedded truncated, cosine ~0.97), so the drop rule
    genuinely fires; the per-cell report makes planted-duplicate
    recovery auditable inline (220 of 319 recoverable planted pairs at
    sf0.1). The cell-split fix is now REGISTERED:
    [[dedup_semantic_ivf_nprobe2]] soft-assigns the probe side to the
    2 nearest cells (69% -> 80% of recoverable pairs), and
    [[dedup_semdedup_nprobe_audit]] prices the knob from one shared
    pair join."""
    K = _SEMDEDUP_K
    corpus = emb_milli_corpus(spark, sf_dir, keeps=(60,))
    cents = corpus.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    # r12 (guide §2.4, §4.2): assignment via the Arrow argmax kernel
    # (crossjoin + per-vec_id window GONE); the one remaining exchange
    # is the per-cell priority rank the method is defined over, and
    # the capped comparison runs as one more Arrow pass with the
    # <= K x C stored index in the task closure (_semdedup_drop_flags)
    # instead of the self-join + distinct + left-join chain.
    w_rank = Window.partitionBy("cell").orderBy("cent_cos", "vec_id")
    ranked = (
        _cent_assign_argmax(corpus, cents)
        .withColumn("rn", F.row_number().over(w_rank))
        .localCheckpoint()
    )
    injected = F.col("vec_id") >= 1000000
    return (
        _semdedup_drop_flags(ranked)
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count(F.when(F.col("dropped"), 1)).alias("n_dropped"),
            F.count(F.when(injected, 1)).alias("n_injected"),
            F.count(F.when(injected & F.col("dropped"), 1)).alias(
                "n_injected_dropped"
            ),
        )
        .orderBy("cell")
    )


def _semdedup_nprobe_prefix_sql() -> str:
    """Shared CTE text for the nprobe=2 SemDeDup pair: primary-cell
    index `ranked` (identical to the single-cell form) plus `probes`
    (each vector probing its 2 nearest cells, carrying its PRIMARY
    redundancy score) and `matches` (the one capped priority join,
    tagged with which probe — primary or secondary — found it)."""
    K, C = _SEMDEDUP_K, _SEMDEDUP_CAP
    return f"""
    WITH {_SQL_MILLI_EMB},
    m AS (SELECT * FROM m0),
    corpus AS MATERIALIZED (
      {emb_milli_corpus_sql((60,))}
    ),
    cents AS (SELECT vec_id AS cid, v AS cv FROM m WHERE vec_id < {K}),
    assign_pairs AS (
      SELECT c0.vec_id, c.cid, c0.v,
             CAST(list_sum(list_transform(range(1, 65),
                    i -> c0.v[i] * c.cv[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(c0.v, x -> x * x))
                          AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(c.cv, x -> x * x))
                            AS DOUBLE))) AS cent_cos
      FROM corpus c0, cents c
    ),
    aranked AS MATERIALIZED (
      SELECT vec_id, cid AS cell, v, cent_cos, arn FROM (
        SELECT vec_id, cid, v, cent_cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cent_cos DESC, cid) AS arn
        FROM assign_pairs
      ) WHERE arn <= 2
    ),
    ranked AS MATERIALIZED (
      SELECT vec_id, cell, v, cent_cos,
             row_number() OVER (PARTITION BY cell
                                ORDER BY cent_cos, vec_id) AS rn
      FROM aranked WHERE arn = 1
    ),
    probes AS (
      SELECT p.vec_id, p.cell AS probe_cell, p.arn, r1.v,
             r1.cent_cos AS my_cos
      FROM aranked p JOIN ranked r1 ON r1.vec_id = p.vec_id
    ),
    matches AS MATERIALIZED (
      SELECT a.vec_id, min(a.arn) AS min_arn
      FROM probes a JOIN ranked b
        ON b.cell = a.probe_cell AND b.rn <= {C}
       AND (b.cent_cos < a.my_cos
            OR (b.cent_cos = a.my_cos AND b.vec_id < a.vec_id))
      WHERE {SQL_COS_AB} >= {_SEMDEDUP_TAU}
      GROUP BY a.vec_id
    )"""


def _semdedup_nprobe2_oracle() -> str:
    return (
        _semdedup_nprobe_prefix_sql()
        + """
    SELECT r.cell,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(mt.vec_id) AS BIGINT) AS n_dropped,
           CAST(count(*) FILTER (WHERE r.vec_id >= 1000000) AS BIGINT)
             AS n_injected,
           CAST(count(mt.vec_id) FILTER (WHERE r.vec_id >= 1000000) AS BIGINT)
             AS n_injected_dropped
    FROM ranked r LEFT JOIN matches mt ON r.vec_id = mt.vec_id
    GROUP BY r.cell
    ORDER BY r.cell
    """
    )


def _semdedup_nprobe_audit_oracle() -> str:
    return (
        _semdedup_nprobe_prefix_sql()
        + f""",
    pairs AS (
      SELECT a.vec_id AS inj_id,
             least(coalesce(mi.min_arn, 9), coalesce(ms.min_arn, 9))
               AS pair_arn,
             CASE WHEN {SQL_COS_AB} >= {_SEMDEDUP_TAU}
                  THEN 1 ELSE 0 END AS above_tau
      FROM corpus a
      JOIN corpus b ON b.vec_id = a.vec_id - 1000000
      LEFT JOIN matches mi ON mi.vec_id = a.vec_id
      LEFT JOIN matches ms ON ms.vec_id = a.vec_id - 1000000
      WHERE a.vec_id >= 1000000
    )
    SELECT (SELECT count(*) FROM corpus) AS n_corpus,
           CAST(count(*) AS BIGINT) AS n_planted_pairs,
           CAST(sum(above_tau) AS BIGINT) AS n_pairs_above_tau,
           CAST(sum(CASE WHEN pair_arn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n1_pairs_recovered,
           CAST(sum(CASE WHEN pair_arn <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n2_pairs_recovered,
           CAST(sum(CASE WHEN pair_arn = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(above_tau) AS recall_nprobe1,
           CAST(sum(CASE WHEN pair_arn <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(above_tau) AS recall_nprobe2
    FROM pairs
    """
    )


def _semdedup_match_arn(ranked: DataFrame) -> DataFrame:
    """(vec_id, cell, min_arn): every ranked member scored against the
    top-C stored index of BOTH its probed cells in one Arrow pass —
    min_arn = 1 if the primary cell holds a dominating TAU-close
    member, 2 if only the secondary does, NULL otherwise. Dominance
    ((b_cos, b_vec_id) < (my_cos, vec_id) lexicographically) matches
    the global keep-priority the pair join used; arithmetic is the
    same exact int64 dot + double division. r12: replaces the probes
    join + capped priority join + ArrowEvalPython pair-dot + groupBy
    chain (guide §2.3, §4.2 — the `_semdedup_drop_flags` pattern with
    a 2-cell probe fan-out folded into the same pass)."""
    idx = _semdedup_stored_index(ranked)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vid = pdf["vec_id"].to_numpy()
            mycos = pdf["cent_cos"].to_numpy()
            V = np.vstack(pdf["v"].to_numpy()).astype(np.int64)
            vn = np.sqrt((V * V).sum(axis=1).astype(np.float64))
            assert vn.all(), "zero-norm corpus vector (NaN cosine)"
            hits = {
                "cell": np.zeros(len(pdf), dtype=bool),
                "cell2": np.zeros(len(pdf), dtype=bool),
            }
            for col, hit in hits.items():
                groups = pdf.groupby(col, sort=False).indices
                for cell, rows_i in groups.items():
                    st = idx.get(cell)
                    if st is None:
                        continue
                    svid, scos, _, M, sn = st
                    cos = (V[rows_i] @ M.T).astype(np.float64) / (
                        vn[rows_i][:, None] * sn[None, :]
                    )
                    my = mycos[rows_i][:, None]
                    dom = (scos[None, :] < my) | (
                        (scos[None, :] == my)
                        & (svid[None, :] < vid[rows_i][:, None])
                    )
                    hit[rows_i] = ((cos >= _SEMDEDUP_TAU) & dom).any(axis=1)
            h1, h2 = hits["cell"], hits["cell2"]
            arn = pd.arrays.IntegerArray(
                np.where(h1, 1, 2).astype("int32"), mask=~(h1 | h2)
            )
            yield pd.DataFrame(
                {
                    "vec_id": vid,
                    "cell": pdf["cell"].to_numpy(),
                    "min_arn": arn,
                }
            )

    return ranked.select(
        "vec_id", "cell", "cell2", "cent_cos", "v"
    ).mapInPandas(score, "vec_id long, cell bigint, min_arn int")


def _semdedup_nprobe_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per primary-cell index member (vec_id, cell, min_arn)
    shared by the nprobe=2 pair: min_arn = 1 if the primary probe
    already found a dominating 0.95-neighbor, 2 if only the secondary
    did, NULL if neither. One scoring pass prices both policies — the
    [[dedup_semdedup_cap_audit]] device. r12: the assignment crossjoin
    is replaced by the Arrow kernel (`_cent_assign_rows` topn=2 — the
    per-vec_id window now pools 2 kernel rows per physical row
    instead of K=32 crossjoin rows, and the pivot to one wide row per
    vec_id reuses the window's partitioning, no extra exchange), and
    the probes/pair joins by `_semdedup_match_arn`'s task-closure
    index pass; the per-cell priority rank keeps its one exchange."""
    K = _SEMDEDUP_K
    corpus = emb_milli_corpus(spark, sf_dir, keeps=(60,))
    cents = corpus.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    # pooled top-2 across a duplicated vec_id's physical rows == the
    # old window over the |rows| x K pair set: the global #1/#2 are
    # each some row's per-row #1 or #2, all present in the kernel's
    # per-row top-2 union (tests/test_edge_embeddings.py pins this)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("cent_cos").desc(), F.col("cell")
    )
    one = F.col("arn") == 1
    wide = (
        _cent_assign_rows(corpus, cents, topn=2)
        .withColumn("arn", F.row_number().over(w_assign))
        .filter(F.col("arn") <= 2)
        .groupBy("vec_id")
        .agg(
            F.first(F.when(one, F.col("cell")), ignorenulls=True).alias(
                "cell"
            ),
            F.first(
                F.when(one, F.col("cent_cos")), ignorenulls=True
            ).alias("cent_cos"),
            F.first(F.when(one, F.col("v")), ignorenulls=True).alias("v"),
            F.first(
                F.when(F.col("arn") == 2, F.col("cell")), ignorenulls=True
            ).alias("cell2"),
        )
    )
    w_rank = Window.partitionBy("cell").orderBy("cent_cos", "vec_id")
    ranked = wide.withColumn(
        "rn", F.row_number().over(w_rank)
    ).localCheckpoint()
    return _semdedup_match_arn(ranked)


@register("dedup_semantic_ivf_nprobe2", oracle=_semdedup_nprobe2_oracle())
def dedup_semantic_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[[dedup_semantic_ivf_cells]] with SOFT ASSIGNMENT (nprobe=2) —
    the registered fix for the method's measured recall limiter (r7,
    VERDICT r6 task 4). Single-cell SemDeDup loses planted pairs whose
    two sides argmax into DIFFERENT cells (~35% at sf0.1, priced by
    the single-cell query's report); here each vector PROBES its 2
    nearest cells while the stored index and the survivor rule stay on
    the argmax cell alone (the paper's keep-lowest-centroid-similarity
    rule, now as a global (cent_cos, vec_id) priority — which reduces
    to exactly the single-cell rank order for same-cell pairs, so
    nprobe=2 drops are a strict superset of nprobe=1 drops).

    Cost stays |corpus| x C-bounded: 2 probe rows per vector, each
    meeting <= C indexed candidates — the same WindowGroupLimit cap,
    doubled, nothing quadratic. At 100 TB this is the standard
    IVF-serving recall knob (FAISS nprobe), applied to the dedup
    gate: same broadcast codebook, same per-cell cap, 2x the probe
    fan-out, no new shuffle. Output is the same per-(primary-)cell
    report as the single-cell form for row-by-row comparability;
    [[dedup_semdedup_nprobe_audit]] prices the recall lift from one
    shared pair join."""
    scored = _semdedup_nprobe_matches(spark, sf_dir)
    injected = F.col("vec_id") >= 1000000
    return (
        scored.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count("min_arn").alias("n_dropped"),
            F.count(F.when(injected, 1)).alias("n_injected"),
            F.count(
                F.when(injected & F.col("min_arn").isNotNull(), 1)
            ).alias("n_injected_dropped"),
        )
        .orderBy("cell")
    )


@register(
    "dedup_semdedup_nprobe_audit", oracle=_semdedup_nprobe_audit_oracle()
)
def dedup_semdedup_nprobe_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRICE TAG on [[dedup_semantic_ivf_nprobe2]]'s recall knob:
    planted-duplicate recovery under nprobe=1 vs nprobe=2, decided
    from ONE shared capped pair join (each match row is tagged with
    the min probe rank that found it, so the two policies are counted
    without re-scoring anything — the [[dedup_semdedup_cap_audit]]
    device applied to the probe axis). Recall is PAIR-level: a planted
    pair (src, src+1e6, cosine ~0.97) is recovered iff EITHER member
    is dropped — the pair collapses to one survivor, which is the
    dedup outcome that matters; counting only dropped injected rows
    would understate both policies whenever the survivor rule happens
    to drop the source side.

    The audit also computes the method-independent CEILING inline:
    n_pairs_above_tau = planted pairs whose true cosine clears the
    0.95 gate at all (319/400 at sf0.1 — the remaining 81 are a
    THRESHOLD decision, unreachable by any probing policy), and the
    recall columns are measured against that ceiling. Measured at
    sf0.1: nprobe=1 recovers 220/319 = 69.0% of recoverable pairs,
    nprobe=2 recovers 256/319 = 80.3% — the cell-split loss drops
    from 99 pairs to 63 for 2x probe fan-out (sf0.01: 75% -> 90%)."""
    matches = (
        _semdedup_nprobe_matches(spark, sf_dir)
        .filter(F.col("min_arn").isNotNull())
        .select("vec_id", "min_arn")
        .localCheckpoint()
    )
    corpus = emb_milli_corpus(spark, sf_dir, keeps=(60,))
    mi = matches.select(
        F.col("vec_id").alias("inj_id"), F.col("min_arn").alias("arn_i")
    )
    ms = matches.select(
        F.col("vec_id").alias("src_id"), F.col("min_arn").alias("arn_s")
    )
    inj = corpus.filter(F.col("vec_id") >= 1000000).select(
        F.col("vec_id").alias("inj_id"),
        (F.col("vec_id") - 1000000).alias("src_id"),
        F.col("v").alias("vi"),
        sq_norm(F.col("v")).alias("ni"),
    )
    src = corpus.select(
        F.col("vec_id").alias("src_id"),
        F.col("v").alias("vs"),
        sq_norm(F.col("v")).alias("ns"),
    )
    pair_cos = pair_dot_udf()(F.col("vi"), F.col("vs")).cast("double") / (
        F.sqrt(F.col("ni").cast("double")) * F.sqrt(F.col("ns").cast("double"))
    )
    pairs = (
        inj.join(src, "src_id")
        .join(mi, "inj_id", "left")
        .join(ms, "src_id", "left")
        .select(
            F.least(
                F.coalesce("arn_i", F.lit(9)), F.coalesce("arn_s", F.lit(9))
            ).alias("pair_arn"),
            (pair_cos >= _SEMDEDUP_TAU).cast("long").alias("above_tau"),
        )
    )
    return (
        corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
        .crossJoin(
            F.broadcast(
                pairs.agg(
                    F.count(F.lit(1)).alias("n_planted_pairs"),
                    F.sum("above_tau").alias("n_pairs_above_tau"),
                    F.sum(
                        (F.col("pair_arn") == 1).cast("long")
                    ).alias("n1_pairs_recovered"),
                    F.sum(
                        (F.col("pair_arn") <= 2).cast("long")
                    ).alias("n2_pairs_recovered"),
                )
            )
        )
        .select(
            "n_corpus",
            "n_planted_pairs",
            "n_pairs_above_tau",
            "n1_pairs_recovered",
            "n2_pairs_recovered",
            (
                F.col("n1_pairs_recovered").cast("double")
                / F.col("n_pairs_above_tau")
            ).alias("recall_nprobe1"),
            (
                F.col("n2_pairs_recovered").cast("double")
                / F.col("n_pairs_above_tau")
            ).alias("recall_nprobe2"),
        )
    )


_SUBSTR_K = 20  # exact-substring gram width (tokens)


def _substring_coverage_oracle() -> str:
    K = _SUBSTR_K
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             greatest(len(string_split(text, ' ')) - 2, 0)),
                             ' '), '') AS text
      FROM documents WHERE doc_id % 5 = 0
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sizes AS (SELECT doc_id, len(t) AS n_tokens FROM toks),
    grams AS MATERIALIZED (
      SELECT doc_id, s.i,
             md5(array_to_string(list_slice(t, s.i, s.i + {K - 1}), ' ')) AS g
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, len(t) - {K - 1}))
                    AS i) s
    ),
    dup_pos AS MATERIALIZED (
      SELECT doc_id, i FROM (
        SELECT doc_id, i, count(*) OVER (PARTITION BY g) AS occ FROM grams
      ) WHERE occ >= 2
    ),
    swept AS (
      SELECT doc_id, i, i + {K - 1} AS e,
             CASE WHEN max(i + {K - 1}) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= i
                  THEN 0 ELSE 1 END AS brk
      FROM dup_pos
    ),
    islands AS (
      SELECT doc_id, i, e,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM swept
    ),
    isl_span AS (
      SELECT doc_id, isl, count(*) AS n_pos, max(e) - min(i) + 1 AS ilen
      FROM islands GROUP BY doc_id, isl
    ),
    cov AS (
      SELECT doc_id, CAST(sum(n_pos) AS BIGINT) AS n_dup_grams,
             CAST(sum(ilen) AS BIGINT) AS covered_tokens
      FROM isl_span GROUP BY doc_id
    )
    SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens,
           COALESCE(c.n_dup_grams, 0) AS n_dup_grams,
           COALESCE(c.covered_tokens, 0) AS covered_tokens,
           CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE) / s.n_tokens
             AS coverage
    FROM sizes s LEFT JOIN cov c ON s.doc_id = c.doc_id
    ORDER BY s.doc_id
    """


@register("dedup_substring_coverage", oracle=_substring_coverage_oracle())
def dedup_substring_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication coverage per document — the
    distributed form of Lee et al. 2022's "Deduplicating Training
    Data Makes Language Models Better" (arXiv:2107.06499) exact
    substring criterion: a token position is DUPLICATED if some
    K-token window containing its start occurs verbatim anywhere else
    in the corpus (K=20 here; the paper's 50-token threshold over a
    suffix array, re-expressed as overlapping K-gram fingerprints —
    the approximation every distributed pipeline ships, since a
    corpus-wide suffix array doesn't shard).

    Plan shape is the whole point: there is NO pair join anywhere.
    Gram md5s are minted map-side; "occurs elsewhere" is one
    count-over-window on the gram digest partition (the
    `dedup_near_jaccard` posting-list device); per-doc coverage is
    the `win_interval_merge` sweep (running-max break flag + running
    island sum) over each doc's duplicated windows, so overlapping
    grams aren't double-counted — covered_tokens is the exact union
    length of [i, i+K-1] intervals. Every stage is linear in corpus
    tokens and shuffles only (digest) or (doc_id, position) pairs,
    never text: the 100 TB contract. Same injected corpus as the
    fuzzy family (every 5th doc re-appears truncated by 2 tokens), so
    originals and their twins show ~full coverage while the untouched
    corpus floors at 0; short docs (< K tokens) have no windows and
    report coverage 0 by construction."""
    K = _SUBSTR_K
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    t0 = F.split(F.col("text"), " ")
    trunc = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(
            F.slice(t0, 1, F.greatest(F.size(t0) - 2, F.lit(0))), " "
        ).alias("text"),
    )
    corpus = docs.unionByName(trunc)
    toks = corpus.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    sizes = toks.select(
        "doc_id", F.size("t").cast("long").alias("n_tokens")
    )
    starts = F.when(
        F.size("t") >= K, F.sequence(F.lit(1), F.size("t") - (K - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode(starts).alias("i"),
        F.col("t"),
    ).select(
        "doc_id",
        "i",
        F.md5(F.array_join(F.slice(F.col("t"), F.col("i"), K), " ")).alias("g"),
    )
    dup_pos = (
        grams.withColumn("occ", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .filter(F.col("occ") >= 2)
        .select("doc_id", "i")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    prev_max_e = F.max(F.col("i") + (K - 1)).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = dup_pos.select(
        "doc_id",
        "i",
        (F.col("i") + (K - 1)).alias("e"),
        F.when(prev_max_e >= F.col("i"), 0).otherwise(1).alias("brk"),
    )
    islands = swept.withColumn(
        "isl",
        F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    isl_span = islands.groupBy("doc_id", "isl").agg(
        F.count(F.lit(1)).alias("n_pos"),
        (F.max("e") - F.min("i") + 1).alias("ilen"),
    )
    cov = isl_span.groupBy("doc_id").agg(
        F.sum("n_pos").cast("long").alias("n_dup_grams"),
        F.sum("ilen").cast("long").alias("covered_tokens"),
    )
    zero = F.lit(0).cast("long")
    return (
        sizes.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_grams", zero).alias("n_dup_grams"),
            F.coalesce("covered_tokens", zero).alias("covered_tokens"),
            (
                F.coalesce("covered_tokens", zero).cast("double")
                / F.col("n_tokens")
            ).alias("coverage"),
        )
        .orderBy("doc_id")
    )


_BLOOM_M = 65536  # bitset width (16-bit addressable)
_BLOOM_K = 3  # hash functions per fingerprint


def _bloom_prefilter_oracle() -> str:
    M, K = _BLOOM_M, _BLOOM_K
    return f"""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
               AS fingerprint
      FROM documents
    ),
    corp AS MATERIALIZED (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 >= 3
    ),
    batch AS MATERIALIZED (
      SELECT doc_id, fingerprint FROM fp WHERE doc_id % 10 < 3
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, fingerprint
      FROM fp WHERE doc_id % 10 >= 3 AND doc_id % 9 = 0
    ),
    bits AS MATERIALIZED (
      SELECT DISTINCT CAST(concat('0x',
               substr(md5(CAST(s.j AS VARCHAR) || '|' || fingerprint), 1, 4))
               AS BIGINT) % {M} AS bloom_bit
      FROM corp, LATERAL (SELECT unnest(generate_series(0, {K - 1})) AS j) s
    ),
    probe AS (
      SELECT b.doc_id, b.fingerprint,
             count(*) FILTER (WHERE bits.bloom_bit IS NULL) AS misses
      FROM (SELECT doc_id, fingerprint,
                   CAST(concat('0x', substr(md5(CAST(s.j AS VARCHAR) || '|'
                        || fingerprint), 1, 4)) AS BIGINT) % {M} AS pb
            FROM batch,
                 LATERAL (SELECT unnest(generate_series(0, {K - 1})) AS j) s
           ) b
      LEFT JOIN bits ON b.pb = bits.bloom_bit
      GROUP BY b.doc_id, b.fingerprint
    ),
    judged AS (
      SELECT p.doc_id, p.misses = 0 AS flagged,
             EXISTS (SELECT 1 FROM corp c
                     WHERE c.fingerprint = p.fingerprint) AS is_dup
      FROM probe p
    )
    SELECT CAST(count(*) AS BIGINT) AS n_batch,
           CAST(count(*) FILTER (WHERE flagged) AS BIGINT) AS n_flagged,
           CAST(count(*) FILTER (WHERE is_dup) AS BIGINT) AS n_true_dups,
           CAST(count(*) FILTER (WHERE flagged AND NOT is_dup) AS BIGINT)
             AS n_false_pos,
           CAST(count(*) FILTER (WHERE is_dup AND NOT flagged) AS BIGINT)
             AS n_missed,
           CAST(count(*) FILTER (WHERE flagged AND NOT is_dup) AS DOUBLE)
             / (count(*) - count(*) FILTER (WHERE is_dup)) AS fp_rate,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
           CAST((SELECT count(*) FROM bits) AS DOUBLE) / {M} AS fill_ratio
    FROM judged
    """


@register("dedup_bloom_prefilter_audit", oracle=_bloom_prefilter_oracle())
def dedup_bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-fronted incremental dedup, with the filter's whole
    contract measured in one row: `pipeline_incremental_dedup`'s
    docstring notes its digest anti-join "is exactly what a
    Bloom-filter-fronted incremental dedup degrades to on filter
    miss" — this query BUILDS that front. The existing corpus's
    normalized fingerprints set k=3 md5-derived bits in an m=2^16
    bitset; a nightly batch (fresh docs + a recrawled slice under new
    ids, so true duplicates exist) probes it, and a batch doc passes
    the prefilter only when ALL its bits are set. The report carries
    the two numbers that justify the filter at 100 TB — n_missed
    (MUST be 0: a Bloom filter has no false negatives, asserted
    cross-engine rather than assumed) and fp_rate (the fraction of
    genuinely-new docs that still pay the exact anti-join, ~fill³) —
    plus bits_set/fill_ratio, the capacity gauges that say when to
    widen m.

    Scale shape: the build is one DISTINCT over m-bounded ints — a
    fixed-size broadcastable bitset (at 100 TB you'd mint it with
    `bloom_filter_agg`/DataSketches into literal bits; the (bit) row
    form here keeps the arithmetic exactly mirrorable in SQL), and
    the probe joins batch-minted bits against that broadcast — the
    corpus itself is never shuffled per batch, which is the entire
    point of fronting [[pipeline_incremental_dedup]]'s anti-join.
    Spark's own runtime form of this idea is exercised by
    [[join_bloom_runtime_filter]]; this operator is the explicit,
    persistable variant a nightly pipeline owns. Probability check:
    intra-doc bit collisions are handled (a doc is flagged iff no
    drawn bit is missing, not iff 3 bits matched)."""
    M, K = _BLOOM_M, _BLOOM_K
    fp = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("fingerprint"),
    )
    corp = (
        fp.filter(F.col("doc_id") % 10 >= 3).select("fingerprint").distinct()
    )
    batch = (
        fp.filter(F.col("doc_id") % 10 < 3)
        .unionByName(
            fp.filter(
                (F.col("doc_id") % 10 >= 3) & (F.col("doc_id") % 9 == 0)
            ).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "fingerprint"
            )
        )
    )

    def bloom_bit(j_col, fp_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(j_col.cast("string"), F.lit("|"), fp_col)),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long")
            % M
        )

    j = F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("j")
    bits = (
        corp.select("fingerprint", j)
        .select(bloom_bit(F.col("j"), F.col("fingerprint")).alias("bloom_bit"))
        .distinct()
    )
    probe = (
        batch.select("doc_id", "fingerprint", j)
        .select(
            "doc_id",
            "fingerprint",
            bloom_bit(F.col("j"), F.col("fingerprint")).alias("pb"),
        )
        .join(F.broadcast(bits), F.col("pb") == F.col("bloom_bit"), "left")
        .groupBy("doc_id", "fingerprint")
        .agg(
            F.count(F.when(F.col("bloom_bit").isNull(), 1)).alias("misses")
        )
    )
    judged = probe.join(
        corp.withColumn("in_corpus", F.lit(1)), "fingerprint", "left"
    ).select(
        (F.col("misses") == 0).alias("flagged"),
        F.col("in_corpus").isNotNull().alias("is_dup"),
    )
    n_bits = bits.agg(
        F.count(F.lit(1)).alias("bits_set"),
        (F.count(F.lit(1)).cast("double") / M).alias("fill_ratio"),
    )
    return (
        judged.agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.count(F.when(F.col("flagged"), 1)).alias("n_flagged"),
            F.count(F.when(F.col("is_dup"), 1)).alias("n_true_dups"),
            F.count(F.when(F.col("flagged") & ~F.col("is_dup"), 1)).alias(
                "n_false_pos"
            ),
            F.count(F.when(F.col("is_dup") & ~F.col("flagged"), 1)).alias(
                "n_missed"
            ),
            (
                F.count(F.when(F.col("flagged") & ~F.col("is_dup"), 1)).cast(
                    "double"
                )
                / (
                    F.count(F.lit(1))
                    - F.count(F.when(F.col("is_dup"), 1))
                )
            ).alias("fp_rate"),
        )
        .crossJoin(F.broadcast(n_bits))
    )


def _semdedup_cap_audit_oracle() -> str:
    K, C = _SEMDEDUP_K, _SEMDEDUP_CAP
    return f"""
    WITH {_SQL_MILLI_EMB},
    m AS (SELECT * FROM m0),
    corpus AS MATERIALIZED (
      {emb_milli_corpus_sql((60,))}
    ),
    cents AS (SELECT vec_id AS cid, v AS cv FROM m WHERE vec_id < {K}),
    assign_pairs AS (
      SELECT c0.vec_id, c.cid, c0.v,
             CAST(list_sum(list_transform(range(1, 65),
                    i -> c0.v[i] * c.cv[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(c0.v, x -> x * x))
                          AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(c.cv, x -> x * x))
                            AS DOUBLE))) AS cent_cos
      FROM corpus c0, cents c
    ),
    ranked AS MATERIALIZED (
      SELECT vec_id, cell, v, cent_cos,
             row_number() OVER (PARTITION BY cell
                                ORDER BY cent_cos, vec_id) AS rn
      FROM (
        SELECT vec_id, cid AS cell, v, cent_cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cent_cos DESC, cid) AS arn
        FROM assign_pairs
      ) WHERE arn = 1
    ),
    close_pairs AS MATERIALIZED (
      SELECT a.vec_id, b.rn AS b_rn
      FROM ranked a JOIN ranked b
        ON a.cell = b.cell AND b.rn < a.rn
      WHERE {SQL_COS_AB} >= {_SEMDEDUP_TAU}
    ),
    drops_u AS (SELECT DISTINCT vec_id FROM close_pairs),
    drops_c AS (SELECT DISTINCT vec_id FROM close_pairs WHERE b_rn <= {C})
    SELECT CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(c.vec_id) AS BIGINT) AS n_dropped_capped,
           CAST(count(u.vec_id) AS BIGINT) AS n_dropped_uncapped,
           CAST(count(*) FILTER (WHERE (c.vec_id IS NULL)
                                     = (u.vec_id IS NULL)) AS BIGINT)
             AS n_agree,
           CAST(count(*) FILTER (WHERE (c.vec_id IS NULL)
                                     = (u.vec_id IS NULL)) AS DOUBLE)
             / count(*) AS agree_rate
    FROM ranked r
    LEFT JOIN drops_c c ON r.vec_id = c.vec_id
    LEFT JOIN drops_u u ON r.vec_id = u.vec_id
    """


@register("dedup_semdedup_cap_audit", oracle=_semdedup_cap_audit_oracle())
def dedup_semdedup_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What [[dedup_semantic_ivf_cells]]'s top-C comparison cap costs —
    the house recall-audit move applied to the round's one remaining
    un-audited approximation: the same assignment + priority ranking,
    with the drop decision computed BOTH ways (capped: a higher-
    priority 0.95-neighbor within the cell's top-64 index; uncapped:
    any higher-priority 0.95-neighbor in the cell) and per-vector
    agreement reported in one row. The uncapped side is the occ²
    ground truth and exists ONLY in this audit — at 100 TB it runs on
    a sampled cell subset, never the corpus, exactly like the
    `*_exact` audit twins of the LSH family; the capped side is the
    registered operator's rule verbatim. One within-cell pair join
    feeds both rules (the cap is a predicate on the stored side's
    rank, so the audit costs one join, not two)."""
    K, C = _SEMDEDUP_K, _SEMDEDUP_CAP
    corpus = emb_milli_corpus(spark, sf_dir, keeps=(60,))
    cents = corpus.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    # r12: assignment via the Arrow argmax kernel (shared with the
    # registered operator); the UNCAPPED pair join below deliberately
    # stays a real within-cell join — its stored side is the whole
    # cell (occ², the audit's ground truth), not a bounded index, so
    # the task-closure kernel does not apply.
    w_rank = Window.partitionBy("cell").orderBy("cent_cos", "vec_id")
    ranked = (
        _cent_assign_argmax(corpus, cents)
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("nrm", sq_norm(F.col("v")))
        .localCheckpoint()
    )
    a = ranked.select(
        "vec_id", "cell", "rn",
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = ranked.select(
        F.col("cell").alias("b_cell"), F.col("rn").alias("b_rn"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    pair_cos = pair_dot_udf()(F.col("va"), F.col("vb")).cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    close = (
        a.join(b, (F.col("cell") == F.col("b_cell")) & (F.col("b_rn") < F.col("rn")))
        .filter(pair_cos >= _SEMDEDUP_TAU)
        .select("vec_id", "b_rn")
        .localCheckpoint()
    )
    drops_u = close.select("vec_id").distinct().withColumn("du", F.lit(1))
    drops_c = (
        close.filter(F.col("b_rn") <= C)
        .select("vec_id")
        .distinct()
        .withColumn("dc", F.lit(1))
    )
    agree = F.col("dc").isNull() == F.col("du").isNull()
    return (
        ranked.select("vec_id")
        .join(drops_c, "vec_id", "left")
        .join(drops_u, "vec_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count("dc").alias("n_dropped_capped"),
            F.count("du").alias("n_dropped_uncapped"),
            F.count(F.when(agree, 1)).alias("n_agree"),
            (
                F.count(F.when(agree, 1)).cast("double") / F.count(F.lit(1))
            ).alias("agree_rate"),
        )
    )
