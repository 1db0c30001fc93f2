"""Frontier extensions, part 2 — LSH quality auditing, leave-one-out
target encoding, gain/lift deciles, k-core graph peeling, SQL surface
parity (LATERAL VIEW, PIVOT clause), binary magic-byte sniffing, and
boilerplate n-gram detection (SURVEY.md §2 B11 continuation).

All EXT relative to the reference (three files, one aggregation —
`IRSSpark.py:181`). House determinism conventions apply: exact BIGINT
accumulation, one IEEE division at the end, md5 where a cross-engine
hash is needed, full-column tiebreaks on every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import (
    global_order,
    ntile_from_rn,
)
from apache_spark_irs_form_990_spark.functions.text import shingles
from apache_spark_irs_form_990_spark.operators.multimodal import media_table
from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.queries.graph_ext import copurchase_edges
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load, register_views


@register(
    "dedup_lsh_recall_audit",
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
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingled GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM shingled a
      JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = inter.id_a
      JOIN sizes sb ON sb.doc_id = inter.id_b
      WHERE 3 * n_inter >= sa.n_sh + sb.n_sh
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
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a
      JOIN sig b ON a.band = b.band AND a.band_min = b.band_min
                AND a.doc_id < b.doc_id
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
def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall audit of the MinHash-LSH candidate generator
    against exact-Jaccard ground truth (threshold 0.5, integer
    cross-multiplied: 3·|A∩B| ≥ |A|+|B|). Same corpus, shingles and
    md5-banded signatures as `dedup_minhash_banding_md5`, so this
    measures THAT operator's recall. The exact all-pairs side is
    intentionally quadratic in shared-shingle co-occurrence — at
    100 TB you run this audit on a hash-bucketed SAMPLE of the corpus
    (`sample_hash_deterministic` composes in front) to pick band/row
    parameters, then trust LSH for the full pass; the audit query
    itself is how those parameters get justified. Single-row output,
    counts exact, ratios one IEEE division each."""
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
    ).localCheckpoint()
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = shingled.alias("a"), shingled.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("sb"))
    truth = (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(3 * F.col("n_inter") >= F.col("sa") + F.col("sb"))
        .select("id_a", "id_b")
    )
    md5h = F.md5(F.col("shingle"))
    sigw = shingled.groupBy("doc_id").agg(
        *[
            F.min(F.substring(md5h, 1 + 8 * b, 8)).alias(f"m{b}")
            for b in range(4)
        ]
    )
    sig = sigw.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"m{b}") for b in range(4)])).alias(
            "band", "band_min"
        ),
    )
    sga, sgb = sig.alias("sa"), sig.alias("sb")
    cand = (
        sga.join(
            sgb,
            (F.col("sa.band") == F.col("sb.band"))
            & (F.col("sa.band_min") == F.col("sb.band_min"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .select(
            F.col("sa.doc_id").alias("id_a"), F.col("sb.doc_id").alias("id_b")
        )
        .distinct()
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
            (
                F.col("n_hits").cast("double") / F.col("n_candidates")
            ).alias("precision"),
            (F.col("n_hits").cast("double") / F.col("n_truth")).alias("recall"),
        )
    )


@register(
    "ml_target_encode_loo",
    oracle=f"""
    WITH enc AS (
      SELECT o_orderkey, o_orderpriority,
             sum({sql_cents('o_totalprice')})
               OVER (PARTITION BY o_orderpriority) AS s,
             count(*) OVER (PARTITION BY o_orderpriority) AS n,
             {sql_cents('o_totalprice')} AS xc
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(s - xc AS DOUBLE) / (n - 1) / 100.0 AS loo_price
    FROM enc WHERE o_orderkey % 97 = 0
    """,
)
def ml_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of `o_orderpriority` by mean order
    value — the standard high-cardinality categorical encoder for
    gradient-boosted models, LOO so a row never sees its own target
    (leakage guard). One unordered window per category computes Σ and
    n; each row's encoding is (Σ−x)/(n−1) in exact integer cents with
    ONE final IEEE division — bit-identical cross-engine, no
    tolerance. The window shuffles by category key only; at 100 TB
    this is a single exchange on the encoded column, and rare
    categories (n=1) would be smoothed against the global prior
    before use. Output is a deterministic 1/97 key-sample of the
    encoded rows (the full encoding is data-sized)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority")
    enc = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.sum(cents("o_totalprice")).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
        cents("o_totalprice").alias("xc"),
    )
    return enc.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        (
            (F.col("s") - F.col("xc")).cast("double") / (F.col("n") - 1) / 100.0
        ).alias("loo_price"),
    )


@register(
    "ml_gain_deciles",
    oracle="""
    WITH ranked AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
      FROM documents
    ),
    per AS (
      SELECT decile, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
      FROM ranked GROUP BY decile
    )
    SELECT decile, n, n_pos,
           CAST(sum(n_pos) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_pos,
           CAST(CAST(sum(n_pos) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS DOUBLE)
             / CAST(sum(n_pos) OVER () AS BIGINT) AS capture_rate
    FROM per
    """,
)
def ml_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gain (cumulative-capture) table for `n_chars` as a ranking score
    of `lang = 'en'` — the model-evaluation companion to `ml_roc_auc`:
    decile 1 = highest scores; capture_rate = share of all positives
    found in deciles 1..k. Decile assignment is NTILE(10) over the full
    (score DESC, doc_id) tiebreak order — computed scale-safe: the
    exact global row_number comes from `global_order` (range-partition
    + per-partition rank + broadcast offsets, no single-task window),
    and `ntile_from_rn` reproduces ANSI NTILE arithmetic from that
    rank and the broadcast total count, so the result stays
    hash-identical to the oracle's `ntile(10)`. The gain arithmetic
    then runs on the 10-row decile table — cumulative sums via a
    triangular broadcast self-join (10x10 pairs), keeping the whole
    plan free of unpartitioned windows (tests/test_plan_lint.py)."""
    docs = load(spark, sf_dir, "documents")
    ranked = global_order(
        docs.select(
            "doc_id",
            "n_chars",
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        ),
        [F.desc("n_chars"), "doc_id"],
        rn_col="_rn",
    )
    total = docs.agg(F.count(F.lit(1)).alias("_total"))
    per = (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "pos",
            ntile_from_rn(F.col("_rn"), F.col("_total"), 10).alias("decile"),
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos"))
    )
    lower = per.select(
        F.col("decile").alias("_d2"), F.col("n_pos").alias("_p2")
    )
    return (
        per.join(F.broadcast(lower), F.col("_d2") <= F.col("decile"))
        .groupBy("decile", "n", "n_pos")
        .agg(F.sum("_p2").alias("cum_pos"))
        .crossJoin(
            F.broadcast(per.agg(F.sum("n_pos").alias("_tot_pos")))
        )
        .select(
            "decile",
            "n",
            "n_pos",
            "cum_pos",
            (F.col("cum_pos").cast("double") / F.col("_tot_pos")).alias(
                "capture_rate"
            ),
        )
    )


# MATERIALIZED hints matter here (r6, VERDICT r5 task 5): each peel
# round references the previous round's edge CTE several times (degree
# UNION ALL reads it twice, the survivor restriction once more), so
# without materialization DuckDB's inlining re-evaluates the whole
# chain — including the items self-join — multiplicatively per unroll
# level: 172 s at sf0.1 vs 1.3 s materialized, identical results.
_KCORE_SQL_EDGES = """
    items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM items a
           JOIN items b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2
           HAVING count(*) >= 2)
"""


@register(
    "graph_kcore_peel",
    oracle=f"""
    WITH {_KCORE_SQL_EDGES},
    d0 AS MATERIALIZED (SELECT p, count(*) AS deg
           FROM (SELECT pa AS p FROM e0 UNION ALL SELECT pb FROM e0)
           GROUP BY p),
    k0 AS MATERIALIZED (SELECT p FROM d0 WHERE deg >= 3),
    e1 AS MATERIALIZED (SELECT pa, pb FROM e0 WHERE pa IN (SELECT p FROM k0)
                                   AND pb IN (SELECT p FROM k0)),
    d1 AS MATERIALIZED (SELECT p, count(*) AS deg
           FROM (SELECT pa AS p FROM e1 UNION ALL SELECT pb FROM e1)
           GROUP BY p),
    k1 AS MATERIALIZED (SELECT p FROM d1 WHERE deg >= 3),
    e2 AS MATERIALIZED (SELECT pa, pb FROM e1 WHERE pa IN (SELECT p FROM k1)
                                   AND pb IN (SELECT p FROM k1)),
    d2 AS MATERIALIZED (SELECT p, count(*) AS deg
           FROM (SELECT pa AS p FROM e2 UNION ALL SELECT pb FROM e2)
           GROUP BY p),
    k2 AS MATERIALIZED (SELECT p FROM d2 WHERE deg >= 3),
    e3 AS MATERIALIZED (SELECT pa, pb FROM e2 WHERE pa IN (SELECT p FROM k2)
                                   AND pb IN (SELECT p FROM k2))
    SELECT p AS partkey, count(*) AS deg
    FROM (SELECT pa AS p FROM e3 UNION ALL SELECT pb FROM e3)
    GROUP BY p
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core peeling of the part co-purchase graph (edges = part pairs
    sharing ≥ 2 orders, from `copurchase_edges`): three unrolled
    peel rounds, each dropping nodes of degree < 3 and restricting
    edges to survivors via left-semi joins. The edge derivation is the
    one data-sized pass (shared-exchange self-join on l_orderkey); the
    peel loop then works on the aggregated edge list —
    `localCheckpoint`-ed per round so round N+1 does not replay rounds
    1..N — which is how iterative graph trimming should decompose at
    100 TB (heavy extraction once, fixpoint on the graph summary).
    Output: surviving nodes with their degree after round 3 (a fixed
    iteration count, mirrored exactly by the unrolled SQL twin)."""
    e = copurchase_edges(spark, sf_dir, support=2).select("pa", "pb").localCheckpoint()
    for _ in range(3):
        deg = (
            e.select(F.explode(F.array("pa", "pb")).alias("p"))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= 3).select("p")
        e = (
            e.join(keep, e.pa == keep.p, "left_semi")
            .join(keep, e.pb == keep.p, "left_semi")
            .localCheckpoint()
        )
    return (
        e.select(F.explode(F.array("pa", "pb")).alias("partkey"))
        .groupBy("partkey")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


@register(
    "sql_lateral_view",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    )
    SELECT lang, tok, count(*) AS cnt
    FROM tok WHERE tok <> ''
    GROUP BY lang, tok
    ORDER BY cnt DESC, lang, tok
    LIMIT 30
    """,
)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HiveQL `LATERAL VIEW explode(...)` SQL surface — same
    generator-join semantics as the DataFrame `explode` used
    everywhere else, but exercised through `spark.sql` so the engine's
    SQL parser path for table-generating functions is covered (the
    reference has no SQL surface at all; `SQLContext` at
    `IRSSpark.py:145` never parses a query). Catalyst plans the
    LATERAL VIEW into the same Generate node as the DataFrame API —
    one explode, one hash aggregate, one TakeOrdered."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT lang, tok, count(*) AS cnt
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) t AS tok
        WHERE tok <> ''
        GROUP BY lang, tok
        ORDER BY cnt DESC, lang, tok
        LIMIT 30
        """
    )


@register(
    "sql_pivot_clause",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL `PIVOT` clause surface (Spark SQL syntax) with an
    explicit value list — the parser-path twin of `reshape_pivot_api`
    and `agg_pivot_events`. With values enumerated in the query,
    Catalyst plans a single-pass PivotFirst aggregate (one shuffle);
    omitting them would force a values-discovery scan first, which is
    the 100 TB anti-pattern the explicit list avoids."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * FROM (
          SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS q
          FROM lineitem
        )
        PIVOT (sum(q) FOR l_linestatus IN ('O' AS qty_o, 'F' AS qty_f))
        """
    )


@register(
    "mm_payload_magic_sniff",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           hex(encode(substring(text, 1, 4))) AS magic_hex,
           count(*) AS n
    FROM documents
    GROUP BY 1, 2
    ORDER BY n DESC, kind, magic_hex
    LIMIT 25
    """,
)
def mm_payload_magic_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-type sniffing from payload magic bytes: hex of the first 4
    bytes of each binary payload, tallied per declared kind — the
    consistency check a media-ingest pipeline runs to catch
    mislabeled/corrupt uploads (declared MIME vs actual magic). The
    byte slice happens at the scan via JVM `substring` on the BINARY
    column — 4 bytes per row reach the aggregate, the payload itself
    never shuffles. Payloads here are the deterministic stand-ins from
    `media_table` (`operators/multimodal.py`), so the 'magic' is the
    first 4 utf-8 bytes; with real media the same plan reads JPEG/PNG
    signatures."""
    m = media_table(spark, sf_dir)
    return (
        m.select(
            F.col("meta.kind").alias("kind"),
            F.hex(F.expr("substring(payload, 1, 4)")).alias("magic_hex"),
        )
        .groupBy("kind", "magic_hex")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "kind", "magic_hex")
        .limit(25)
    )


@register(
    "text_boilerplate_ngrams",
    oracle="""
    WITH doc_grams AS (
      SELECT doc_id, source,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 4), ' ')
               FOR i IN generate_series(1, len(t) - 4)
             ])) AS gram
      FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)
    )
    SELECT gram,
           count(*) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM doc_grams
    GROUP BY gram
    HAVING count(*) >= 5
    ORDER BY n_docs DESC, gram
    LIMIT 20
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: word 5-grams appearing in ≥ 5 distinct
    documents, ranked by document frequency — the CCNet-style report
    that surfaces navigation chrome, license headers and template
    text for removal before training. Grams are deduplicated
    per-document map-side (`array_distinct` before the explode), so
    the aggregate counts documents, not occurrences, and the explode
    feeds one hash aggregate keyed by gram. At 100 TB the HAVING
    floor makes the reduce side sparse (singleton grams — the vast
    majority — collapse map-side); the output feeds
    `dedup_paragraph_reassembly`-style scrubbing as its block list."""
    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(shingles(F.col("text"), 5))).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
        .filter(F.col("n_docs") >= 5)
        .orderBy(F.desc("n_docs"), "gram")
        .limit(20)
    )
