"""Frontier extensions — iterative graph traversal (BFS), ML evaluation
metrics (ROC-AUC), sentence-level text statistics, technical-analysis
bands, spike anomaly detection, geospatial distance, incremental corpus
dedup, and unigram-LM surprisal (SURVEY.md §2 B11 continuation).

All EXT relative to the reference (`IRSSpark.py` has one reduceByKey
aggregation and no joins/windows/iteration); these are the shapes a
100 TB training-data warehouse runs daily on top of the same
partial+final hash-aggregate machinery.

Cross-engine determinism follows the house conventions
(`functions/money.py` / stats_ext docstring):

- exact BIGINT accumulation (counts, cents, micro-nats), one IEEE
  division at the end — identical bits on both engines;
- ln/sin/cos-derived outputs rounded (4-6 decimals) after identical
  association order;
- ordering keys on derived doubles always carry full-column integer
  tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "graph_bfs_hops",
    oracle="""
    WITH RECURSIVE trade AS (
      SELECT s.s_nationkey AS a, c.c_nationkey AS b
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY s.s_nationkey, c.c_nationkey
      HAVING count(*) >= 20
    ),
    ue AS (SELECT a, b FROM trade UNION SELECT b, a FROM trade),
    bfs(n, d) AS (
      SELECT CAST(0 AS INTEGER), 0
      UNION ALL
      SELECT ue.b, bfs.d + 1 FROM bfs JOIN ue ON ue.a = bfs.n WHERE bfs.d < 4
    )
    SELECT n AS nationkey, CAST(min(d) AS BIGINT) AS hops
    FROM bfs GROUP BY n
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first hop distance from nation 0 over the supplier→customer
    trade graph (edge kept when the two nations co-occur on >= 20
    lineitems — the support floor sparsifies an otherwise complete
    graph). Iterative frontier expansion, 4 rounds (bounded diameter):
    each round is one tiny join + min-aggregate over a <= 25-row
    distance table against a `localCheckpoint`-ed edge list, so Spark
    never replays the fact-table scan. The expensive part — edge
    derivation — is ONE pass over lineitem with AQE-planned dimension
    joins; the iteration itself is metadata-sized at any corpus scale
    (node domain = nations), which is exactly how a 100 TB BFS should
    decompose: heavy edge extraction once, light fixpoint on the
    aggregated graph. Oracle: DuckDB recursive CTE with the same
    depth bound."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    trade = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("a"), F.col("c_nationkey").alias("b")
        )
        .count()
        .filter(F.col("count") >= 20)
        .select("a", "b")
    )
    ue = (
        trade.union(trade.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    dist = spark.createDataFrame([(0, 0)], "n int, d int")
    for _ in range(4):
        nxt = dist.join(ue, dist.n == ue.a).select(
            ue["b"].alias("n"), (dist["d"] + 1).alias("d")
        )
        dist = (
            dist.union(nxt)
            .groupBy("n")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
    return dist.select(
        F.col("n").alias("nationkey"), F.col("d").cast("long").alias("hops")
    )


@register(
    "ml_roc_auc",
    oracle="""
    WITH vals AS (
      SELECT n_chars AS v, count(*) AS cnt,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
      FROM documents GROUP BY n_chars
    ),
    ranked AS (
      SELECT v, cnt, pos,
             2 * COALESCE(sum(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS midrank2
      FROM vals
    )
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(cnt - pos) AS BIGINT) AS n_neg,
           CAST(sum(pos * midrank2) - sum(pos) * (sum(pos) + 1) AS DOUBLE)
             / (2.0 * CAST(sum(pos) AS BIGINT) * CAST(sum(cnt - pos) AS BIGINT))
             AS auc
    FROM ranked
    """,
)
def ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of `n_chars` as a classifier score for `lang = 'en'`,
    via the exact Mann-Whitney midrank identity:
    AUC = (ΣR⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻). The naive formulation sorts
    every row; this one collapses to the VALUE DOMAIN first (one hash
    aggregate), then ranks the distinct values with a window whose
    input is domain-sized, not data-sized — at 100 TB of docs the
    window runs over thousands of distinct lengths, not billions of
    rows. Midranks are kept as exact `2r` integers so ties cost no
    precision; the single final division of exact BIGINTs is
    correctly-rounded IEEE, hence bit-identical cross-engine."""
    docs = load(spark, sf_dir, "documents")
    vals = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "midrank2",
        2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1,
    )
    return ranked.agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).alias("n_neg"),
        (
            (
                F.sum(F.col("pos") * F.col("midrank2"))
                - F.sum("pos") * (F.sum("pos") + 1)
            ).cast("double")
            / (2.0 * F.sum("pos") * F.sum(F.col("cnt") - F.col("pos")))
        ).alias("auc"),
    )


@register(
    "text_sentence_stats",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
             len(list_filter(string_split_regex(text, '[.!?]+'),
                             x -> trim(x) <> '')) AS n_sent,
             len(list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '')) AS n_words
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_sent) AS BIGINT) AS n_sentences,
           CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(CAST(sum(n_words) AS BIGINT) AS DOUBLE)
             / CAST(sum(n_sent) AS BIGINT) AS words_per_sentence
    FROM per_doc
    GROUP BY lang
    """,
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation statistics per language: docs, sentences
    (split on terminal-punctuation runs, whitespace-only segments
    dropped), words, and words-per-sentence. Segmentation is pure
    codegen string work (`split` + higher-order `filter` — no Python
    UDF), so the scan stays in one WholeStageCodegen span and
    parallelizes embarrassingly; the only shuffle is the 5-group
    final aggregate of 3 longs per language. The ratio is one IEEE
    division of exact BIGINT sums."""
    docs = load(spark, sf_dir, "documents")
    n_sent = F.size(
        F.filter(
            F.transform(F.split("text", r"[.!?]+"), lambda x: F.trim(x)),
            lambda x: x != F.lit(""),
        )
    )
    n_words = F.size(
        F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    )
    return (
        docs.select("lang", n_sent.alias("n_sent"), n_words.alias("n_words"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sent").alias("n_sentences"),
            F.sum("n_words").alias("n_words"),
            (
                F.sum("n_words").cast("double") / F.sum("n_sent")
            ).alias("words_per_sentence"),
        )
    )


_BOLL_SQL_MEAN = "CAST(sc AS DOUBLE) / 20.0"
_BOLL_SQL_SD = (
    "sqrt((CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)"
    " / 20.0) / 20.0)"
)


@register(
    "win_bollinger_bands",
    # NB: the window sums are pinned back to BIGINT before any DOUBLE
    # cast — DuckDB's sum() widens to HUGEINT, and its int128->double
    # conversion is NOT correctly rounded (off by 1 ulp vs Spark's
    # BigDecimal path), which the variance cancellation then amplifies
    # into visible band differences. BIGINT->double is a correctly
    # rounded CPU instruction on both engines.
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum({sql_cents('o_totalprice')}) // 100 AS BIGINT) AS day_r
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    framed AS (
      SELECT day, day_r,
             CAST(sum(day_r)  OVER w AS BIGINT) AS sc,
             CAST(sum(day_r * day_r) OVER w AS BIGINT) AS sc2,
             row_number() OVER (ORDER BY day) AS rn
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(day_r AS DOUBLE) AS revenue,
           round(({_BOLL_SQL_MEAN}), 4) AS sma20,
           round(({_BOLL_SQL_MEAN} + 2.0 * {_BOLL_SQL_SD}), 4) AS upper_band,
           round(({_BOLL_SQL_MEAN} - 2.0 * {_BOLL_SQL_SD}), 4) AS lower_band,
           CAST(day_r AS DOUBLE) > {_BOLL_SQL_MEAN} + 2.0 * {_BOLL_SQL_SD}
             OR CAST(day_r AS DOUBLE) < {_BOLL_SQL_MEAN} - 2.0 * {_BOLL_SQL_SD}
             AS breakout
    FROM framed WHERE rn >= 20
    """,
)
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-day Bollinger bands over daily order revenue: trailing SMA ±
    2σ, with a breakout flag for days outside the band. Aggregate-
    then-window: the data-sized pass is the daily hash aggregate (one
    shuffle of integer cents); the window then runs over the DAY
    domain — bounded by the calendar, not the corpus, so the single
    unpartitioned sort is a few thousand rows at any SF. Both frame
    moments (Σr, Σr²) come from ONE window spec; mean/σ/bands are a
    closed-form double expression with identical association order on
    both engines (sqrt is correctly rounded), and the breakout
    predicate compares in the exact integer domain.

    Numeric domain (r3 fix): daily revenue is floored to WHOLE DOLLARS
    before the moments — at cents granularity Σ(day²) crosses 2^63 at
    sf0.1 (long overflow under ANSI), and parking it in int128/decimal
    trips DuckDB's incorrectly-rounded int128->double conversion (1
    ulp, amplified by the variance cancellation into band mismatches).
    Dollar-integer moments stay well inside int64 — and inside the
    correctly-rounded conversion domain — through SF ~30; beyond that,
    widen to decimal and re-derive the band doubles from split hi/lo
    int63 parts."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("day_c"))
        .select("day", F.expr("day_c div 100").alias("day_r"))
    )
    w = Window.orderBy("day").rowsBetween(-19, 0)
    framed = daily.select(
        "day",
        "day_r",
        F.sum("day_r").over(w).alias("sc"),
        F.sum(F.col("day_r") * F.col("day_r")).over(w).alias("sc2"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    ).filter(F.col("rn") >= 20)
    mean_r = F.col("sc").cast("double") / 20.0
    sd_r = F.sqrt(
        (
            F.col("sc2").cast("double")
            - F.col("sc").cast("double") * F.col("sc").cast("double") / 20.0
        )
        / 20.0
    )
    day_d = F.col("day_r").cast("double")
    return framed.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        day_d.alias("revenue"),
        F.round(mean_r, 4).alias("sma20"),
        F.round(mean_r + 2.0 * sd_r, 4).alias("upper_band"),
        F.round(mean_r - 2.0 * sd_r, 4).alias("lower_band"),
        ((day_d > mean_r + 2.0 * sd_r) | (day_d < mean_r - 2.0 * sd_r)).alias(
            "breakout"
        ),
    )


@register(
    "ts_anomaly_spike",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             count(*) AS cnt
      FROM events GROUP BY event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE)
    ),
    framed AS (
      SELECT event_type, day, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sum7,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
           CAST(sum7 AS BIGINT) AS sum7
    FROM framed
    WHERE rn > 7 AND 7 * cnt > 3 * sum7
    """,
)
def ts_anomaly_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-spike anomaly detection: flag days where an event type's
    count exceeds 3× its trailing 7-observed-day average. The
    comparison is cross-multiplied into pure integers
    (7·today > 3·Σ₇) — no division, no floats, no tolerance. Daily
    aggregation is the only data-sized shuffle; the window runs per
    event type over the day domain (calendar-bounded). The first 7
    days per type are excluded (no full baseline)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wsum = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    )
    wrn = Window.partitionBy("event_type").orderBy("day")
    framed = daily.select(
        "event_type",
        "day",
        "cnt",
        F.sum("cnt").over(wsum).alias("sum7"),
        F.row_number().over(wrn).alias("rn"),
    )
    return framed.filter(
        (F.col("rn") > 7) & (7 * F.col("cnt") > 3 * F.col("sum7"))
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cnt",
        "sum7",
    )


_HAV_LAT = "((n_nationkey * 37) % 140) - 70 + 0.5"
_HAV_LON = "((n_nationkey * 91) % 340) - 170 + 0.5"


@register(
    "fn_geo_haversine",
    oracle=f"""
    WITH pts AS (
      SELECT n_nationkey AS k, n_name AS name,
             CAST({_HAV_LAT} AS DOUBLE) AS lat,
             CAST({_HAV_LON} AS DOUBLE) AS lon
      FROM nation
    )
    SELECT a.name AS name_a, b.name AS name_b,
           round(2.0 * 6371.0 * asin(sqrt(
             sin(radians(b.lat - a.lat) / 2.0) * sin(radians(b.lat - a.lat) / 2.0)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin(radians(b.lon - a.lon) / 2.0)
               * sin(radians(b.lon - a.lon) / 2.0))), 4) AS dist_km
    FROM pts a JOIN pts b ON a.k < b.k
    ORDER BY dist_km, name_a, name_b
    LIMIT 20
    """,
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance between nations placed on a
    deterministic synthetic grid (integer-arithmetic lat/lon from the
    nation key — the testdata carries no real coordinates), reporting
    the 20 closest pairs. The trig chain is written with IDENTICAL
    association order on both engines and rounded to 4 decimals (libm
    sin/cos agree to ~1 ulp; 4-dec rounding gives ~1e12× margin over
    that). Self-join of a 25-row dimension — broadcast nested loop,
    no shuffle; at scale the same expression joins a point fact table
    against a broadcast geo dimension."""
    n = load(spark, sf_dir, "nation")
    pts = n.select(
        F.col("n_nationkey").alias("k"),
        F.col("n_name").alias("name"),
        F.expr(_HAV_LAT).cast("double").alias("lat"),
        F.expr(_HAV_LON).cast("double").alias("lon"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    dlat_h = F.radians(F.col("b.lat") - F.col("a.lat")) / 2.0
    dlon_h = F.radians(F.col("b.lon") - F.col("a.lon")) / 2.0
    dist = F.round(
        2.0
        * 6371.0
        * F.asin(
            F.sqrt(
                F.sin(dlat_h) * F.sin(dlat_h)
                + F.cos(F.radians(F.col("a.lat")))
                * F.cos(F.radians(F.col("b.lat")))
                * F.sin(dlon_h)
                * F.sin(dlon_h)
            )
        ),
        4,
    )
    return (
        a.join(b, F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.alias("dist_km"),
        )
        .orderBy("dist_km", "name_a", "name_b")
        .limit(20)
    )


@register(
    "pipeline_incremental_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
               AS fingerprint
      FROM documents
    ),
    inc AS (SELECT * FROM fp WHERE doc_id % 10 < 3),
    corp AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 >= 3)
    SELECT doc_id, source, fingerprint
    FROM (
      SELECT i.doc_id, i.source, i.fingerprint,
             row_number() OVER (PARTITION BY i.fingerprint
                                ORDER BY i.doc_id) AS rn
      FROM inc i
      WHERE NOT EXISTS (SELECT 1 FROM corp WHERE corp.fingerprint = i.fingerprint)
    ) WHERE rn = 1
    """,
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup — the nightly-ingest shape: an incoming
    batch (doc_id % 10 < 3 stands in for "today's crawl") is admitted
    only where its whitespace/case-normalized fingerprint is (a) absent
    from the existing corpus (left-anti join) and (b) first within the
    batch itself (min-doc_id window). Fingerprints are computed
    map-side, so the anti-join and window shuffle 16-byte digests, not
    document text — at 100 TB the corpus side is a digest index, a
    ~1000× shuffle reduction, and the anti probe is exactly what a
    Bloom-filter-fronted incremental dedup degrades to on filter miss.
    Normalization mirrors `pipeline_corpus_prep`'s fingerprint
    (`operators/pipeline.py`)."""
    docs = load(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        ).alias("fingerprint"),
    )
    # NB: Spark regexp_replace is global; lower-before-trim and
    # trim-before-lower agree, but the oracle applies trim then lower —
    # both normalize identically since trim only strips ASCII spaces.
    inc = fp.filter(F.col("doc_id") % 10 < 3)
    corp = fp.filter(F.col("doc_id") % 10 >= 3).select("fingerprint")
    novel = inc.join(corp, "fingerprint", "left_anti")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        novel.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "fingerprint")
    )


@register(
    "text_unigram_surprisal",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    n AS (SELECT sum(cnt) AS total FROM vocab),
    scored AS (
      SELECT t.doc_id,
             CAST(round(ln(CAST(n.total AS DOUBLE) / v.cnt) * 1000000)
                  AS BIGINT) AS micro
      FROM tok t JOIN vocab v ON t.tok = v.tok CROSS JOIN n
    )
    SELECT doc_id, count(*) AS n_tokens,
           round(CAST(sum(micro) AS DOUBLE) / 1000000.0 / count(*), 6)
             AS avg_surprisal_nats
    FROM scored
    GROUP BY doc_id
    ORDER BY avg_surprisal_nats DESC, doc_id
    LIMIT 25
    """,
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal −(1/n)Σ ln p(w) against the
    corpus unigram LM — the classic perplexity-style quality filter
    (high surprisal ≈ rare-token noise; the 25 most surprising docs
    are returned). Plan shape at scale: one token explode feeds BOTH
    the vocabulary aggregate and the per-doc score; the vocab table
    (domain-sized) broadcasts back onto the token stream, and the
    corpus total N is a 1-row broadcast scalar — so the data-sized
    shuffles are the vocab count and the per-doc sum, each carrying
    longs. Per-token ln values are snapped to exact micro-nat integers
    so document sums are partition-order-independent."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        tok.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(
                F.log(F.col("total").cast("double") / F.col("cnt")) * 1000000
            )
            .cast("long")
            .alias("micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("micro").cast("double") / 1000000.0 / F.count(F.lit(1)),
                6,
            ).alias("avg_surprisal_nats"),
        )
        .orderBy(F.desc("avg_surprisal_nats"), "doc_id")
        .limit(25)
    )
