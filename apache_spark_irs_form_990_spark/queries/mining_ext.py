"""Data-mining extensions — discrete percentiles, winsorized means,
duplicate-payment auditing, user lifecycle staging, containment-based
near-dup detection, n-gram novelty, and nearest-centroid evaluation
(SURVEY.md §2 B11 continuation).

All EXT relative to the reference; these extend the counting core
(`IRSSpark.py:181`) with the mining/evaluation layer of an analytics
engine. Cross-engine determinism follows the sibling modules:

- **Discrete percentiles** select the value AT an exact integer rank
  (ceil(p·n) computed as `(n·p + 99) div 100` in BIGINTs) — no
  interpolation, so the output is a real data value and the oracle
  can never disagree on rounding.
- **Injected fixtures** (duplicate payments, prefix near-dups) are
  derived deterministically from the base tables on BOTH engines with
  identical arithmetic, the same pattern as `dedup_near_jaccard`.
- **Classification argmax** ranks by a cosine whose dot products and
  norms are exact integer milli-unit sums; the double division chain
  is written in the same association order on both engines, with a
  label tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.vectors import (
    nonzero_milli,
    dot,
    milli_vec,
    sq_norm,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "agg_percentile_disc",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, c,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY c) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM v
    )
    SELECT l_returnflag,
           max(n) AS n,
           CAST(min(CASE WHEN rn = (n * 25 + 99) // 100 THEN c END) AS DOUBLE)
             / 100.0 AS p25_disc,
           CAST(min(CASE WHEN rn = (n * 50 + 99) // 100 THEN c END) AS DOUBLE)
             / 100.0 AS p50_disc,
           CAST(min(CASE WHEN rn = (n * 75 + 99) // 100 THEN c END) AS DOUBLE)
             / 100.0 AS p75_disc
    FROM r
    GROUP BY l_returnflag
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC p25/50/75 of extended price per return flag —
    the discrete complement of [[agg_percentiles]] (PERCENTILE_CONT):
    the reported number is an actual row value at rank ceil(p·n),
    never an interpolation, which is what tail-latency and
    compliance reports require.

    Rank targets are exact integer arithmetic ((n·p+99) div 100), the
    selected cents value is divided once at the end. The plan is one
    per-group sort (the honest cost of an exact discrete percentile);
    at 100 TB the domain-collapse rewrite (group by value, cumulative
    counts — prices repeat heavily) bounds the sort by |distinct
    values| instead of |rows|, the same trick as
    [[stats_ks_two_sample]]."""
    li = load(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("c")
    w_n = Window.partitionBy("l_returnflag")
    r = v.select(
        "l_returnflag",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )

    def pick(pct: int, alias: str):
        target = F.expr(f"(n * {pct} + 99) div 100")
        return (
            F.min(F.when(F.col("rn") == target, F.col("c"))).cast("double") / 100.0
        ).alias(alias)

    return r.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        pick(25, "p25_disc"),
        pick(50, "p50_disc"),
        pick(75, "p75_disc"),
    )


@register(
    "win_winsorized_mean",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, c,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY c) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM v
    ),
    bounds AS (
      SELECT l_returnflag,
             min(CASE WHEN rn = (n * 5 + 99) // 100 THEN c END) AS lo,
             min(CASE WHEN rn = (n * 95 + 99) // 100 THEN c END) AS hi
      FROM r GROUP BY l_returnflag
    )
    SELECT v.l_returnflag,
           count(*) AS n,
           round(CAST(sum(CASE WHEN c < lo THEN lo
                               WHEN c > hi THEN hi
                               ELSE c END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 100.0, 6) AS winsorized_mean,
           CAST(max(lo) AS DOUBLE) / 100.0 AS clamp_lo,
           CAST(max(hi) AS DOUBLE) / 100.0 AS clamp_hi
    FROM v JOIN bounds ON v.l_returnflag = bounds.l_returnflag
    GROUP BY v.l_returnflag
    """,
)
def win_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5/95 winsorized mean of extended price per return flag — the
    robust-location estimator that CLAMPS outliers to the percentile
    fence instead of dropping them ([[agg_trimmed_mean]] drops; both
    belong in a robust-metrics layer because a raw mean moves with a
    single fat-fingered value).

    Fences are exact discrete percentiles (same integer-rank identity
    as [[agg_percentile_disc]]); the 5-row fence table broadcast-joins
    back onto the scan, clamped cents sum exactly, and ONE division +
    round(6) closes it out. Two passes over the data (fence, then
    clamp+mean) — unavoidable for exact percentile fences; at scale
    both passes share the scan cache."""
    li = load(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
    )
    w = Window.partitionBy("l_returnflag").orderBy("c")
    w_n = Window.partitionBy("l_returnflag")
    r = v.select(
        "l_returnflag",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    bounds = r.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n * 5 + 99) div 100"), F.col("c"))
        ).alias("lo"),
        F.min(
            F.when(F.col("rn") == F.expr("(n * 95 + 99) div 100"), F.col("c"))
        ).alias("hi"),
    )
    clamped = F.when(F.col("c") < F.col("lo"), F.col("lo")).when(
        F.col("c") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("c"))
    return (
        v.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(clamped).cast("double") / F.count(F.lit(1)).cast("double") / 100.0,
                6,
            ).alias("winsorized_mean"),
            (F.max("lo").cast("double") / 100.0).alias("clamp_lo"),
            (F.max("hi").cast("double") / 100.0).alias("clamp_hi"),
        )
    )


@register(
    "audit_duplicate_payments",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day_no
      FROM orders
    ),
    corpus AS (
      SELECT * FROM base
      UNION ALL
      -- double-submission fixture: every 200th order re-keyed, next day
      SELECT o_orderkey + 10000000, o_custkey, cents, day_no + 1
      FROM base WHERE o_orderkey % 200 = 0
    ),
    w AS (
      SELECT *,
             lag(o_orderkey) OVER
               (PARTITION BY o_custkey, cents
                ORDER BY day_no, o_orderkey) AS first_orderkey,
             lag(day_no) OVER
               (PARTITION BY o_custkey, cents
                ORDER BY day_no, o_orderkey) AS first_day
      FROM corpus
    )
    SELECT o_custkey, first_orderkey, o_orderkey AS dup_orderkey,
           CAST(cents AS DOUBLE) / 100.0 AS amount,
           day_no - first_day AS gap_days
    FROM w
    WHERE first_orderkey IS NOT NULL AND day_no - first_day <= 3
    """,
)
def audit_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment audit: flag orders where the same customer has
    another order of the EXACT same amount within 3 days — the
    classic double-submission / double-charge screen.

    The base table has no such collisions (verified), so a
    deterministic fixture injects them (every 200th order replayed
    next-day with a re-minted key, derived identically on both
    engines — the [[dedup_near_jaccard]] fixture pattern). Detection
    is one (custkey, amount-cents) window with a day-number lag: the
    pair key makes candidate sets tiny, so no self-join — at 100 TB
    this shuffles each payment once by (payer, amount) and nothing
    else."""
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("day_no"),
    )
    replay = base.filter(F.col("o_orderkey") % 200 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        "cents",
        (F.col("day_no") + 1).alias("day_no"),
    )
    corpus = base.unionByName(replay)
    w = Window.partitionBy("o_custkey", "cents").orderBy("day_no", "o_orderkey")
    flagged = corpus.select(
        "*",
        F.lag("o_orderkey").over(w).alias("first_orderkey"),
        F.lag("day_no").over(w).alias("first_day"),
    ).filter(
        F.col("first_orderkey").isNotNull()
        & ((F.col("day_no") - F.col("first_day")) <= 3)
    )
    return flagged.select(
        "o_custkey",
        "first_orderkey",
        F.col("o_orderkey").alias("dup_orderkey"),
        (F.col("cents").cast("double") / 100.0).alias("amount"),
        (F.col("day_no") - F.col("first_day")).alias("gap_days"),
    )


@register(
    "beh_lifecycle_stage",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no
      FROM events
    ),
    span AS (
      SELECT user_id, min(day_no) AS first_day FROM ud GROUP BY user_id
    ),
    maxd AS (SELECT max(day_no) AS max_day FROM ud),
    spine AS (
      SELECT user_id, first_day, unnest(range(first_day, max_day + 1)) AS day_no
      FROM span, maxd
    ),
    flags AS (
      SELECT s.user_id, s.day_no, s.first_day,
             CASE WHEN ud.user_id IS NULL THEN 0 ELSE 1 END AS present
      FROM spine s LEFT JOIN ud
        ON s.user_id = ud.user_id AND s.day_no = ud.day_no
    ),
    staged AS (
      SELECT day_no,
             CASE WHEN day_no = first_day THEN 'new'
                  WHEN present = 1 AND lag(present) OVER
                       (PARTITION BY user_id ORDER BY day_no) = 1 THEN 'retained'
                  WHEN present = 1 THEN 'resurrected'
                  WHEN lag(present) OVER
                       (PARTITION BY user_id ORDER BY day_no) = 1 THEN 'churned'
             END AS stage
      FROM flags
    )
    SELECT day_no, stage, count(*) AS n_users
    FROM staged WHERE stage IS NOT NULL
    GROUP BY day_no, stage
    """,
)
def beh_lifecycle_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user-lifecycle staging: each user-day on a dense calendar
    spine is classified new / retained / resurrected / churned from
    yesterday's presence (dormant days — absent after absent — carry
    no signal and are excluded). This is the growth-accounting
    identity: DAU(t) = new + retained + resurrected, and churned(t)
    measures yesterday's leak.

    The spine is generated per user (sequence from first day to the
    corpus max day — a broadcast scalar), so the left join and both
    windows align on one user_id exchange; spine rows are bounded by
    users × days, far below raw event volume at any scale."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day_no")
    ).distinct()
    span = ud.groupBy("user_id").agg(F.min("day_no").alias("first_day"))
    maxd = ud.agg(F.max("day_no").alias("max_day"))
    spine = (
        span.crossJoin(F.broadcast(maxd))
        .select(
            "user_id",
            "first_day",
            F.explode(F.sequence("first_day", "max_day")).alias("day_no"),
        )
    )
    flags = spine.join(
        ud.withColumn("present", F.lit(1)), ["user_id", "day_no"], "left"
    ).select(
        "user_id",
        "day_no",
        "first_day",
        F.coalesce("present", F.lit(0)).alias("present"),
    )
    w = Window.partitionBy("user_id").orderBy("day_no")
    prev = F.lag("present").over(w)
    staged = flags.select(
        "day_no",
        F.when(F.col("day_no") == F.col("first_day"), "new")
        .when((F.col("present") == 1) & (prev == 1), "retained")
        .when(F.col("present") == 1, "resurrected")
        .when(prev == 1, "churned")
        .alias("stage"),
    ).filter(F.col("stage").isNotNull())
    return staged.groupBy("day_no", "stage").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "text_dedup_containment",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      -- subset-duplication fixture: first half of every 7th doc
      SELECT doc_id + 2000000 AS doc_id,
             coalesce(array_to_string(list_slice(string_split(text, ' '), 1,
                             len(string_split(text, ' ')) // 2), ' '), '') AS text
      FROM documents WHERE doc_id % 7 = 0
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
    SELECT id_a, id_b, shared, sa.n AS n_a, sb.n AS n_b,
           CAST(shared AS DOUBLE) / least(sa.n, sb.n) AS containment
    FROM pair_overlap
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(shared AS DOUBLE) / least(sa.n, sb.n) >= 0.9
    """,
)
def text_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection: |A∩B| / min(|A|,|B|) over
    distinct token-trigram shingle sets — the asymmetric measure that
    catches SUBSET duplication (a document embedded inside a longer
    one), which symmetric Jaccard misses: a half-prefix copy scores
    containment ≈ 1.0 but Jaccard ≈ 0.5, below any sane threshold.
    The injected fixture is exactly that half-prefix copy, so this
    query finds pairs [[dedup_near_jaccard]] provably cannot.

    Same inverted-index candidate generation (pairs meet only on a
    shared shingle), with the count-over-window document-frequency
    cap (df <= 100) bounding hot posting lists before the self-join —
    the r3 treatment applied across the whole shingle-join family.
    Exact integer overlap counts, one final division against the
    smaller set size — both computed over the capped universe."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    prefix = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, (F.size(toks) / 2).cast("int")), " ").alias(
            "text"
        ),
    )
    corpus = docs.unionByName(prefix)
    t = F.split(F.col("text"), " ")
    shingled0 = corpus.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    # guarded: sequence(1, k) with k < 1 DESCENDS and
                    # element_at then reads out of bounds on short docs
                    F.when(
                        F.size(t) - 2 >= 1, F.sequence(F.lit(1), F.size(t) - 2)
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(t, i),
                        F.element_at(t, i + 1),
                        F.element_at(t, i + 2),
                    ),
                )
            )
        ).alias("shingle"),
    ).distinct()  # set semantics per (doc_id, shingle) under dup rows
    w_df = Window.partitionBy("shingle")
    shingled = (
        shingled0.withColumn("df", F.count(F.lit(1)).over(w_df))
        .filter(F.col("df") <= 100)
        .drop("df")
    )
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
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
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    joined = (
        overlap.join(sizes.withColumnRenamed("n", "n_a"), overlap.id_a == sizes.doc_id)
        .drop("doc_id")
        .join(
            sizes.withColumnRenamed("n", "n_b"),
            F.col("id_b") == sizes.doc_id,
        )
        .drop("doc_id")
    )
    containment = F.col("shared").cast("double") / F.least("n_a", "n_b")
    return joined.filter(containment >= 0.9).select(
        "id_a", "id_b", "shared", "n_a", "n_b", containment.alias("containment")
    )


@register(
    "text_ngram_novelty",
    oracle="""
    WITH doc_grams AS (
      SELECT doc_id, source,
             unnest(list_distinct([
               array_to_string(list_slice(t, i, i + 4), ' ')
               FOR i IN generate_series(1, len(t) - 4)
             ])) AS gram
      FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)
    ),
    marked AS (
      SELECT source,
             CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY gram)
                  THEN 1 ELSE 0 END AS novel
      FROM doc_grams
    )
    SELECT source,
           count(*) AS n_grams,
           CAST(sum(novel) AS BIGINT) AS n_novel,
           CAST(sum(novel) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
    FROM marked GROUP BY source
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 5-gram novelty: the fraction of each document's
    distinct 5-grams that are globally FIRST SEEN in that document
    (corpus position = doc_id), micro-averaged per source — the
    dataset-curation signal for "how much genuinely new text does
    this source contribute vs. recombine", the n-gram analog of
    [[text_vocab_growth]]'s token curve.

    First-seen attribution is one min-over-gram window (the
    first-occurrence trick — no self-join against all earlier
    documents); counts are exact integers with one final division.
    At 100 TB the gram-partitioned window is the only wide exchange,
    and a document-frequency cap bounds hot grams."""
    docs = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(
                F.transform(
                    # guarded: see the size-2 site above (1-token docs)
                    F.when(
                        F.size(t) - 4 >= 1, F.sequence(F.lit(1), F.size(t) - 4)
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(t, i),
                        F.element_at(t, i + 1),
                        F.element_at(t, i + 2),
                        F.element_at(t, i + 3),
                        F.element_at(t, i + 4),
                    ),
                )
            )
        ).alias("gram"),
    )
    w = Window.partitionBy("gram")
    marked = grams.select(
        "source",
        F.when(F.col("doc_id") == F.min("doc_id").over(w), 1).otherwise(0).alias(
            "novel"
        ),
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("novel").alias("n_novel"),
        (F.sum("novel").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "novelty"
        ),
    )


@register(
    "ml_nearest_centroid_confusion",
    oracle="""
    WITH m AS (
      SELECT vec_id, label, v FROM (
        SELECT vec_id, label,
                    list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        FROM embeddings
      ) WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    long AS (
      SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM m
    ),
    sums AS (
      SELECT label, pos, CAST(sum(x) AS BIGINT) AS sx
      FROM long GROUP BY label, pos
    ),
    cent AS (
      SELECT label AS label_c, list(sx ORDER BY pos) AS cv
      FROM sums GROUP BY label
    ),
    scored AS (
      SELECT vec_id, m.label, label_c,
             CAST(list_sum(list_transform(range(1, 65), i -> v[i] * cv[i]))
                  AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(v, x -> x * x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE)))
               AS cos
      FROM m, cent
    ),
    best AS (
      SELECT *, row_number() OVER
               (PARTITION BY vec_id ORDER BY cos DESC, label_c) AS rn
      FROM scored
    )
    SELECT label AS label_true, label_c AS label_pred, count(*) AS n
    FROM best WHERE rn = 1
    GROUP BY label_true, label_pred
    """,
)
def ml_nearest_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification + confusion matrix: each vector
    is assigned to the label whose centroid direction it is closest to
    (cosine argmax over 10 class centroids), and the (true, predicted)
    count matrix is the output — the standard embedding-quality
    evaluation, one rung below [[sim_knn_classify]] in cost: 10
    comparisons per vector instead of a bounded all-pairs join.

    Centroids are per-label element-wise SUMS of the exact milli-int
    vectors (cosine is scale-invariant, so the un-divided sum vector
    gives bit-identical assignments to the mean — and keeps every dot
    product an exact BIGINT). The 10-row centroid table broadcasts;
    the argmax is a 10-row-per-vector rank with a label tiebreak; at
    any corpus size the only shuffle is the centroid aggregation."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", milli_vec(F.col("embedding")).alias("v")
    ).transform(nonzero_milli)
    long = emb.select("label", F.posexplode("v").alias("pos", "x"))
    sums = long.groupBy("label", "pos").agg(F.sum("x").alias("sx"))
    cent = sums.groupBy(F.col("label").alias("label_c")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sx"))), lambda s: s["sx"]
        ).alias("cv")
    )
    cos = dot(F.col("v"), F.col("cv")).cast("double") / (
        F.sqrt(sq_norm(F.col("v")).cast("double"))
        * F.sqrt(sq_norm(F.col("cv")).cast("double"))
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "label_c", cos.alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "label_c")
    best = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.groupBy(
        F.col("label").alias("label_true"), F.col("label_c").alias("label_pred")
    ).agg(F.count(F.lit(1)).alias("n"))
