"""Statistical inference + sequence-behavior extensions — two-sample
tests (Kolmogorov–Smirnov, Mann–Whitney), Benford first-digit audit,
Kaplan–Meier survival, session path mining, second-order Markov
transitions, purchase inter-arrival, debounce compaction, and
deterministic feature hashing (SURVEY.md §2 B11 continuation).

All EXT relative to the reference (its only statistic is the
CitiesCount frequency sum, `IRSSpark.py:181`); these are the
hypothesis-testing and sequence-mining layers a warehouse serves on
top of that counting core.

Cross-engine determinism, same conventions as the sibling modules:

- **Rank/ECDF statistics are computed on exact integer counts** of the
  small discrete value domain (l_quantity ∈ 1..50), never on per-row
  rank windows: the per-value count table is tiny and the KS/U
  statistics come out of cross-multiplied BIGINT identities, with ONE
  final IEEE division (correctly rounded, hence bit-identical).
- **Survival products** integerize each ln(1 - d/n) term to micro-nats
  (exact-int inputs → identical double ratio → identical ln up to the
  snap) and cumulative-sum the integers, so the running product is
  order-independent; exp + round(6) happens once per output row.
- **Path/transition mining** orders strictly by the unique
  (ts, event_id) pair, so collected sequences are identical on any
  engine and any partitioning.
- **Top-k over counts** always carries full-key ascending tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "stats_ks_two_sample",
    oracle="""
    WITH f AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty, l_returnflag
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    per AS (
      SELECT qty,
             count(*) FILTER (WHERE l_returnflag = 'R') AS c_r,
             count(*) FILTER (WHERE l_returnflag = 'N') AS c_n
      FROM f GROUP BY qty
    ),
    cum AS (
      SELECT sum(c_r) OVER (ORDER BY qty) AS cr,
             sum(c_n) OVER (ORDER BY qty) AS cn,
             sum(c_r) OVER () AS nr,
             sum(c_n) OVER () AS nn
      FROM per
    )
    SELECT CAST(max(nr) AS BIGINT) AS n_r,
           CAST(max(nn) AS BIGINT) AS n_n,
           CAST(max(abs(cr * nn - cn * nr)) AS DOUBLE)
             / CAST(max(nr) * max(nn) AS DOUBLE) AS ks_d
    FROM cum
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D between the l_quantity
    distributions of returned ('R') vs. never-returned ('N') items.

    Scale path: the raw table collapses to a per-value count table
    first (one partial+final hash aggregate over a ≤50-row domain), so
    the ECDF windows and the max run on O(|domain|) rows regardless of
    input size — no per-row rank shuffle, which is what makes naive KS
    implementations fall over at 100 TB. D is the max of the exact
    cross-multiplied BIGINT identity |F1·n2 − F2·n1| divided ONCE at
    the end (|diff| ≤ n1·n2 ≈ 4e18 stays under 2^63 up to ~SF 300 per
    side; beyond that, switch the cross-product to DECIMAL(38))."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    per = li.groupBy(F.col("l_quantity").cast("long").alias("qty")).agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("c_r"),
        F.count(F.when(F.col("l_returnflag") == "N", 1)).alias("c_n"),
    )
    w_cum = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = per.select(
        F.sum("c_r").over(w_cum).alias("cr"),
        F.sum("c_n").over(w_cum).alias("cn"),
        F.sum("c_r").over(w_all).alias("nr"),
        F.sum("c_n").over(w_all).alias("nn"),
    )
    return cum.agg(
        F.max("nr").alias("n_r"),
        F.max("nn").alias("n_n"),
        (
            F.max(F.abs(F.col("cr") * F.col("nn") - F.col("cn") * F.col("nr"))).cast(
                "double"
            )
            / (F.max("nr") * F.max("nn")).cast("double")
        ).alias("ks_d"),
    )


@register(
    "stats_mann_whitney_u",
    oracle="""
    WITH f AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty, l_returnflag
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    per AS (
      SELECT qty,
             count(*) FILTER (WHERE l_returnflag = 'R') AS c_r,
             count(*) FILTER (WHERE l_returnflag = 'N') AS c_n
      FROM f GROUP BY qty
    ),
    rk AS (
      SELECT c_r, c_n,
             2 * coalesce(sum(c_r + c_n) OVER
                   (ORDER BY qty ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0)
               + (c_r + c_n) + 1 AS midrank2,
             sum(c_r) OVER () AS nr,
             sum(c_n) OVER () AS nn
      FROM per
    )
    SELECT CAST(max(nr) AS BIGINT) AS n_r,
           CAST(max(nn) AS BIGINT) AS n_n,
           CAST(sum(c_r * midrank2) - max(nr) * (max(nr) + 1) AS DOUBLE)
             / 2.0 AS u_r,
           CAST(max(nr) * max(nn) AS DOUBLE)
             - CAST(sum(c_r * midrank2) - max(nr) * (max(nr) + 1) AS DOUBLE)
               / 2.0 AS u_n
    FROM rk
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) between 'R' and 'N' quantity samples,
    with exact midrank tie handling.

    Ties are total here (a ≤50-value integer domain), so midranks are
    computed from the per-value count table: midrank(v) = cum_before +
    (ties+1)/2, carried ×2 as the exact integer midrank2 so no halves
    enter the sums. U1 = ΣR1 − n1(n1+1)/2 emerges from BIGINT sums
    with one final /2.0 (binary-exact). Same 100 TB shape as the KS
    query: one hash aggregate collapses the data; the rank windows
    touch only the value domain."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "N"))
    per = li.groupBy(F.col("l_quantity").cast("long").alias("qty")).agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("c_r"),
        F.count(F.when(F.col("l_returnflag") == "N", 1)).alias("c_n"),
    )
    w_bef = Window.orderBy("qty").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c = F.col("c_r") + F.col("c_n")
    rk = per.select(
        "c_r",
        "c_n",
        (2 * F.coalesce(F.sum(c).over(w_bef), F.lit(0)) + c + 1).alias("midrank2"),
        F.sum("c_r").over(w_all).alias("nr"),
        F.sum("c_n").over(w_all).alias("nn"),
    )
    r1_2 = F.sum(F.col("c_r") * F.col("midrank2"))
    nr, nn = F.max("nr"), F.max("nn")
    u_r = (r1_2 - nr * (nr + 1)).cast("double") / F.lit(2.0)
    return rk.agg(
        nr.alias("n_r"),
        nn.alias("n_n"),
        u_r.alias("u_r"),
        ((nr * nn).cast("double") - u_r).alias("u_n"),
    )


@register(
    "audit_benford_first_digit",
    oracle="""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders
      WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 100
    ),
    per AS (
      SELECT digit, count(*) AS n, sum(count(*)) OVER () AS total
      FROM c GROUP BY digit
    )
    SELECT digit, n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_expected,
           round(abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
                     - round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)),
                 6) AS abs_deviation
    FROM per
    """,
)
def audit_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — a fraud /
    data-fabrication screen: naturally occurring amounts follow
    P(d) = log10(1 + 1/d); synthetic or tampered columns don't.

    The first significant digit is extracted from the DECIMAL-exact
    integer-cents representation rendered as a decimal string (both
    engines print BIGINT identically; no float formatting is ever
    string-ified). One hash aggregate to a 9-row digit table, a
    window for the grand total, exact-integer share division, and the
    Benford expectation computed as the same rounded expression on
    both engines. Scale: digits-only shuffle, 9 groups, any SF."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    o = load(spark, sf_dir, "orders").filter(cents >= 100)
    per = (
        o.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "total",
            F.sum("n").over(
                Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
    )
    share = F.col("n").cast("double") / F.col("total").cast("double")
    expected = F.round(F.log10(1.0 + 1.0 / F.col("digit").cast("double")), 6)
    return per.select(
        "digit",
        "n",
        share.alias("share"),
        expected.alias("benford_expected"),
        F.round(F.abs(share - expected), 6).alias("abs_deviation"),
    )


@register(
    "stats_survival_km",
    oracle="""
    WITH life AS (
      SELECT user_id,
             (max(epoch_us(CAST(ts AS TIMESTAMP)))
              - min(epoch_us(CAST(ts AS TIMESTAMP)))) // 86400000000 AS t_day
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT t_day, count(*) AS d_n FROM life GROUP BY t_day
    ),
    risk AS (
      SELECT t_day, d_n,
             sum(d_n) OVER () - coalesce(sum(d_n) OVER
               (ORDER BY t_day ROWS BETWEEN UNBOUNDED PRECEDING
                AND 1 PRECEDING), 0) AS n_risk
      FROM d
    ),
    terms AS (
      SELECT t_day, d_n, n_risk,
             CASE WHEN n_risk > d_n
                  THEN CAST(round(ln(CAST(n_risk - d_n AS DOUBLE)
                                     / CAST(n_risk AS DOUBLE)) * 1000000)
                            AS BIGINT)
             END AS term_micro
      FROM risk
    )
    SELECT t_day, CAST(n_risk AS BIGINT) AS n_risk, d_n,
           CASE WHEN n_risk = d_n THEN 0.0
                ELSE round(exp(CAST(sum(term_micro) OVER (ORDER BY t_day)
                                    AS DOUBLE) / 1000000.0), 6)
           END AS survival
    FROM terms
    """,
)
def stats_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve over user lifetimes (days between a
    user's first and last event; every lifetime fully observed, so the
    estimator has no censoring branch here).

    S(t) = Π_{s≤t} (1 − d_s/n_s) is a running PRODUCT — not window-
    expressible directly — so each factor's ln is snapped to exact
    integer micro-nats and the product becomes an order-independent
    cumulative BIGINT sum (the [[geo-harmonic|agg_geo_harmonic_mean]]
    trick applied to a window). The final-step rows where everyone
    remaining dies (n = d, S = 0) are emitted through an explicit CASE
    rather than ln(0). Scale: one per-user aggregate (the only real
    shuffle), then windows over the tiny distinct-lifetime table."""
    ev = load(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.expr(
            "(max(unix_micros(ts)) - min(unix_micros(ts))) div 86400000000"
        ).alias("t_day")
    )
    d = life.groupBy("t_day").agg(F.count(F.lit(1)).alias("d_n"))
    w_bef = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_cum = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, 0)
    risk = d.withColumn(
        "n_risk",
        F.sum("d_n").over(w_all) - F.coalesce(F.sum("d_n").over(w_bef), F.lit(0)),
    )
    term = F.when(
        F.col("n_risk") > F.col("d_n"),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d_n")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * 1000000
        ).cast("long"),
    )
    return risk.withColumn("term_micro", term).select(
        "t_day",
        "n_risk",
        "d_n",
        F.when(F.col("n_risk") == F.col("d_n"), F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(F.sum("term_micro").over(w_cum).cast("double") / 1000000.0), 6
            )
        )
        .alias("survival"),
    )


@register(
    "beh_session_paths",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR lag(event_id) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT *, sum(new_sess) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS sess_no
      FROM ordered
    ),
    head5 AS (
      SELECT user_id, sess_no, ts, event_id, event_type
      FROM (SELECT *, row_number() OVER
                      (PARTITION BY user_id, sess_no ORDER BY ts, event_id) AS rn
            FROM sess)
      WHERE rn <= 5
    ),
    paths AS (
      SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM head5 GROUP BY user_id, sess_no
    ),
    counted AS (
      SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
    )
    SELECT rank, path, n_sessions
    FROM (SELECT *, row_number() OVER
                    (ORDER BY n_sessions DESC, path) AS rank
          FROM counted)
    WHERE rank <= 15
    """,
)
def beh_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 session opening paths: the first ≤5 event types of each
    30-minute-gap session, joined with '>' — the clickstream-mining
    query behind "how do users start a session".

    All four stages (gap flag, session numbering, in-session rank,
    path assembly) run on ONE user_id hash exchange — the window sort
    order (ts, event_id) is unique, so paths are engine-independent;
    the path table is then tiny and the global top-k uses a
    deterministic (count desc, path) rank. At 100 TB the only big
    shuffle is the per-user one; paths beyond position 5 never leave
    the map side of the final aggregate."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800000000), 1).otherwise(0),
    ).withColumn("sess_no", F.sum("new_sess").over(w))
    w_s = Window.partitionBy("user_id", "sess_no").orderBy("ts", "event_id")
    head5 = sess.withColumn("rn", F.row_number().over(w_s)).filter(F.col("rn") <= 5)
    paths = head5.groupBy("user_id", "sess_no").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.unix_micros("ts").alias("us"), "event_id", "event_type")
                    )
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    w_rank = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        counted.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 15)
        .select("rank", "path", "n_sessions")
    )


@register(
    "beh_markov_second_order",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lag(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev1,
             lag(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev2
      FROM events
    ),
    tri AS (
      SELECT prev2, prev1, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev2 IS NOT NULL
      GROUP BY prev2, prev1, next_type
    ),
    ctx AS (
      SELECT *, sum(n) OVER (PARTITION BY prev2, prev1) AS ctx_total
      FROM tri
    )
    SELECT rank, prev2, prev1, next_type, n,
           CAST(n AS DOUBLE) / CAST(ctx_total AS DOUBLE) AS prob
    FROM (SELECT *, row_number() OVER
                    (ORDER BY n DESC, prev2, prev1, next_type) AS rank
          FROM ctx)
    WHERE rank <= 25
    """,
)
def beh_markov_second_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov transitions: P(next | prev2, prev1) for the
    25 most frequent event trigrams — one memory level deeper than
    [[first-order|beh_transition_matrix]], the difference between
    "after a click" and "after an error then a click".

    Both lags share one (user_id)-partitioned window sort; the trigram
    count table is at most |types|³ = 125 rows, so the row-stochastic
    normalizer window and the global rank are free. The probability is
    ONE exact-integer division. Scale: a single per-user exchange
    followed by a partial+final aggregate of a bounded domain."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type"),
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    ).filter(F.col("prev2").isNotNull())
    tri = seq.groupBy("prev2", "prev1", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    ctx = tri.withColumn(
        "ctx_total", F.sum("n").over(Window.partitionBy("prev2", "prev1"))
    )
    w_rank = Window.orderBy(F.desc("n"), "prev2", "prev1", "next_type")
    return (
        ctx.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 25)
        .select(
            "rank",
            "prev2",
            "prev1",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.col("ctx_total").cast("double")).alias(
                "prob"
            ),
        )
    )


@register(
    "beh_time_to_next_purchase",
    oracle="""
    WITH p AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
               AS gap_us
      FROM p
    )
    SELECT user_id,
           count(*) AS n_purchases,
           round(CAST(sum(gap_us) AS DOUBLE)
                 / CAST(count(gap_us) AS DOUBLE) / 3600000000.0, 6)
             AS avg_gap_hours
    FROM gaps
    GROUP BY user_id
    HAVING count(*) >= 2
    """,
)
def beh_time_to_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase inter-arrival: how many purchases, and the
    average hours between consecutive ones (repeat-purchase cadence —
    the input to replenishment and win-back timing models).

    Gap sums are exact integer microseconds; the average is division
    of exact integers in a fixed association order. The lead window
    and the final aggregate share the user_id exchange. HAVING n ≥ 2
    keeps only users with at least one gap (count(gap_us) excludes
    the per-user final NULL lead on both engines)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    ).withColumn("gap_us", F.lead("us").over(w) - F.col("us"))
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum("gap_us").cast("double")
                / F.count("gap_us").cast("double")
                / 3600000000.0,
                6,
            ).alias("avg_gap_hours"),
        )
        .filter(F.col("n_purchases") >= 2)
    )


@register(
    "win_event_debounce",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                         (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id)
                       > 600000000
                  OR lag(event_id) OVER
                         (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS kept
      FROM events
    )
    SELECT event_type,
           count(*) AS raw_n,
           CAST(sum(kept) AS BIGINT) AS kept_n,
           CAST(sum(kept) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_ratio
    FROM d GROUP BY event_type
    """,
)
def win_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce compaction audit: within each (user, event_type)
    stream, an event is kept only if it is the first or arrived more
    than 10 minutes after the previous same-type event — the alert/
    notification suppression rule, here measured as a keep-ratio per
    type (how much raw event volume a debounced pipeline would drop).

    One (user_id, event_type) window exchange; the verdict is a lag
    comparison in exact integer microseconds; the report aggregate
    collapses to |types| rows. At scale the debounced WRITE path is
    the same plan with `filter(kept = 1)` instead of the ratio agg."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    d = ev.withColumn(
        "kept", F.when(gap.isNull() | (gap > 600000000), 1).otherwise(0)
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum("kept").alias("kept_n"),
        (F.sum("kept").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "keep_ratio"
        ),
    )


@register(
    "ml_feature_hash_bucket",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    hashed AS (
      SELECT substr(md5(token), 1, 2) AS bucket, token
      FROM tok WHERE token <> ''
    )
    SELECT bucket,
           count(*) AS n_tokens,
           count(DISTINCT token) AS n_terms
    FROM hashed GROUP BY bucket
    """,
)
def ml_feature_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (hashing-trick) bucket census: every corpus
    token is mapped to one of 256 buckets by a content hash, and the
    per-bucket load (token occurrences) and collision width (distinct
    terms sharing the bucket) are reported — the dimensionality-
    reduction primitive behind HashingTF-style featurization, made
    engine-portable by using md5 (the cheap murmur used by
    `F.hash()` is not cross-engine stable, same reasoning as
    [[sample_hash_deterministic]]).

    Scale: explode is map-side; the shuffle carries (bucket, token)
    pairs only for the distinct-count, and the output is a fixed 256
    rows at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    hashed = tok.select(F.substring(F.md5("token"), 1, 2).alias("bucket"), "token")
    return hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("token").alias("n_terms"),
    )
