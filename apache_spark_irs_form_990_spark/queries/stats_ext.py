"""Statistical / time-series extensions — distribution shape (geometric,
harmonic, skewness, kurtosis), rolling medians, interval merging,
normalized Markov transitions, session statistics, month-over-month
deltas and corpus PMI (SURVEY.md §2 B11 continuation).

All EXT relative to the reference (its only aggregate is the
CitiesCount frequency sum, `IRSSpark.py:181` + `CitiesCountJob.py:14-16`);
these generalize that partial+final aggregation to the moment-based
and windowed statistics a 100 TB warehouse serves daily.

Cross-engine determinism, same conventions as the sibling modules:

- **Integer moments**: Σq, Σq², Σq³, Σq⁴ of the integer-valued
  `l_quantity` are exact BIGINTs; skewness/kurtosis come out of one
  closed-form double expression written with IDENTICAL association
  order on both engines (IEEE +,-,*,/ and sqrt are correctly rounded,
  so identical inputs + identical tree = identical bits).
- **ln-derived outputs** (geometric mean, PMI) are rounded to 6
  decimals; per-row `round(ln(q)*1e6)` integerization is used where a
  sum must be order-independent (verified: no ln(q)*1e6 for q in 2..50
  lands within 0.01 of a rounding half-way point, >> the 1-ulp
  cross-engine ln discrepancy).
- **Ratios of exact integers** (probabilities, ratios, percent
  changes) are emitted as one IEEE division — correctly rounded,
  hence bit-identical — never rounded-then-compared.
- **Ordering keys** for top-k over derived doubles are built from the
  same exact-integer division chain on both sides, with full-column
  tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "agg_geo_harmonic_mean",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(exp(CAST(sum(CAST(round(ln(l_quantity) * 1000000) AS BIGINT))
                          AS DOUBLE) / 1000000.0 / count(*)), 6) AS geo_mean_qty,
           round(count(*) / (CAST(sum(CAST(round(1000000000.0 / l_quantity)
                                           AS BIGINT)) AS DOUBLE)
                             / 1000000000.0), 6) AS harm_mean_qty
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_returnflag
    """,
)
def agg_geo_harmonic_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric and harmonic means of order quantity per return flag.
    Neither is a Spark built-in; both reduce to ordinary sums under a
    transform — exp(avg(ln q)) and n/Σ(1/q) — so they inherit the
    partial+final hash-aggregate plan (one shuffle of 3 longs per
    group, any data size). Per-row ln/reciprocal values are snapped to
    exact integers (micro-nats / nano-units) so the sums are
    order-independent; the final exp/division happens once per group.
    Both means are defined on POSITIVE values only (ln and 1/x blow up
    at zero), so zero-quantity lines are excluded on both engines —
    the textbook domain restriction, found by the relational edge
    sweep (tests/test_edge_relational.py)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    ln_micro = F.round(F.log("l_quantity") * 1000000).cast("long")
    inv_nano = F.round(1000000000.0 / F.col("l_quantity")).cast("long")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(
            F.exp(F.sum(ln_micro).cast("double") / 1000000.0 / n), 6
        ).alias("geo_mean_qty"),
        F.round(
            n / (F.sum(inv_nano).cast("double") / 1000000000.0), 6
        ).alias("harm_mean_qty"),
    )


@register(
    "agg_skew_kurt_exact",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS dn,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS d1,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS DOUBLE) AS d2,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS d3,
             CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS DOUBLE) AS d4
      FROM lineitem
      GROUP BY l_returnflag
      HAVING count(*) >= 2
    )
    SELECT l_returnflag,
           round((d2 - d1 * d1 / dn) / dn, 6) AS var_pop,
           round((d3 - 3.0 * d2 * d1 / dn + 2.0 * d1 * d1 * d1 / (dn * dn))
                 / dn
                 / (((d2 - d1 * d1 / dn) / dn)
                    * sqrt((d2 - d1 * d1 / dn) / dn)), 6) AS skewness,
           round((d4 - 4.0 * d3 * d1 / dn + 6.0 * d2 * d1 * d1 / (dn * dn)
                  - 3.0 * d1 * d1 * d1 * d1 / (dn * dn * dn))
                 / dn
                 / (((d2 - d1 * d1 / dn) / dn)
                    * ((d2 - d1 * d1 / dn) / dn)) - 3.0, 6) AS kurtosis_excess
    FROM m
    """,
)
def agg_skew_kurt_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per return flag from the
    first four EXACT integer moments (l_quantity is integer-valued, so
    q..q⁴ sums are exact BIGINTs; Σq⁴ ≤ 6.25e6·n stays under 2^63 past
    SF 1000). One aggregation pass — 5 longs of state per group — then
    a closed-form double expression evaluated identically on both
    engines (same association order; sqrt for the 1.5 power). The
    moment-sketch alternative (`skewness()`/`kurtosis()` built-ins)
    is order-dependent in doubles and cannot be oracle-hashed."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("dn"),
        F.sum(q).cast("double").alias("d1"),
        F.sum(q * q).cast("double").alias("d2"),
        F.sum(q * q * q).cast("double").alias("d3"),
        F.sum(q * q * q * q).cast("double").alias("d4"),
    ).filter(F.col("dn") >= 2)
    dn, d1, d2, d3, d4 = (F.col(c) for c in ("dn", "d1", "d2", "d3", "d4"))
    var = (d2 - d1 * d1 / dn) / dn
    skew = (d3 - 3.0 * d2 * d1 / dn + 2.0 * d1 * d1 * d1 / (dn * dn)) / dn / (
        var * F.sqrt(var)
    )
    kurt = (
        d4
        - 4.0 * d3 * d1 / dn
        + 6.0 * d2 * d1 * d1 / (dn * dn)
        - 3.0 * d1 * d1 * d1 * d1 / (dn * dn * dn)
    ) / dn / (var * var) - 3.0
    return m.select(
        "l_returnflag",
        F.round(var, 6).alias("var_pop"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_excess"),
    )


@register(
    "win_rolling_median",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             CAST(ts AS TIMESTAMP) AS tts
      FROM events
    ),
    framed AS (
      SELECT event_id, user_id,
             list(v_cents) OVER (PARTITION BY user_id ORDER BY tts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
               AS frame
      FROM c
    )
    SELECT event_id, user_id,
           CAST(list_sort(frame)[(len(frame) + 1) // 2] AS DOUBLE) / 100.0
             AS rolling_median
    FROM framed
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-row median of event value per user. Median is not a
    frame-capable window aggregate in Spark, so the frame is collected
    as a (≤5-element) array, sorted, and indexed at ceil(n/2) — the
    lower median, exact, no interpolation. State per row is bounded by
    the frame length (5 longs), so this holds at any table size; the
    sort is per-array (k log k, k=5), not a shuffle. Values are
    snapped to integer cents so sort order and the picked element are
    engine-independent."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    frame = F.sort_array(F.collect_list(cents("value")).over(w))
    med = F.element_at(frame, ((F.size(frame) + 1) / 2).cast("int"))
    return e.select(
        "event_id",
        "user_id",
        (med.cast("double") / 100.0).alias("rolling_median"),
    )


@register(
    "win_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s,
             epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) IS NULL
                    OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island,
             event_id
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    )
    SELECT user_id, min(s) AS start_us, max(e) AS end_us,
           count(*) AS n_events
    FROM islands
    GROUP BY user_id, island
    """,
)
def win_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merge: each event opens a 30-minute
    activity interval; intervals per user that overlap are coalesced
    into maximal islands (the interval-union primitive behind uptime /
    coverage metrics). Classic sweep: running max of interval ends
    over the start-ordered stream flags island breaks, a running sum
    numbers them, one aggregate closes them — all three windows share
    a single (user_id)×(start) exchange+sort, and per-row state is one
    long, so the sweep streams at any scale."""
    e = load(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 1800000000).alias("e"),
    )
    order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_e = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("start_us"),
        F.max("e").alias("end_us"),
        F.count("*").alias("n_events"),
    ).drop("island")


@register(
    "beh_next_event_prob",
    oracle="""
    WITH t AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id)
                 AS prev_type
        FROM events
      )
      WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p_next
    FROM t
    """,
)
def beh_next_event_prob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized first-order Markov model: P(next event type | previous
    type), the row-stochastic form of `beh_transition_matrix`. The
    normalizing row total comes from an unordered window over the
    (#types²)-row count table — no second shuffle of the raw events,
    no join-back. Probability is one IEEE division of exact counts,
    so it hash-matches without rounding."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    row_total = F.sum("n").over(Window.partitionBy("prev_type"))
    return counts.withColumn(
        "p_next", F.col("n").cast("double") / row_total
    )


@register(
    "beh_session_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, t_us,
             CASE WHEN prev_us IS NULL OR t_us - prev_us > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM seq
    ),
    numbered AS (
      SELECT user_id, t_us,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY t_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_no,
             max(t_us) - min(t_us) AS dur_us,
             count(*) AS n_events
      FROM numbered
      GROUP BY user_id, session_no
    )
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(sum(dur_us) AS DOUBLE) / count(*) AS avg_session_us,
           CAST(sum(n_events) AS DOUBLE) / count(*) AS avg_events_per_session
    FROM sessions
    GROUP BY user_id
    """,
)
def beh_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session statistics on top of 30-minute-gap
    sessionization (the second-level rollup `win_sessionize_batch`
    stops short of): session count, mean duration, mean events per
    session. The lag window, the running session counter, the
    per-session aggregate AND the per-user aggregate all key on
    user_id — Catalyst reuses ONE exchange for the entire pipeline,
    so the whole query costs a single shuffle of the events table.
    Durations are integer microseconds; the means are single exact-int
    divisions."""
    e = load(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    seq = e.select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    ).withColumn("prev_us", F.lag("t_us").over(order))
    flagged = seq.withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("t_us") - F.col("prev_us") > 1800000000),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = numbered.groupBy("user_id", "session_no").agg(
        (F.max("t_us") - F.min("t_us")).alias("dur_us"),
        F.count("*").alias("n_events"),
    )
    n_sess = F.count(F.lit(1))
    return sessions.groupBy("user_id").agg(
        n_sess.alias("n_sessions"),
        (F.sum("dur_us").cast("double") / n_sess).alias("avg_session_us"),
        (F.sum("n_events").cast("double") / n_sess).alias(
            "avg_events_per_session"
        ),
    )


@register(
    "text_hapax_ratio",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tc AS (
      SELECT source, token, count(*) AS c
      FROM tok GROUP BY source, token
    )
    SELECT source,
           count(*) AS vocab_size,
           count(*) FILTER (WHERE c = 1) AS hapax_count,
           CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE) / count(*)
             AS hapax_ratio
    FROM tc
    GROUP BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness per source: the fraction of the vocabulary
    occurring exactly once (hapax legomena) — a standard
    corpus-quality / diversity signal (high hapax ratio ⇒ long-tail
    vocabulary; low ⇒ template/boilerplate text). Token counts partial
    +final aggregate on (source, token) before the per-source rollup,
    so the exploded token stream collapses map-side and only distinct
    tokens shuffle. The ratio is one exact-integer division."""
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    vocab = F.count(F.lit(1))
    hapax = F.count_if(F.col("c") == 1)
    return tc.groupBy("source").agg(
        vocab.alias("vocab_size"),
        hapax.alias("hapax_count"),
        (hapax.cast("double") / vocab).alias("hapax_ratio"),
    )


@register(
    "text_pmi_bigrams",
    oracle="""
    WITH toks AS (
      SELECT string_split(text, ' ') AS ts FROM documents
    ),
    uni AS (
      SELECT unnest(ts) AS w FROM toks
    ),
    uc AS (
      SELECT w, count(*) AS c FROM uni GROUP BY w
    ),
    totals AS (
      SELECT sum(c) AS n_tok FROM uc
    ),
    bg AS (
      SELECT z[1] AS w1, z[2] AS w2
      FROM (SELECT unnest(list_zip(ts[1:len(ts)-1], ts[2:len(ts)])) AS z
            FROM toks)
    ),
    bc AS (
      SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2
    ),
    btotals AS (
      SELECT sum(c_ab) AS n_bg FROM bc
    )
    SELECT w1, w2, c_ab,
           round(ln(CAST(c_ab AS DOUBLE)) - ln(CAST(n_bg AS DOUBLE))
                 + ln(CAST(n_tok AS DOUBLE)) - ln(CAST(a.c AS DOUBLE))
                 + ln(CAST(n_tok AS DOUBLE)) - ln(CAST(b.c AS DOUBLE)), 6)
             AS pmi
    FROM bc
    JOIN uc a ON bc.w1 = a.w
    JOIN uc b ON bc.w2 = b.w
    CROSS JOIN totals CROSS JOIN btotals
    WHERE c_ab >= 5
    ORDER BY CAST(c_ab AS DOUBLE) / n_bg / a.c * n_tok / b.c * n_tok DESC,
             w1, w2
    LIMIT 40
    """,
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations: top-40 adjacent token pairs by pointwise
    mutual information, PMI = ln(p(a,b) / (p(a)·p(b))), support ≥ 5.
    Bigrams come from a per-document zip of the token array with its
    own 1-shifted slice (no self-join); unigram and bigram counts are
    two hash aggregates off the same scan; the two count-table joins
    are broadcasts (vocabulary ≪ corpus). The ORDER BY key is the raw
    probability ratio built as the SAME exact-int division chain on
    both engines (bit-identical), with the ln-sum only in the rounded
    display column — so ranking never depends on libm."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("ts"))
    uc = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    bg = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, F.size("ts") - 1),
                F.expr("slice(ts, 2, size(ts) - 1)"),
            )
        ).alias("z")
    ).select(F.col("z.0").alias("w1"), F.col("z.1").alias("w2"))
    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    n_tok = uc.agg(F.sum("c").alias("n_tok"))
    n_bg = bc.agg(F.sum("c_ab").alias("n_bg"))
    a = uc.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    b = uc.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    joined = (
        bc.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_bg))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    pmi = F.round(
        F.log(dbl("c_ab"))
        - F.log(dbl("n_bg"))
        + F.log(dbl("n_tok"))
        - F.log(dbl("c_a"))
        + F.log(dbl("n_tok"))
        - F.log(dbl("c_b")),
        6,
    )
    rank_key = (
        dbl("c_ab") / F.col("n_bg") / F.col("c_a") * F.col("n_tok")
        / F.col("c_b") * F.col("n_tok")
    )
    return (
        joined.select("w1", "w2", "c_ab", pmi.alias("pmi"), rank_key.alias("_k"))
        .orderBy(F.col("_k").desc(), "w1", "w2")
        .limit(40)
        .drop("_k")
    )


@register(
    "win_percent_change_mom",
    oracle=f"""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', CAST(l_shipdate AS TIMESTAMP)),
                      '%Y-%m') AS month,
             sum({sql_cents('l_extendedprice')} * (100 - {sql_cents('l_discount')}))
               AS rev_units
      FROM lineitem
      GROUP BY month
    )
    SELECT month,
           CAST(rev_units AS DOUBLE) / 10000.0 AS revenue,
           CAST(rev_units - lag(rev_units) OVER (ORDER BY month) AS DOUBLE)
             / lag(rev_units) OVER (ORDER BY month) AS pct_change
    FROM monthly
    """,
)
def win_percent_change_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly revenue (exact 1e-4
    integer units) plus its relative change against the previous
    month. The unpartitioned lag window runs AFTER aggregation — on
    #months rows, not the fact table — so the single-partition window
    is a constant-size report stage, never a scale hazard. The percent
    change is one division of exact integer deltas."""
    li = load(spark, sf_dir, "lineitem")
    rev_units = F.sum(
        cents("l_extendedprice") * (100 - cents("l_discount"))
    ).alias("rev_units")
    monthly = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(rev_units)
    prev = F.lag("rev_units").over(Window.orderBy("month"))
    return monthly.select(
        "month",
        (F.col("rev_units").cast("double") / 10000.0).alias("revenue"),
        ((F.col("rev_units") - prev).cast("double") / prev).alias("pct_change"),
    )
