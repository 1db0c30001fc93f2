"""Pattern-matching, sketch-style distinct counting, decay scoring and
time-weighted aggregation (SURVEY.md §2 B11 continuation).

All EXT relative to the reference. Highlights of the scale stances:

- `agg_bitmap_distinct` is the exact-distinct pattern that actually
  scales: per-bucket roaring-style bitmaps OR-merge associatively, so
  the shuffle carries fixed-size bitmap blobs instead of raw ids
  (COUNT(DISTINCT) via Expand replays every id through the exchange).
- `beh_sequence_pattern` is MATCH_RECOGNIZE-lite: per-key ordered
  event strings + regex, the standard poor-man's sequence engine on
  engines without a native one.
- step-decay weights are integer halvings (`1e6 >> (age/30)`), not
  `pow(0.5, age/30)` — bit-shift weights are exact, order-independent
  and immune to libm; both engines cap the shift explicitly because
  Java shift amounts wrap at 64 (`x >> 80` ≡ `x >> 16` on the JVM —
  a silent wrong answer, not an error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via bitmap aggregation —
    Spark 3.5+'s `bitmap_bucket_number` / `bitmap_construct_agg` /
    `bitmap_count` trio. Ids land in fixed 32k-bit buckets whose
    bitmaps OR-merge associatively, so partial aggregation is perfect
    (each executor ships at most one 4 KB blob per (group, bucket),
    independent of row count) and the final count is a popcount sum.
    This is the plan to reach for when COUNT(DISTINCT)'s Expand
    shuffle becomes the bottleneck on dense-integer keys at 100 TB.
    The oracle is the plain exact COUNT(DISTINCT) — same answer, two
    plans."""
    e = load(spark, sf_dir, "events")
    per_bucket = e.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct_users")
    )


@register(
    "beh_sequence_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CASE WHEN regexp_matches(s, 's.*p') THEN 1 ELSE 0 END
             AS signup_then_purchase,
           CASE WHEN regexp_matches(s, 'ee') THEN 1 ELSE 0 END
             AS double_error,
           substr(s, 1, 10) AS seq_prefix
    FROM seq
    """,
)
def beh_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: each user's event history collapses to an
    ordered initial-letter string (event types have distinct initials
    here; map through a CASE for real data), and sequence predicates
    become plain regexes — "signed up then later purchased" is
    `s.*p`, "two consecutive errors" is `ee`. The ordered string
    builds via collect-sort-transform (struct sort on (ts, event_id)
    makes the order total and engine-identical); state per user is the
    event string itself, bounded by history length. The regex pass is
    codegen'd string matching, no second shuffle."""
    e = load(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts", "event_id", F.substring("event_type", 1, 1).alias("ini")
                        )
                    )
                ),
                lambda x: x["ini"],
            ),
            "",
        ).alias("s"),
        F.count("*").cast("long").alias("n_events"),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.when(F.col("s").rlike("s.*p"), 1).otherwise(0).alias(
            "signup_then_purchase"
        ),
        F.when(F.col("s").rlike("ee"), 1).otherwise(0).alias("double_error"),
        F.substring("s", 1, 10).alias("seq_prefix"),
    )


@register(
    "beh_decay_engagement",
    oracle="""
    WITH anchor AS (
      SELECT max(CAST(ts AS TIMESTAMP)) AS max_ts FROM events
    ),
    w AS (
      SELECT user_id,
             CAST(date_diff('day', CAST(ts AS TIMESTAMP), max_ts) AS BIGINT)
               // 30 AS s
      FROM events, anchor
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN s >= 20 THEN 0
                         ELSE 1000000 >> s END) AS BIGINT) AS score_micro,
           CAST(sum(CASE WHEN s >= 20 THEN 0
                         ELSE 1000000 >> s END) AS DOUBLE) / 1000000.0
             AS score
    FROM w GROUP BY user_id
    """,
)
def beh_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement score: each event contributes a
    weight that halves every 30 days of age (anchored at the corpus
    max timestamp, so the query is deterministic, not wall-clock-
    dependent). Weights are integer bit-shifts `1e6 >> (age/30)` —
    exact, order-independent partial+final sums — with the shift
    explicitly capped at 20 (1e6 < 2^20) because JVM shift amounts
    wrap at 64: `1000000 >> 80` silently equals `1000000 >> 16`.
    The anchor is a 1-row broadcast; one aggregation pass total."""
    e = load(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("max_ts"))
    aged = e.crossJoin(F.broadcast(anchor)).withColumn(
        "s", F.expr("CAST(datediff(max_ts, ts) AS BIGINT) DIV 30")
    )
    weight = F.expr(
        "CASE WHEN s >= 20 THEN CAST(0 AS BIGINT)"
        " ELSE shiftright(CAST(1000000 AS BIGINT), CAST(s AS INT)) END"
    )
    return (
        aged
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(weight).cast("long").alias("score_micro"),
            (F.sum(weight).cast("double") / 1000000.0).alias("score"),
        )
    )


@register(
    "fn_fixed_width_roundtrip",
    oracle=f"""
    WITH enc AS (
      SELECT o_orderkey, {sql_cents('o_totalprice')} AS p_cents,
             o_orderpriority, CAST(o_orderdate AS VARCHAR) AS d,
             concat(
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0'),
               lpad(CAST({sql_cents('o_totalprice')} AS VARCHAR), 14, '0'),
               rpad(o_orderpriority, 16, ' '),
               CAST(o_orderdate AS VARCHAR)
             ) AS line
      FROM orders
    ),
    dec AS (
      SELECT *,
             CAST(substr(line, 1, 12) AS BIGINT) AS k2,
             CAST(substr(line, 13, 14) AS BIGINT) AS p2,
             rtrim(substr(line, 27, 16)) AS prio2,
             substr(line, 43, 10) AS d2
      FROM enc
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE k2 = o_orderkey AND p2 = p_cents
                                 AND prio2 = o_orderpriority AND d2 = d)
                AS BIGINT) AS n_roundtrip_ok,
           CAST(min(length(line)) AS BIGINT) AS min_len,
           CAST(max(length(line)) AS BIGINT) AS max_len,
           min(line) AS first_line
    FROM dec
    """,
)
def fn_fixed_width_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width record codec — the mainframe-interchange format the
    reference's CSV/JSON/XML ingest trio doesn't cover: orders encode
    to 52-char fixed layout (zero-padded key and cents, space-padded
    priority, ISO date), decode back via substr/trim/cast, and the
    audit proves the round trip is lossless for every row (plus
    min/max/first-line to pin the actual encoded bytes into the
    oracle hash). Everything is codegen'd string ops in one map-side
    pass; the final audit is a single aggregate."""
    o = load(spark, sf_dir, "orders")
    p_cents = cents("o_totalprice")
    d = F.col("o_orderdate").cast("string")
    line = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.lpad(p_cents.cast("string"), 14, "0"),
        F.rpad("o_orderpriority", 16, " "),
        d,
    )
    enc = o.select(
        "o_orderkey",
        p_cents.alias("p_cents"),
        "o_orderpriority",
        d.alias("d"),
        line.alias("line"),
    )
    dec = enc.select(
        "*",
        F.substring("line", 1, 12).cast("long").alias("k2"),
        F.substring("line", 13, 14).cast("long").alias("p2"),
        F.rtrim(F.substring("line", 27, 16)).alias("prio2"),
        F.substring("line", 43, 10).alias("d2"),
    )
    ok = (
        (F.col("k2") == F.col("o_orderkey"))
        & (F.col("p2") == F.col("p_cents"))
        & (F.col("prio2") == F.col("o_orderpriority"))
        & (F.col("d2") == F.col("d"))
    )
    return dec.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count_if(ok).cast("long").alias("n_roundtrip_ok"),
        F.min(F.length("line")).cast("long").alias("min_len"),
        F.max(F.length("line")).cast("long").alias("max_len"),
        F.min("line").alias("first_line"),
    )


@register(
    "stats_chi2_cells",
    oracle="""
    WITH o AS (
      SELECT event_type, CAST(user_id % 2 AS BIGINT) AS cohort,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_tot
          FROM o GROUP BY 1),
    c AS (SELECT cohort, CAST(sum(obs) AS BIGINT) AS col_tot
          FROM o GROUP BY 1),
    t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o)
    SELECT o.event_type, o.cohort, obs,
           CAST(row_tot AS DOUBLE) * col_tot / n AS expected,
           CAST((obs * n - row_tot * col_tot)
                * (obs * n - row_tot * col_tot) AS DOUBLE)
             / n / row_tot / col_tot / n AS chi2_term
    FROM o JOIN r USING (event_type) JOIN c USING (cohort) CROSS JOIN t
    """,
)
def stats_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence grid for event type × cohort: observed
    count, expected count and the per-cell χ² contribution, computed
    as `(O·N − r·c)² / (N·r·c·N)` — an all-integer numerator (exact
    under 2^63 through sf0.1; integerize to per-mille shares beyond)
    over one left-associated division chain, so every cell is
    bit-identical with no floating subtraction of near-equal means.
    Margins come from re-aggregating the |types|×2 cell table (three
    tiny broadcasts), not from re-scanning events. Cells are emitted
    as rows — the monitor sums chi2_term and compares against the
    χ²(df) critical value."""
    e = load(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", (F.col("user_id") % 2).cast("long").alias("cohort")
    ).agg(F.count("*").cast("long").alias("obs"))
    r = o.groupBy("event_type").agg(F.sum("obs").cast("long").alias("row_tot"))
    c = o.groupBy("cohort").agg(F.sum("obs").cast("long").alias("col_tot"))
    t = o.agg(F.sum("obs").cast("long").alias("n"))
    cells = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "cohort")
        .crossJoin(F.broadcast(t))
    )
    dev = F.col("obs") * F.col("n") - F.col("row_tot") * F.col("col_tot")
    return cells.select(
        "event_type",
        "cohort",
        "obs",
        (F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")).alias(
            "expected"
        ),
        (
            (dev * dev).cast("double")
            / F.col("n")
            / F.col("row_tot")
            / F.col("col_tot")
            / F.col("n")
        ).alias("chi2_term"),
    )


@register(
    "win_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS v_cents,
             epoch_us(lead(CAST(ts AS TIMESTAMP))
                      OVER (PARTITION BY user_id
                            ORDER BY CAST(ts AS TIMESTAMP), event_id))
               - epoch_us(CAST(ts AS TIMESTAMP)) AS dur_us
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(dur_us) AS BIGINT) AS total_us,
           CAST(sum(v_cents * dur_us) AS DOUBLE)
             / sum(dur_us) / 100.0 AS twap
    FROM seg
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    HAVING sum(dur_us) > 0
    """,
)
def win_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    holds until the next one, so its weight is the segment duration
    from `lead` — the correct average for irregularly-sampled series
    where the plain mean over-weights bursts. Weights and values are
    exact integers (micros × cents; Σ v·dur ~ 1e13·cents per user —
    integer-exact far past this corpus); the lead window and the
    aggregate share one user_id exchange. Final row per user divides
    once."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id",
        cents("value").alias("v_cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias(
            "dur_us"
        ),
    ).filter(F.col("dur_us").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_segments"),
            F.sum("dur_us").cast("long").alias("total_us"),
            F.sum(F.col("v_cents") * F.col("dur_us")).alias("wsum"),
        )
        # a user whose whole observed span is zero (all events at one
        # instant) has no defined TWAP — filter BEFORE dividing, or the
        # division is an ANSI divide-by-zero job failure
        .filter(F.col("total_us") > 0)
        .select(
            "user_id",
            "n_segments",
            "total_us",
            (
                F.col("wsum").cast("double") / F.col("total_us") / 100.0
            ).alias("twap"),
        )
    )
