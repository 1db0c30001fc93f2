"""Analytics extensions round 2 — market-basket, SCD2 history, entropy,
array set algebra, stratified sampling, inter-arrival timing and IDF
(SURVEY.md §2 B11 continuation).

Like everything in `queries/`, these are EXT operators (the reference's
only workload is the CitiesCount frequency count, `CitiesCountJob.py:18-23`);
they generalize its filter→project→reduce pipeline to the shapes a
corpus/behavioral pipeline needs at 100 TB.

Cross-engine determinism notes specific to this module:

- **Natural logs** (entropy, IDF): Spark's `ln` (Java Math.log) and
  DuckDB's `ln` (libm) are both ≤1 ulp from the true value but not
  guaranteed bit-identical. Every ln-derived output is rounded to 6
  decimals — a 1-ulp (~1e-16 relative) discrepancy cannot flip a
  6-decimal rounding except within ~1e-16 of a half-way point, which
  the irrational inputs here never hit.
- **Timestamps difference** is taken in integer microseconds
  (`unix_micros`) and divided once — exact on both engines.
- **Sampling** is content-hash based (md5 of the unique key), never
  `df.sample()` — reproducible regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "join_basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 50
    """,
)
def join_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 50 part pairs most often bought
    in the same order. The self-join is keyed on l_orderkey with the
    `part_a < part_b` residual, so the blow-up is bounded by
    (lines-per-order choose 2) per order — ~15 pairs for 6-line orders,
    independent of table size — and the DISTINCT pre-pass collapses
    repeat lines before pairing. Both join sides share one exchange on
    l_orderkey (self-join of the same deduplicated frame); top-50 via
    TakeOrderedAndProject with full key tiebreak."""
    items = (
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, (a.ok == b.ok2) & (a.part_a < b.part_b))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


@register(
    "win_scd2_intervals",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY CAST(ts AS TIMESTAMP), event_id)
                 AS prev_type
        FROM events
      )
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
           epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           )) AS valid_to_us,
           lead(CAST(ts AS TIMESTAMP)) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) IS NULL AS is_current
    FROM changes
    """,
)
def win_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: compact each user's event-type stream
    into [valid_from, valid_to) intervals — one row per *state change*,
    open-ended on the latest. Two window passes over the SAME
    (user_id)x(ts, event_id) sort: lag to detect changes, lead on the
    compacted rows to close intervals; Catalyst plans a single exchange
    + sort for the first and the compaction typically leaves few enough
    rows that the second sort is cheap. This is the dimension-history
    primitive behind `merge_upsert_cdc`'s source side."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", "ts", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "beh_user_entropy",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, count(*) AS n_t
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(sum(n_t) AS BIGINT) AS n_events,
           round(ln(CAST(sum(n_t) AS DOUBLE))
                 - sum(CAST(n_t AS DOUBLE) * ln(CAST(n_t AS DOUBLE)))
                   / CAST(sum(n_t) AS DOUBLE),
                 6) AS entropy_nats
    FROM per_type
    GROUP BY user_id
    """,
)
def beh_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix — the
    "behavioral diversity" feature (0 = single-type user). Uses the
    algebraic identity H = ln(n) - (1/n)·Σ n_t·ln(n_t) so entropy
    falls out of ONE two-level aggregation (no per-row p·ln p
    materialization, no join back for totals); both group-bys hash on
    user_id so the second reuses the first's partitioning. ln outputs
    rounded to 6 decimals (see module docstring)."""
    e = load(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n_t"))
    n = F.sum("n_t").cast("double")
    return per_type.groupBy("user_id").agg(
        F.sum("n_t").cast("long").alias("n_events"),
        F.round(
            F.log(n) - F.sum(F.col("n_t").cast("double") * F.log(F.col("n_t").cast("double"))) / n,
            6,
        ).alias("entropy_nats"),
    )


@register(
    "fn_array_setops",
    oracle="""
    SELECT vec_id,
           coalesce(array_to_string(
             list_sort(list_distinct(list_cat(a, b))), ','), '') AS arr_union,
           coalesce(array_to_string(
             list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))),
             ','), '') AS arr_intersect,
           coalesce(array_to_string(
             list_sort(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))),
             ','), '') AS arr_except,
           len(list_distinct(list_cat(a, b))) AS n_union
    FROM (
      SELECT vec_id,
             range(vec_id % 7, vec_id % 7 + 5) AS a,
             range(vec_id % 3, vec_id % 3 + 5) AS b
      FROM embeddings
    )
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union / intersect / except) as JVM-side
    built-ins — the set-feature primitive for tag lists and shingle
    sets that must never fall back to Python at 100 TB. Spark's
    array_union/intersect/except already carry set semantics; outputs
    are array_sort-ed (engines order set results differently) and
    serialized to canonical comma-joined strings — the only stable,
    hashable cross-engine representation. Inputs are deterministic
    integer ranges derived from the row key."""
    e = load(spark, sf_dir, "embeddings")
    a = F.sequence(F.col("vec_id") % 7, F.col("vec_id") % 7 + 4)
    b = F.sequence(F.col("vec_id") % 3, F.col("vec_id") % 3 + 4)

    def canon(arr):
        return F.array_join(
            F.transform(F.array_sort(arr), lambda x: x.cast("string")), ","
        )

    return e.select(
        "vec_id",
        canon(F.array_union(a, b)).alias("arr_union"),
        canon(F.array_intersect(a, b)).alias("arr_intersect"),
        canon(F.array_except(a, b)).alias("arr_except"),
        F.size(F.array_union(a, b)).cast("long").alias("n_union"),
    )


@register(
    "sample_stratified_topn",
    oracle="""
    SELECT event_type, event_id, user_id
    FROM (
      SELECT event_type, event_id, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR))
             ) AS rn
      FROM events
    )
    WHERE rn <= 100
    """,
)
def sample_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: exactly 100 rows per
    event_type stratum, chosen by md5 order of the unique key — the
    balanced-eval-set carve that (unlike `df.sample`) is reproducible
    on any engine/partitioning and can't under-fill rare strata.
    One shuffle on the stratum key; the rank window never sees more
    than a stratum per task, and at 100 TB a pre-filter on a hash
    prefix (as in `sample_hash_deterministic`) would bound the sort
    input before ranking."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string"))
    )
    return (
        e.select("event_type", "event_id", "user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .drop("rn")
    )


@register(
    "beh_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ) AS gap_us
      FROM events
    )
    SELECT event_type,
           count(*) AS n_gaps,
           CAST(sum(gap_us) AS DOUBLE) / 1000000.0 / count(*) AS avg_gap_s,
           CAST(max(gap_us) AS DOUBLE) / 1000000.0 AS max_gap_s,
           CAST(min(gap_us) AS DOUBLE) / 1000000.0 AS min_gap_s
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def beh_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival timing per event type: how long after a user's
    previous event (of any type) does each type arrive. Gap taken in
    exact integer microseconds via one lag window on the (user_id)
    partitioning, then a global per-type aggregate — window and agg
    keys differ so this costs two shuffles, the second on a 5-row
    domain. The sum/count division happens once per output row on
    exact integers (order-independent)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        (F.sum("gap_us").cast("double") / 1e6 / F.count("*")).alias("avg_gap_s"),
        (F.max("gap_us").cast("double") / 1e6).alias("max_gap_s"),
        (F.min("gap_us").cast("double") / 1e6).alias("min_gap_s"),
    )


@register(
    "text_idf_terms",
    oracle="""
    WITH df AS (
      SELECT token, count(DISTINCT doc_id) AS doc_freq
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
      )
      WHERE token <> ''
      GROUP BY token
    )
    SELECT token, doc_freq,
           round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
                    / CAST(doc_freq AS DOUBLE)), 6) AS idf
    FROM df
    ORDER BY doc_freq DESC, token
    LIMIT 30
    """,
)
def text_idf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus IDF table: document frequency and inverse document
    frequency for the 30 most common tokens — the weighting half of
    TF-IDF retrieval. Tokens explode once; (doc_id, token) pairs
    dedup map-side inside the distinct-count aggregate; the corpus
    size N joins in as a broadcast 1-row scalar, NOT a collect() —
    the driver never sees data. ln rounded to 6 decimals (module
    docstring)."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    df_tab = tokens.groupBy("token").agg(
        F.count_distinct("doc_id").alias("doc_freq")
    )
    n_docs = d.agg(F.count("*").cast("double").alias("n_docs"))
    return (
        df_tab.crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "doc_freq",
            F.round(
                F.log(F.col("n_docs") / F.col("doc_freq").cast("double")), 6
            ).alias("idf"),
        )
        .orderBy(F.col("doc_freq").desc(), "token")
        .limit(30)
    )


@register(
    "reshape_pivot_api",
    oracle="""
    SELECT user_id,
           coalesce(count(*) FILTER (WHERE event_type = 'click'), 0) AS click,
           coalesce(count(*) FILTER (WHERE event_type = 'error'), 0) AS error,
           coalesce(count(*) FILTER (WHERE event_type = 'purchase'), 0)
               AS purchase,
           coalesce(count(*) FILTER (WHERE event_type = 'signup'), 0) AS signup,
           coalesce(count(*) FILTER (WHERE event_type = 'view'), 0) AS view
    FROM events
    GROUP BY user_id
    """,
)
def reshape_pivot_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame `.pivot()` API path (vs `agg_pivot_events`' manual
    count_if rewrite). The value list is passed EXPLICITLY — omitting
    it makes Spark run a blocking distinct scan to discover columns,
    a hidden extra job you never want against a 100 TB fact. With the
    list given, this plans exactly like the manual rewrite: one
    shuffle, PivotFirst aggregates. Absent combinations yield null
    counts, coalesced to 0 to match SQL count semantics."""
    e = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = e.groupBy("user_id").pivot("event_type", types).count()
    for t in types:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)))
    return out


@register(
    "sql_recursive_calendar",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '2001-08-01'
    )
    SELECT CAST(CAST(m AS DATE) AS VARCHAR) AS month_start,
           coalesce(o.n_orders, 0) AS n_orders
    FROM months
    LEFT JOIN (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m2,
             count(*) AS n_orders
      FROM orders GROUP BY m2
    ) o ON CAST(months.m AS DATE) = CAST(o.m2 AS DATE)
    """,
)
def sql_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (a Spark 4 SQL capability the reference era
    lacked entirely): generate an 80-month calendar spine by recursion,
    then left-join monthly order counts so empty months surface as
    explicit zeros — the gap-free time-series scaffold reports need.
    The recursion runs on the driver-side plan (80 iterations of a
    1-row frame, negligible); the fact aggregates once and joins
    broadcast-wise to the tiny spine."""
    from apache_spark_irs_form_990_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months WHERE m < DATE '2001-08-01'
        )
        SELECT CAST(m AS STRING) AS month_start,
               coalesce(o.n_orders, CAST(0 AS BIGINT)) AS n_orders
        FROM months
        LEFT JOIN (
          SELECT to_date(date_trunc('month', o_orderdate)) AS m2,
                 count(*) AS n_orders
          FROM orders GROUP BY m2
        ) o ON months.m = o.m2
        """
    )


@register(
    "beh_power_users",
    oracle="""
    WITH per_user AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    ),
    thresh AS (
      SELECT quantile_cont(CAST(n_events AS DOUBLE), 0.9) AS p90 FROM per_user
    )
    SELECT u.user_id, u.n_events
    FROM per_user u, thresh
    WHERE CAST(u.n_events AS DOUBLE) >= thresh.p90
    """,
)
def beh_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user carve: users at or above the 90th percentile of
    event volume. The percentile is computed over the ALREADY
    aggregated per-user counts (tiny) and broadcast back as a 1-row
    threshold — never a second pass over raw events. Exact
    PERCENTILE_CONT on integer counts interpolates identically in both
    engines (position (n-1)p, exact binary fraction 0.9... is not an
    exact fraction, but both engines compute the same double)."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("n_events"))
    thresh = per_user.agg(
        F.expr("percentile(CAST(n_events AS DOUBLE), 0.9)").alias("p90")
    )
    return (
        per_user.crossJoin(F.broadcast(thresh))
        .filter(F.col("n_events").cast("double") >= F.col("p90"))
        .select("user_id", "n_events")
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH c2 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_nationkey END AS nk
      FROM customer
    ),
    n2 AS (
      SELECT CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey END AS nk,
             n_name
      FROM nation
    )
    SELECT coalesce(n2.n_name, '<null-key>') AS n_name,
           count(*) AS n_cust
    FROM c2 JOIN n2 ON c2.nk IS NOT DISTINCT FROM n2.nk
    GROUP BY n_name
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the semantics
    you need when a dimension models 'unknown' as a real bucket.
    Nulls are injected deterministically on both sides; the plan is
    still a hash join (null-safe equality is hashable: null gets its
    own hash bucket), so scale behavior matches a plain equi-join."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 97 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    n = load(spark, sf_dir, "nation").select(
        F.when(F.col("n_nationkey") == 0, None)
        .otherwise(F.col("n_nationkey"))
        .alias("nk2"),
        "n_name",
    )
    return (
        c.join(F.broadcast(n), c.nk.eqNullSafe(F.col("nk2")))
        .groupBy(F.coalesce("n_name", F.lit("<null-key>")).alias("n_name"))
        .agg(F.count("*").alias("n_cust"))
    )


@register(
    "ts_resample_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             count(*) AS n_events,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS day_value
      FROM events GROUP BY user_id, day
    ),
    bounds AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                           AS DATE) AS day
      FROM bounds
    )
    SELECT s.user_id, CAST(s.day AS VARCHAR) AS day,
           coalesce(d.n_events, 0) AS n_events,
           coalesce(d.day_value, 0.0) AS day_value
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def ts_resample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resampling with gap fill: every user gets a dense calendar
    row for every day in their own [first, last] activity range, with
    explicit zeros where nothing happened — the step that turns an
    event log into a model-ready regular time series. The spine comes
    from exploding a per-user `sequence(d0, d1)` (rows ∝ user-days, no
    cross join against a global calendar), and the left join back to
    the daily aggregate reuses the same (user_id) partitioning. Value
    sums are exact cents."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias("day_value"),
        )
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
        )
    )


@register(
    "ts_ema_per_user",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           list_reduce(list(CAST(value AS DOUBLE)
                            ORDER BY CAST(ts AS TIMESTAMP), event_id),
                       (acc, x) -> 0.125 * x + 0.875 * acc) AS ema
    FROM events
    GROUP BY user_id
    """,
)
def ts_ema_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average per user — the recursive smoother
    (ema_t = a*x_t + (1-a)*ema_{t-1}) that standard window frames
    CANNOT express (each value depends on the whole prefix). Spark's
    higher-order `aggregate` folds the user's time-ordered value array
    instead: collect → array_sort on (ts, event_id) struct → fold,
    seeded with the first value exactly like DuckDB's list_reduce.
    alpha = 0.125 is an exact binary fraction, so the fold is the same
    IEEE operation sequence in both engines — bit-identical output
    with NO rounding. Per-key history must fit in one row's array
    (fine for bounded per-entity histories; for unbounded streams use
    `applyInPandasWithState`, see stream_custom_state)."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", F.col("value").cast("double").alias("v")))
            ),
            lambda s: s.getField("v"),
        ).alias("vals"),
    )
    ema = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(0.125) * x + F.lit(0.875) * acc,
    )
    return per_user.select("user_id", "n_events", ema.alias("ema"))
