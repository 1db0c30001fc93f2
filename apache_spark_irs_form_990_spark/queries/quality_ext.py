"""Data-quality audits, drift detection and experimentation stats —
referential-integrity orphan accounting, surrogate-key gap census,
CUSUM change detection, series autocorrelation, two-proportion A/B
z-score and Simpson vocabulary diversity (SURVEY.md §2 B11
continuation).

All EXT relative to the reference, but direct descendants of its
operational-metrics intent: the reference's only quality surface is
the processed/failed accumulator trio (`IRSSpark.py:119-125,156-165`)
— these queries are that idea promoted to first-class relational
audits over the warehouse itself.

Determinism conventions (same as sibling modules): counts and moments
are exact BIGINT sums; every emitted ratio/statistic is a closed-form
chain of IEEE ops over those exact integers written with identical
association order on both engines; no per-row transcendentals feed any
aggregate (the diversity metric is deliberately Simpson — Σc², pure
integers — rather than Shannon, whose per-count ln snapping is
half-boundary-fragile at corpus vocabulary sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import SQL_REVENUE_CENTS
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load

_FK_EDGES = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_oracle() -> str:
    parts = [
        f"""
        SELECT '{rel}' AS relationship,
               (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS child_rows,
               (SELECT CAST(count(*) AS BIGINT) FROM {child} c
                WHERE c.{key} NOT IN (SELECT {pkey} FROM {parent})) AS orphans
        """
        for rel, child, key, parent, pkey in _FK_EDGES
    ]
    return (
        "SELECT relationship, child_rows, orphans, "
        "CAST(orphans AS DOUBLE) / child_rows AS orphan_ratio FROM ("
        + " UNION ALL ".join(parts)
        + ")"
    )


@register("audit_referential_integrity", oracle=_fk_oracle())
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across every edge of the star schema:
    one row per relationship with child cardinality, orphan count and
    orphan ratio. Each edge is a `left_anti` probe of the child key
    against the parent key set — constant-cardinality parents
    (nation/region) broadcast by hint; scaling parents (orders,
    customer, part, supplier) are left to AQE, which broadcasts them
    while small and shuffles once they outgrow the threshold. All
    seven probes are independent
    subplans unioned into one report, so they schedule concurrently.
    A healthy warehouse reports all-zero orphans; the ratio column
    makes regressions thresholdable by a monitor."""
    out = None
    for rel, child, key, parent, pkey in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent)
        parent_keys = p.select(pkey).distinct()
        # Hint only the constant-size dims; customer/part/supplier/orders
        # scale with SF, so a forced broadcast would OOM at warehouse
        # scale — AQE decides for those.
        if parent in ("nation", "region"):
            parent_keys = F.broadcast(parent_keys)
        orphans = (
            c.select(key)
            .join(parent_keys, F.col(key) == F.col(pkey), "left_anti")
            .agg(F.count("*").cast("long").alias("orphans"))
        )
        row = (
            c.agg(F.count("*").cast("long").alias("child_rows"))
            .crossJoin(orphans)
            .select(
                F.lit(rel).alias("relationship"),
                "child_rows",
                "orphans",
                (F.col("orphans").cast("double") / F.col("child_rows")).alias(
                    "orphan_ratio"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "audit_sequence_gaps",
    oracle="""
    WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders
               WHERE o_orderstatus = 'F'),
    g AS (SELECT k, lag(k) OVER (ORDER BY k) AS prev FROM k)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           min(k) AS min_key,
           max(k) AS max_key,
           CAST(count(*) FILTER (WHERE prev IS NOT NULL AND k - prev > 1)
                AS BIGINT) AS n_gaps,
           CAST(coalesce(sum(CASE WHEN prev IS NOT NULL AND k - prev > 1
                                  THEN k - prev - 1 ELSE 0 END), 0)
                AS BIGINT) AS n_missing
    FROM g
    """,
)
def audit_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key gap census over the finished-order keyspace
    (`o_orderstatus = 'F'` — a real subset, so the gap arithmetic is
    exercised): key count, span, number of gaps and total missing
    keys. Computed WITHOUT the lag-over-sorted-keys single-task
    window, via two exact identities on the distinct-key set:
    total missing = span − n_keys (every interior absent key is
    missing exactly once), and n_gaps = (#run starts) − 1, where a
    run start is a key whose predecessor k−1 is absent — one
    self-anti-join on the key (hash-shuffled, scale-safe). Identical
    to the oracle's lag formulation: interior holes only — holes
    outside [min, max] are uncounted by both."""
    k = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    succ = k.select((F.col("k") + 1).alias("k"))
    starts = k.join(succ, "k", "left_anti").agg(
        F.count(F.lit(1)).alias("n_starts")
    )
    base = k.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )
    return base.crossJoin(F.broadcast(starts)).select(
        "n_keys",
        "min_key",
        "max_key",
        F.greatest(F.col("n_starts") - 1, F.lit(0))
        .cast("long")
        .alias("n_gaps"),
        (F.col("max_key") - F.col("min_key") + 1 - F.col("n_keys"))
        .cast("long")
        .alias("n_missing"),
    )


@register(
    "ts_cusum_change",
    oracle="""
    WITH d AS (
      SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')
               AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS tot
          FROM d),
    s AS (SELECT day, x,
                 CAST(sum(n * x - tot) OVER (ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run,
                 n
          FROM d, t)
    SELECT day, x,
           CAST(run - min(run) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cusum_units,
           CAST(run - min(run) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / n AS cusum_excess
    FROM s
    """,
)
def ts_cusum_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detector over daily event volume. The
    textbook recursion S_t = max(0, S_{t-1} + (x_t − μ)) is not
    window-expressible, but its closed form is: the positive CUSUM
    equals the running sum of deviations minus its own running
    minimum. Deviations are kept exact by cross-multiplying away the
    mean — D_t = n·x_t − total — so every windowed quantity is an
    exact BIGINT and only the final display column divides. Both
    windows and the scalar totals share one ordered pass over the
    per-day aggregate (#days rows), never the raw events."""
    e = load(spark, sf_dir, "events")
    d = e.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    t = d.agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("tot")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = d.crossJoin(F.broadcast(t)).withColumn(
        "run", F.sum(F.col("n") * F.col("x") - F.col("tot")).over(w).cast("long")
    )
    excess = (F.col("run") - F.min("run").over(w)).cast("long")
    return s.select(
        "day",
        "x",
        excess.alias("cusum_units"),
        (excess.cast("double") / F.col("n")).alias("cusum_excess"),
    )


@register(
    "ts_autocorr_daily",
    oracle=f"""
    WITH d AS (
      SELECT strftime(date_trunc('day', CAST(l_shipdate AS TIMESTAMP)),
                      '%Y-%m-%d') AS day,
             CAST(sum({SQL_REVENUE_CENTS}) AS BIGINT) // 10000 AS r
      FROM lineitem GROUP BY 1
    ),
    p AS (SELECT r AS x, lag(r) OVER (ORDER BY day) AS y FROM d),
    m AS (SELECT CAST(count(*) AS DOUBLE) AS dn,
                 CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                 CAST(sum(x * y) AS DOUBLE) AS sxy,
                 CAST(sum(x * x) AS DOUBLE) AS sxx,
                 CAST(sum(y * y) AS DOUBLE) AS syy
          FROM p WHERE y IS NOT NULL)
    SELECT CAST(dn AS BIGINT) AS n_pairs,
           round((dn * sxy - sx * sy)
                 / (sqrt(dn * sxx - sx * sx) * sqrt(dn * syy - sy * sy)), 6)
             AS acf1
    FROM m
    """,
)
def ts_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily revenue series — the
    day-over-day persistence signal that decides whether a forecast
    needs an AR term. Daily revenue is the exact 1e-4-unit integer sum
    truncated to whole dollars (`DIV 10000`, deterministic — cent
    units already overflow Σx² at sf0.01); the lag pairs come from one
    ordered pass over the #days aggregate; Pearson r is the
    agg_corr_covar closed form — five exact BIGINT moments cast to
    double once, identical association order both engines. Headroom:
    daily dollars ~1e8 at SF 1000 keep Σ(x·y) ~1e19·#days⁻¹… switch
    to k$ units past SF ~300."""
    li = load(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.date_format(F.date_trunc("day", "l_shipdate"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.expr(f"CAST(sum({_SPARK_REVENUE_CENTS_SQL}) AS BIGINT) DIV 10000").alias("r")
    )
    p = (
        d.select("day", F.col("r").alias("x"))
        .withColumn("y", F.lag("x").over(Window.orderBy("day")))
        .filter(F.col("y").isNotNull())
    )
    m = p.agg(
        F.count("*").cast("double").alias("dn"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    dn, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ("dn", "sx", "sy", "sxy", "sxx", "syy")
    )
    acf = (dn * sxy - sx * sy) / (
        F.sqrt(dn * sxx - sx * sx) * F.sqrt(dn * syy - sy * sy)
    )
    return m.select(
        dn.cast("long").alias("n_pairs"), F.round(acf, 6).alias("acf1")
    )


# Spark-side twin of SQL_REVENUE_CENTS for use inside F.expr strings.
_SPARK_REVENUE_CENTS_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


@register(
    "beh_ab_test_z",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS BIGINT) AS cohort,
             CASE WHEN 5 * count(CASE WHEN event_type = 'purchase'
                                      THEN 1 END) > count(*)
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) FILTER (WHERE cohort = 0) AS BIGINT) AS n_a,
             CAST(coalesce(sum(conv) FILTER (WHERE cohort = 0), 0) AS BIGINT)
               AS conv_a,
             CAST(count(*) FILTER (WHERE cohort = 1) AS BIGINT) AS n_b,
             CAST(coalesce(sum(conv) FILTER (WHERE cohort = 1), 0) AS BIGINT)
               AS conv_b
      FROM u
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(conv_a AS DOUBLE) / n_a AS p_a,
           CAST(conv_b AS DOUBLE) / n_b AS p_b,
           round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / nullif(
                     sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                          * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b)), 0.0), 6) AS z_score
    FROM m
    """,
)
def beh_ab_test_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B split: users land in cohorts by
    `user_id % 2` (a stand-in for the experiment assignment column),
    conversion is the scale-free integer predicate "purchases exceed
    20% of the user's events" (5·purchases > events — an ever-purchased
    flag degenerates to pooled p = 1 on this data, zeroing the
    denominator), and the pooled z-score comes out of
    the standard formula evaluated as ONE double expression over four
    exact integers — written with identical association order on both
    engines, rounded only at display. Per-user conversion flags
    aggregate in the same pass that splits cohorts, so the whole test
    is two hash aggregates over events, no joins."""
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.when(
            5 * F.count(F.when(F.col("event_type") == "purchase", 1))
            > F.count("*"),
            1,
        )
        .otherwise(0)
        .alias("conv")
    ).select((F.col("user_id") % 2).cast("long").alias("cohort"), "conv")
    m = u.agg(
        F.count_if(F.col("cohort") == 0).cast("long").alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("cohort") == 0, F.col("conv"))), F.lit(0))
        .cast("long")
        .alias("conv_a"),
        F.count_if(F.col("cohort") == 1).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.when(F.col("cohort") == 1, F.col("conv"))), F.lit(0))
        .cast("long")
        .alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.nullif(
        F.sqrt(
            pp
            * (F.lit(1.0) - pp)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        ),
        F.lit(0.0),
    )
    return m.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "text_simpson_diversity",
    oracle="""
    WITH tc AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents)
      GROUP BY source, token
    ),
    m AS (SELECT source,
                 CAST(count(*) AS BIGINT) AS vocab_size,
                 CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(sum(c * c) AS BIGINT) AS sum_c2
          FROM tc GROUP BY source)
    SELECT source, vocab_size, n_tokens,
           CAST(sum_c2 AS DOUBLE) / n_tokens / n_tokens AS simpson_index,
           CAST(n_tokens AS DOUBLE) * n_tokens / sum_c2 AS effective_vocab
    FROM m
    """,
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary concentration per source via the Simpson index
    Σ(c/T)² and its inverse (the "effective vocabulary" — how many
    equally-likely tokens would give the same concentration). Chosen
    over Shannon entropy deliberately: Σc² is pure integer arithmetic
    — order-independent, no per-count ln whose half-boundary snapping
    is fragile at corpus vocabulary sizes (see module docstring). Token
    counts collapse map-side on (source, token) before the per-source
    rollup; the two emitted ratios are identical left-associated IEEE
    chains. Headroom: Σc² caps at T², so counts stay exact until a
    single token exceeds ~3e9 occurrences in one source."""
    d = load(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").cast("long").alias("c"))
    )
    m = tc.groupBy("source").agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_c2"),
    )
    return m.select(
        "source",
        "vocab_size",
        "n_tokens",
        (
            F.col("sum_c2").cast("double") / F.col("n_tokens") / F.col("n_tokens")
        ).alias("simpson_index"),
        (
            F.col("n_tokens").cast("double") * F.col("n_tokens") / F.col("sum_c2")
        ).alias("effective_vocab"),
    )
