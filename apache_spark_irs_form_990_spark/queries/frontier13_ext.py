"""Frontier extensions, part 13 — average precision (PR-AUC), the
Theil–Sen robust trend estimator, Herfindahl concentration, and a
deterministic hash-bootstrap confidence interval
(SURVEY.md §2 B11 continuation).

House determinism conventions: exact integers, micro-snapping before
order-sensitive sums, one final IEEE division, full tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import global_order
from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "ml_average_precision",
    oracle="""
    WITH ranked AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS k,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               OVER (ORDER BY n_chars DESC, doc_id
                     ROWS UNBOUNDED PRECEDING) AS cumpos
      FROM documents
    )
    SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
           round(CAST(CAST(sum(CASE WHEN pos = 1
                   THEN CAST(round(CAST(cumpos AS DOUBLE) / k * 1000000)
                             AS BIGINT) END) AS BIGINT) AS DOUBLE)
                 / 1000000.0 / CAST(sum(pos) AS BIGINT), 6) AS avg_precision
    FROM ranked
    """,
)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the area under the precision–recall curve)
    for `n_chars` ranking `lang='en'`: AP = (1/n⁺) Σ_{positives}
    precision@k — the eval metric that, unlike ROC-AUC
    ([[ml_roc_auc]]), ignores the easy negatives and is the standard
    for retrieval and imbalanced classification. The global rank k and
    the running positive count over the full (score DESC, id) tiebreak
    order — formerly one unpartitioned window, a single-task sort —
    both come from `global_order` in one pass: range-partition on the
    score key, per-partition row_number + running sum, broadcast
    partition offsets. Exactly the same (k, cumpos) pairs, so the
    micro-snapped precision@k sum stays hash-identical to the oracle;
    no unpartitioned window remains in the plan
    (tests/test_plan_lint.py)."""
    docs = load(spark, sf_dir, "documents")
    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    ranked = global_order(
        docs.select("doc_id", "n_chars", pos.alias("pos")),
        [F.desc("n_chars"), "doc_id"],
        running={"cumpos": F.col("pos")},
        rn_col="k",
    )
    prec_micro = F.round(
        F.col("cumpos").cast("double") / F.col("k") * 1000000
    ).cast("long")
    return ranked.agg(
        F.sum("pos").alias("n_pos"),
        F.round(
            F.sum(F.when(F.col("pos") == 1, prec_micro)).cast("double")
            / 1000000.0
            / F.sum("pos"),
            6,
        ).alias("avg_precision"),
    )


@register(
    "ts_theil_sen_monthly",
    oracle=f"""
    WITH monthly AS (
      SELECT row_number() OVER (ORDER BY m) AS i,
             rev_c
      FROM (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m,
               sum({sql_cents('o_totalprice')}) AS rev_c
        FROM orders GROUP BY 1
      )
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(slope, 0.5) / 100.0, 6)
             AS theil_sen_slope_per_month
    FROM (
      SELECT CAST(b.rev_c - a.rev_c AS DOUBLE) / (b.i - a.i) AS slope
      FROM monthly a JOIN monthly b ON a.i < b.i
    )
    """,
)
def ts_theil_sen_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the MEDIAN of all pairwise slopes of
    the monthly revenue series — the estimator that shrugs off the
    outlier months that wreck OLS ([[agg_linreg_grouped]] is the
    parametric twin). The pairwise blow-up is over the MONTH GRID
    (n months → n(n−1)/2 pairs, calendar-bounded — thousands of pairs
    at any corpus size), never the fact table; each slope is one
    division of exact integers, and the median interpolates between
    identically-computed doubles on both engines."""
    o = load(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "m"
            )
        )
        .agg(F.sum(cents("o_totalprice")).alias("rev_c"))
        .select(
            F.row_number().over(Window.orderBy("m")).alias("i"), "rev_c"
        )
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(b, F.col("a.i") < F.col("b.i")).select(
        (
            (F.col("b.rev_c") - F.col("a.rev_c")).cast("double")
            / (F.col("b.i") - F.col("a.i"))
        ).alias("slope")
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.expr("percentile(slope, 0.5)") / 100.0, 6
        ).alias("theil_sen_slope_per_month"),
    )


@register(
    "agg_hhi_market_concentration",
    oracle=f"""
    WITH shares AS (
      SELECT p.p_type AS market, s.s_suppkey,
             sum({sql_cents('l_extendedprice')}) AS v
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    )
    SELECT market,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS DOUBLE)
                 / (CAST(sum(CAST(v AS BIGINT)) AS DOUBLE)
                    * CAST(sum(CAST(v AS BIGINT)) AS DOUBLE)) * 10000.0, 6)
             AS hhi
    FROM shares
    GROUP BY market
    """,
)
def agg_hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration per market (part type):
    HHI = 10000·Σ share² — the antitrust-standard companion to the
    Gini/Simpson measures already in the registry
    ([[agg_gini_concentration]], [[text_simpson_diversity]]).
    Computed as Σv²/(Σv)² on exact integer cents — no per-supplier
    share division, so there is nothing to round until the single
    closing expression. Two hash aggregates (supplier×market, then
    market); part/supplier join under AQE (both scale with SF).
    Σv² overflow headroom: supplier
    revenue cents ~1e9 at SF 1; squared 1e18 fits int64 through
    SF ~2, then the moment column widens to decimal(38,0) (SCALE.md
    §4)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    s = load(spark, sf_dir, "supplier").select("s_suppkey")
    shares = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("p_type").alias("market"), "s_suppkey")
        .agg(F.sum(cents("l_extendedprice")).alias("v"))
    )
    # squared cents exceed int64 (SCALE.md §4): accumulate the second
    # moment in decimal(38,0) — exact, like DuckDB's HUGEINT.
    vd = F.col("v").cast("decimal(19,0)")
    return shares.groupBy("market").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            F.sum((vd * vd).cast("decimal(38,0)")).cast("double")
            / (
                F.sum("v").cast("double") * F.sum("v").cast("double")
            )
            * 10000.0,
            6,
        ).alias("hhi"),
    )


@register(
    "stats_bootstrap_hash_ci",
    oracle=f"""
    WITH blocks AS (SELECT b FROM range(0, 7) AS t(b)),
    hashed AS (
      SELECT blocks.b,
             md5(CAST(blocks.b AS VARCHAR) || '|'
                 || CAST(o_orderkey AS VARCHAR)) AS hx,
             {sql_cents('o_totalprice')} AS xc
      FROM orders, blocks
    ),
    drawn AS (
      SELECT b * 16 + s.i AS r,
             CASE WHEN substr(hx, 2 * s.i + 1, 2) < '5e' THEN 0
                  WHEN substr(hx, 2 * s.i + 1, 2) < 'bc' THEN 1 ELSE 2
             END AS w,
             xc
      FROM hashed,
           LATERAL (SELECT unnest(generate_series(0, 15)) AS i) s
      WHERE b * 16 + s.i < 100
    ),
    means AS (
      SELECT r,
             CAST(sum(w * xc) AS DOUBLE) / CAST(sum(w) AS BIGINT) / 100.0
               AS rep_mean
      FROM drawn GROUP BY r
    )
    SELECT CAST(count(*) AS BIGINT) AS n_replicates,
           round(quantile_cont(rep_mean, 0.5), 6) AS boot_median,
           round(quantile_cont(rep_mean, 0.025), 6) AS ci_low,
           round(quantile_cont(rep_mean, 0.975), 6) AS ci_high
    FROM means
    """,
)
def stats_bootstrap_hash_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order value with
    DETERMINISTIC resampling: replicate r draws each row 0/1/2 times
    according to md5(r‖key) — a three-point approximation of the
    Poisson(1) multinomial the classical bootstrap converges to —
    so the 100 replicates are identical on any engine, partitioning,
    or rerun (`rand()` bootstraps are none of these). Weights come
    from LEXICOGRAPHIC comparison of a 2-hex-char digest slice (both
    engines emit lowercase hex, so '<' agrees; thresholds 94/256 and
    188/256 give P(0)≈P(1)≈0.37, P(2)≈0.27, mean 1). One md5 yields
    SIXTEEN independent byte draws, so replicate r reads byte r%16 of
    md5(r//16 ‖ key) — 7 digests per row instead of 100 (the r6 perf
    split found the per-replicate digest was 80% of this query's
    engine cost; the statistical contract is unchanged since every
    digest byte is uniform). Each replicate mean is exact-integer
    Σwx/Σw; the CI is exact percentiles over the 100-row replicate
    table. Cost: a ×7 digest pass and a ×100 weight explosion into one
    hash aggregate — at 100 TB the same query runs on a 1/1000 hash
    sample ([[sample_hash_deterministic]]) with replicates unchanged."""
    o = load(spark, sf_dir, "orders")
    hashed = o.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("b"),
        F.col("o_orderkey"),
        cents("o_totalprice").alias("xc"),
    ).select(
        "b",
        "xc",
        F.md5(
            F.concat(
                F.col("b").cast("string"),
                F.lit("|"),
                F.col("o_orderkey").cast("string"),
            )
        ).alias("hx"),
    )
    drawn = (
        hashed.select(
            "b",
            "xc",
            "hx",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("i"),
        )
        .filter(F.col("b") * 16 + F.col("i") < 100)
        .select(
            (F.col("b") * 16 + F.col("i")).alias("r"),
            "xc",
            F.substring(F.col("hx"), F.col("i") * 2 + 1, F.lit(2)).alias("h2"),
        )
        .select(
            "r",
            "xc",
            F.when(F.col("h2") < "5e", 0)
            .when(F.col("h2") < "bc", 1)
            .otherwise(2)
            .alias("w"),
        )
    )
    means = drawn.groupBy("r").agg(
        (
            F.sum(F.col("w") * F.col("xc")).cast("double")
            / F.sum("w")
            / 100.0
        ).alias("rep_mean")
    )
    return means.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.expr("percentile(rep_mean, 0.5)"), 6).alias("boot_median"),
        F.round(F.expr("percentile(rep_mean, 0.025)"), 6).alias("ci_low"),
        F.round(F.expr("percentile(rep_mean, 0.975)"), 6).alias("ci_high"),
    )
