"""Frontier extensions, part 16 — per-slice AUC monitoring, the
SELECT * EXCEPT projection surface, and log-log price elasticity
(SURVEY.md §2 B11 continuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load, register_views


@register(
    "ml_auc_by_slice",
    oracle="""
    WITH vals AS (
      SELECT source, n_chars AS v, count(*) AS cnt,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
      FROM documents GROUP BY source, n_chars
    ),
    ranked AS (
      SELECT source, v, cnt, pos,
             2 * COALESCE(sum(cnt) OVER (PARTITION BY source ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS midrank2
      FROM vals
    )
    SELECT source,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(cnt - pos) AS BIGINT) AS n_neg,
           CAST(sum(pos * midrank2) - sum(pos) * (sum(pos) + 1) AS DOUBLE)
             / (2.0 * CAST(sum(pos) AS BIGINT)
                * CAST(sum(cnt - pos) AS BIGINT)) AS auc
    FROM ranked
    GROUP BY source
    HAVING sum(pos) > 0 AND sum(cnt - pos) > 0
    """,
)
def ml_auc_by_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC computed PER SLICE (source) — the model-monitoring view
    that catches a score collapsing on one segment while the global
    AUC ([[ml_roc_auc]]) still looks fine. Identical midrank identity,
    with the value-domain collapse and ranking window both PARTITIONED
    by the slice key, so at 100 TB this is one (slice, value) hash
    aggregate plus a window over each slice's value domain — slices
    parallelize instead of serializing through one global sort.
    Degenerate slices (no positives or no negatives) are excluded on
    both engines."""
    docs = load(spark, sf_dir, "documents")
    vals = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = vals.withColumn(
        "midrank2",
        2 * F.coalesce(F.sum("cnt").over(w), F.lit(0)) + F.col("cnt") + 1,
    )
    return (
        ranked.groupBy("source")
        .agg(
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
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    )


@register(
    "sql_select_except_star",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
    WHERE o_orderkey % 151 = 0
    """,
)
def sql_select_except_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * EXCEPT (cols)` — the wide-table ergonomic for
    'everything but the PII/noise columns', shared by both engines'
    dialects. Catalyst resolves the EXCEPT list at analysis time into
    a plain pruned projection, so the parquet scan reads only the
    surviving columns — sugar over column pruning, zero runtime cost.
    The excluded columns here (custkey, orderdate) are exactly what a
    privacy-scoped export would drop."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT * EXCEPT (o_custkey, o_orderdate, o_totalprice),
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders
        WHERE o_orderkey % 151 = 0
        """
    )


@register(
    "beh_price_elasticity",
    oracle="""
    WITH obs AS (
      SELECT p_brand,
             CAST(round(ln(l_extendedprice / l_quantity) * 1000000)
                  AS BIGINT) AS lp_micro,
             CAST(round(ln(l_quantity) * 1000000) AS BIGINT) AS lq_micro
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_quantity > 0 AND l_extendedprice > 0
    ),
    m AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lp_micro) AS BIGINT) AS sp,
             CAST(sum(lq_micro) AS BIGINT) AS sq,
             CAST(sum(lp_micro * lq_micro) AS HUGEINT) AS spq,
             CAST(sum(lp_micro * lp_micro) AS HUGEINT) AS spp
      FROM obs GROUP BY p_brand HAVING count(*) >= 30
    )
    SELECT p_brand, n,
           round((CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE)
                    * CAST(sq AS DOUBLE) / n)
                 / (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)
                    * CAST(sp AS DOUBLE) / n), 6) AS elasticity
    FROM m
    """,
)
def beh_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) — the pricing-team regression, with
    the classic caveat that observational slopes conflate supply and
    demand (the query measures association, the docnote says so).
    Per-row logs snap to exact micro-nats ([[agg_linreg_grouped]]'s
    moment discipline), cross-moments accumulate exactly (decimal
    Spark-side, HUGEINT oracle-side — micro² products overflow int64),
    and the slope is one closed-form double per brand."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lp = F.round(
        F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 1000000
    ).cast("long")
    lq = F.round(F.log("l_quantity") * 1000000).cast("long")
    obs = (
        li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(p, li.l_partkey == p.p_partkey)
        .select("p_brand", lp.alias("lp"), lq.alias("lq"))
    )
    lpd = F.col("lp").cast("decimal(19,0)")
    lqd = F.col("lq").cast("decimal(19,0)")
    m = (
        obs.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("lp").alias("sp"),
            F.sum("lq").alias("sq"),
            F.sum((lpd * lqd).cast("decimal(38,0)")).alias("spq"),
            F.sum((lpd * lpd).cast("decimal(38,0)")).alias("spp"),
        )
        .filter(F.col("n") >= 30)
    )
    num = F.col("spq").cast("double") - F.col("sp").cast("double") * F.col(
        "sq"
    ).cast("double") / F.col("n")
    den = F.col("spp").cast("double") - F.col("sp").cast("double") * F.col(
        "sp"
    ).cast("double") / F.col("n")
    return m.select(
        "p_brand", "n", F.round(num / den, 6).alias("elasticity")
    )
