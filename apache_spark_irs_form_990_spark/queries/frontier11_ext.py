"""Frontier extensions, part 11 — CAGR, BLEU-style n-gram precision,
IQR-fence outlier auditing, file-metadata columns, and DISTRIBUTE BY
physical-layout SQL (SURVEY.md §2 B11 continuation).

House determinism conventions throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.text import shingles
from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load, register_views


@register(
    "ts_cagr_monthly",
    oracle=f"""
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             sum({sql_cents('o_totalprice')}) AS rev_c
      FROM orders GROUP BY 1
    ),
    ends AS (
      SELECT count(*) AS n_months,
             min({{'m': month, 'r': CAST(rev_c AS BIGINT)}}) AS first_m,
             max({{'m': month, 'r': CAST(rev_c AS BIGINT)}}) AS last_m
      FROM monthly
    )
    SELECT n_months,
           CAST(first_m.r AS DOUBLE) / 100.0 AS first_month_rev,
           CAST(last_m.r AS DOUBLE) / 100.0 AS last_month_rev,
           round(pow(CAST(last_m.r AS DOUBLE) / CAST(first_m.r AS DOUBLE),
                     1.0 / (n_months - 1)) - 1.0, 6) AS monthly_growth_rate
    FROM ends
    """,
)
def ts_cagr_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound monthly growth rate of order revenue: (last/first)^(1/(n−1))−1
    over the month series — the KPI-dashboard headline number. First
    and last months ride a lexicographic struct min/max (the
    [[agg_argmin_struct]] trick keyed on the month string, revenue as
    payload), so the whole thing is ONE aggregate over the monthly
    grid with no window or sort; pow() gets identical exact-integer-
    derived inputs on both engines and the output rounds to 6."""
    o = load(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(F.sum(cents("o_totalprice")).alias("rev_c"))
    ends = monthly.agg(
        F.count(F.lit(1)).alias("n_months"),
        F.min(F.struct(F.col("month").alias("m"), F.col("rev_c").alias("r"))).alias(
            "first_m"
        ),
        F.max(F.struct(F.col("month").alias("m"), F.col("rev_c").alias("r"))).alias(
            "last_m"
        ),
    )
    first_r = F.col("first_m.r").cast("double")
    last_r = F.col("last_m.r").cast("double")
    return ends.select(
        "n_months",
        (first_r / 100.0).alias("first_month_rev"),
        (last_r / 100.0).alias("last_month_rev"),
        F.round(
            F.pow(last_r / first_r, 1.0 / (F.col("n_months") - 1)) - 1.0, 6
        ).alias("monthly_growth_rate"),
    )


@register(
    "ml_ngram_precision_bleu",
    oracle="""
    WITH cand AS (
      SELECT g AS gram, count(*) AS c FROM (
        SELECT unnest([array_to_string(list_slice(t, i, i + 2), ' ')
                       FOR i IN generate_series(1, len(t) - 2)]) AS g
        FROM (SELECT string_split(text, ' ') AS t FROM documents
              WHERE source = 'src1')
      ) GROUP BY g
    ),
    ref AS (
      SELECT g AS gram, count(*) AS c FROM (
        SELECT unnest([array_to_string(list_slice(t, i, i + 2), ' ')
                       FOR i IN generate_series(1, len(t) - 2)]) AS g
        FROM (SELECT string_split(text, ' ') AS t FROM documents
              WHERE source = 'src2')
      ) GROUP BY g
    )
    SELECT CAST(sum(cand.c) AS BIGINT) AS n_cand_grams,
           CAST(sum(least(cand.c, COALESCE(ref.c, 0))) AS BIGINT)
             AS n_clipped_matches,
           CAST(sum(least(cand.c, COALESCE(ref.c, 0))) AS DOUBLE)
             / CAST(sum(cand.c) AS BIGINT) AS precision_3gram
    FROM cand LEFT JOIN ref ON cand.gram = ref.gram
    """,
)
def ml_ngram_precision_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-style modified (clipped) n-gram precision between two
    corpora: Σ min(count_cand, count_ref) / Σ count_cand over word
    3-grams, src1 as candidate and src2 as reference — the
    generation-eval metric in its corpus-level form, and equally the
    inter-source contamination/similarity measure for corpus curation.
    Both sides collapse to gram-count tables first (domain-sized), so
    the clip join carries counts, not text; exact integers throughout,
    one final division."""
    docs = load(spark, sf_dir, "documents")

    def grams(src: str) -> DataFrame:
        return (
            docs.filter(F.col("source") == src)
            .select(
                F.explode(shingles(F.col("text"))).alias("gram")
            )
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    cand = grams("src1").select(
        "gram", F.col("c").alias("cand_c")
    )
    ref = grams("src2").select("gram", F.col("c").alias("ref_c"))
    joined = cand.join(ref, "gram", "left")
    clipped = F.least(F.col("cand_c"), F.coalesce(F.col("ref_c"), F.lit(0)))
    return joined.agg(
        F.sum("cand_c").alias("n_cand_grams"),
        F.sum(clipped).alias("n_clipped_matches"),
        (F.sum(clipped).cast("double") / F.sum("cand_c")).alias(
            "precision_3gram"
        ),
    )


@register(
    "audit_outlier_iqr_fences",
    oracle="""
    WITH fences AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           count(*) AS n,
           CAST(sum(CASE WHEN o.o_totalprice
                              > f.q3 + 1.5 * (f.q3 - f.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers,
           round(f.q3 + 1.5 * (f.q3 - f.q1), 6) AS high_fence
    FROM orders o JOIN fences f ON o.o_orderpriority = f.o_orderpriority
    GROUP BY o.o_orderpriority, f.q1, f.q3
    """,
)
def audit_outlier_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outlier audit per order priority: values above
    Q3 + 1.5·IQR are flagged — the distribution-free data-quality rule
    that complements the parametric z-score carve
    ([[win_outlier_zscore]]); right fence only since order values are
    bounded below. Two passes by construction (exact percentiles,
    then the fence count) with the 5-row fence table broadcast back —
    the same aggregate-then-rejoin shape as [[agg_median_abs_dev]].
    At 100 TB the exact `percentile` swaps for `approx_percentile`
    with everything else unchanged (SCALE.md §7)."""
    o = load(spark, sf_dir, "orders")
    fences = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    high = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    joined = o.join(F.broadcast(fences), "o_orderpriority")
    return joined.groupBy("o_orderpriority", "q1", "q3").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("o_totalprice") > high, 1).otherwise(0)
        ).alias("n_high_outliers"),
        F.round(F.max(high), 6).alias("high_fence"),
    ).drop("q1", "q3")


@register(
    "scan_file_metadata_cols",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows
    FROM lineitem
    """,
)
def scan_file_metadata_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden `_metadata` columns of file-based sources: per-file
    row accounting via `_metadata.file_name` — file-level lineage
    without a separate manifest, the mechanism behind incremental
    processors ('which files did these rows come from') and corrupt-
    file triage. Selecting only metadata still scans row groups, but
    the column itself is generated, not read — and combining it with
    real filters gives per-file audit reports during backfills."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "sql_distribute_by",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum({sql_cents('l_quantity')}) AS BIGINT) AS qty_cents
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_distribute_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DISTRIBUTE BY` + `SORT BY` — SQL-level control of physical
    layout (hash-partition by a key, sort within partitions) without
    changing results: the declarative form of
    `repartition().sortWithinPartitions()` used to pre-shape data
    before a write ([[sink_sorted_clustering]] is the write-side
    payoff). Here the distributed/sorted stream feeds an aggregate
    whose result is layout-invariant — which is exactly what the
    oracle checks, while the plan shows the requested exchange."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum({sql_cents('l_quantity')}) AS BIGINT) AS qty_cents
        FROM (
          SELECT l_returnflag, l_linestatus, l_quantity
          FROM lineitem
          DISTRIBUTE BY l_returnflag SORT BY l_returnflag, l_linestatus
        )
        GROUP BY l_returnflag, l_linestatus
        """
    )
