"""Frontier extensions, part 23 — rank-biased overlap between two
document rankings (SURVEY.md §2 B11 continuation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import global_order
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load

_RBO_DEPTH = 50


@register(
    "ml_rank_biased_overlap",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS p1,
             row_number() OVER (
               ORDER BY len(list_filter(string_split(text, ' '),
                                        x -> x <> '')) DESC, doc_id) AS p2
      FROM documents
    ),
    m AS (
      SELECT doc_id, greatest(p1, p2) AS md FROM scored
      WHERE greatest(p1, p2) <= {_RBO_DEPTH}
    ),
    ovl AS (
      SELECT d.d, CAST(count(m.doc_id) AS BIGINT) AS ov
      FROM range(1, {_RBO_DEPTH + 1}) AS d(d)
      LEFT JOIN m ON m.md <= d.d
      GROUP BY d.d
    ),
    terms AS (
      SELECT list(pow(0.5, d - 1) * (CAST(ov AS DOUBLE) / d)
                  ORDER BY d) AS ts
      FROM ovl
    )
    SELECT CAST((SELECT max(ov) FROM ovl) AS BIGINT)
             AS overlap_at_depth,
           round(0.5 * list_reduce([CAST(0.0 AS DOUBLE)] || ts,
                                   (a, b) -> a + b), 6) AS rbo_p05
    FROM terms
    """,
)
def ml_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (RBO, p=0.5, depth 50) between two document
    rankings — by character count vs by token count — the top-weighted
    ranking-similarity measure for comparing retrieval systems or
    checking that a cheap ranker tracks an expensive one (Kendall/
    Spearman [[stats_spearman_rho]] weight all positions equally; RBO
    cares most about the top, like users do). The key identity:
    overlap at depth d = #{docs : max(rank₁, rank₂) ≤ d}, so one join
    of the two rankings yields per-doc max-ranks and the whole depth
    profile falls out of a 50-row spine join — no quadratic prefix
    intersection. p = 0.5 makes the depth weights exact binary
    fractions, and each term is (exact ratio)×2^{-(d-1)} folded in
    fixed depth order — bit-identical cross-engine. The two global
    rankings — formerly two unpartitioned windows, each a single-task
    sort — come from `global_order` (range-partition + per-partition
    rank + broadcast offsets); only docs in BOTH top-50s can have
    max-rank ≤ depth, so each side prunes to ≤50 rows before a
    broadcast join. At 100 TB the rankings would come from the score
    pipelines' own top-k outputs instead."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    )
    r1 = global_order(
        docs.select("doc_id", "n_chars"),
        [F.desc("n_chars"), "doc_id"],
        rn_col="p1",
    ).filter(F.col("p1") <= _RBO_DEPTH)
    r2 = global_order(
        docs.select("doc_id", n_tokens.alias("_ntok")),
        [F.col("_ntok").desc(), F.col("doc_id")],
        rn_col="p2",
    ).filter(F.col("p2") <= _RBO_DEPTH)
    m = (
        r1.select("doc_id", "p1")
        .join(F.broadcast(r2.select("doc_id", "p2")), "doc_id")
        .select("doc_id", F.greatest("p1", "p2").alias("md"))
        .filter(F.col("md") <= _RBO_DEPTH)
    )
    depths = spark.range(1, _RBO_DEPTH + 1).select(
        F.col("id").cast("int").alias("d")
    )
    overlaps = (
        depths.join(F.broadcast(m), F.col("md") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("doc_id").alias("ov"))
    )
    terms = overlaps.agg(
        F.max("ov").alias("overlap_at_depth"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "ov"))),
            lambda s: F.pow(F.lit(0.5), s.getField("d") - 1)
            * (s.getField("ov").cast("double") / s.getField("d")),
        ).alias("ts"),
    )
    rbo = F.round(
        0.5
        * F.aggregate(
            F.col("ts"), F.lit(0.0), lambda acc, v: acc + v
        ),
        6,
    )
    return terms.select(
        F.col("overlap_at_depth").cast("long").alias("overlap_at_depth"),
        rbo.alias("rbo_p05"),
    )


@register(
    "sql_scripting_procedure",
    oracle="""
    WITH thr AS (
      SELECT min(tp) AS cut FROM (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS tp
        FROM orders ORDER BY tp DESC LIMIT 100
      )
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_price
    FROM orders, thr
    WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= thr.cut
    GROUP BY o_orderpriority
    """,
)
def sql_scripting_procedure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4.0 BEGIN/END blocks): a T-SQL-style
    procedure that binds a scalar into a session variable — the
    top-100-orders price cutoff, exact integer cents — then reports
    the over-threshold orders by priority. The block's final SELECT is
    the result set, exactly like a stored procedure's. DECLARE /
    SET / control flow (IF, WHILE, FOR) run on the driver as plan
    orchestration; every statement inside is still a full Catalyst
    query, so scripting adds sequencing, not a new (slower) execution
    engine — the reason to prefer it over driver-side Python glue is
    that the whole procedure ships as one artifact any SQL client can
    run. The oracle is the equivalent single query (CTE in place of
    the variable), proving the script's observable result is plain
    relational algebra."""
    old = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    try:
        return spark.sql(
        """
        BEGIN
          DECLARE cut BIGINT DEFAULT 0;
          SET cut = (
            SELECT min(tp) FROM (
              SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS tp
              FROM orders ORDER BY tp DESC LIMIT 100
            )
          );
          SELECT o_orderpriority,
                 count(*) AS n_orders,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS total_price
          FROM orders
          WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= cut
          GROUP BY o_orderpriority;
        END
        """
        )
    finally:
        # the script executes inside spark.sql(); restore the shared
        # session's parser config so query order can't matter
        spark.conf.set("spark.sql.scripting.enabled", old)


@register(
    "fn_collation_lcase",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                  ELSE event_type END AS et
      FROM events
    )
    SELECT min(et) AS variant_min,
           count(*) AS n_events,
           count(DISTINCT et) AS n_case_variants
    FROM mixed
    GROUP BY lower(et)
    """,
)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String COLLATIONS (Spark 4): grouping under the UTF8_LCASE
    collation makes case-insensitivity a property of the comparison,
    not a rewrite — no `lower()` scattered over every predicate, and
    (unlike the rewrite) the collation survives into sorts, joins and
    GROUP BYs the optimizer plans natively. The fixture upper-cases
    every even event's type so each logical group really contains two
    binary-distinct variants; the output proves it (n_case_variants=2)
    while grouping collapses them. Output key is min(variant) under
    BINARY collation — deterministic in both engines — because the
    collated group's representative is not. The oracle is the
    classic `GROUP BY lower()` rewrite: for ASCII data the two must
    agree exactly, which is precisely the migration guarantee a user
    switching to collations needs checked."""
    ev = load(spark, sf_dir, "events")
    mixed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("et")
    )
    return (
        mixed.groupBy(F.expr("collate(et, 'UTF8_LCASE')").alias("_k"))
        .agg(
            F.min(F.expr("collate(et, 'UTF8_BINARY')")).alias("variant_min"),
            F.count("*").alias("n_events"),
            F.countDistinct(F.expr("collate(et, 'UTF8_BINARY')")).alias(
                "n_case_variants"
            ),
        )
        .drop("_k")
    )
