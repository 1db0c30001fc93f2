"""Frontier extensions, part 5 — SQL-surface parity (named WINDOW
clause, range() table function, correlated LATERAL subquery), schema
contract governance, and reproducible epoch shuffling
(SURVEY.md §2 B11 continuation).

The reference never parses SQL (`SQLContext` at IRSSpark.py:145 is
used only for createDataFrame/saveAsTable); these queries exercise
Catalyst's parser/analyzer paths that the DataFrame-API twins elsewhere
in the registry compile into, proving both surfaces reach the same
plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import global_order
from apache_spark_irs_form_990_spark.functions.money import sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load, register_views


@register(
    "sql_window_clause_named",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum({sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0
             AS flag_status_price,
           round(CAST(sum({sql_cents('l_extendedprice')}) AS DOUBLE)
                 / CAST(sum(sum({sql_cents('l_extendedprice')}))
                        OVER w_flag AS DOUBLE), 6) AS share_of_flag,
           CAST(rank() OVER (PARTITION BY l_returnflag
                             ORDER BY sum({sql_cents('l_extendedprice')}) DESC,
                                      l_linestatus) AS BIGINT) AS rnk
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    WINDOW w_flag AS (PARTITION BY l_returnflag)
    """,
)
def sql_window_clause_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named `WINDOW` clause SQL surface: one window specification
    declared once and shared by multiple window functions over a
    grouped result — parser/analyzer parity for what the DataFrame API
    does with a reused `Window` spec object. Aggregate-then-window:
    both the share normalizer and the rank run on the (flag × status)
    grid, not the fact table, and Catalyst folds the two compatible
    specs into adjacent Window operators on one sort."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(sum({sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0
                 AS flag_status_price,
               round(CAST(sum({sql_cents('l_extendedprice')}) AS DOUBLE)
                     / CAST(sum(sum({sql_cents('l_extendedprice')}))
                            OVER w_flag AS DOUBLE), 6) AS share_of_flag,
               CAST(rank() OVER (PARTITION BY l_returnflag
                                 ORDER BY sum({sql_cents('l_extendedprice')}) DESC,
                                          l_linestatus) AS BIGINT) AS rnk
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        WINDOW w_flag AS (PARTITION BY l_returnflag)
        """
    )


@register(
    "sql_tvf_range_spine",
    oracle="""
    WITH spine AS (
      SELECT strftime(DATE '1994-01-01' + to_months(CAST(i AS INTEGER)),
                      '%Y-%m') AS month
      FROM range(0, 24) AS t(i)
    ),
    monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             count(*) AS n
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1994-01-01'
        AND o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY 1
    )
    SELECT s.month, COALESCE(m.n, 0) AS n_orders
    FROM spine s LEFT JOIN monthly m ON s.month = m.month
    """,
)
def sql_tvf_range_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar spine from the `range()` table-valued function —
    the non-recursive twin of [[sql_recursive_calendar]]: 24 generated
    month rows left-join the monthly aggregate so empty months surface
    as explicit zeros. The TVF materializes driver-side metadata (24
    rows, no scan); the aggregate is the only data-sized work, and the
    spine join broadcasts. This is the idiomatic Spark shape for 'grid
    × facts' reports — `range()`/`sequence()+explode` generate the
    grid; recursion is never needed for linear spines."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH spine AS (
          SELECT date_format(add_months(DATE '1994-01-01', CAST(id AS INT)),
                             'yyyy-MM') AS month
          FROM range(0, 24)
        ),
        monthly AS (
          SELECT date_format(date_trunc('month', o_orderdate), 'yyyy-MM')
                   AS month,
                 count(*) AS n
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1994-01-01'
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY 1
        )
        SELECT s.month, COALESCE(m.n, 0) AS n_orders
        FROM spine s LEFT JOIN monthly m ON s.month = m.month
        """
    )


@register(
    "sql_lateral_correlated",
    oracle="""
    SELECT seg.c_mktsegment, top.c_custkey, top.c_acctbal
    FROM (SELECT DISTINCT c_mktsegment FROM customer) seg,
         LATERAL (
           SELECT c_custkey, c_acctbal
           FROM customer c
           WHERE c.c_mktsegment = seg.c_mktsegment
           ORDER BY c_acctbal DESC, c_custkey
           LIMIT 2
         ) top
    """,
)
def sql_lateral_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT — 'top-2
    customers per segment' phrased the SQL-standard way instead of the
    window-function way ([[win_rank_topn_per_group]]). Catalyst
    de-correlates the lateral into a ranked window join, so both
    phrasings reach equivalent plans; having the surface matters
    because ported warehouse SQL arrives written like this. Segment
    domain is tiny; the inner sort is per-group with a pushed group
    limit."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT seg.c_mktsegment, top.c_custkey, top.c_acctbal
        FROM (SELECT DISTINCT c_mktsegment FROM customer) seg,
             LATERAL (
               SELECT c_custkey, c_acctbal
               FROM customer c
               WHERE c.c_mktsegment = seg.c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey
               LIMIT 2
             ) top
        """
    )


_LINEITEM_CONTRACT = [
    (1, "l_orderkey", "bigint"),
    (2, "l_partkey", "bigint"),
    (3, "l_suppkey", "bigint"),
    (4, "l_linenumber", "int"),
    (5, "l_quantity", "double"),
    (6, "l_extendedprice", "double"),
    (7, "l_discount", "double"),
    (8, "l_tax", "double"),
    (9, "l_returnflag", "string"),
    (10, "l_linestatus", "string"),
    # TIMESTAMP_NTZ: the generator writes isAdjustedToUTC=false parquet
    # timestamps, which Spark surfaces as the NTZ type (DuckDB: TIMESTAMP).
    (11, "l_shipdate", "timestamp_ntz"),
]


@register(
    "audit_schema_contract",
    oracle="""
    SELECT * FROM (VALUES
    """
    + ",\n    ".join(
        f"({i}, '{n}', '{t}')" for i, n, t in _LINEITEM_CONTRACT
    )
    + """
    ) AS t(ordinal, col_name, dtype)
    """,
)
def audit_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-contract audit: the fact table's ACTUAL schema (name and
    type per ordinal, straight from the parquet footer — a metadata
    read, no data scan) emitted as rows and hash-compared against the
    declared contract. Any drift — a renamed column, a widened type, a
    reordered field from an upstream producer — fails the diff before
    a single downstream job runs on bad assumptions. This is the
    engine-side half of schema governance; `scan_merge_schema` covers
    the read-time evolution half."""
    li = load(spark, sf_dir, "lineitem")
    rows = [
        (i + 1, f.name, f.dataType.simpleString())
        for i, f in enumerate(li.schema.fields)
    ]
    return spark.createDataFrame(
        rows, "ordinal int, col_name string, dtype string"
    )


@register(
    "pipeline_epoch_shuffle",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY md5('epoch7|' || CAST(doc_id AS VARCHAR)),
                                   doc_id) AS BIGINT) AS position,
           doc_id
    FROM documents
    ORDER BY position
    LIMIT 20
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch-shuffle order: documents sorted by
    md5(seed‖doc_id) — a different but DETERMINISTIC permutation per
    epoch seed, so a crashed training run resumes mid-epoch on the
    exact same order, on any cluster size (the property
    `rand(seed)` loses the moment partitioning changes). Emits the
    first 20 positions of epoch 7. The global rank — formerly one
    unpartitioned window, a single-task sort — comes from
    `global_order`: the md5 key IS the range-partitioning key (epoch
    shards = hash ranges, exactly how the 100 TB shuffle-write lays
    out epoch files), ranks are per-partition, and broadcast offsets
    make them global. The top-20 audit view is then a plain
    TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("epoch7|"), F.col("doc_id").cast("string")))
    ranked = global_order(
        docs.select("doc_id", key.alias("_ekey")),
        ["_ekey", "doc_id"],
        rn_col="position",
    )
    return (
        ranked.select(F.col("position").cast("long").alias("position"), "doc_id")
        .orderBy("position")
        .limit(20)
    )
