"""TPC-H analog suite — the classic decision-support queries re-expressed
on the driver's star schema (SURVEY.md §2 B11; extends the Q1/Q3/Q4/Q5/Q10
analogs that live in aggregates.py / joins.py / relational_ext.py).

The testdata schema (TESTDATA.md) lacks `partsupp`, ship modes,
commit/receipt dates, phones and containers, so each query keeps the
*shape* of its TPC-H original (the join topology, the subquery class,
the aggregate structure) while substituting available columns; every
substitution is noted in the docstring.

Scale posture shared by the whole suite:

- Dimensions (`part`, `supplier`, `customer`, `nation`, `region`)
  broadcast — the fact side never shuffles for a dim join; at 100 TB
  `customer` may exceed the broadcast threshold, at which point AQE
  falls back to shuffle join without a code change.
- The only unavoidable shuffles are fact⋈fact on `l_orderkey` and the
  final group-by exchanges; selective filters (`l_returnflag`,
  date ranges, brand predicates) sit before any join so they push into
  the parquet scan (verify: `PushedFilters` in `.explain`).
- Money/quantity arithmetic uses the exact-integer-cents convention of
  `functions/money.py` so every oracle hash-matches bit-for-bit.

Reference lineage: the reference has no joins at all (SURVEY.md §2
Part A, "operators the reference does NOT have" — verified against all
297 lines of `IRSSpark.py` + `CitiesCountJob.py`); this suite is the
B3/B4 generalization that makes the engine a usable analytics engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import (
    SQL_REVENUE_CENTS,
    cents,
    revenue_cents,
    revenue_sum,
    sql_cents,
    sql_revenue_sum,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


# --------------------------------------------------------------------------
# Q6 — forecast revenue change (pure filter + single aggregate)
# --------------------------------------------------------------------------
@register(
    "agg_q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(sum({sql_cents('l_extendedprice')} * {sql_cents('l_discount')})
                AS DOUBLE) / 10000.0 AS promo_revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def agg_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: revenue that would be gained by eliminating
    discounts in a band — `sum(l_extendedprice * l_discount)` under a
    date/discount/quantity conjunction. No joins: the entire predicate
    pushes into the parquet scan and the aggregate is a single
    partial+final pass, so at 100 TB this reads a fraction of one
    column family and shuffles ~32 partial rows."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(cents("l_extendedprice") * cents("l_discount")).cast("double")
                / 10000.0
            ).alias("promo_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------
@register(
    "join_q7_nation_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
           {sql_revenue_sum('volume')}
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
    WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
       OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def join_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: shipping volume between two trading nations,
    both directions, by ship year. The nation table joins the fact
    twice (supplier path and customer path) — both AQE-planned
    (nation aliases broadcast by hint; customer/supplier scale); the
    disjunctive nation-pair predicate is evaluated after both maps so
    a single fact pass feeds both directions. Only lineitem⋈orders
    shuffles."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("long").alias("l_year"),
        )
        .agg(revenue_sum("volume"))
    )


# --------------------------------------------------------------------------
# Q8 — market share of one nation within a region
# --------------------------------------------------------------------------
@register(
    "join_q8_market_share",
    oracle=f"""
    SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN ns.n_name = 'NATION_3'
                         THEN {SQL_REVENUE_CENTS} ELSE 0 END) AS DOUBLE)
             / CAST(sum({SQL_REVENUE_CENTS}) AS DOUBLE) AS mkt_share,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
    JOIN region r    ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1996-01-01'
                                          AND DATE '1997-12-31'
    GROUP BY o_year
    """,
)
def join_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: NATION_3's share of revenue sold into the ASIA
    region per order year. The share is a ratio of two exact integer
    sums computed in ONE aggregate pass (conditional numerator), not
    two scans + a join — at scale this halves the fact traffic of the
    naive two-query formulation. Division happens once per output row
    on exact integers, so the double is engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    rev = revenue_cents()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------
@register(
    "join_q9_product_profit",
    oracle=f"""
    SELECT ns.n_name AS nation,
           CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
           CAST(sum({SQL_REVENUE_CENTS}
                    - {sql_cents('p.p_retailprice')}
                      * CAST(round(l.l_quantity) AS BIGINT) * 50)
                AS DOUBLE) / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
)
def join_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: profit on 'widget' parts per supplier nation
    and order year. The schema has no `partsupp.ps_supplycost`, so unit
    cost is modeled as half the part's retail price — profit =
    `price*(1-disc) - 0.5*retailprice*qty`, computed entirely in exact
    1e-4 units (retail cents x qty x 50 is an exact integer). The
    part-name filter prunes the part dim BEFORE the join (AQE
    broadcasts the slice while it fits), so
    the fact rows for other parts drop at the join probe."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    profit_units = revenue_cents() - cents("p_retailprice") * F.round(
        F.col("l_quantity")
    ).cast("long") * F.lit(50)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_units).cast("double") / 10000.0).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# Q12 — shipping priority classes (conditional counts)
# --------------------------------------------------------------------------
@register(
    "join_q12_priority_class",
    oracle="""
    SELECT l.l_linestatus,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def join_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog: per line status (stand-in for the absent
    `l_shipmode`), how many 1997 shipments carried urgent/high order
    priority vs not. Two conditional counts in one aggregate pass —
    `count_if` stays inside whole-stage codegen; the date filter pushes
    to the scan so only one year of the fact joins."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count_if(is_high).alias("high_line_count"),
            F.count_if(~is_high).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution
# --------------------------------------------------------------------------
@register(
    "join_q13_order_histogram",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def join_q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog: distribution of orders-per-customer including
    zero-order customers (the left join keeps them; `count(o_orderkey)`
    counts non-nulls so they land in bucket 0). Two aggregations, two
    shuffles — the first on custkey (same key as the join, so Catalyst
    reuses the exchange), the second on the tiny count domain."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --------------------------------------------------------------------------
# Q14 — promotion revenue share per month
# --------------------------------------------------------------------------
@register(
    "join_q14_promo_share",
    oracle=f"""
    SELECT CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_year,
           CAST(month(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS l_month,
           100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                            THEN {SQL_REVENUE_CENTS} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({SQL_REVENUE_CENTS}) AS DOUBLE) AS promo_pct,
           {sql_revenue_sum('total_revenue')}
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY l_year, l_month
    """,
)
def join_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: percent of monthly revenue from PROMO-type
    parts across 1997. Same one-pass conditional-numerator shape as
    Q8 — ratio of two exact integer sums, multiplied by the literal
    100.0 identically on both engines. part is unhinted (it scales
    with SF; AQE broadcasts while small); the only
    shuffle is the 12-row group-by."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    p = load(spark, sf_dir, "part")
    rev = revenue_cents()
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.year(F.to_date("l_shipdate")).cast("long").alias("l_year"),
            F.month(F.to_date("l_shipdate")).cast("long").alias("l_month"),
        )
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_pct"),
            revenue_sum("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue
# --------------------------------------------------------------------------
@register(
    "join_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no, {sql_revenue_sum('total_revenue')}
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def join_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog: the supplier(s) achieving maximum revenue in
    1997Q1 (the view + scalar-max-subquery query). One aggregation,
    then the scalar max rides back as a broadcast 1-row cross join and
    an equality filter — the per-supplier totals never collapse into a
    single-task window (they are |suppliers|-sized, which grows with
    the corpus). Ties all surface (same semantics as the SQL
    max-equality), which keeps the result deterministic without a
    tiebreak."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-04-01"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        revenue_sum("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return top.join(s, top.supplier_no == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# --------------------------------------------------------------------------
# Q16 — supplier variety per part attribute group
# --------------------------------------------------------------------------
@register(
    "join_q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17)
    GROUP BY p.p_brand, p.p_type, p_size
    """,
)
def join_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: how many distinct suppliers actually shipped
    each (brand, type, size) family — `lineitem` stands in for the
    absent `partsupp`. All three part predicates prune the broadcast
    dim before the join; COUNT(DISTINCT) plans as the two-phase
    Expand/partial-distinct aggregate, so duplicate (group, suppkey)
    pairs collapse map-side before the shuffle."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-part average)
# --------------------------------------------------------------------------
@register(
    "join_q17_small_quantity",
    oracle=f"""
    SELECT CAST(sum({sql_cents('l.l_extendedprice')}) AS DOUBLE) / 100.0 / 7.0
               AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#21'
      AND l.l_quantity < 0.2 * (
        SELECT avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def join_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: yearly revenue lost if sub-20%-of-average
    quantity orders for one brand's parts were no longer filled. The
    correlated per-part AVG de-correlates into a window over
    `l_partkey` — but only AFTER the brand join prunes the fact to that
    brand's partkeys, so the window shuffle touches ~1/25 of lineitem,
    not all of it. Quantities are integral doubles, so the window AVG
    is order-exact and the 0.2x comparison is engine-identical."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#21")
    li = load(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100.0 / 7.0).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q18 — large-volume orders (HAVING over fact, then enrich)
# --------------------------------------------------------------------------
@register(
    "join_q18_large_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
           o.o_totalprice,
           CAST(t.sum_qty AS BIGINT) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 200
    ) t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def join_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: the 100 largest orders by total price among
    orders whose line quantities sum past 200 units. Aggregates the
    fact FIRST (groupBy orderkey shrinks it ~6x before any join — the
    HAVING prunes further), then enriches with orders/customer;
    TakeOrderedAndProject keeps only 100 rows per partition before the
    single-driver merge. Quantity sums are exact BIGINTs."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        t.join(o, t.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q19 — disjunctive brand/size/quantity predicate join
# --------------------------------------------------------------------------
@register(
    "join_q19_disjunctive",
    oracle=f"""
    SELECT {sql_revenue_sum('revenue')}, count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def join_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog: revenue matching an OR of three
    brand/size/quantity conjunctions — the classic test that an engine
    evaluates disjunctive mixed-side predicates as a join residual
    rather than a cross product. Catalyst extracts the common
    `p_partkey` equi-key and applies the OR as a post-join filter; the
    derivable single-side prefilters (brand IN ..., qty BETWEEN 1 AND
    30) are pushed by the optimizer's constraint propagation."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(branch)
        .agg(revenue_sum("revenue"), F.count("*").alias("n_lines"))
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# --------------------------------------------------------------------------
@register(
    "join_q21_waiting_supplier",
    oracle="""
    WITH lines AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey,
             CAST(l.l_shipdate AS DATE)
                 > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE is_late)
    SELECT s.s_name, count(*) AS numwait
    FROM late t
    JOIN supplier s ON s.s_suppkey = t.l_suppkey
    WHERE EXISTS (
      SELECT 1 FROM lines a
      WHERE a.l_orderkey = t.l_orderkey AND a.l_suppkey <> t.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM lines b
      WHERE b.l_orderkey = t.l_orderkey AND b.l_suppkey <> t.l_suppkey
        AND b.is_late
    )
    GROUP BY s.s_name
    """,
)
def join_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: per supplier, the number of multi-supplier
    orders where THEY were the only late shipper ("late" = shipped >60
    days after ordering, the schema's stand-in for the absent
    commit/receipt dates).

    The oracle states the spec as EXISTS/NOT-EXISTS self-joins; a
    literal translation scans and deduplicates the fact three times
    (one per quantifier — Catalyst can't reuse the exchange across the
    differing semi/anti conditions). This implementation de-correlates
    BOTH quantifiers into one per-order aggregate instead: for each
    (order, supplier) compute any_late, then per order count suppliers
    and late suppliers; a late supplier "kept the order waiting" iff
    n_supp > 1 (EXISTS another supplier) and n_late_supp == 1 (NOT
    EXISTS another late one — they themselves are the 1). One fact
    scan, two aggregations on the same l_orderkey key (exchange
    reused), and a posexplode-free row count bounded by |orders|."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60)
            ).alias("is_late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("any_late"))
    )
    w = Window.partitionBy("l_orderkey")
    qualified = (
        pair.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late_supp", F.sum(F.col("any_late").cast("long")).over(w))
        .filter(
            F.col("any_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
    )
    return (
        qualified.join(s, qualified.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --------------------------------------------------------------------------
# Q22 — idle high-balance customers (anti join + scalar subquery)
# --------------------------------------------------------------------------
@register(
    "join_q22_idle_customers",
    oracle=f"""
    WITH pool AS (
      SELECT right(c_name, 2) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE right(c_name, 2) IN ('00', '11', '22', '33', '44', '55', '66')
    ),
    thresh AS (
      SELECT CAST(sum({sql_cents('c_acctbal')}) AS DOUBLE) / 100.0 / count(*)
                 AS avg_bal
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT p.cntrycode, count(*) AS numcust,
           CAST(sum({sql_cents('p.c_acctbal')}) AS DOUBLE) / 100.0 AS totacctbal
    FROM pool p, thresh
    WHERE p.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
      )
    GROUP BY p.cntrycode
    """,
)
def join_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: customers in selected "country codes" (last
    two digits of c_name — the schema has no phone column) with
    above-average positive balances and NO orders. Three classic
    pieces: an uncorrelated scalar subquery (exact-cents average,
    broadcast as a 1-row cross join), an anti join against orders for
    the NOT EXISTS, and a final tiny group-by. The anti join probes
    orders' custkey side only — no order payload is ever read."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    pool = c.select(
        F.expr("right(c_name, 2)").alias("cntrycode"), "c_custkey", "c_acctbal"
    ).filter(F.col("cntrycode").isin("00", "11", "22", "33", "44", "55", "66"))
    thresh = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents("c_acctbal")).cast("double") / 100.0 / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        pool.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / 100.0).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part (argmin over a derived cost view)
# --------------------------------------------------------------------------
@register(
    "join_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 / count(*) AS avg_price
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, l_suppkey, avg_price FROM (
        SELECT l_partkey, l_suppkey, avg_price,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY avg_price, l_suppkey) AS rn
        FROM ps
      ) WHERE rn = 1
    )
    SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name,
           b.avg_price
    FROM best b
    JOIN part p     ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    ORDER BY s.s_acctbal DESC, p.p_partkey
    LIMIT 100
    """,
)
def join_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: for each part in one size/type family, the
    supplier selling it cheapest (average realized unit price from
    lineitem stands in for the absent `partsupp.ps_supplycost`). The
    correlated min-subquery becomes a per-part argmin window over the
    (part, supplier) aggregate; the part-family predicate prunes the
    broadcast dim BEFORE the fact aggregation so the groupBy shuffles
    only the family's lines (~1/300 of the fact), and the exact-cents
    average makes the argmin engine-identical (suppkey tiebreak)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    ps = (
        li.join(F.broadcast(p.select("p_partkey", "p_name")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey", "p_partkey", "p_name")
        .agg(
            (
                F.sum(cents("l_extendedprice")).cast("double")
                / 100.0
                / F.count(F.lit(1))
            ).alias("avg_price")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("avg_price", "l_suppkey")
    best = ps.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "avg_price")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q11 — important stock (share-of-total HAVING via scalar subquery)
# --------------------------------------------------------------------------
@register(
    "join_q11_important_parts",
    oracle=f"""
    WITH vals AS (
      SELECT l.l_partkey, {sql_revenue_sum('value')}
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value
    FROM vals
    WHERE value > (SELECT sum(value) * 0.001 FROM vals)
    """,
)
def join_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: parts whose NATION_5-supplied revenue exceeds
    0.1% of that nation's total (lineitem revenue stands in for
    partsupp stock value). The scalar total re-aggregates the ALREADY
    grouped per-part values (tiny input) and broadcasts back as a
    1-row cross join — the fact is read and shuffled exactly once.
    Threshold comparison is double-on-exact-cents on both engines."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    vals = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(revenue_sum("value"))
    )
    total = vals.agg((F.sum("value") * 0.001).alias("thresh"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("thresh"))
        .select("l_partkey", "value")
    )


# --------------------------------------------------------------------------
# Q20 — suppliers with excess supply of a part family (semi-join chain)
# --------------------------------------------------------------------------
@register(
    "join_q20_excess_supply",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'cold%'
          AND CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING sum(CAST(round(l.l_quantity) AS BIGINT)) > 100
      )
    """,
)
def join_q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: NATION_7 suppliers who moved >100 units of
    some 'cold*' part during 1997 — the candidate list for the
    excess-inventory promotion. The IN-subquery is a left-semi join
    against the HAVING-filtered (supplier, part) aggregate; date +
    name predicates prune scan and broadcast dim before the fact
    aggregation, and the semi probe carries only suppkey."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("cold%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )
