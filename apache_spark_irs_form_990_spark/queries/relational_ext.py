"""Extended relational operators (SURVEY.md §2 Part B widening).

The reference's only query is a filter+count (CitiesCountJob.py:18-23);
everything here is EXT capability a user of a real analytics engine
expects on the same star schema: full TPC-H-Q1-style pricing summaries,
scalar/IN/correlated subqueries (via ``spark.sql`` — Catalyst's parser
is the engine's SQL surface, SURVEY §3.1), pivot/unpivot reshapes,
exact distribution statistics, percentiles, deterministic hash
sampling, range-frame windows, explode/flatten, and ordered string
aggregation.

Oracle-stability rules (see functions/money.py): any double aggregate
goes through integer cents; any threshold computed from data (e.g. a
scalar-subquery average) is computed with the same exact-integer
formula on both engines so boundary rows can't flip.

Scale notes per query are in the docstrings — the common theme: one
shuffle per groupBy/window on a well-distributed key, dimension-side
broadcasts, and no driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import (
    global_order,
    ntile_from_rn,
)
from apache_spark_irs_form_990_spark.functions.money import (
    cents,
    davg,
    dsum,
    revenue_sum,
    sql_cents,
    sql_davg,
    sql_dsum,
    sql_revenue_sum,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load, register_views


# Exact order-independent average, usable as a subquery threshold in
# both dialects (identical text is valid Spark SQL and DuckDB SQL).
_EXACT_AVG_ACCTBAL = (
    "SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)"
    " / 100.0 / count(*) FROM customer"
)


@register(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty', scale=0)},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_revenue_sum('sum_disc_price')},
           CAST(sum({sql_cents('l_extendedprice')}
                    * (100 - {sql_cents('l_discount')})
                    * (100 + {sql_cents('l_tax')})) AS DOUBLE) / 1000000.0
               AS sum_charge,
           {sql_davg('l_quantity', 'avg_qty', scale=0)},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: the full pricing summary report.

    One partial+final hash aggregate over a handful of groups — the
    shuffle moves only #groups x #partitions pre-aggregated rows, so
    the plan is scan-bound at any scale. The ship-date predicate pushes
    to the parquet scan. Charge sums integers scaled 1e6; headroom to
    ~9e18 covers ~SF100 in a single long — beyond that, swap the cast
    to decimal(38,6) (same expression shape).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") <= F.lit("1998-09-02")
    )
    charge = (
        cents("l_extendedprice") * (100 - cents("l_discount")) * (100 + cents("l_tax"))
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty", scale=0),
            dsum("l_extendedprice", "sum_base_price"),
            revenue_sum("sum_disc_price"),
            (F.sum(charge).cast("double") / 1e6).alias("sum_charge"),
            davg("l_quantity", "avg_qty", scale=0),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "subq_scalar_avg",
    oracle=f"""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > ({_EXACT_AVG_ACCTBAL})
    """,
)
def subq_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery through ``spark.sql`` — customers
    above the exact global average balance.

    Catalyst plans the subquery as a one-row broadcast (Subquery →
    ReusedSubquery), so the outer scan streams with a cheap scalar
    compare; no join materializes. The threshold uses the exact-cents
    average so both engines agree on boundary rows.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        f"SELECT c_custkey, c_name, c_acctbal FROM customer "
        f"WHERE c_acctbal > ({_EXACT_AVG_ACCTBAL})"
    )


@register(
    "subq_in_segment",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'AUTOMOBILE')
    GROUP BY o_orderpriority
    """,
)
def subq_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — orders from one market segment, counted by
    priority. Catalyst rewrites IN (subquery) to a left-semi join; the
    filtered customer side broadcasts under the threshold, so the
    orders fact never shuffles for the membership test.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderpriority, count(*) AS n_orders "
        "FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE') "
        "GROUP BY o_orderpriority"
    )


@register(
    "subq_correlated_avg",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice >
          (SELECT CAST(sum(CAST(round(p2.p_retailprice * 100) AS BIGINT)) AS DOUBLE)
                  / 100.0 / count(*)
           FROM part p2 WHERE p2.p_brand = p.p_brand)
    """,
)
def subq_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — parts priced above their brand's
    exact average. Catalyst de-correlates this into an aggregate on
    p_brand joined back to part (one shuffle on the low-cardinality
    brand key, dimension-sized right side), rather than re-running the
    inner query per row.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT p.p_partkey, p.p_brand, p.p_retailprice FROM part p "
        "WHERE p.p_retailprice > "
        "(SELECT CAST(sum(CAST(round(p2.p_retailprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 / count(*) FROM part p2 WHERE p2.p_brand = p.p_brand)"
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "agg_pivot_events",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view
    FROM events
    GROUP BY 1
    """,
)
def agg_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): daily event counts, one column per event
    type, as SINGLE-PASS conditional aggregation.

    ``DataFrame.pivot`` — even with an explicit value list — plans two
    aggregate+exchange pairs ((day,type) pre-agg, then pivotfirst by
    day). With a known value domain, one ``count_if`` per output column
    is the plan you actually want: one partial+final aggregate, ONE
    shuffle of #days×#types pre-aggregated rows (asserted in
    tests/test_plans.py). Reach for ``pivot()`` only when the value
    set must be discovered at runtime.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .agg(
            *[
                F.count_if(F.col("event_type") == t).alias(f"n_{t}")
                for t in _EVENT_TYPES
            ]
        )
    )


@register(
    "reshape_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): part metrics melted to (key, metric, val).
    Narrow, shuffle-free — each input row expands locally to one row
    per value column (Spark's Expand node), so cost is linear and
    partition-local at any scale.
    """
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "agg_stats_exact_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(round(l_quantity) AS BIGINT)) AS s1,
             sum(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS s2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))
               AS var_qty,
           sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
               AS std_qty
    FROM s
    """,
)
def agg_stats_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev via exact integer moments.

    Built-in ``var_samp``/``stddev_samp`` stream doubles and are
    order-dependent (partition merge order changes the last ulp), so
    they can't hash-match another engine. Summing integer moments (n,
    Σx, Σx²) is exact and order-independent; the closed-form variance
    is then one deterministic double expression. Same partial+final
    aggregate shape — no extra shuffle vs the built-in.
    """
    li = load(spark, sf_dir, "lineitem")
    q = cents("l_quantity", scale=0)
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
    )
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (
        F.col("n").cast("double") * (F.col("n") - 1)
    )
    return s.select(
        "l_returnflag", "n", var.alias("var_qty"), F.sqrt(var).alias("std_qty")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25_qty,
           quantile_cont(l_quantity, 0.50) AS median_qty,
           quantile_cont(l_quantity, 0.75) AS p75_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT semantics; both
    engines interpolate at position (n-1)p over integer-valued doubles,
    and 0.25/0.5/0.75 are exact binary fractions, so results match
    bit-for-bit). Spark's exact percentile collects per-group value
    counts — fine for bounded-domain columns like quantity (50 distinct
    values); for unbounded doubles at 100 TB use approx_percentile.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        F.expr("percentile(l_quantity, 0.50)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75_qty"),
    )


@register(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
    GROUP BY o_orderpriority
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample by content hash of the key.

    ``df.sample()`` is seed-and-partitioning dependent — useless for
    reproducible pipelines or cross-engine checks. Hashing the key and
    keeping one hex bucket gives the same sample on any engine, any
    partitioning, any cluster size — the pattern to use for stable
    eval-set carving at 100 TB. md5 here because both engines define it
    identically; cheap non-crypto hashes don't agree across engines.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


@register(
    "win_range_30d_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_no,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 100.0 AS sum_30d
    FROM orders
    """,
)
def win_range_30d_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per customer, rolling 30-day order value.

    The frame is value-based (days), not row-based, so same-day ties
    all land in the same frame — deterministic regardless of intra-day
    row order (a ROWS frame here would be nondeterministic AND wrong).
    One shuffle on o_custkey; frames evaluate in a single sorted pass
    per partition.
    """
    o = load(spark, sf_dir, "orders")
    day_no = F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01")).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        o.withColumn("day_no", day_no)
        .withColumn(
            "sum_30d",
            F.sum(cents("o_totalprice")).over(w).cast("double") / 100.0,
        )
        .select("o_orderkey", "o_custkey", "day_no", "sum_30d")
    )


@register(
    "win_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def win_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-event-per-user — the canonical CDC/log compaction
    pattern. row_number (not rank) with an event_id tiebreak picks
    exactly one row per key deterministically. One shuffle on user_id;
    AQE handles hot users via skew split.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
    )


@register(
    "fn_explode_tokens",
    oracle="""
    SELECT word, count(*) AS n_parts
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def fn_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode/flatten (UDTF-shaped, SURVEY A6 in pure built-ins):
    split part names into words, one output row per word, count by
    word. Generate stays inside whole-stage codegen — no Python
    boundary — and the expansion is partition-local before the
    aggregate's shuffle.
    """
    p = load(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_parts"))
    )


@register(
    "agg_string_agg_sorted",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_string_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation. collect_list order is
    partition-arrival order (nondeterministic), so the sort happens
    explicitly AFTER collection — array_sort then join. Only valid for
    bounded groups (here: nations per region); unbounded groups would
    need a capped slice first.
    """
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "join_topk_unshipped",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_revenue_sum('revenue')},
           strftime(CAST(o.o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def join_topk_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: top-10 highest-revenue unshipped orders for one
    market segment. The segment filter reduces customer to a
    broadcastable side BEFORE the join (filter-then-broadcast, not
    join-then-filter); both date predicates push to the parquet scans;
    the top-10 runs as TakeOrderedAndProject (per-partition heaps +
    driver merge of 10-row heads — no global sort at any scale).
    Deterministic under ties via the orderkey tiebreak; revenue is
    cents-exact so both engines rank identically.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1995-03-15")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue_sum("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS and_lo,
           o_orderkey | 16 AS or_hi,
           xor(o_orderkey, 255) AS xor_mask,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3
    FROM orders
    WHERE o_orderkey < 2048
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar functions (AND/OR/XOR/shifts) — integer-exact in
    any engine, all inside whole-stage codegen."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2048)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_lo"),
        k.bitwiseOR(F.lit(16)).alias("or_hi"),
        k.bitwiseXOR(F.lit(255)).alias("xor_mask"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
    )


@register(
    "fn_struct_access",
    oracle="""
    SELECT c_name,
           c_custkey AS key,
           c_acctbal AS bal,
           c_nationkey AS nk
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def fn_struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct build + field access: pack columns into a struct,
    read them back through dotted paths. Catalyst collapses the
    pack/unpack (CreateNamedStruct + GetStructField cancel out), so
    nesting is free at the physical level — the output plan is a plain
    projection, which is what the flat oracle verifies.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    packed = c.select(
        "c_name",
        F.struct(
            F.col("c_custkey").alias("key"),
            F.col("c_acctbal").alias("bal"),
            F.struct(F.col("c_nationkey").alias("nk")).alias("geo"),
        ).alias("cs"),
    )
    return packed.select(
        "c_name",
        F.col("cs.key").alias("key"),
        F.col("cs.bal").alias("bal"),
        F.col("cs.geo.nk").alias("nk"),
    )


@register(
    "agg_count_if",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_totalprice > 100000.0) AS n_big,
           count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 100000.0)
               AS n_big_cust
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (FILTER clause / count_if): conditional
    counts inside one aggregate pass — no self-join, no second scan.
    The threshold compares raw doubles, identical in both engines.
    """
    o = load(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 100000.0
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.count_if(big).alias("n_big"),
        F.count_distinct(F.when(big, F.col("o_custkey"))).alias("n_big_cust"),
    )


@register(
    "fn_try_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(split_part(text, ' ', 1) AS BIGINT) AS first_word_int,
           TRY_CAST(lang AS DOUBLE) AS lang_num
    FROM documents
    WHERE doc_id < 200
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting: TRY_CAST yields NULL instead of failing the
    job — the difference between one malformed row and a dead 100 TB
    pipeline (the declarative face of the reference's skip-bad-record
    intent, A15)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.try_to_number(F.split_part("text", F.lit(" "), F.lit(1)), F.lit("999999999"))
        .cast("long")
        .alias("first_word_int"),
        F.col("lang").try_cast("double").alias("lang_num"),
    )


@register(
    "agg_bool_and_or",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_totalprice > 400000.0) AS any_over_400k
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bool_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/some) — exact in any engine."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_over_400k"),
    )


@register(
    "fn_string_shape",
    oracle="""
    SELECT n_nationkey,
           lpad(n_name, 20, '.') AS padded,
           translate(n_name, 'AEIOU', 'aeiou') AS vowels_lower,
           repeat('-', CAST(n_nationkey % 5 AS INTEGER)) AS dashes,
           reverse(n_name) AS rev
    FROM nation
    """,
)
def fn_string_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String shaping functions (pad/translate/repeat/reverse)."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.lpad("n_name", 20, ".").alias("padded"),
        F.translate("n_name", "AEIOU", "aeiou").alias("vowels_lower"),
        F.repeat(F.lit("-"), (F.col("n_nationkey") % 5).cast("int")).alias("dashes"),
        F.reverse("n_name").alias("rev"),
    )


@register(
    "win_rank_distribution",
    oracle="""
    SELECT c_custkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal)
    """,
)
def win_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank / cume_dist /
    ntile(4) over account balance — computed scale-safe from ONE
    distributed global row_number (`global_order`: range-partition +
    per-partition rank + broadcast offsets) instead of the former
    single-task unpartitioned window. The tie-stable identities:
    rank = min(rn) within the tie group, so percent_rank =
    (min(rn)−1)/(N−1); cume_dist = max(rn)/N; ntile gets the
    unique-key tiebreak (its bucket boundary cuts through ties), so
    its bucket is `ntile_from_rn` of rn directly. The tie-group
    min/max windows partition BY the order value (c_acctbal) — never
    empty partition specs — and N broadcasts as a 1-row cross join.
    All three are IEEE divisions of exact integers, hash-identical to
    the engines' built-ins."""
    c = load(spark, sf_dir, "customer")
    ranked = global_order(
        c.select("c_custkey", "c_acctbal"),
        ["c_acctbal", "c_custkey"],
        rn_col="_rn",
    )
    total = c.agg(F.count(F.lit(1)).alias("_total"))
    wtie = Window.partitionBy("c_acctbal")
    return (
        ranked.withColumn("_min_rn", F.min("_rn").over(wtie))
        .withColumn("_max_rn", F.max("_rn").over(wtie))
        .crossJoin(F.broadcast(total))
        .select(
            "c_custkey",
            # N=1 guard: built-in percent_rank (and the oracle) define
            # the degenerate single-row ranking as 0.0, not 0/0=NaN
            F.when(
                F.col("_total") > 1,
                (F.col("_min_rn") - 1).cast("double") / (F.col("_total") - 1),
            )
            .otherwise(F.lit(0.0))
            .alias("pr"),
            (F.col("_max_rn").cast("double") / F.col("_total")).alias("cd"),
            ntile_from_rn(F.col("_rn"), F.col("_total"), 4).alias("quartile"),
        )
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersection (multiplicity = min of the two
    sides), completing the set-op family in sorts_sets.py."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@register(
    "join_range_bucketed",
    oracle="""
    SELECT p.event_id,
           count(*) AS n_nearby
    -- DISTINCT probe side: the Spark plan's bucket-dedup distinct also
    -- collapses duplicated purchase rows, so the oracle must probe
    -- each distinct purchase row once (build side keeps multiplicity).
    -- Dedup on exactly the columns the Spark plan projects —
    -- (user_id, event_id, ts) — not DISTINCT *: a duplicated event_id
    -- whose rows differ only in an UNPROJECTED column stays 2 rows
    -- under DISTINCT * but 1 under the plan's projection-then-distinct
    -- (ADVICE r7)
    FROM (SELECT DISTINCT user_id, event_id, ts
          FROM events WHERE event_type = 'purchase') p
    JOIN events o
      ON o.user_id = p.user_id
     AND abs(epoch_us(CAST(o.ts AS TIMESTAMP))
             - epoch_us(CAST(p.ts AS TIMESTAMP))) <= 3600000000
    GROUP BY p.event_id
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucket decomposition: events within ±1 hour of
    each purchase, same user.

    A naive range join degenerates to nested-loop (Spark plans
    BroadcastNestedLoopJoin or a per-key cross product). The scalable
    form quantizes time into range-sized buckets: each probe row
    expands to its bucket ±1 (3 rows), the build side keeps one bucket
    per row, the join is pure EQUI on (user, bucket), and the exact
    range predicate filters residually. Probe amplification is
    constant (3×) and the join uses hash machinery — at 100 TB this is
    the difference between a shuffle join and a cross product. Same
    decomposition generalizes to any banded interval join (IP ranges,
    genomic intervals, price bands).
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    HOUR = 3_600_000_000
    probe = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("p_event_id"),
            F.col("us").alias("p_us"),
            # integer `div`, not floor(a/b): double division of large
            # epoch-micros can round across a bucket boundary
            F.explode(
                F.array(
                    F.expr(f"(us - {HOUR}) div {HOUR}"),
                    F.expr(f"us div {HOUR}"),
                    F.expr(f"(us + {HOUR}) div {HOUR}"),
                )
            ).alias("bucket"),
        )
        # corner case: ±1h may land in the same bucket as the center
        .distinct()
    )
    build = e.select(
        "user_id", F.col("us").alias("o_us"), F.expr(f"us div {HOUR}").alias("bucket")
    )
    return (
        probe.join(build, on=["user_id", "bucket"])
        .filter(F.abs(F.col("o_us") - F.col("p_us")) <= HOUR)
        .groupBy(F.col("p_event_id").alias("event_id"))
        .agg(F.count("*").alias("n_nearby"))
    )


@register(
    "agg_histogram_bins",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via arithmetic binning — one aggregate
    pass, bins computable in codegen; the building block for
    distribution dashboards over arbitrarily large tables (the shuffle
    carries only #bins rows per partition)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("long").alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double") / 100.0).alias("sum_price"),
        )
    )


@register(
    "win_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_ok,
           last_value(o_orderkey) OVER w AS last_ok,
           nth_value(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with an explicit UNBOUNDED..UNBOUNDED
    frame. The default frame (UNBOUNDED..CURRENT ROW) makes last_value
    a row-dependent trap — always state the frame; orderkey tiebreak
    makes tied dates deterministic."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers — distinguishes 'NULL because
    subtotal row' from 'NULL because the data is null', which any
    consumer of multi-level aggregates needs."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count("*").alias("n"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n"
        )
    )


@register(
    "agg_corr_covar",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(round(l_quantity) AS BIGINT)) AS sx,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
             sum(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_quantity) AS BIGINT)) AS sxx,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS syy,
             sum(CAST(round(l_quantity) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 100.0
             AS covar_qty_price,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_qty_price
    FROM m
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance and Pearson correlation, cross-engine exact.

    Built-in ``corr``/``covar_samp`` stream doubles in partition order
    and can't hash-match another engine. Here the per-group moments
    (n, Σx, Σy, Σx², Σy², Σxy) accumulate as EXACT int64 (binding term
    Σ(price-cents)² ≈ 7.4e18 < 2^63 at sf0.1; scale y down at larger
    SFs), then the closed forms evaluate in double with the SAME
    operation sequence in both engines — exact identical inputs +
    identical IEEE arithmetic = bit-identical outputs. The n·Σy² style
    products live in double deliberately: as int64 they would overflow
    (Spark wraps silently, DuckDB throws — worse, differently).
    """
    li = load(spark, sf_dir, "lineitem")
    x = cents("l_quantity", scale=0)
    y = cents("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    num = nd * sxyd - sxd * syd
    return m.select(
        "l_returnflag",
        "n",
        (num / (nd * (nd - 1.0)) / 100.0).alias("covar_qty_price"),
        (num / (F.sqrt(nd * sxxd - sxd * sxd) * F.sqrt(nd * syyd - syd * syd))).alias(
            "corr_qty_price"
        ),
    )


@register(
    "agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(38, 0))
                    * CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                           AS DECIMAL(38, 0)))
                AS VARCHAR) AS sum_sq_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL(38) exact aggregation — the documented fallback when
    integer-cents sums would overflow int64 (agg_pricing_summary /
    agg_corr_covar docstrings). Σ(price-cents)² ≈ 7.4e18 per group at
    sf0.1 is near the int64 cliff; in DECIMAL(38,0) the same sum has
    20 digits of headroom and stays EXACT, at ~1.8x the cost of a long
    sum (decimal leaves codegen's primitive path — measured, not
    guessed). Output as string: a 19+ digit exact value can't round-
    trip a double, and the driver hash compares strings fine."""
    li = load(spark, sf_dir, "lineitem")
    y = cents("l_extendedprice").cast("decimal(38,0)")
    return li.groupBy("l_returnflag").agg(
        F.sum(y * y).cast("decimal(38,0)").cast("string").alias("sum_sq_cents")
    )


@register(
    "agg_distinct_multi",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_orderpriority) AS n_prio,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) over different columns in one pass —
    Catalyst plans this with an Expand node (one row replica per
    distinct aggregate) feeding a single aggregate tree, instead of N
    self-joined subqueries. The expansion factor equals the number of
    distinct aggregates: fine for 2-3, a reason to switch to
    approx_count_distinct beyond that."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_cust"),
        F.count_distinct("o_orderpriority").alias("n_prio"),
        F.count("*").alias("n_orders"),
    )


@register(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
             / CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0
             AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price: Σ(w·x)/Σw with both sums exact
    integers, one division at the end — the order-independent form of
    every weighted metric (weighted quality scores, token-weighted
    perplexity, revenue-weighted ratings)."""
    li = load(spark, sf_dir, "lineitem")
    w = cents("l_quantity", scale=0)
    x = cents("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        (
            F.sum(x * w).cast("double") / F.sum(w).cast("double") / 100.0
        ).alias("wavg_price")
    )


@register(
    "win_change_detection",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           event_type
    FROM (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS prev_type
      FROM events
    )
    WHERE prev_type IS NULL OR event_type != prev_type
    """,
)
def win_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change detection (SCD compaction): keep only rows where the
    tracked value differs from the key's previous row — collapses
    steady-state repetition into transitions, the step before loading
    a type-2 dimension or compacting a CDC log. One lag window, one
    filter; rows out ≈ number of real changes, not input size."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        e.withColumn("prev_type", prev)
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
        )
    )


@register(
    "agg_argmin_struct",
    oracle="""
    SELECT o_orderstatus,
           m.p AS min_price,
           CAST(m.k AS BIGINT) AS min_price_orderkey
    FROM (
      SELECT o_orderstatus,
             min({'p': o_totalprice, 'k': o_orderkey}) AS m
      FROM orders
      GROUP BY o_orderstatus
    )
    """,
)
def agg_argmin_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin via struct ordering: min(struct(value, key)) compares
    lexicographically, so the key rides along with the extreme value
    AND breaks value ties deterministically — the tie-safe form of
    min_by/arg_min (which pick an arbitrary row among equal minima in
    both engines). Single aggregate pass, no window, no self-join."""
    o = load(spark, sf_dir, "orders")
    s = F.min(F.struct(F.col("o_totalprice"), F.col("o_orderkey"))).alias("m")
    return (
        o.groupBy("o_orderstatus")
        .agg(s)
        .select(
            "o_orderstatus",
            F.col("m.o_totalprice").alias("min_price"),
            F.col("m.o_orderkey").cast("long").alias("min_price_orderkey"),
        )
    )


@register(
    "agg_skew_salted_twostage",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_skew_salted_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: the skewed-GROUP-BY remedy (the
    join-side twin is join_skew_salted). Stage 1 groups by
    (key, key-derived salt) so a hot key's rows spread across R
    reducers; stage 2 merges the R partials per key — a tiny shuffle.
    Catalyst's partial aggregation already does this implicitly when
    upstream partitioning is random, but after a prior shuffle ON the
    hot key (sort, window, join output) partials collapse to one task
    — explicit salting restores the spread. Result provably equals the
    plain groupBy (the oracle)."""
    R = 8
    e = load(spark, sf_dir, "events")
    stage1 = (
        e.withColumn("salt", (F.col("event_id") % R).cast("int"))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("pcents"),
        )
    )
    return stage1.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        (F.sum("pcents").cast("double") / 100.0).alias("sum_value"),
    )


@register(
    "agg_gini_concentration",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY o_totalprice, o_orderkey) AS i,
             count(*) OVER (PARTITION BY c_nationkey) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_nationkey,
           CAST(max(n) AS BIGINT) AS n_orders,
           2.0 * CAST(sum(i * cents) AS DOUBLE)
             / (CAST(max(n) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
             - (CAST(max(n) AS DOUBLE) + 1.0) / CAST(max(n) AS DOUBLE)
             AS gini
    FROM ranked
    GROUP BY c_nationkey
    """,
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per customer nation — the
    concentration/inequality metric (is revenue dominated by a few
    giant orders?). Uses the sorted-rank identity
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n with integer cents and a
    deterministic rank (ties share equal x, so any rank order among
    ties yields the same Σ(i·xᵢ) — but the orderkey tiebreak pins it
    anyway). One window + one aggregate on the same partitioning."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_nationkey", cents("o_totalprice").alias("cents"), "o_totalprice", "o_orderkey"
    )
    w = Window.partitionBy("c_nationkey").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("c_nationkey")
    ranked = joined.select(
        "c_nationkey",
        "cents",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wn).alias("n"),
    )
    nd = F.max("n").cast("double")
    return ranked.groupBy("c_nationkey").agg(
        F.max("n").cast("long").alias("n_orders"),
        (
            2.0 * F.sum(F.col("i") * F.col("cents")).cast("double")
            / (nd * F.sum("cents").cast("double"))
            - (nd + 1.0) / nd
        ).alias("gini"),
    )


@register(
    "join_q5_local_supplier",
    oracle=f"""
    SELECT n.n_name,
           {sql_revenue_sum('revenue')}
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def join_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: revenue from LOCAL commerce — line items where
    the supplier sits in the customer's own nation, one Asian-region
    row per nation. The distinctive edge is supplier⋈(suppkey AND
    c_nation = s_nation): a join predicate spanning two dimension
    paths. nation/region broadcast by hint; customer/supplier join
    under AQE (they scale with SF); lineitem⋈orders is the only
    shuffle pair, so the plan scales with the fact side alone."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue_sum("revenue"))
    )


@register(
    "win_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_filled
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      FROM events
    )
    """,
)
def win_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): nulls take the
    key's most recent non-null value in event-time order — the
    sensor/price gap-fill primitive. last(ignorenulls) over a running
    frame is linear per partition; no self-join, no as-of lookup.
    (Every 5th value is nulled deterministically so the fill is
    observable in the fixture.)"""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )
