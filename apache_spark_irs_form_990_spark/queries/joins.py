"""Join operators (SURVEY.md §2 B3 — all EXT; the reference has no joins).

Scale posture for every join here:

- **Constant-size dimensions broadcast by hint; scaling dimensions by
  AQE.** nation (25 rows) and region (5) are constant at any SF —
  `F.broadcast()` is always right for them. customer/supplier/part
  grow with SF, so they carry NO hint: an explicit hint overrides
  AQE's size check and becomes an executor OOM at 100x scale, whereas
  the unhinted join broadcasts while the dim fits
  autoBroadcastJoinThreshold and degrades to shuffle past it. Verify
  with ``.explain``: no Exchange on the fact side of a hinted dim
  join.
- **Fact-fact joins shuffle on the join key** (sort-merge); AQE's
  skew-join splitting (on in session.py) handles hot keys at runtime.
- **Semi/anti instead of distinct-after-join** — existence tests never
  materialize the join product.
- **As-of join is a window composition**, not a per-key loop: union the
  two tagged sides, one shuffle on (user_id), one sort by ts — linear
  in rows, no range explosion, no driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import (
    revenue_sum,
    sql_revenue_sum,
)
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


@register(
    "join_inner_equi",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           {sql_revenue_sum('revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (lineitem x orders) + aggregate.

    Both sides shuffle on orderkey (sort-merge at scale); AQE may flip
    to broadcast at small SF where orders fits the threshold.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), revenue_sum("revenue"))
    )


@register(
    "join_star_revenue",
    oracle=f"""
    SELECT n.n_name,
           r.r_name,
           {sql_revenue_sum('revenue')},
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-join showcase (SURVEY §7 M3): 5-table star-schema
    revenue rollup. nation/region broadcast by hint (constant 25/5
    rows at any SF); customer is deliberately UNhinted — it scales
    with SF (150k x SF), so AQE broadcasts it while it fits and
    degrades to a shuffle join past the threshold instead of OOMing
    the cluster. Only the lineitem⋈orders edge must shuffle, so the
    plan survives a 1000x fact scale-up."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(revenue_sum("revenue"), F.count("*").alias("n_lines"))
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT n.n_name, count(*) AS n_cust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join on the smallest dimension. The
    25-row nation table ships to every executor; customer never
    shuffles for the join."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double") / 100.0).alias("sum_bal"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_cust
      FROM customer GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cust.nationkey, supp.nationkey) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated sides (nations with customers
    but no suppliers and vice versa both survive)."""
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, "nationkey", "full")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence test as left-semi join: no duplication, the orders side
    is only probed, never materialized into the output."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence test as left-anti join (customers with no orders)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT n1.n_name AS name_a, n2.n_name AS name_b, n1.n_regionkey AS regionkey
    FROM nation n1
    JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey
     AND n1.n_nationkey < n2.n_nationkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: unordered pairs of nations within a
    region. The equi part (regionkey) keys the join; the range
    predicate evaluates as a post-join residual — at scale this is the
    pattern that keeps a theta join out of nested-loop territory."""
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(
        F.col("n1.n_name").alias("name_a"),
        F.col("n2.n_name").alias("name_b"),
        F.col("n1.n_regionkey").alias("regionkey"),
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit key-salting: the manual remedy for skewed shuffle joins,
    shown on orders⋈customer (result identical to the plain join — the
    oracle proves salting is correctness-neutral).

    Mechanics: the fact side gets a deterministic salt from its own
    unique key (``o_orderkey % R`` — NOT rand(), which breaks retries
    and reproducibility); the build side replicates R times via a
    posexplode'd literal array. The join key becomes (custkey, salt),
    so one hot customer's rows spread over R reducer partitions instead
    of one straggler task. Costs R× replication of the build side —
    use for diagnosed hot keys (or just enable AQE skew-join, as
    session.py does, when runtime splitting suffices; this operator is
    the portable form for engines/pipelines where AQE can't see the
    skew, e.g. skewed aggregations before a join).
    """
    R = 4
    o = load(spark, sf_dir, "orders").withColumn(
        "salt", (F.col("o_orderkey") % R).cast("int")
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.posexplode(F.array(*[F.lit(i) for i in range(R)])).alias("pos", "salt"),
    ).drop("pos")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double") / 100.0).alias("sum_price"),
        )
    )


@register(
    "join_asof_event",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_us,
           epoch_us(CAST(c.ts AS TIMESTAMP)) AS last_click_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
    """,
)
def join_asof_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY B3 `join_asof_event`): for each purchase, the
    latest click of the same user at-or-before it.

    Spark has no native ASOF JOIN; a range join explodes and
    per-group pandas merge_asof caps at group size. This composition is
    the scalable form: union the tagged sides, ONE shuffle on user_id,
    one sort by ts, last_value(ignoreNulls) carried forward. Linear
    cost, no row explosion, works on a billion users.

    Tie rule (click.ts == purchase.ts matches) is encoded in the sort:
    clicks order before purchases at equal ts.
    """
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(1).alias("kind"), "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = clicks.unionByName(purchases).withColumn(
        "last_click_ts",
        F.last(F.when(F.col("kind") == 0, F.col("ev_ts")), ignorenulls=True).over(w),
    )
    return (
        tagged.filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ev_ts").alias("purchase_us"),
            F.unix_micros("last_click_ts").alias("last_click_us"),
        )
    )


@register(
    "join_q4_late_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND CAST(l.l_shipdate AS DATE)
            > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def join_q4_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: orders having at least one line item shipped
    more than 60 days after ordering, counted by priority. The
    correlated EXISTS with a cross-table date predicate becomes a
    left-semi join whose condition spans both sides — the semi join
    still probes (never materializes) the lineitem side."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        F.to_date(li.l_shipdate) > F.date_add(F.to_date(o.o_orderdate), 60)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "join_q10_returned_topk",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_revenue_sum('revenue')}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def join_q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top-20 customers by revenue on RETURNED items
    — the churn-risk report. The returnflag filter pushes into the
    lineitem scan (reads a fraction of the fact before any join);
    nation broadcasts by hint; customer joins under AQE (it scales
    with SF); top-20 via TakeOrderedAndProject with a
    custkey tiebreak for determinism."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue_sum("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             event_type = 'purchase' AS is_p
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    framed AS (
      SELECT user_id, event_id, ts, is_p,
             last_value(CASE WHEN NOT is_p THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_click_us,
             first_value(CASE WHEN NOT is_p THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click_us
      FROM tagged
    )
    SELECT user_id, event_id,
           epoch_us(ts) AS purchase_us,
           CASE
             WHEN prev_click_us IS NULL THEN next_click_us
             WHEN next_click_us IS NULL THEN prev_click_us
             WHEN epoch_us(ts) - prev_click_us <= next_click_us - epoch_us(ts)
               THEN prev_click_us
             ELSE next_click_us
           END AS nearest_click_us
    FROM framed
    WHERE is_p
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join, BOTH directions: each purchase pairs
    with its temporally closest click, before or after (the
    backward-only variant is `join_asof_event`). Same union-and-window
    composition — one (user_id) shuffle, one sort serves both the
    backward `last_value` and forward `first_value` scans; ties at
    equal distance resolve backward deterministically. No range
    self-join, so cost stays linear in events at any scale."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    tagged = e.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "purchase").alias("is_p"),
    )
    order = [F.col("ts"), F.col("is_p"), F.col("event_id")]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    click_us = F.when(~F.col("is_p"), F.unix_micros("ts"))
    framed = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "is_p",
        F.last(click_us, ignorenulls=True).over(w_prev).alias("prev_click_us"),
        F.first(click_us, ignorenulls=True).over(w_next).alias("next_click_us"),
    )
    us = F.unix_micros("ts")
    nearest = (
        F.when(F.col("prev_click_us").isNull(), F.col("next_click_us"))
        .when(F.col("next_click_us").isNull(), F.col("prev_click_us"))
        .when(
            us - F.col("prev_click_us") <= F.col("next_click_us") - us,
            F.col("prev_click_us"),
        )
        .otherwise(F.col("next_click_us"))
    )
    return framed.filter("is_p").select(
        "user_id",
        "event_id",
        us.alias("purchase_us"),
        nearest.alias("nearest_click_us"),
    )


@register(
    "join_bloom_runtime_filter",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           {sql_revenue_sum('revenue')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderpriority
    """,
)
def join_bloom_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dimension fact join written to exploit Spark's RUNTIME
    BLOOM FILTER join pruning (on by default since 3.4): the optimizer
    builds a bloom filter over the filtered orders side's join keys and
    injects `might_contain(xxhash64(l_orderkey))` into the lineitem
    scan filter, so ~80% of fact rows drop BEFORE the shuffle — the
    runtime analogue of static predicate pushdown, for predicates that
    only exist after another table is filtered.

    At test SF the 10 GB `applicationSideScanSizeThreshold` exempts the
    tiny fact scan, so the query plans as a plain filtered join (same
    result either way — the bloom is semantically transparent);
    tests/test_plans.py lowers the threshold to the at-scale condition
    and asserts the might_contain filter lands in the fact scan. At
    100 TB the thresholds trigger untouched."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), revenue_sum("revenue"))
    )
