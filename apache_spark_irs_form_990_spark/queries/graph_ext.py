"""Graph / association analytics — PageRank power iterations, triangle
census, degree distributions, association-rule lift, seasonality
profiles and heavy-hitter carves (SURVEY.md §2 B11 continuation).

All EXT relative to the reference (which has no joins at all —
SURVEY.md §2 "Operators the reference does NOT have"); these build the
graph-shaped analyses a relationship-bearing warehouse runs on top of
the same star schema the relational queries use.

Scale stance: every graph here is an *aggregated* edge table (nation
trade flows: ≤ |nations|², part co-purchase: bounded by per-order
line-pair combinations), so the expensive distributed work is the edge
construction over the fact tables — shuffles keyed on join keys with
map-side combine — while the iterative / self-join stages run on the
collapsed edge list. Edge tables feeding multiple downstream subplans
or iterations are `localCheckpoint`-ed once so Spark does not replay
the fact-table joins per iteration (same pattern as
`dedup_cluster_components`).

Determinism: ranks and thresholds use exact integer arithmetic
(nano-rank units, `DIV` integer division, integer cross-multiplied
predicates); ratio outputs are single IEEE divisions of exact integers
with identical association order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


def copurchase_edges(spark: SparkSession, sf_dir: str, support: int) -> DataFrame:
    """Undirected part co-purchase edges (pa < pb) appearing in at least
    `support` distinct orders. The self-join is keyed on l_orderkey, so
    both sides share one exchange and the pair blow-up is bounded by
    (lines-per-order choose 2) per order regardless of table size."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, (a.ok == b.ok2) & (a.pa < b.pb))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= support)
    )


_SQL_COPURCHASE = """
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                 CAST(count(*) AS BIGINT) AS n_ab
          FROM items a
          JOIN items b ON a.l_orderkey = b.l_orderkey
                      AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= {support})
"""


@register(
    "graph_pagerank_nations",
    oracle="""
    WITH e AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    wout AS (SELECT src, sum(w) AS wt FROM e GROUP BY src),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nation),
    r0 AS (SELECT n_nationkey AS node,
                  CAST(1000000000 AS BIGINT) // cnt AS rank
           FROM nation, nn),
    i1 AS (SELECT e.dst, CAST(sum((r.rank * e.w) // w2.wt) AS BIGINT) AS s
           FROM e JOIN r0 r ON e.src = r.node JOIN wout w2 ON e.src = w2.src
           GROUP BY e.dst),
    r1 AS (SELECT n.n_nationkey AS node,
                  (CAST(150000000 AS BIGINT) // cnt)
                  + (85 * coalesce(i1.s, CAST(0 AS BIGINT))) // 100 AS rank
           FROM nation n LEFT JOIN i1 ON n.n_nationkey = i1.dst, nn),
    i2 AS (SELECT e.dst, CAST(sum((r.rank * e.w) // w2.wt) AS BIGINT) AS s
           FROM e JOIN r1 r ON e.src = r.node JOIN wout w2 ON e.src = w2.src
           GROUP BY e.dst),
    r2 AS (SELECT n.n_nationkey AS node,
                  (CAST(150000000 AS BIGINT) // cnt)
                  + (85 * coalesce(i2.s, CAST(0 AS BIGINT))) // 100 AS rank
           FROM nation n LEFT JOIN i2 ON n.n_nationkey = i2.dst, nn),
    i3 AS (SELECT e.dst, CAST(sum((r.rank * e.w) // w2.wt) AS BIGINT) AS s
           FROM e JOIN r2 r ON e.src = r.node JOIN wout w2 ON e.src = w2.src
           GROUP BY e.dst),
    r3 AS (SELECT n.n_nationkey AS node,
                  (CAST(150000000 AS BIGINT) // cnt)
                  + (85 * coalesce(i3.s, CAST(0 AS BIGINT))) // 100 AS rank
           FROM nation n LEFT JOIN i3 ON n.n_nationkey = i3.dst, nn)
    SELECT n.n_name AS nation, r3.rank AS rank_nano,
           CAST(r3.rank AS DOUBLE) / 1000000000.0 AS pagerank
    FROM r3 JOIN nation n ON r3.node = n.n_nationkey
    """,
)
def graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 3 power iterations) over the directed nation
    trade graph: edge u→v weighted by lineitems a customer in nation u
    bought from a supplier in nation v. The heavy distributed work is
    the edge aggregation (one fact-table shuffle pair; supplier is
    broadcast, the orders⋈customer side stays a shuffle join since
    customer grows with SF); the ≤|nations|² edge table is then
    `localCheckpoint`-ed so the three iterations replay a 625-row join,
    never the fact scan. Ranks live in exact integer nano-units with
    truncating DIV at every step — identical trajectories on both
    engines, no floating accumulation. Headroom: rank(≤1e9) × edge
    weight stays under 2^63 until edge weights reach ~9e9 lineitems
    per nation pair (beyond SF 1000); normalize weights per-mille
    first if ever wider."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count("*").cast("long").alias("w"))
    ).localCheckpoint()

    wout = edges.groupBy("src").agg(F.sum("w").alias("wt"))
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    n_df = nation.agg(F.count("*").cast("long").alias("cnt"))

    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr("CAST(1000000000 AS BIGINT) DIV cnt").alias("rank")
    )
    for _ in range(3):
        contrib = (
            edges.join(F.broadcast(ranks), edges.src == ranks.node)
            .join(F.broadcast(wout), "src")
            .select("dst", F.expr("(rank * w) DIV wt").alias("c"))
        )
        inbound = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(F.broadcast(inbound), F.col("node") == F.col("dst"), "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    F.expr("CAST(150000000 AS BIGINT) DIV cnt")
                    + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")
                ).alias("rank"),
            )
        )
    return ranks.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("node") == F.col("n_nationkey"),
    ).select(
        F.col("n_name").alias("nation"),
        F.col("rank").alias("rank_nano"),
        (F.col("rank").cast("double") / 1000000000.0).alias("pagerank"),
    )


@register(
    "graph_triangle_count",
    oracle="WITH "
    + _SQL_COPURCHASE.format(support=2)
    + """,
    tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.pb = e2.pa
            JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
    nodes AS (SELECT CAST(count(DISTINCT p) AS BIGINT) AS n_nodes
              FROM (SELECT pa AS p FROM e UNION ALL SELECT pb FROM e)),
    ecnt AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
    SELECT n_nodes, n_edges, n_triangles FROM nodes, ecnt, tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (support ≥ 2):
    node count, edge count, and closed-triangle count — the clustering
    signal behind community detection. Triangles enumerate via the
    canonical ordered pattern (x<y<z as (x,y)⋈(y,z)⋈(x,z)), so each
    triangle is produced exactly once and the join fan-out is bounded
    by the graph's degeneracy, not |E|². The support filter collapses
    the edge list before the self-joins, and the edge table is
    `localCheckpoint`-ed since three downstream subplans reuse it."""
    e = copurchase_edges(spark, sf_dir, support=2).select("pa", "pb").localCheckpoint()
    e1 = e.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = e.select(F.col("pa").alias("y2"), F.col("pb").alias("z"))
    e3 = e.select(F.col("pa").alias("x3"), F.col("pb").alias("z3"))
    tri = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    nodes = (
        e.select(F.explode(F.array("pa", "pb")).alias("p"))
        .agg(F.count_distinct("p").cast("long").alias("n_nodes"))
    )
    ecnt = e.agg(F.count("*").cast("long").alias("n_edges"))
    return nodes.crossJoin(ecnt).crossJoin(tri)


@register(
    "graph_degree_distribution",
    oracle="WITH "
    + _SQL_COPURCHASE.format(support=2)
    + """,
    deg AS (SELECT p, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT pa AS p FROM e UNION ALL SELECT pb AS p FROM e)
            GROUP BY p)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_parts
    FROM deg GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the co-purchase graph (support ≥ 2): how
    many parts have k co-purchase partners — the shape diagnostic
    (power-law vs uniform) that sizes any downstream graph algorithm.
    Each undirected edge contributes one endpoint record per side
    (edges are distinct pairs, so partner counts need no dedup); both
    aggregation levels are plain partial+final hash aggregates."""
    e = copurchase_edges(spark, sf_dir, support=2)
    deg = (
        e.select(F.explode(F.array("pa", "pb")).alias("p"))
        .groupBy("p")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count("*").cast("long").alias("n_parts"))


@register(
    "beh_assoc_lift",
    oracle="WITH "
    + _SQL_COPURCHASE.format(support=3)
    + """,
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM
            (SELECT DISTINCT l_orderkey FROM items)),
    ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM items
           GROUP BY 1)
    SELECT pa, pb, n_ab,
           CAST(n_ab AS DOUBLE) / ca.n AS confidence_a_b,
           CAST(n_ab AS DOUBLE) * t.n_orders / ca.n / cb.n AS lift
    FROM e
    JOIN ic ca ON e.pa = ca.l_partkey
    JOIN ic cb ON e.pb = cb.l_partkey
    CROSS JOIN tot t
    ORDER BY CAST(n_ab AS DOUBLE) * t.n_orders / ca.n / cb.n DESC, pa, pb
    LIMIT 30
    """,
)
def beh_assoc_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchases: top-30 part pairs by lift
    (P(ab)/(P(a)P(b))) with support ≥ 3, plus directional confidence
    P(b|a) — the `join_basket_pairs` co-occurrence counts upgraded to
    normalized rule strength. Per-part counts and the basket total are
    broadcast against the (support-filtered, tiny) pair table. Lift is
    ONE left-associated chain of IEEE ops over exact integers —
    `n_ab * N / n_a / n_b` written identically on both engines — so the
    ranking key is bit-identical and needs no rounding; full (pa, pb)
    tiebreak makes the limit deterministic."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pairs = copurchase_edges(spark, sf_dir, support=3)
    ic = items.groupBy("l_partkey").agg(F.count("*").cast("long").alias("n"))
    tot = items.select("l_orderkey").distinct().agg(
        F.count("*").cast("long").alias("n_orders")
    )
    ca = ic.select(F.col("l_partkey").alias("pa"), F.col("n").alias("n_a"))
    cb = ic.select(F.col("l_partkey").alias("pb"), F.col("n").alias("n_b"))
    joined = (
        pairs.join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .crossJoin(F.broadcast(tot))
    )
    lift = (
        F.col("n_ab").cast("double") * F.col("n_orders") / F.col("n_a") / F.col("n_b")
    )
    return (
        joined.select(
            "pa",
            "pb",
            "n_ab",
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence_a_b"),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(30)
    )


@register(
    "ts_seasonality_dow",
    oracle="""
    SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY event_type) AS share_of_type,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 / count(*) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: volume, share of
    that type's weekly traffic, and mean value (exact integer cents).
    ISO day numbering (Monday=1) on both engines — Spark's `weekday`
    (Monday=0) shifted by one, DuckDB's `isodow` — sidesteps the
    locale-dependent `dayofweek` builtins. The share normalizer is an
    unordered window over the 7×|types| aggregate, not a second pass
    over events."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(
        (F.weekday("ts") + 1).cast("long").alias("dow"), "event_type"
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(cents("value")).alias("v_cents"),
    )
    share = F.col("n").cast("double") / F.sum("n").over(
        Window.partitionBy("event_type")
    )
    return agg.select(
        "dow",
        "event_type",
        "n",
        share.alias("share_of_type"),
        (F.col("v_cents").cast("double") / 100.0 / F.col("n")).alias("avg_value"),
    )


@register(
    "agg_heavy_hitters",
    oracle="""
    WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY user_id),
    t AS (SELECT sum(n) AS tot, CAST(count(*) AS BIGINT) AS n_users FROM c)
    SELECT user_id, n,
           CAST(n AS DOUBLE) / t.tot AS share,
           CAST(n AS DOUBLE) * t.n_users / t.tot AS mean_ratio
    FROM c, t
    WHERE n * n_users * 100 > tot * 115
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter carve: users whose event volume exceeds 1.15× the
    per-user mean, with traffic share and mean-multiple. The threshold
    is the cross-multiplied integer predicate
    `n · n_users · 100 > total · 115` — no division, no float compare,
    scale-free (tracks the mean as SF grows). One aggregation pass
    builds per-user counts; the 2-scalar totals row broadcasts back
    over them."""
    e = load(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))
    t = c.agg(
        F.sum("n").alias("tot"), F.count("*").cast("long").alias("n_users")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .filter(F.col("n") * F.col("n_users") * 100 > F.col("tot") * 115)
        .select(
            "user_id",
            "n",
            (F.col("n").cast("double") / F.col("tot")).alias("share"),
            (F.col("n").cast("double") * F.col("n_users") / F.col("tot")).alias(
                "mean_ratio"
            ),
        )
    )


@register(
    "graph_jaccard_neighbors",
    oracle="WITH "
    + _SQL_COPURCHASE.format(support=2)
    + """,
    d AS (SELECT pa AS u, pb AS v FROM e
          UNION ALL SELECT pb, pa FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM d GROUP BY u),
    common AS (
      SELECT a.u AS pa, b.u AS pb, CAST(count(*) AS BIGINT) AS cn
      FROM d a JOIN d b ON a.v = b.v AND a.u < b.u
      GROUP BY 1, 2
    )
    SELECT c.pa, c.pb, c.cn AS n_common, da.dg AS deg_a, db.dg AS deg_b,
           round(CAST(c.cn AS DOUBLE) / (da.dg + db.dg - c.cn), 6) AS jaccard
    FROM common c
    JOIN deg da ON c.pa = da.u
    JOIN deg db ON c.pb = db.u
    ORDER BY CAST(c.cn AS DOUBLE) / (da.dg + db.dg - c.cn) DESC, c.pa, c.pb
    LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural node similarity: Jaccard overlap of co-purchase
    neighborhoods for the 20 most-similar part pairs — the link-
    prediction / substitute-product primitive. Built on the same
    support-filtered edge list as [[graph_triangle_count]]
    (`localCheckpoint`-ed once, reused by the degree table and both
    sides of the wedge join). Common-neighbor counting is the
    canonical ordered wedge join (u<w sharing v), whose fan-out is
    Σ_v deg(v)² over the SUPPORT-FILTERED graph — the support
    threshold is the scale knob, exactly as in the triangle census.
    Jaccard = cn/(deg_a+deg_b-cn) is one IEEE division of exact
    integers; top-20 orders by that ratio (bit-identical both
    engines) with full id tiebreaks, planning as
    TakeOrderedAndProject."""
    e = copurchase_edges(spark, sf_dir, support=2).select("pa", "pb").localCheckpoint()
    d = e.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionAll(
        e.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = d.groupBy("u").agg(F.count("*").cast("long").alias("dg"))
    a = d.select(F.col("u").alias("pa"), F.col("v").alias("w"))
    b = d.select(F.col("u").alias("pb"), F.col("v").alias("w2"))
    common = (
        a.join(b, (F.col("w") == F.col("w2")) & (F.col("pa") < F.col("pb")))
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("long").alias("cn"))
    )
    da = deg.select(F.col("u").alias("pa"), F.col("dg").alias("deg_a"))
    db = deg.select(F.col("u").alias("pb"), F.col("dg").alias("deg_b"))
    j = (
        common.join(da, "pa")
        .join(db, "pb")
        .select(
            "pa",
            "pb",
            F.col("cn").alias("n_common"),
            "deg_a",
            "deg_b",
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
    )
    key = F.col("n_common").cast("double") / (
        F.col("deg_a") + F.col("deg_b") - F.col("n_common")
    )
    return j.orderBy(key.desc(), "pa", "pb").limit(20)
