"""Data-layout sinks: partitioned and bucketed writes (SURVEY.md §4.2
"100 TB posture").

The reference writes flat managed tables (IRSSpark.py:183-188). At
100 TB, layout IS the optimization: directory partitioning turns
selective scans into partition pruning (read 1/N of the data before a
single row is decoded), and bucketing pre-shuffles fact tables on
their join key so repeated joins run with ZERO exchanges. Both are
write-time declarations — Catalyst exploits them automatically at read
time, which is exactly the Spark-first posture: declare layout, let
the planner use it.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import revenue_sum, sql_revenue_sum
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_")


@register(
    "sink_partitioned_prune",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           count(*) AS n_purchases,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-pruned read.

    events is written ``partitionBy(event_type)``; the read-back filter
    on event_type resolves at PLANNING time against the directory
    listing (PartitionFilters in the scan, asserted in
    tests/test_plans.py) — the other partitions' files are never
    opened. At 100 TB this is the difference between scanning 20 TB and
    scanning 4 TB for the same query. Partition column choice follows
    the cardinality rule: low-cardinality (5 event types), high-skew
    columns partition; high-cardinality keys bucket instead.
    """
    out = os.path.join(tempfile.gettempdir(), f"spark990_part_events_{_sf_tag(sf_dir)}")
    load(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    e = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    return (
        e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@register(
    "sink_bucketed_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           {sql_revenue_sum('revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed write + exchange-free sort-merge join.

    lineitem and orders are written ``bucketBy(8, orderkey)`` +
    ``sortBy(orderkey)`` as external tables; the subsequent join reads
    both bucket layouts and runs a sort-merge join with NO Exchange on
    either side (asserted in tests/test_plans.py) — the shuffle was
    paid once at write time and is amortized over every future join on
    that key. This is the layout for fact-fact joins at 100 TB, where a
    per-query lineitem shuffle is the single largest cost in the plan.
    The merge hint pins SMJ so the demo stays exchange-free even where
    AQE would broadcast the small side at test scale.
    """
    tag = _sf_tag(sf_dir)
    base = os.path.join(tempfile.gettempdir(), f"spark990_bucketed_{tag}")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        tbl = f"{name}_bkt_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load(spark, sf_dir, name)
            .write.mode("overwrite")
            .option("path", os.path.join(base, name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    li = spark.table(f"lineitem_bkt_{tag}")
    o = spark.table(f"orders_bkt_{tag}")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_lines"), revenue_sum("revenue"))
    )


@register(
    "scan_merge_schema",
    oracle="""
    SELECT n_nationkey,
           n_name,
           CASE WHEN n_nationkey < 13 THEN NULL
                ELSE n_regionkey END AS n_regionkey
    FROM nation
    """,
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet files written with
    DIFFERENT schemas (an old extract without n_regionkey, a new one
    with it) read back as ONE table via mergeSchema — missing columns
    null-fill. This is how a 100 TB lake absorbs schema change without
    rewriting history; the footer-merge cost is why it's opt-in, so
    pin the merged schema explicitly on hot paths."""
    n = load(spark, sf_dir, "nation")
    root = os.path.join(tempfile.gettempdir(), f"spark990_evolve_{_sf_tag(sf_dir)}")
    old = n.filter(F.col("n_nationkey") < 13).select("n_nationkey", "n_name")
    new = n.filter(F.col("n_nationkey") >= 13).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    old.write.mode("overwrite").parquet(os.path.join(root, "v=1"))
    new.write.mode("overwrite").parquet(os.path.join(root, "v=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(root, "v=1"), os.path.join(root, "v=2"))
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "scan_dynamic_partition_prune",
    oracle="""
    SELECT e.event_type,
           count(*) AS n,
           count(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN (SELECT DISTINCT event_type FROM events
          WHERE event_type IN ('purchase', 'signup')) d
      ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
)
def scan_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP): the fact side is partitioned on
    event_type; the pruning predicate arrives only through a JOIN with
    a filtered dimension, so no static filter exists at planning time —
    Catalyst inserts a dynamicpruning subquery that runs the dim side
    first and prunes fact partitions at RUNTIME (asserted in
    tests/test_plans.py). At 100 TB this is how 'join to this month's
    dim rows' reads one partition instead of the whole fact table.
    """
    out = os.path.join(
        tempfile.gettempdir(), f"spark990_dpp_events_{_sf_tag(sf_dir)}"
    )
    ev = load(spark, sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        ev.filter(F.col("event_type").isin("purchase", "signup"))
        .select("event_type")
        .distinct()
    )
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def _z_interleave_sql() -> str:
    """DuckDB 16-bit Morton code over the min/max-normalized 8-bit
    (customer, day) coordinates cx/cy."""
    terms = []
    for i in range(8):
        terms.append(f"(((cx >> {i}) & 1) << {2 * i})")
        terms.append(f"(((cy >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder_stats",
    oracle=f"""
    WITH b AS (
      SELECT min(o_custkey) AS mn_c, max(o_custkey) AS mx_c,
             min(o_orderdate) AS mn_d, max(o_orderdate) AS mx_d
      FROM orders
    ),
    norm AS (
      SELECT ((o_custkey - mn_c) * 255) // (mx_c - mn_c) AS cx,
             (date_diff('day', mn_d, o_orderdate) * 255)
               // date_diff('day', mn_d, mx_d) AS cy
      FROM orders, b
    ),
    z AS (
      SELECT cx, cy, CAST({{Z}} AS BIGINT) AS zval FROM norm
    )
    SELECT CAST(zval >> 10 AS BIGINT) AS cell,
           count(*) AS n_rows,
           CAST(min(cx) AS BIGINT) AS min_cx, CAST(max(cx) AS BIGINT) AS max_cx,
           CAST(min(cy) AS BIGINT) AS min_cy, CAST(max(cy) AS BIGINT) AS max_cy
    FROM z GROUP BY cell
    """.replace("{Z}", _z_interleave_sql()),
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit — the 2-D data-skipping layout
    OSS Spark lacks as a built-in (Delta/Iceberg expose it as OPTIMIZE
    ZORDER): normalize two filter dimensions (customer, order-day) to
    8-bit coordinates with a broadcast min/max scalar (ONE 1-row
    aggregate — the same bounds a `repartitionByRange` write would
    sample), interleave their bits into a 16-bit z value, and report
    per-z-cell (top-6-bit) row counts + per-dimension min/max. Each
    cell is a small RECTANGLE in (customer x day) space, so parquet
    min/max stats skip files for predicates on EITHER dimension —
    single-key sorting helps only its own key. The production write
    this audit justifies is `df.repartitionByRange(64, "zval")
    .sortWithinPartitions("zval").write.parquet(...)`.

    All-integer arithmetic: floor division of non-negative ints
    matches between engines; the bit interleave is 32 codegen'd
    shift/mask terms, no UDF, one aggregate pass."""
    o = load(spark, sf_dir, "orders")
    bounds = F.broadcast(
        o.agg(
            F.min("o_custkey").alias("mn_c"),
            F.max("o_custkey").alias("mx_c"),
            F.min("o_orderdate").alias("mn_d"),
            F.max("o_orderdate").alias("mx_d"),
        )
    )
    norm = o.crossJoin(bounds).select(
        F.expr("((o_custkey - mn_c) * 255) div (mx_c - mn_c)").alias("cx"),
        F.expr(
            "(datediff(o_orderdate, mn_d) * 255) div datediff(mx_d, mn_d)"
        ).alias("cy"),
    )
    z = None
    for i in range(8):
        tx = F.shiftleft(F.shiftright(F.col("cx"), i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(
            F.shiftright(F.col("cy"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = tx + ty if z is None else z + tx + ty
    d = norm.select("cx", "cy", z.cast("long").alias("zval"))
    return d.groupBy(
        F.shiftright(F.col("zval"), 10).cast("long").alias("cell")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("cx").cast("long").alias("min_cx"),
        F.max("cx").cast("long").alias("max_cx"),
        F.min("cy").cast("long").alias("min_cy"),
        F.max("cy").cast("long").alias("max_cy"),
    )


_TARGET_FILE_BYTES = 128 * 1024 * 1024  # the maxPartitionBytes default


@register(
    "layout_partition_size_planner",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(8 + 8 + 8 + 4
                    + octet_length(CAST(o_orderpriority AS BLOB))
                    + octet_length(CAST(o_orderstatus AS BLOB))) AS BIGINT)
             AS est_bytes,
           CAST(greatest(1,
             (sum(8 + 8 + 8 + 4
                  + octet_length(CAST(o_orderpriority AS BLOB))
                  + octet_length(CAST(o_orderstatus AS BLOB)))
              + {_TARGET_FILE_BYTES - 1}) // {_TARGET_FILE_BYTES})
             AS BIGINT) AS n_target_files
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def layout_partition_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-layout SIZING audit — the query you run BEFORE a
    partitioned write to avoid both failure modes of file layout: tiny
    files (per-file overhead swamps the scan; the reference's nightly
    output shape) and giant files (a task's input no longer fits
    memory under `maxPartitionBytes`). Per partition key it estimates
    uncompressed bytes from exact column widths (fixed-width columns
    at their encoded size + actual UTF-8 string lengths — all integer
    arithmetic, no sampling) and derives the target file count at the
    128 MB default via ceiling division. Feed the result into
    `repartitionByRange(n_target_files, key, ...)` before the write —
    `sink_partitioned_prune` shows the write itself, and SCALE.md §7
    names this sizing as step 2 of a real 100 TB run. One hash
    aggregate on the partition key; nothing but (key, 3 longs) leaves
    the exchange."""
    o = load(spark, sf_dir, "orders")
    row_bytes = (
        F.lit(8 + 8 + 8 + 4)  # orderkey, custkey, totalprice, orderdate
        + F.octet_length("o_orderpriority")
        + F.octet_length("o_orderstatus")
    ).cast("long")
    est = F.sum(row_bytes)
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_rows"),
            est.alias("est_bytes"),
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(
                    (est + (_TARGET_FILE_BYTES - 1)) / _TARGET_FILE_BYTES
                ).cast("long"),
            ).alias("n_target_files"),
        )
    )


def _zval(cx, cy):
    """16-bit Morton interleave of two 8-bit coordinate Columns."""
    z = None
    for i in range(8):
        tx = F.shiftleft(F.shiftright(cx, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = tx + ty if z is None else z + tx + ty
    return z


@register(
    "layout_zorder_prune_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE o_custkey <= 300
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1996-01-01'
    """,
)
def layout_zorder_prune_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The z-order layout EXECUTED, not narrated: [[layout_zorder_stats]]
    audits the Morton-cell geometry and its docstring prescribes the
    production write — this query performs it (compute zval, range-
    partition into 64 z-runs, sort within, write parquet), reads the
    clustered table back as an independent scan, and answers a 2-D
    RECTANGLE query (customer range x one year) against it. The oracle
    is plain SQL over the original `orders`, so the round trip is
    proven lossless; the pruning payoff is asserted separately in
    tests/test_plans.py — each z-sorted file covers a contiguous zval
    run = a small rectangle in (customer, day) space, so parquet
    row-group min/max stats on the RAW columns skip most files for a
    predicate on EITHER or BOTH dimensions, where a single-key sort
    localizes only its own key.

    The write is `repartitionByRange(64, zval)` + `sortWithinPartitions`
    — exactly the layout job OPTIMIZE ZORDER runs in Delta/Iceberg; at
    100 TB it is a nightly one-pass shuffle whose cost every
    subsequent selective scan amortizes (the persisted-index argument
    of [[sim_ann_index_persist_probe]], applied to table layout)."""
    o = load(spark, sf_dir, "orders")
    bounds = F.broadcast(
        o.agg(
            F.min("o_custkey").alias("mn_c"),
            F.max("o_custkey").alias("mx_c"),
            F.min("o_orderdate").alias("mn_d"),
            F.max("o_orderdate").alias("mx_d"),
        )
    )
    # greatest(..., 1) divisor guard: on a degenerate fixture where a
    # dimension is constant the raw divisor is 0 -> NULL zvals -> the
    # layout silently degenerates to one partition range; clamping
    # makes a constant dimension degrade to a 1-D sort instead.
    cx = F.expr("((o_custkey - mn_c) * 255) div greatest(mx_c - mn_c, 1)")
    cy = F.expr(
        "(datediff(o_orderdate, mn_d) * 255)"
        " div greatest(datediff(mx_d, mn_d), 1)"
    )
    clustered = o.crossJoin(bounds).select(
        o["*"], _zval(cx, cy).cast("long").alias("zval")
    )
    out = os.path.join(
        tempfile.gettempdir(), f"spark990_zorder_orders_{_sf_tag(sf_dir)}"
    )
    clustered.repartitionByRange(64, "zval").sortWithinPartitions(
        "zval"
    ).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(
            (F.col("o_custkey") <= 300)
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
            F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        )
    )


@register(
    "layout_compact_binpack",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(least(40, count(*)) AS BIGINT) AS files_before,
           CAST(greatest(1,
             (sum(8 + 8 + 8 + 4
                  + octet_length(CAST(o_orderpriority AS BLOB))
                  + octet_length(CAST(o_orderstatus AS BLOB)))
              + {_TARGET_FILE_BYTES - 1}) // {_TARGET_FILE_BYTES})
             AS BIGINT) AS files_after,
           CAST(greatest(1,
             (sum(8 + 8 + 8 + 4
                  + octet_length(CAST(o_orderpriority AS BLOB))
                  + octet_length(CAST(o_orderstatus AS BLOB)))
              + {_TARGET_FILE_BYTES - 1}) // {_TARGET_FILE_BYTES})
             AS BIGINT) AS n_target_files,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def layout_compact_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE COMPACTION PLAN EXECUTED (VERDICT r9 task 3) — the weekly
    OPTIMIZE job every warehouse runs, closing the loop
    [[layout_partition_size_planner]] opened: that query computes
    128 MB-target file counts; this one takes a deliberately
    OVER-FRAGMENTED partitioned table (each partition key written as
    40 round-robin files — the tiny-file failure mode a nightly
    append-heavy pipeline accumulates), bin-packs every partition back
    to the planner's target count, rewrites, and reads the compacted
    table back as an independent scan.

    The returned row per partition key carries the physical file
    CENSUS (before/after, counted from the written directories) next
    to the planner's target and the read-back row count + exact-cents
    sum — and the ORACLE recomputes all of it from plain SQL over
    `orders`: files_before == least(40, rows) proves the fragmented
    write's shape, files_after == n_target_files proves the rewrite
    hit plan, and n_rows/sum_cents prove losslessness. The per-key
    driver loop is bounded by partition-key cardinality (the
    partition-column choice rule in [[sink_partitioned_prune]]), i.e.
    it is a metadata loop, not a data loop; each key's rewrite is one
    `repartition(target)` — at 100 TB, one shuffle per fragmented
    partition, touching no healthy partition (and under the commit-log
    table of sources/lakehouse.py the same rewrite lands as a
    file-replacing commit, `compact_table`)."""
    import glob as _glob

    o = load(spark, sf_dir, "orders")
    tag = _sf_tag(sf_dir)
    frag = os.path.join(tempfile.gettempdir(), f"spark990_fragged_{tag}")
    comp = os.path.join(tempfile.gettempdir(), f"spark990_compact_{tag}")
    prios = sorted(
        r["o_orderpriority"]
        for r in o.select("o_orderpriority").distinct().collect()
    )
    # the planner's targets (same byte model as the registered planner)
    row_bytes = (
        F.lit(8 + 8 + 8 + 4)
        + F.octet_length("o_orderpriority")
        + F.octet_length("o_orderstatus")
    ).cast("long")
    est = F.sum(row_bytes)
    targets = {
        r["o_orderpriority"]: r["t"]
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.greatest(
                F.lit(1).cast("long"),
                F.floor(
                    (est + (_TARGET_FILE_BYTES - 1)) / _TARGET_FILE_BYTES
                ).cast("long"),
            ).alias("t")
        )
        .collect()
    }
    # r11 (guide §2.6 — overlap independent jobs): the per-key
    # fragment→compact chains are independent; running them from a
    # small thread pool lets the next key's tasks back-fill executors
    # freed by the current key's write tail instead of serializing
    # ~3 jobs x |keys| driver-side. pool.map preserves key order, the
    # writes and glob census are byte-identical to the serial loop.
    from concurrent.futures import ThreadPoolExecutor

    def _one_key(p: str):
        pdir_f = os.path.join(frag, f"p={p}")
        pdir_c = os.path.join(comp, f"p={p}")
        spark.sparkContext.setJobDescription(f"compact_binpack: key {p}")
        o.filter(F.col("o_orderpriority") == p).repartition(40).write.mode(
            "overwrite"
        ).parquet(pdir_f)
        spark.read.parquet(pdir_f).repartition(int(targets[p])).write.mode(
            "overwrite"
        ).parquet(pdir_c)
        return (
            p,
            len(_glob.glob(os.path.join(pdir_f, "part-*"))),
            len(_glob.glob(os.path.join(pdir_c, "part-*"))),
            int(targets[p]),
        )

    with ThreadPoolExecutor(max_workers=min(3, len(prios) or 1)) as pool:
        census = list(pool.map(_one_key, prios))
    census_df = spark.createDataFrame(
        census,
        "o_orderpriority string, files_before long, files_after long,"
        " n_target_files long",
    )
    back = spark.read.option("basePath", comp).parquet(
        *[os.path.join(comp, f"p={p}") for p in prios]
    )
    agg = back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("sum_cents"),
    )
    return agg.join(F.broadcast(census_df), "o_orderpriority").select(
        "o_orderpriority",
        "n_rows",
        "files_before",
        "files_after",
        "n_target_files",
        "sum_cents",
    )
