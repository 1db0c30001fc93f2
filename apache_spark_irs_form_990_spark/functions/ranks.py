"""Distributed exact order statistics — global row_number, global
running sums, and exact NTILE, without a single-task global sort.

Spark plans ``Window.orderBy(...)`` with an EMPTY partition spec as one
task holding the entire input ("No Partition Defined for Window
operation! Moving all data to a single partition" — the warning that
spammed BENCH_r03). Correct at test scale; fatal on a 100 TB corpus.
The distributed fix is the MapReduce-era total-order partitioner (the
same trick ``rdd.zipWithIndex`` uses, expressed in DataFrame ops):

1. **Range-partition on the sort key.** ``repartitionByRange`` samples
   the key distribution and assigns contiguous key ranges to
   partitions; equal keys land in the same partition. The frame is
   lazily ``localCheckpoint``-ed so the rank pass and the offsets pass
   below share ONE materialization (and, by construction, one set of
   sampled range boundaries).
2. **Rank within each partition.** ``Window.partitionBy`` on the
   captured ``spark_partition_id()`` — fully parallel; the only
   window in the plan has a non-empty partition spec, so the plan
   lint (tests/test_plan_lint.py) stays clean.
3. **Broadcast partition offsets.** Per-partition row / sum totals
   (one tiny aggregate, <= numPartitions rows) become cumulative
   offsets via a triangular broadcast self-join — deliberately NOT a
   global window, even over this tiny frame — then broadcast-join back
   onto the ranked rows: ``global = offset + local``.

The result is EXACTLY the global row_number / inclusive running sum
over the given total order (callers must pass a full tiebreak), at the
cost of one range shuffle plus one pid-keyed window shuffle, both
embarrassingly parallel and skew-free (ranges are sampled equi-depth).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def idiv(a: Column, b: Column | int) -> Column:
    """Exact non-negative integer floor-division as a long Column.

    ``a / b`` on longs is IEEE double division in Spark SQL; near 2^53
    the quotient could round across an integer before ``floor``. Taking
    the remainder out first makes the numerator an exact multiple, so
    the double division is exact and the cast is a no-op truncation.

    Domain: exact only while ``a < 2^53`` — above that the long-to-
    double conversion itself rounds and the quotient can be off by
    one. Row counts and the NTILE operands used here stay far below
    that (2^53 rows ~ 9e15; a 100 TB corpus is ~1e10-1e12 rows); for
    byte-scale running sums use decimal arithmetic instead.
    """
    return ((a - (a % b)) / b).cast("long")


def _resolve_partitions(spark, num_partitions: int | None) -> int:
    """Range-partition count for `global_order`: the explicit argument,
    else ``spark.sql.shuffle.partitions``, else — when that conf holds
    a non-numeric value (some platforms set "auto" with adaptive
    coalescing; OSS Spark validates at set-time but patched runtimes
    do not) — the cluster's default parallelism (ADVICE r4). An
    explicit ``num_partitions < 1`` is a caller bug — raised here with
    a clear message instead of surfacing as a repartitionByRange
    failure (ADVICE r5)."""
    if num_partitions is not None:
        if num_partitions < 1:
            raise ValueError(
                f"num_partitions must be >= 1, got {num_partitions}"
            )
        return int(num_partitions)
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:
        return int(spark.sparkContext.defaultParallelism)


def global_order(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    running: Mapping[str, Column] | None = None,
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Annotate ``df`` with the exact global ``row_number`` over
    ``order_cols`` (as long column ``rn_col``) and, for each
    ``name -> integer column`` in ``running``, the exact inclusive
    global running sum over the same order (as long column ``name``).

    ``order_cols`` must be a deterministic TOTAL order (include a
    unique tiebreak column) — the same contract the single-task
    ``Window.orderBy`` form had, now enforced across range partitions.
    """
    running = dict(running or {})
    spark = df.sparkSession
    n = _resolve_partitions(spark, num_partitions)
    parted = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_gpid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    w = Window.partitionBy("_gpid").orderBy(*order_cols)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    local = parted.withColumn("_lrn", F.row_number().over(w).cast("long"))
    for name, col in running.items():
        local = local.withColumn(
            f"_l_{name}", F.sum(col).over(wsum).cast("long")
        )

    totals = parted.groupBy("_gpid").agg(
        F.count(F.lit(1)).alias("_t_rows"),
        *[
            F.sum(col).cast("long").alias(f"_t_{name}")
            for name, col in running.items()
        ],
    )
    lower = totals.select(
        F.col("_gpid").alias("_gpid_lo"),
        F.col("_t_rows").alias("_lo_rows"),
        *[F.col(f"_t_{name}").alias(f"_lo_{name}") for name in running],
    )
    offsets = (
        totals.join(
            F.broadcast(lower), F.col("_gpid_lo") < F.col("_gpid"), "left"
        )
        .groupBy("_gpid")
        .agg(
            F.coalesce(F.sum("_lo_rows"), F.lit(0)).alias("_off_rows"),
            *[
                F.coalesce(F.sum(f"_lo_{name}"), F.lit(0)).alias(
                    f"_off_{name}"
                )
                for name in running
            ],
        )
    )

    out = local.join(F.broadcast(offsets), "_gpid").withColumn(
        rn_col, (F.col("_off_rows") + F.col("_lrn")).cast("long")
    )
    for name in running:
        out = out.withColumn(
            name, (F.col(f"_off_{name}") + F.col(f"_l_{name}")).cast("long")
        )
    drop = (
        ["_gpid", "_lrn", "_off_rows"]
        + [f"_l_{name}" for name in running]
        + [f"_off_{name}" for name in running]
    )
    return out.drop(*drop)


def ntile_from_rn(rn: Column, total: Column, n: int) -> Column:
    """Exact ANSI ``NTILE(n)`` bucket (long) from a global row_number
    and the total row count: with q = total div n and r = total mod n,
    the first r buckets take q+1 rows and the rest take q — identical
    to Spark's and DuckDB's NTILE given the same total order, which is
    how the rewired queries stay hash-green against their unchanged
    oracles. The q = 0 branch of the conditional is unreachable when
    total < n (all rows fall in the first r buckets), so the division
    by q is never evaluated there (WHEN/OTHERWISE is branch-lazy).
    """
    r = (total % n).cast("long")
    q = idiv(total, n)
    head = r * (q + 1)
    return F.when(rn <= head, idiv(rn - 1, q + 1) + 1).otherwise(
        r + idiv(rn - head - 1, q) + 1
    )
