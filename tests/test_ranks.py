"""Unit tests for functions.ranks — the distributed global
row_number / running-sum / NTILE helper every former single-task
global sort now routes through (SURVEY.md §4.2 global-sort policy).
Each property is checked against Spark's own single-task window
built-ins on the same frame, so the helper is pinned to the exact
semantics the rewired queries' unchanged oracles assume."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.ranks import (
    global_order,
    idiv,
    ntile_from_rn,
)


def _frame(spark, n=997, parts=7):
    # deterministic, tie-heavy (key has only 13 distinct values), with
    # a unique tiebreak id — the contract global_order requires
    return spark.range(n).repartition(parts).select(
        F.col("id"),
        (F.col("id") * 37 % 13).alias("key"),
        (F.col("id") % 5).alias("val"),
    )


def test_global_row_number_matches_window(spark):
    df = _frame(spark)
    got = global_order(df, ["key", "id"], rn_col="rn")
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("key", "id")).cast("long")
    )
    assert got.select("id", "rn").exceptAll(want.select("id", "rn")).count() == 0
    assert want.select("id", "rn").exceptAll(got.select("id", "rn")).count() == 0


def test_global_running_sum_matches_window(spark):
    df = _frame(spark)
    got = global_order(
        df, [F.desc("key"), "id"], running={"cum": F.col("val")}, rn_col="rn"
    )
    w = Window.orderBy(F.desc("key"), "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.withColumn("cum", F.sum("val").over(w).cast("long"))
    assert got.select("id", "cum").exceptAll(want.select("id", "cum")).count() == 0
    assert want.select("id", "cum").exceptAll(got.select("id", "cum")).count() == 0


@pytest.mark.parametrize("n,buckets", [(997, 4), (997, 10), (7, 10), (40, 4)])
def test_ntile_from_rn_matches_builtin(spark, n, buckets):
    # includes total < buckets (q = 0 branch must stay unevaluated)
    df = spark.range(n).select("id")
    got = (
        global_order(df, ["id"], rn_col="rn")
        .crossJoin(F.broadcast(df.agg(F.count(F.lit(1)).alias("t"))))
        .select("id", ntile_from_rn(F.col("rn"), F.col("t"), buckets).alias("b"))
    )
    want = df.select(
        "id",
        F.ntile(buckets).over(Window.orderBy("id")).cast("long").alias("b"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_idiv_exact(spark):
    rows = (
        spark.range(1, 1000)
        .select(idiv(F.col("id") * 7919, F.lit(13)).alias("q"), "id")
        .collect()
    )
    for r in rows:
        assert r.q == (r.id * 7919) // 13


def test_global_order_partition_invariant(spark):
    """The assigned ranks are a pure function of the data and the
    order spec — they must not change under input repartitioning
    (range boundaries move, but offset + local rank always
    reconstructs the same total order). The property that makes the
    rewired queries reproducible across cluster sizes."""
    df = _frame(spark)
    base = {
        (r.id, r.rn, r.cum)
        for r in global_order(
            df, ["key", "id"], running={"cum": F.col("val")}, rn_col="rn"
        ).collect()
    }
    for n in (1, 3, 50):
        got = {
            (r.id, r.rn, r.cum)
            for r in global_order(
                df.repartition(n),
                ["key", "id"],
                running={"cum": F.col("val")},
                rn_col="rn",
            ).collect()
        }
        assert got == base, f"ranks changed under repartition({n})"


def test_no_unpartitioned_window_in_helper_plan(spark):
    from apache_spark_irs_form_990_spark.plans.inspect import (
        unpartitioned_windows,
    )

    df = global_order(
        _frame(spark), ["key", "id"], running={"cum": F.col("val")}
    )
    assert unpartitioned_windows(df) == []


def test_resolve_partitions_non_numeric_conf_falls_back(spark):
    """Some platforms hold a non-numeric spark.sql.shuffle.partitions
    (e.g. "auto" with adaptive coalescing; OSS Spark rejects it at
    set-time, patched runtimes do not) — the resolver must fall back
    to defaultParallelism instead of raising ValueError (ADVICE r4)."""
    from apache_spark_irs_form_990_spark.functions.ranks import (
        _resolve_partitions,
    )

    class _FakeConf:
        def get(self, key, default=None):
            return "auto"

    class _FakeSpark:
        conf = _FakeConf()
        sparkContext = spark.sparkContext

    assert _resolve_partitions(_FakeSpark(), None) == int(
        spark.sparkContext.defaultParallelism
    )
    assert _resolve_partitions(_FakeSpark(), 7) == 7
    assert _resolve_partitions(spark, None) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_global_order_constant_key_skew(spark):
    """WORST-CASE sort-key skew: the primary key is ONE constant value
    for every row, so the range partitioner sees a single key group
    and spreads rows only via the unique tiebreak column the contract
    demands. Asserts (a) max-task rows stays ~n/P (no single task
    holds the frame — the failure mode of a naive range partition on
    the primary key alone), (b) ranks are exact vs the single-task
    window, (c) the result is partition-invariant (VERDICT r5 task 6)."""
    n, parts = 4096, 16
    df = spark.range(n).repartition(7).select(
        "id", F.lit(0).alias("key"), (F.col("id") % 5).alias("val")
    )
    parted = (
        df.repartitionByRange(parts, "key", "id")
        .withColumn("_gpid", F.spark_partition_id())
    )
    prof = (
        parted.groupBy("_gpid")
        .agg(F.count(F.lit(1)).alias("rows"))
        .agg(F.max("rows").alias("mx"), F.count(F.lit(1)).alias("nt"))
        .collect()[0]
    )
    # range sampling is approximate: allow 4x the ideal share, but the
    # single-task collapse (mx == n) must be impossible
    assert prof.mx <= 4 * (n // parts), (
        f"constant-key skew collapsed the range partition: max task "
        f"holds {prof.mx} of {n} rows across {prof.nt} tasks"
    )
    got = global_order(
        df, ["key", "id"], running={"cum": F.col("val")}, rn_col="rn",
        num_partitions=parts,
    )
    w = Window.orderBy("key", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("key", "id")).cast("long")
    ).withColumn("cum", F.sum("val").over(w).cast("long"))
    assert got.select("id", "rn", "cum").exceptAll(
        want.select("id", "rn", "cum")
    ).count() == 0
    assert want.select("id", "rn", "cum").exceptAll(
        got.select("id", "rn", "cum")
    ).count() == 0
    base = {(r.id, r.rn, r.cum) for r in got.collect()}
    for p in (1, 50):
        again = {
            (r.id, r.rn, r.cum)
            for r in global_order(
                df.repartition(p),
                ["key", "id"],
                running={"cum": F.col("val")},
                rn_col="rn",
                num_partitions=parts,
            ).collect()
        }
        assert again == base, f"skewed ranks changed under repartition({p})"


def test_resolve_partitions_rejects_nonpositive(spark):
    """An explicit num_partitions < 1 is a caller bug — raise a clear
    ValueError instead of the opaque repartitionByRange failure
    (ADVICE r5)."""
    from apache_spark_irs_form_990_spark.functions.ranks import (
        _resolve_partitions,
    )

    with pytest.raises(ValueError, match="num_partitions"):
        _resolve_partitions(spark, 0)
    with pytest.raises(ValueError, match="num_partitions"):
        _resolve_partitions(spark, -3)
