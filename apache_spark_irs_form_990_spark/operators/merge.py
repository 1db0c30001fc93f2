"""Batch MERGE / CDC-apply operator (SURVEY.md §2 B11 extension).

Spark without a table format (Delta/Iceberg) has no MERGE INTO
statement, but the *operator* is a join shape: full-outer-join the
base table with a change set on the key, then resolve per row —
update wins over base, insert has no base row, delete tombstones drop
the row. Plan honesty (r10): a FULL OUTER equi-join cannot use a
broadcast-hash build in Spark (either side may need to emit unmatched
rows), so the flat form costs one co-partitioned shuffle of base +
changes — at 100 TB the way to avoid shuffling the base is to bound
WHAT the merge reads, not the join strategy: the commit-log table
(`sources/lakehouse.py`, `lakehouse_merge_commitlog`) prunes to the
files whose key range holds a change key and runs this same resolve
over that bounded subset.

The whole resolution is one declarative expression — Catalyst sees a
join + projection, not an imperative row loop — and therefore gets an
exact DuckDB oracle like any other query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    key,
    op_col: str = "op",
) -> DataFrame:
    """Apply a change set (op ∈ {'U','I','D'}) to `base` on `key`
    (one column name or a list — composite keys join on every
    component, r11 for the lakehouse's partitioned/composite tables).

    Semantics: 'D' removes the keyed row; 'U'/'I' replace-or-add the
    row with the change's payload columns (same schema as base).
    Unknown keys with 'U' behave as upserts — the CDC-friendly choice.

    No broadcast hint: broadcast-hash builds don't support FULL OUTER
    joins, so the previous hint was silently discarded (HintErrorLogger
    warning, found r10) while the docstring claimed a broadcast plan —
    the join is a co-partitioned shuffle by design; see the module
    docstring for how the lakehouse path bounds its input instead.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in base.columns if c not in keys]
    joined = base.alias("b").join(changes.alias("c"), on=keys, how="full")
    keep: Column = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    picked = [
        F.when(
            F.col(f"c.{op_col}").isin("U", "I"), F.col(f"c.{p}")
        ).otherwise(F.col(f"b.{p}")).alias(p)
        for p in payload
    ]
    return joined.filter(keep).select(*[F.col(k) for k in keys], *picked)


@register(
    "merge_upsert_cdc",
    oracle="""
    WITH changes AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN 'U'
                  WHEN n_nationkey % 3 = 1 THEN 'D'
                  ELSE 'I' END AS op,
             concat('NATION_', CAST(n_nationkey AS VARCHAR)) AS n_name,
             CAST(n_nationkey % 5 AS BIGINT) AS n_regionkey
      FROM nation WHERE n_nationkey % 2 = 0
      UNION ALL
      SELECT 100 + n_nationkey, 'I',
             concat('NEW_', CAST(n_nationkey AS VARCHAR)),
             CAST(n_nationkey % 5 AS BIGINT)
      FROM nation WHERE n_nationkey < 3
    )
    SELECT coalesce(b.n_nationkey, c.n_nationkey) AS n_nationkey,
           CASE WHEN c.op IN ('U','I') THEN c.n_name ELSE b.n_name END AS n_name,
           CASE WHEN c.op IN ('U','I') THEN c.n_regionkey
                ELSE b.n_regionkey END AS n_regionkey
    FROM nation b
    FULL OUTER JOIN changes c ON b.n_nationkey = c.n_nationkey
    WHERE c.op IS NULL OR c.op != 'D'
    """,
)
def merge_upsert_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE demo: a deterministic change set over nation — every even
    key becomes an update ('U'), delete ('D'), or re-insert by key mod;
    three brand-new keys insert. The oracle replays identical semantics
    as a FULL OUTER JOIN in SQL, proving the operator == the relational
    definition of MERGE."""
    base = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", F.col("n_regionkey").cast("long").alias("n_regionkey")
    )
    n = load(spark, sf_dir, "nation")
    mod_changes = n.filter(F.col("n_nationkey") % 2 == 0).select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 3 == 0, "U")
        .when(F.col("n_nationkey") % 3 == 1, "D")
        .otherwise("I")
        .alias("op"),
        F.concat(F.lit("NATION_"), F.col("n_nationkey").cast("string")).alias(
            "n_name"
        ),
        (F.col("n_nationkey") % 5).cast("long").alias("n_regionkey"),
    )
    new_rows = n.filter(F.col("n_nationkey") < 3).select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.lit("I").alias("op"),
        F.concat(F.lit("NEW_"), F.col("n_nationkey").cast("string")).alias("n_name"),
        (F.col("n_nationkey") % 5).cast("long").alias("n_regionkey"),
    )
    changes = mod_changes.unionByName(new_rows)
    return merge_apply(base, changes, key="n_nationkey")


@register(
    "merge_scd2_dimension_apply",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT c_custkey, c_mktsegment AS seg FROM customer
    ),
    batch AS (
      SELECT DISTINCT c_custkey, 'NEW-' || c_mktsegment AS seg
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT d.c_custkey,
           d.seg,
           '2023-01-01' AS valid_from,
           CASE WHEN b.c_custkey IS NULL THEN '9999-12-31'
                ELSE '2024-06-01' END AS valid_to,
           b.c_custkey IS NULL AS is_current
    FROM dim d LEFT JOIN batch b ON d.c_custkey = b.c_custkey
    UNION ALL
    SELECT c_custkey, seg,
           '2024-06-01', '9999-12-31', TRUE
    FROM batch
    """,
)
def merge_scd2_dimension_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 dimension maintenance — apply a CDC batch to a
    slowly-changing dimension by CLOSING the changed keys' current
    interval (valid_to = effective date, is_current = false) and
    INSERTING the new version (open-ended interval) in the SAME pass:
    one left join of the dimension against the (small, broadcastable)
    change batch, then a conditional 1-or-2-row explode per key — no
    second scan of the dimension for the inserts, which is the
    difference between this and the naive close-then-append two-job
    version. Complements [[merge_upsert_cdc]] (type-1 overwrite) and
    [[win_scd2_intervals]] (rebuilding history from an event log);
    [[join_scd2_asof_lookup]] is the read side. The change batch is
    synthesized deterministically (every 7th customer re-segments on
    2024-06-01). At 100 TB the dimension never shuffles: the batch
    broadcasts, and output rewrites touch only affected partitions.

    Unique-key contract (r8, found by the dimension edge sweep): SCD2
    is defined over ONE current row per key and ONE change per key per
    batch, so both sides dedup on (key, attribute) first — a
    duplicate-loaded dimension row must not double-close and
    double-open its key (the join would fan out quadratically in the
    duplication factor). Conflicting same-key attribute values remain
    two rows, i.e. corrupt SCD2 input stays visible rather than being
    silently resolved."""
    dim = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    batch = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey", F.concat(F.lit("NEW-"), F.col("c_mktsegment")).alias("bseg")
        )
        .distinct()
    )
    # interval bounds emitted as ISO strings: DATE round-trips as
    # datetime64 from DuckDB but as date objects from Spark, and the
    # bounds here are literals anyway
    eff = F.lit("2024-06-01")
    far = F.lit("9999-12-31")
    opened = F.lit("2023-01-01")
    changed = F.col("bseg").isNotNull()
    joined = dim.join(F.broadcast(batch), "c_custkey", "left")
    rows = F.when(
        changed,
        F.array(
            F.struct(
                F.col("seg").alias("seg"),
                opened.alias("valid_from"),
                eff.alias("valid_to"),
                F.lit(False).alias("is_current"),
            ),
            F.struct(
                F.col("bseg").alias("seg"),
                eff.alias("valid_from"),
                far.alias("valid_to"),
                F.lit(True).alias("is_current"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("seg").alias("seg"),
                opened.alias("valid_from"),
                far.alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
        )
    )
    return joined.select("c_custkey", F.explode(rows).alias("r")).select(
        "c_custkey", "r.seg", "r.valid_from", "r.valid_to", "r.is_current"
    )
