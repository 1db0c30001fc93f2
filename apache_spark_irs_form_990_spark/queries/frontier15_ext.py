"""Frontier extensions, part 15 — cross-engine-exact random-projection
LSH for cosine similarity, and a candidate-period periodogram
(SURVEY.md §2 B10/B11 continuation).

`sim_cosine_rp_lsh_md5` follows the house determinism move of
[[dedup_minhash_banding_md5]] / [[dedup_near_minhash]]: the classic
algorithm with every random choice replaced by an md5-derived
deterministic one, so the full pipeline — projection, signature,
bucket join, exact re-rank — carries an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.functions.money import cents, sql_cents
from apache_spark_irs_form_990_spark.registry import register
from apache_spark_irs_form_990_spark.tables import load

_RP_BITS = 12


def _sql_rp_sign(bit: str, dim: str) -> str:
    """±1 hyperplane component from md5 parity (lowercase-hex last char)."""
    return (
        f"CASE WHEN substr(md5('rp|' || CAST({bit} AS VARCHAR) || '|' "
        f"|| CAST({dim} AS VARCHAR)), 32, 1) "
        f"IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END"
    )


@register(
    "sim_cosine_rp_lsh_md5",
    oracle=f"""
    WITH planes AS (
      SELECT b.bit, d.dim, {_sql_rp_sign('b.bit', 'd.dim')} AS sgn
      FROM range(0, {_RP_BITS}) AS b(bit), range(1, 65) AS d(dim)
    ),
    proj AS (
      SELECT e.vec_id, p.bit,
             sum(CAST(round(CAST(e.embedding[p.dim] AS DOUBLE) * p.sgn
                            * 1000000) AS BIGINT)) AS dot_micro
      FROM embeddings e, planes p
      GROUP BY e.vec_id, p.bit
    ),
    sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN dot_micro >= 0 THEN '1' ELSE '0' END,
                        '' ORDER BY bit) AS signature
      FROM proj GROUP BY vec_id
    ),
    cand AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sig a JOIN sig b
        ON a.signature = b.signature AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b,
             CAST(round(
               list_reduce([CAST(0.0 AS DOUBLE)] ||
                 [CAST(ea.embedding[j] AS DOUBLE)
                  * CAST(eb.embedding[j] AS DOUBLE)
                  FOR j IN generate_series(1, 64)], (x, y) -> x + y)
               / sqrt(list_reduce([CAST(0.0 AS DOUBLE)] ||
                 [CAST(ea.embedding[j] AS DOUBLE)
                  * CAST(ea.embedding[j] AS DOUBLE)
                  FOR j IN generate_series(1, 64)], (x, y) -> x + y))
               / sqrt(list_reduce([CAST(0.0 AS DOUBLE)] ||
                 [CAST(eb.embedding[j] AS DOUBLE)
                  * CAST(eb.embedding[j] AS DOUBLE)
                  FOR j IN generate_series(1, 64)], (x, y) -> x + y))
               * 1000) AS BIGINT) AS cos_milli
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.id_a
      JOIN embeddings eb ON eb.vec_id = c.id_b
    )
    SELECT id_a, id_b, cos_milli
    FROM scored
    ORDER BY cos_milli DESC, id_a, id_b
    LIMIT 25
    """,
)
def sim_cosine_rp_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection (SimHash-family) LSH for cosine similarity
    with a CROSS-ENGINE-EXACT construction: 12 hyperplanes
    whose ±1 components come from md5 parity, per-vector sign
    signatures (projections accumulated as exact micro-integers, so
    the sign — the one thing that matters — is partition-order-proof),
    same-signature bucket join, then exact milli-cosine re-rank of the
    top 25 candidate pairs. Same scale shape as the production path
    ([[sim_cosine_ann_lsh]], MLlib-random, rows-only): candidates cost
    Σ bucket², the projection is one (vector × bit) aggregate of
    longs, and raising bits sharpens buckets exponentially. The md5
    determinism is what buys the exact oracle — the algorithm is
    unchanged."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("x"),
    )
    planes = spark.range(0, _RP_BITS).select(
        F.col("id").alias("bit"),
        F.explode(F.sequence(F.lit(1), F.lit(64))).alias("dim"),
    ).select(
        "bit",
        "dim",
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("rp|"),
                        F.col("bit").cast("string"),
                        F.lit("|"),
                        F.col("dim").cast("string"),
                    )
                ),
                32,
                1,
            ).isin(*"01234567"),
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    comps = emb.select(
        "vec_id", F.posexplode("x").alias("pos", "xj")
    ).select("vec_id", (F.col("pos") + 1).alias("dim"), "xj")
    proj = (
        comps.join(F.broadcast(planes), "dim")
        .select(
            "vec_id",
            "bit",
            F.round(F.col("xj") * F.col("sgn") * 1000000)
            .cast("long")
            .alias("term"),
        )
        .groupBy("vec_id", "bit")
        .agg(F.sum("term").alias("dot_micro"))
    )
    sig = proj.groupBy("vec_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bit", "dot_micro"))),
                lambda s: F.when(s.getField("dot_micro") >= 0, "1").otherwise(
                    "0"
                ),
            ),
            "",
        ).alias("signature")
    )
    a, b = sig.alias("a"), sig.alias("b")
    cand = a.join(
        b,
        (F.col("a.signature") == F.col("b.signature"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
    )
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("x").alias("xa"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("x").alias("xb"))
    dot = F.aggregate(
        F.zip_with(F.col("xa"), F.col("xb"), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda p: p * p), F.lit(0.0), lambda acc, v: acc + v
        )
    )
    scored = (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(dot / nrm(F.col("xa")) / nrm(F.col("xb")) * 1000)
            .cast("long")
            .alias("cos_milli"),
        )
    )
    return scored.orderBy(F.desc("cos_milli"), "id_a", "id_b").limit(25)


@register(
    "ts_periodogram_candidates",
    oracle=f"""
    WITH daily AS (
      SELECT row_number() OVER (ORDER BY day) - 1 AS t,
             CAST(rev_c AS BIGINT) AS rev_c
      FROM (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum({sql_cents('o_totalprice')}) AS rev_c
        FROM orders GROUP BY 1
      )
    ),
    terms AS (
      SELECT p.period,
             CAST(round(d.rev_c / 100.0
                        * (round(cos(2 * pi() * (d.t % p.period) / p.period)
                                 * 1000000) / 1000000.0) * 1000)
                  AS BIGINT) AS c_milli,
             CAST(round(d.rev_c / 100.0
                        * (round(sin(2 * pi() * (d.t % p.period) / p.period)
                                 * 1000000) / 1000000.0) * 1000)
                  AS BIGINT) AS s_milli
      FROM daily d, (SELECT unnest([7, 14, 30]) AS period) p
    )
    SELECT period,
           -- exact int128 squares of the exact milli sums, ONE cast to
           -- double at the end: squaring ~1e14 doubles first left the
           -- result 1 ulp engine-dependent, flipping round(,2)
           CAST(CAST(sum(c_milli) AS HUGEINT) * sum(c_milli)
                + CAST(sum(s_milli) AS HUGEINT) * sum(s_milli) AS DOUBLE)
             / 1000000.0 AS power
    FROM terms
    GROUP BY period
    """,
)
def ts_periodogram_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-period periodogram of daily revenue: spectral power
    |Σ x·e^{-2πit/p}|² at the periods that matter for commerce data
    (weekly, biweekly, monthly) — the quantitative form of the
    day-of-week seasonality the [[ts_seasonality_dow]] profile shows,
    and the test that picks WHICH seasonal adjustment
    [[ts_seasonal_decompose_dow]] should apply. Each cos/sin term is
    snapped to exact milli-integers before the (order-sensitive)
    sums, and the trig arguments are phase-reduced (t mod p — at most
    51 distinct small angles, then the cos/sin VALUES snap to a
    micro grid), because libm argument reduction on ~2000-radian
    inputs differs across engines at the ulp level. The day index comes from a
    calendar-bounded ranking window; the term explode is 3× the day
    grid, nowhere near data-sized."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(cents("o_totalprice")).alias("rev_c"))
        .select(
            (F.row_number().over(Window.orderBy("day")) - 1).alias("t"),
            "rev_c",
        )
    )
    terms = daily.select(
        F.explode(F.array(F.lit(7), F.lit(14), F.lit(30))).alias("period"),
        "t",
        "rev_c",
    ).select(
        "period",
        F.round(
            F.col("rev_c")
            / 100.0
            * (
                F.round(
                    F.cos(
                        2
                        * F.lit(3.141592653589793)
                        * (F.col("t") % F.col("period"))
                        / F.col("period")
                    )
                    * 1000000
                )
                / 1000000.0
            )
            * 1000
        )
        .cast("long")
        .alias("c_milli"),
        F.round(
            F.col("rev_c")
            / 100.0
            * (
                F.round(
                    F.sin(
                        2
                        * F.lit(3.141592653589793)
                        * (F.col("t") % F.col("period"))
                        / F.col("period")
                    )
                    * 1000000
                )
                / 1000000.0
            )
            * 1000
        )
        .cast("long")
        .alias("s_milli"),
    )
    # exact squares of the exact milli sums, one final double cast. The
    # oracle squares in HUGEINT (int128); Spark has no int128 scalar,
    # so the operands are decimal(19,0) — the widest precision whose
    # product still fits decimal(38,0). The JOINT exactness bound is
    # the final sum cd^2 + sd^2 < 1e38 (also decimal(38,0)), i.e.
    # |sums| jointly below ~7.07e18 — int64 sums at the 9.2e18 extreme
    # could overflow it (ANSI error, never a silent wrong value), and
    # HUGEINT itself tops out at 1.70e38 just past the same point.
    # Fixture sums are ~1e14, four orders inside the bound.
    # decimal(18,0) (pre-r8) lost a decade of that headroom while
    # claiming int128 parity.
    cd = F.sum("c_milli").cast("decimal(19,0)")
    sd = F.sum("s_milli").cast("decimal(19,0)")
    return terms.groupBy("period").agg(
        ((cd * cd + sd * sd).cast("double") / 1000000.0).alias("power")
    )
