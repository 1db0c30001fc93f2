"""Exhaustive cross-engine check of the one transcendental inside
`sample_weighted_reservoir` (queries/datasci_ext.py): the nano-nat
integerization round(ln((h+1)/65536) * 1e9) must agree between Spark
(JVM Math.log + HALF_UP round) and DuckDB (libm log + round) on the
ENTIRE 16-bit hash domain the query draws u from. The domain bound is
what turns "probably agrees" (the micro-nat family's statistical
argument) into a checked property — if a platform's libm ever
disagrees on some h, this test names it before the differential does.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_lnu_nano_domain_exhaustive(spark, duck):
    duck_vals = dict(
        duck.execute(
            "SELECT h, CAST(round(ln((h + 1) / 65536.0) * 1000000000)"
            "            AS BIGINT) AS lnu_nano"
            " FROM (SELECT unnest(generate_series(0, 65535)) AS h)"
        ).fetchall()
    )
    sdf = (
        spark.range(0, 65536)
        .select(
            F.col("id").alias("h"),
            F.round(
                F.log((F.col("id") + 1) / F.lit(65536.0)) * 1000000000
            )
            .cast("long")
            .alias("lnu_nano"),
        )
        .collect()
    )
    assert len(sdf) == 65536 == len(duck_vals)
    mismatches = [
        (r.h, r.lnu_nano, duck_vals[r.h])
        for r in sdf
        if duck_vals[r.h] != r.lnu_nano
    ]
    assert mismatches == [], f"first mismatches: {mismatches[:5]}"


def test_integer_ln_micro_domain(spark, duck):
    """`pipeline_dsir_weights` confines its transcendentals to ln of
    INTEGERS (token counts + 1, totals + vocab). Check Spark and DuckDB
    agree on the micro-nat integerization round(ln(k)*1e6) across the
    fixture's full integer domain (counts stay well under 4e5 at test
    SFs; the check is the dense prefix plus a sparse high tail)."""
    duck_vals = dict(
        duck.execute(
            "SELECT k, CAST(round(ln(k) * 1000000) AS BIGINT)"
            " FROM (SELECT unnest(generate_series(1, 400000)) AS k)"
        ).fetchall()
    )
    sdf = spark.range(1, 400001).select(
        F.col("id").alias("k"),
        F.round(F.log(F.col("id")) * 1000000).cast("long").alias("v"),
    )
    mismatch = [
        (r.k, r.v, duck_vals[r.k]) for r in sdf.collect()
        if duck_vals[r.k] != r.v
    ]
    assert mismatch == [], f"first mismatches: {mismatch[:5]}"


def test_reservoir_is_weighted_and_stable(spark, duck):
    """The top-100 must be reproducible (two runs identical) and the
    weighting must bite: the weighted sample's mean order value should
    exceed the corpus mean (high-w rows get larger u^(1/w) keys)."""
    from apache_spark_irs_form_990_spark import registry
    from tests.conftest import SF_DIR

    q = registry.queries()["sample_weighted_reservoir"]
    a = q(spark, SF_DIR).toPandas()
    b = q(spark, SF_DIR).toPandas()
    assert a.equals(b)
    assert len(a) == 100
    corpus_mean = duck.execute(
        "SELECT avg(round(o_totalprice * 100)) FROM orders"
    ).fetchone()[0]
    assert a["price_cents"].mean() > corpus_mean
