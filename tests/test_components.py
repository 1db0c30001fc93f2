"""Unit semantics of the connected-components operator on hand-built
graphs (the oracle test in test_oracle.py covers the full pipeline;
these pin the algorithm itself)."""

from __future__ import annotations


def _cc(spark, nodes, edges):
    from apache_spark_irs_form_990_spark.operators.components import (
        connected_components,
    )

    n = spark.createDataFrame([(i,) for i in nodes], "id long")
    e = spark.createDataFrame(edges or [(None, None)], "src long, dst long")
    if not edges:
        e = e.filter("src IS NOT NULL")
    out = connected_components(n, e)
    return {r["id"]: r["component"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, must converge to min label 1
    got = _cc(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_singleton(spark):
    got = _cc(spark, [1, 2, 3, 10, 11, 99], [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, [7, 8, 9], [])
    assert got == {7: 7, 8: 8, 9: 9}


def test_banded_lsh_pairs_partition_invariant(spark):
    """The candidate set is a pure function of the vectors — it must
    not change under repartitioning (the property that makes results
    reproducible across cluster sizes)."""
    from apache_spark_irs_form_990_spark.operators.similarity import (
        banded_lsh_pairs,
        emb_milli_corpus,
    )
    from tests.conftest import SF_DIR

    corpus = emb_milli_corpus(spark, SF_DIR, keeps=(60,), cap=200)
    base = {(r.id_a, r.id_b) for r in banded_lsh_pairs(corpus).collect()}
    for n in (1, 7):
        got = {
            (r.id_a, r.id_b)
            for r in banded_lsh_pairs(corpus.repartition(n)).collect()
        }
        assert got == base, f"candidates changed under repartition({n})"
    # structural properties: ordered pairs, no self-pairs
    assert all(a < b for a, b in base)
    assert base, "expected nonempty candidates (injected near-dups)"


def test_emb_milli_corpus_injection_shape(spark):
    """Generation k re-ids every 5th vector at +(k+1)e6 with the dim
    tail zeroed; base rows are untouched."""
    from pyspark.sql import functions as F

    from apache_spark_irs_form_990_spark.operators.similarity import (
        emb_milli_corpus,
    )
    from tests.conftest import SF_DIR

    corpus = emb_milli_corpus(spark, SF_DIR, keeps=(60, 56), cap=100)
    counts = dict(
        corpus.groupBy((F.col("vec_id") / 1000000).cast("int").alias("g"))
        .count()
        .collect()
    )
    assert counts[1] == counts[2] == 20  # every 5th of 100
    assert counts[0] == 100
    tail = corpus.filter(F.col("vec_id") >= 2000000).select(
        F.max(F.aggregate(F.slice("v", 57, 8), F.lit(0).cast("long"),
                          lambda a, x: a + F.abs(x))).alias("tail_sum")
    ).collect()[0]["tail_sum"]
    assert tail == 0, "gen2 must zero dims >= 56"


def test_band_signature_kernels_identical(spark):
    """The stateless (streaming) signature kernel must be row-for-row
    identical to the batch explode/groupBy kernel."""
    from apache_spark_irs_form_990_spark.operators.dedup import (
        band_signatures,
        band_signatures_stateless,
    )
    from apache_spark_irs_form_990_spark.tables import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    a = sorted(tuple(r) for r in band_signatures(docs).collect())
    b = sorted(tuple(r) for r in band_signatures_stateless(docs).collect())
    assert a == b and len(a) > 0
