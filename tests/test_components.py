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


def test_banded_lsh_megacluster_star_fallback(spark):
    """A megacluster that overflows its bucket in EVERY band (identical
    vectors collide everywhere) must NOT lose connectivity — the r4
    drop-only cap zeroed recall on exactly this case (ADVICE r4); the
    r5 star fallback links every member to the bucket hub instead, in
    O(occ) edges rather than occ^2 pairs."""
    from apache_spark_irs_form_990_spark.operators.similarity import (
        _MAX_BUCKET_OCCUPANCY,
        _N_BANDS,
        banded_lsh_pairs,
    )

    n_mega = _MAX_BUCKET_OCCUPANCY + 36  # one bucket, always over cap
    mega = [(i, [7] * 64) for i in range(n_mega)]
    # a few distinct cold vectors (deterministic spread across buckets)
    cold = [
        (1000 + k, [((k + 1) * (d + 3)) % 17 - 8 for d in range(64)])
        for k in range(12)
    ]
    corpus = spark.createDataFrame(
        mega + cold, "vec_id long, v array<long>"
    )
    pairs = {(r.id_a, r.id_b) for r in banded_lsh_pairs(corpus).collect()}
    # every megacluster member connects to the hub (min vec_id = 0)
    for m in range(1, n_mega):
        assert (0, m) in pairs, f"megacluster member {m} lost connectivity"
    # and the megacluster contributes O(n) edges, not occ^2 pairs
    mega_edges = [p for p in pairs if p[1] < n_mega]
    assert len(mega_edges) == n_mega - 1, mega_edges[:5]
    # total volume bounded by bands * n (star) + cold pairwise
    assert len(pairs) <= _N_BANDS * (n_mega + len(cold))


def test_flat_index_caps_hot_bucket_but_keeps_queries(spark):
    """`_flat_index` must bound the STORED side of the flat-LSH join at
    C members per bucket while every vector still probes — a hot
    bucket degrades to ranking against the md5 sample, it never
    disappears (the failure mode the r4 drop-only cap had)."""
    from apache_spark_irs_form_990_spark.operators.similarity import (
        _MAX_INDEX_PER_BUCKET,
        _flat_bucketed,
        _flat_index,
    )

    n_hot = _MAX_INDEX_PER_BUCKET + 40
    corpus = spark.createDataFrame(
        [(i, [5] * 64) for i in range(n_hot)], "vec_id long, v array<long>"
    )
    bucketed = _flat_bucketed(corpus)
    index = _flat_index(bucketed)
    # identical vectors share one bucket; the index keeps exactly C
    assert index.count() == _MAX_INDEX_PER_BUCKET
    assert bucketed.count() == n_hot  # probe side is never capped
    # deterministic: same sample under a different partitioning
    again = {
        r.vec_id
        for r in _flat_index(_flat_bucketed(corpus.repartition(7))).collect()
    }
    assert again == {r.vec_id for r in index.collect()}


def test_multiprobe_recall_dominates_single_probe(spark):
    """The registered audit's contract: at equal (capped) index size,
    multiprobe 1-NN agreement with exact truth must be >= single-probe
    — otherwise the 9x probe fan-out buys nothing (docstring promise
    of sim_multiprobe_recall_audit)."""
    from apache_spark_irs_form_990_spark import registry
    from tests.conftest import SF_DIR

    row = (
        registry.queries()["sim_multiprobe_recall_audit"](spark, SF_DIR)
        .collect()[0]
    )
    assert row.n_vecs > 0
    assert row.multi_nn_match >= row.single_nn_match
    assert row.multi_match_rate >= row.single_match_rate


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


def test_fuzzy_star_rescore_recovers_planted_duplicates(spark):
    """The hub-rescored fuzzy cascade must actually dedup: every
    injected near-dup (doc_id = orig + 1e6, orig % 7 == 0) shares its
    cluster's band minima with the original, so the overwhelming
    majority elect the original as keeper (a different hub or a
    banding miss is allowed for a few — LSH recall is probabilistic),
    and NO doc ever elects a keeper larger than itself (hub = bucket
    minimum, so keep-min survivorship is monotone by construction)."""
    from pyspark.sql import functions as F

    from apache_spark_irs_form_990_spark.operators.dedup import (
        dedup_fuzzy_star_rescore,
    )
    from tests.conftest import SF_DIR

    out = dedup_fuzzy_star_rescore(spark, SF_DIR).cache()
    try:
        planted = out.filter(F.col("doc_id") >= 1000000).collect()
        assert len(planted) > 0
        hits = sum(
            1 for r in planted if r.keeper_id == r.doc_id - 1000000
        )
        assert hits >= 0.8 * len(planted), (
            f"only {hits}/{len(planted)} planted near-dups elected "
            f"their original as keeper"
        )
        assert out.filter(F.col("keeper_id") > F.col("doc_id")).count() == 0
    finally:
        out.unpersist()
