"""Property tests for the diameter-independent connected-components
kernel (`connected_components_star`, VERDICT r7 task 1): the
large-star/small-star alternation must (a) agree with the min-label
kernel everywhere both converge, (b) converge in O(log n) alternations
on a PATH GRAPH whose diameter far exceeds the min-label budget — the
chain-shaped near-dup topology (serial paraphrases, crawl mirrors)
that is exactly the min-label kernel's designed failure mode, and
(c) show ~log2(diameter) round growth across path-length decades.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from apache_spark_irs_form_990_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _path_graph(spark, n):
    nodes = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    return nodes, edges


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_min_label_refuses_long_chain(spark):
    """A 300-node path exceeds the min-label default budget (20 rounds)
    and must fail LOUDLY — the documented contract, and the scale
    hazard the star kernel exists to remove."""
    nodes, edges = _path_graph(spark, 300)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges).collect()


def test_star_collapses_long_chain_in_log_rounds(spark):
    """The same chain shape at 4096 nodes: min-label would need 4096
    propagation rounds; the star alternation must finish inside its
    default 25-alternation budget with every node labeled 0."""
    nodes, edges = _path_graph(spark, 4096)
    stats = {}
    out = connected_components_star(nodes, edges, stats=stats)
    labels = _labels(out)
    assert len(labels) == 4096
    assert set(labels.values()) == {0}
    # log2(4096) = 12; allow the confirming alternation plus slack
    assert stats["rounds"] <= 16, stats


def test_star_round_growth_is_logarithmic(spark):
    """Across two path-length decades the alternation count must grow
    like log2(diameter), not diameter: the SCALE_STEP claim in
    miniature, pinned as a hard assertion."""
    rounds = {}
    for n in (16, 256, 4096):
        nodes, edges = _path_graph(spark, n)
        stats = {}
        connected_components_star(nodes, edges, stats=stats).collect()
        rounds[n] = stats["rounds"]
        # log2(n) + 4 slack covers the confirming round and small-n noise
        assert stats["rounds"] <= n.bit_length() + 4, rounds
    # 256x more diameter must cost additive rounds, not multiplicative
    assert rounds[4096] <= rounds[16] + 10, rounds


def test_star_agrees_with_min_label_on_random_graphs(spark):
    """Kernel equivalence on 20 seeded random graphs (mixed density,
    self-loops, duplicate and reversed edges, isolated nodes): the two
    kernels must produce identical labelings wherever min-label's
    budget suffices."""
    rng = random.Random(990)
    for trial in range(20):
        n = rng.randint(2, 40)
        m = rng.randint(0, 2 * n)
        # endpoints range over [0, n + 4): some ids fall OUTSIDE
        # `nodes`, so edge-only endpoints (including self-loop-only
        # ones) are exercised on every trial — includes self-loops
        # and dup/reversed edges by construction
        edge_list = [
            (rng.randrange(n + 4), rng.randrange(n + 4)) for _ in range(m)
        ]
        nodes = spark.range(n).select(F.col("id"))
        if edge_list:
            edges = spark.createDataFrame(edge_list, "src long, dst long")
        else:
            edges = spark.createDataFrame([], "src long, dst long")
        a = _labels(connected_components(nodes, edges, max_iter=50))
        b = _labels(connected_components_star(nodes, edges))
        assert a == b, f"trial {trial}: min-label {a} != star {b}"


def test_star_edgeless_and_single_edge(spark):
    """Degenerate inputs: an edgeless graph labels every node itself
    (zero alternations); a single self-loop is an edgeless graph; one
    real edge is one star."""
    nodes = spark.range(5).select(F.col("id"))
    empty = spark.createDataFrame([], "src long, dst long")
    stats = {}
    out = _labels(connected_components_star(nodes, empty, stats=stats))
    assert out == {i: i for i in range(5)}
    assert stats["rounds"] == 0

    loop = spark.createDataFrame([(3, 3)], "src long, dst long")
    assert _labels(connected_components_star(nodes, loop)) == {
        i: i for i in range(5)
    }

    one = spark.createDataFrame([(4, 1)], "src long, dst long")
    assert _labels(connected_components_star(nodes, one)) == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 1,
    }


def test_contracted_star_edges_preserve_connectivity(spark):
    """The identity `dedup_cluster_components_incremental` rides on:
    for any edge split G = E1 ∪ E2, components of {star edges of
    CC(E1)} ∪ E2 equal components of the full graph — contracted
    phase-1 labels are a lossless stand-in for the phase-1 edge set.
    15 seeded random splits, both kernels on the merge pass."""
    rng = random.Random(8990)
    for trial in range(15):
        n = rng.randint(3, 36)
        m1, m2 = rng.randint(0, 2 * n), rng.randint(1, n)
        e1 = [(rng.randrange(n), rng.randrange(n)) for _ in range(m1)]
        e2 = [(rng.randrange(n), rng.randrange(n)) for _ in range(m2)]
        nodes = spark.range(n).select(F.col("id"))
        df1 = (
            spark.createDataFrame(e1, "src long, dst long")
            if e1
            else spark.createDataFrame([], "src long, dst long")
        )
        df2 = spark.createDataFrame(e2, "src long, dst long")
        full = _labels(
            connected_components_star(nodes, df1.unionByName(df2))
        )
        labels1 = connected_components(nodes, df1, max_iter=50)
        star1 = labels1.filter(F.col("id") != F.col("component")).select(
            F.col("component").alias("src"), F.col("id").alias("dst")
        )
        inc = _labels(
            connected_components_star(nodes, star1.unionByName(df2))
        )
        assert inc == full, f"trial {trial}: incremental {inc} != full {full}"


def test_edge_only_endpoints_are_labeled_by_both_kernels(spark):
    """The pinned labeled-id contract: nodes ∪ ALL edge endpoints,
    identically in both kernels — an endpoint missing from `nodes`
    still gets a component row (r8 review find: the star kernel
    dropped it while min-label's error message called the star form a
    drop-in replacement)."""
    nodes = spark.createDataFrame([(1,)], "id long")
    edges = spark.createDataFrame([(1, 2), (5, 6)], "src long, dst long")
    expected = {1: 1, 2: 1, 5: 5, 6: 5}
    assert _labels(connected_components(nodes, edges)) == expected
    assert _labels(connected_components_star(nodes, edges)) == expected

    # r9 advisor find: an endpoint that appears ONLY in self-loop
    # edges must still get a (self-labeled) row — _canon_edges drops
    # self-loops, so the star kernel's id set has to union endpoints
    # from the RAW edge frame, not the canonicalized one.
    loop_edges = spark.createDataFrame(
        [(1, 2), (7, 7)], "src long, dst long"
    )
    expected_loop = {1: 1, 2: 1, 7: 7}
    assert _labels(connected_components(nodes, loop_edges)) == expected_loop
    assert _labels(connected_components_star(nodes, loop_edges)) == expected_loop
