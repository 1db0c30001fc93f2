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
