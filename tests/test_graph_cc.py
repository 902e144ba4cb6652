"""connected_components (operators/graph.py): min-label propagation over
candidate-pair edges — chains, multiple components, singletons from a
wider node universe, and the bounded-rounds failure contract."""

import pytest

from crba_etl_spark.operators.graph import connected_components


def _cc(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    n = (
        spark.createDataFrame([(x,) for x in nodes], "node long")
        if nodes is not None
        else None
    )
    out = connected_components(e, nodes=n, **kw)
    return {r.node: r.label for r in out.collect()}


def test_chain_and_separate_component(spark):
    # 1-2-3-4 chain (diameter 3) + {10,11}; transitivity must close the
    # chain even though (1,4) was never an edge
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_singletons_from_node_universe(spark):
    got = _cc(spark, [(2, 5)], nodes=[1, 2, 5, 9])
    assert got == {1: 1, 2: 2, 5: 2, 9: 9}


def test_label_is_component_min_regardless_of_edge_direction(spark):
    # min id sits at the dst side of every edge
    got = _cc(spark, [(7, 3), (9, 3)])
    assert got == {3: 3, 7: 3, 9: 3}


def test_bounded_rounds_raise(spark):
    # a 6-node chain has diameter 5 > max_iters=2 propagation budget
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(spark, [(i, i + 1) for i in range(1, 6)], max_iters=2)
