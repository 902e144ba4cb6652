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


def _cc_star(spark, edges, nodes=None, **kw):
    from crba_etl_spark.operators.graph import connected_components_star

    e = spark.createDataFrame(edges, "id_a long, id_b long")
    n = (
        spark.createDataFrame([(x,) for x in nodes], "node long")
        if nodes is not None
        else None
    )
    out = connected_components_star(e, nodes=n, **kw)
    return {r.node: r.label for r in out.collect()}


def test_star_handles_long_chain_in_log_rounds(spark):
    """The seam the min-label docstring promises: a 120-node chain
    (diameter 119) converges for large/small-star within a logarithmic
    round budget where min-label propagation would need ~119 rounds."""
    edges = [(i, i + 1) for i in range(1, 120)]
    got = _cc_star(spark, edges, max_iters=12)
    assert set(got.values()) == {1} and len(got) == 120


def test_star_equivalent_to_label_propagation(spark):
    """Both algorithms must produce the identical (node, component-min)
    labeling on a deterministic pseudo-random multi-component graph,
    including singletons from a wider universe."""
    import hashlib

    def h(i):
        return int(hashlib.md5(f"edge:{i}".encode()).hexdigest()[:8], 16)

    edges = [(h(i) % 60, h(i + 1000) % 60) for i in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    universe = list(range(70))  # 60..69 untouched → singletons
    a = _cc(spark, edges, nodes=universe)
    b = _cc_star(spark, edges, nodes=universe)
    assert a == b
    assert all(b[x] == x for x in range(60, 70))


def test_star_star_shaped_input_is_stable(spark):
    got = _cc_star(spark, [(5, 1), (7, 1), (9, 1)])
    assert got == {1: 1, 5: 1, 7: 1, 9: 1}


def test_star_survives_checksum_collisions(spark, monkeypatch):
    """Round-4 VERDICT #5 / ADVICE low: the star loop's edge-set
    checksum is probabilistic — a collision must NOT terminate the loop
    early. Simulate the worst case (every round's checksum collides) and
    assert the exact exceptAll confirmation still drives the loop to the
    true fixpoint with correct labels."""
    from crba_etl_spark.operators import graph

    monkeypatch.setattr(graph, "_edge_checksum", lambda df: (0, 0))
    edges = [(i, i + 1) for i in range(1, 40)] + [(100, 101)]
    got = _cc_star(spark, edges, max_iters=12)
    assert set(got.items()) == (
        {(i, 1) for i in range(1, 41)} | {(100, 100), (101, 100)}
    )


def _merge(spark, labels, new_edges, new_nodes=None):
    from crba_etl_spark.operators.graph import merge_components

    lab = spark.createDataFrame(list(labels.items()), "node long, label long")
    e = spark.createDataFrame(new_edges, "id_a long, id_b long")
    n = (
        spark.createDataFrame([(x,) for x in new_nodes], "node long")
        if new_nodes is not None
        else None
    )
    out = merge_components(lab, e, new_nodes=n)
    return {r.node: r.label for r in out.collect()}


def test_merge_components_cross_batch_chain(spark):
    """Round-4 VERDICT #6: new pairs bridging several existing
    components (via a brand-new node) must merge them all to the union
    minimum — and match a full recompute over the union graph."""
    from crba_etl_spark.operators.graph import connected_components

    old_edges = [(1, 2), (5, 6), (10, 11)]
    labels = {1: 1, 2: 1, 5: 5, 6: 5, 10: 10, 11: 10, 20: 20}
    # new node 100 chains components {1,2} and {5,6} together; (11, 100)
    # extends the chain to {10,11}; 30-31 is a brand-new pair
    new_edges = [(2, 100), (100, 6), (11, 100), (30, 31)]
    got = _merge(spark, labels, new_edges, new_nodes=[100, 30, 31, 40])
    e = spark.createDataFrame(
        old_edges + new_edges, "id_a long, id_b long"
    )
    n = spark.createDataFrame(
        [(x,) for x in list(labels) + [100, 30, 31, 40]], "node long"
    )
    full = {r.node: r.label for r in connected_components(e, nodes=n).collect()}
    assert got == full
    assert got[100] == 1 and got[10] == 1 and got[5] == 1  # chain closed
    assert got[20] == 20 and got[40] == 40  # untouched / singleton batch node


def test_merge_components_new_min_from_batch(spark):
    """A new node with a smaller id than every existing label must
    become the merged component's canonical label."""
    got = _merge(spark, {5: 5, 6: 5}, [(0, 6)], new_nodes=[0])
    assert got == {0: 0, 5: 0, 6: 0}


def test_merge_components_no_edges(spark):
    got = _merge(spark, {1: 1, 2: 1}, [], new_nodes=[9])
    assert got == {1: 1, 2: 1, 9: 9}


def _merge_delta(spark, labels, new_edges, new_nodes=None):
    from crba_etl_spark.operators.graph import merge_components_delta

    lab = spark.createDataFrame(list(labels.items()), "node long, label long")
    e = spark.createDataFrame(new_edges, "id_a long, id_b long")
    n = (
        spark.createDataFrame([(x,) for x in new_nodes], "node long")
        if new_nodes is not None
        else None
    )
    out = merge_components_delta(lab, e, new_nodes=n)
    return {r.node: r.label for r in out.collect()}


def test_merge_delta_resolves_to_merge_components(spark):
    """Equivalence contract: labels overridden by the delta (delta wins)
    ≡ merge_components, and the delta contains ONLY changed/new rows."""
    labels = {1: 1, 2: 1, 5: 5, 6: 5, 10: 10, 11: 10, 20: 20}
    new_edges = [(2, 100), (100, 6), (11, 100), (30, 31)]
    new_nodes = [100, 30, 31, 40]
    delta = _merge_delta(spark, labels, new_edges, new_nodes=new_nodes)
    full = _merge(spark, labels, new_edges, new_nodes=new_nodes)
    assert {**labels, **delta} == full
    # untouched rows never appear in the delta
    assert 20 not in delta and 1 not in delta and 2 not in delta
    # relabeled components, new edge-nodes and batch singletons do
    assert delta[5] == 1 and delta[10] == 1 and delta[100] == 1
    assert delta[30] == 30 and delta[31] == 30 and delta[40] == 40


def test_merge_delta_update_batch_never_dissolves_groups(spark):
    """new_nodes may OVERLAP the labeled universe (an UPDATE batch):
    a re-ingested member with no surviving edge must NOT get a
    singleton row that would override its group label at read time."""
    delta = _merge_delta(spark, {3: 3, 7: 3}, [], new_nodes=[7, 9])
    assert delta == {9: 9}  # 7 keeps label 3 (no row), 9 is genuinely new


def test_cc_storage_is_o1_in_rounds(spark):
    """Round-4 ADVICE low: each round's localCheckpoint blocks must be
    freed when the next round materializes — a 30-round min-label run
    (and a multi-round star run) may retain only the FINAL round plus
    the tracked edge cache, not one block set per round."""
    from crba_etl_spark.cache import release_caches
    from crba_etl_spark.operators.graph import (
        _persistent_rdd_ids,
        connected_components,
        connected_components_star,
    )

    release_caches()
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 31)], "id_a long, id_b long"
    )
    before = _persistent_rdd_ids(spark)
    out = connected_components(e, max_iters=40)
    assert {r.label for r in out.collect()} == {1}
    retained = _persistent_rdd_ids(spark) - before
    assert len(retained) <= 2, retained  # final labels + tracked sym cache

    before = _persistent_rdd_ids(spark)
    out = connected_components_star(e, max_iters=12)
    assert {r.label for r in out.collect()} == {1}
    retained = _persistent_rdd_ids(spark) - before
    assert len(retained) <= 2, retained
    release_caches()


def test_merge_driver_path_equals_distributed(spark):
    """Round-6: the driver-side union-find fast path (small condensed
    graphs — the per-epoch norm) must produce byte-identical labelings
    to the distributed star path, for both the full and the delta form,
    and the cap must fall back to the distributed path when exceeded."""
    from crba_etl_spark.operators.graph import (
        merge_components,
        merge_components_delta,
    )

    labels = {1: 1, 2: 1, 5: 5, 6: 5, 10: 10, 11: 10, 20: 20}
    new_edges = [(2, 100), (100, 6), (11, 100), (30, 31)]
    new_nodes = [100, 30, 31, 40, 20]  # 20 overlaps the labeled universe
    lab = spark.createDataFrame(list(labels.items()), "node long, label long")
    e = spark.createDataFrame(new_edges, "id_a long, id_b long")
    n = spark.createDataFrame([(x,) for x in new_nodes], "node long")
    for fn in (merge_components, merge_components_delta):
        driver = {
            r.node: r.label
            for r in fn(lab, e, new_nodes=n, driver_cc_max_edges=10_000).collect()
        }
        dist = {
            r.node: r.label
            for r in fn(lab, e, new_nodes=n, driver_cc_max_edges=None).collect()
        }
        fallback = {
            r.node: r.label
            for r in fn(lab, e, new_nodes=n, driver_cc_max_edges=1).collect()
        }
        assert driver == dist == fallback, fn.__name__


def test_merge_driver_no_edges_and_string_ids(spark):
    from crba_etl_spark.operators.graph import merge_components_delta

    lab = spark.createDataFrame([("a", "a"), ("b", "a")], "node string, label string")
    e = spark.createDataFrame([], "id_a string, id_b string")
    n = spark.createDataFrame([("b",), ("z",)], "node string")
    delta = {
        r.node: r.label for r in merge_components_delta(lab, e, new_nodes=n).collect()
    }
    assert delta == {"z": "z"}  # known node keeps its group, new one is a singleton


def test_reliable_checkpoint_option(spark, tmpdir_):
    """Round-6 (r5 VERDICT #5): reliable_checkpoint= routes the CC
    loops' lineage truncation to durable checkpoint() files — identical
    labels, and the checkpoint dir actually receives data (the
    cluster-survivability evidence localCheckpoint can't give)."""
    import os

    from crba_etl_spark.operators.graph import (
        connected_components,
        connected_components_star,
        merge_components_delta,
    )

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)] + [(50, 51)], "id_a long, id_b long"
    )
    want = {r.node: r.label for r in connected_components(e).collect()}
    ckpt = os.path.join(tmpdir_, "cc_ckpt")
    got = {
        r.node: r.label
        for r in connected_components(e, reliable_checkpoint=ckpt).collect()
    }
    assert got == want
    got_star = {
        r.node: r.label
        for r in connected_components_star(e, reliable_checkpoint=ckpt).collect()
    }
    assert got_star == want
    assert any(os.scandir(ckpt))  # durable files were written
    # the incremental merge's distributed fallback threads it through too
    lab = spark.createDataFrame([(1, 1), (2, 1)], "node long, label long")
    delta = {
        r.node: r.label
        for r in merge_components_delta(
            lab,
            spark.createDataFrame([(2, 3)], "id_a long, id_b long"),
            driver_cc_max_edges=None,
            reliable_checkpoint=ckpt,
        ).collect()
    }
    assert delta == {3: 1}
