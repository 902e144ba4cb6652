"""Distributed connected components over candidate-pair edges.

The missing last step of every dedup pipeline: LSH/SimHash produce
near-duplicate PAIRS, but dedup decisions need transitive GROUPS — if
A~B and B~C, one keeper must survive for {A,B,C} even though A~C was
never emitted. Components also scope clustering, per-group sampling
caps and lineage ("these 14 documents are one duplicated article").

Algorithm: iterative min-label propagation, pure DataFrame ops —
``label(n) ← min(label(n), min over neighbors m of label(m))`` until a
fixpoint. Each round is one equi-join + one map-side-combinable min
aggregation; labels only decrease, so the 2-value checksum
(sum(label), count) reaching a fixpoint IS convergence — a driver-side
1-row collect per round, never data-sized. Rounds needed = component
diameter. Near-dup components are dense and tiny in practice (a
duplicated article cluster has diameter 1-2); for adversarial
long-chain graphs swap the propagation step for alternating
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond") which contracts in O(log n) rounds — the
surrounding loop, checksum convergence and API stay identical, which
is why this function is the seam.

Scale notes (100 TB): the edge relation is the LSH candidate output —
already sub-quadratic; the join key is the node id (uniform hash
distribution); every intermediate is (node, label) fixed-width rows.
Per-round relations are persisted via the tracked cache and the
previous round is released immediately, so the lineage and memory
footprint stay O(1) in rounds.

Reference analog: none — graft mandate (dedup family beyond SURVEY §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..cache import persist_tracked


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node, where ``component`` is the
    smallest node id in the node's connected component — a
    deterministic, engine-portable canonical label (and the natural
    dedup keeper id).

    ``nodes`` (single-column, named ``node_col``) widens the universe
    beyond edge endpoints so isolated nodes appear as their own
    singleton components; omit it to label edge endpoints only.
    Raises RuntimeError if ``max_iters`` rounds don't converge (a
    diameter that large means the large-star/small-star variant is the
    right tool — see module docstring)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    if nodes is None:
        universe = sym.select(F.col("a").alias("node")).distinct()
    else:
        universe = nodes.select(F.col(node_col).alias("node")).distinct()
    labels = persist_tracked(
        universe.select("node", F.col("node").alias("label"))
    )
    checksum = labels.agg(
        F.sum("label").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    for _ in range(max_iters):
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), "label"
        )
        new_labels = persist_tracked(
            labels.union(msgs).groupBy("node").agg(F.min("label").alias("label"))
        )
        new_checksum = new_labels.agg(
            F.sum("label").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        prev, labels = labels, new_labels
        prev.unpersist()
        if (new_checksum["s"], new_checksum["n"]) == (checksum["s"], checksum["n"]):
            return labels  # fixpoint: no label changed this round
        checksum = new_checksum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds — "
        "component diameter exceeds the propagation budget; use the "
        "large-star/small-star contraction for long-chain graphs"
    )
