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
    sym = persist_tracked(sym)
    # localCheckpoint (eager) both materializes the round AND truncates
    # the logical plan — without truncation each round's plan embeds the
    # previous round's whole tree several times over, and Catalyst
    # re-analysis cost grows exponentially with rounds (measured: the
    # star variant ground to a halt by round ~7 on a 120-node chain).
    # On a cluster, swap for reliable checkpoint() if executor loss
    # during the loop must be survivable.
    labels = universe.select("node", F.col("node").alias("label")).localCheckpoint()
    checksum = labels.agg(
        F.sum("label").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    for _ in range(max_iters):
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), "label"
        )
        new_labels = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        new_checksum = new_labels.agg(
            F.sum("label").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        labels = new_labels
        if (new_checksum["s"], new_checksum["n"]) == (checksum["s"], checksum["n"]):
            return labels  # fixpoint: no label changed this round
        checksum = new_checksum
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds — "
        "component diameter exceeds the propagation budget; use "
        "connected_components_star for long-chain graphs"
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): for every node u, connect each STRICTLY
    LARGER neighbor to the minimum of u's closed neighborhood. Input and
    output are undirected edge sets encoded as (a, b) pairs."""
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    m = sym.groupBy("a").agg(F.least(F.min("b"), F.col("a")).alias("m"))
    return (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient each edge toward the smaller
    endpoint, then connect every smaller neighbor (and u itself) of each
    node u to the minimum of that neighborhood."""
    directed = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    m = directed.groupBy("a").agg(F.min("b").alias("m"))
    joined = directed.join(m, "a")
    return (
        joined.select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(joined.select(F.col("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iters: int = 40,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction — same output contract as :func:`connected_components`
    ((node, label), label = component min), but convergence is
    O(log n) ROUNDS REGARDLESS OF DIAMETER: each round hangs nodes
    directly off smaller nodes, halving long chains instead of walking
    them. This is the right variant when components can be long paths
    (linked near-dup chains, record-linkage graphs); for the dense tiny
    clusters LSH dedup produces, plain min-label propagation converges
    in fewer total jobs. Cost per round: two grouped mins + two
    distincts over the (shrinking) edge set, all equi-shuffles on node
    ids. Convergence = edge-set fixpoint, checked with a 2-value
    checksum (count, sum of a·h+b) — labels-only, driver-tiny."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()  # truncate lineage per round — see the
    )                       # min-label loop for why this is load-bearing

    def _checksum(df: DataFrame):
        # order-insensitive set fingerprint: sum of per-edge int32
        # hashes as long (never overflows; id-magnitude-safe under ANSI)
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("a", "b").cast("long")).alias("s"),
        ).collect()[0]
        return (r["n"], r["s"])

    chk = _checksum(e)
    for _ in range(max_iters):
        new_e = _small_star(_large_star(e)).localCheckpoint()
        new_chk = _checksum(new_e)
        e = new_e
        if new_chk == chk:
            break
        chk = new_chk
    else:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after {max_iters} rounds"
        )
    # at the fixpoint every edge points at its component's min: (a → b=min)
    labels = e.select(F.col("a").alias("node"), F.col("b").alias("label"))
    roots = e.select(F.col("b").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    out = labels.union(roots)
    if nodes is not None:
        universe = nodes.select(F.col(node_col).alias("node")).distinct()
        singles = universe.join(out.select("node"), "node", "left_anti").select(
            "node", F.col("node").alias("label")
        )
        out = out.union(singles)
    return out.groupBy("node").agg(F.min("label").alias("label"))
