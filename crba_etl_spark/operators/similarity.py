"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the IVF variant assigns
every vector to its nearest coarse centroid and probes only the query's
cell — the 100 TB path (cells are partition keys; only one cell's
partitions are scanned per query; centroids broadcast).

All arithmetic is JVM-side Catalyst expressions over arrays
(``zip_with`` + ``aggregate``): float32 inputs are cast to double first
so the left-to-right summation is bit-identical to the DuckDB oracle's
``list_dot_product`` on the same cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the query vector (excluded).

    Plan shape: broadcast 1-row query → zip_with/aggregate per row (one
    scan, no shuffle except the final top-k), `round(6)` for stable
    cross-engine comparison.
    """
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        _as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine(_as_double(F.col(vec_col)), F.col("qv")), 6).alias(
                "cos_sim"
            ),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to the coarse cell whose centroid it is most
    similar to. Centroids are the first ``n_cells`` vectors (deterministic
    — a real system would k-means; the plumbing is identical). Output:
    (id, cell, cos to centroid)."""
    cents = (
        emb.filter(F.col(id_col) < n_cells)
        .select(
            F.col(id_col).cast("int").alias("cell"),
            _as_double(F.col(vec_col)).alias("cv"),
        )
    )
    scored = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "cell",
            cosine(_as_double(F.col(vec_col)), F.col("cv")).alias("sim"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("sim"), F.col("cell"))).alias("m")
    )
    return best.select(id_col, F.col("m.cell").alias("cell"), F.round("m.sim", 6).alias("cell_sim"))


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos_sim ≥ τ).

    Exact all-pairs form (the verification oracle). At 100 TB you prune
    candidates first — LSH over random hyperplane signs or the IVF cells
    above — then run THIS join only on candidate pairs; the scoring
    expression is identical either way.
    """
    a = emb.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    )
    b = emb.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 5,
    n_cells: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's IVF cell."""
    assign = ivf_assign(emb, n_cells, id_col, vec_col)
    with_cell = emb.join(assign.select(id_col, "cell"), id_col)
    qcell = (
        assign.filter(F.col(id_col) == query_vec_id).select("cell")
    )
    candidates = with_cell.join(F.broadcast(qcell), "cell")
    return cosine_topk(candidates, query_vec_id, k, id_col, vec_col)
