"""Approximation quality of the scale-path similarity operators, measured
against their exact oracle-verified baselines (numbers quoted in
COVERAGE.md):

- IVF ANN (k-means, 4 cells, 2 Lloyd iters) recall@5 vs exact cosine_topk;
- hyperplane-LSH near-dup recall vs the exact all-pairs form, plus the
  sub-quadratic evidence (candidates << all pairs);
- LSH-verified Jaccard pairs are a subset of the exact all-pairs result.
"""

from crba_etl_spark import queries as Q

SF = "/root/testdata/sf0.01"


def test_ann_ivf_recall_at_5(spark):
    """Multi-probe recall: the registry config (8 cells, n_probe=2 -> a
    2/8 table scan) must reach recall@5 >= 0.9; single-probe stays the
    cheap-and-cheerful floor."""
    exact = [
        r.vec_id
        for r in Q.similarity.cosine_topk(
            Q.load(spark, SF, "embeddings"), query_vec_id=0, k=5
        ).collect()
    ]
    approx2 = {r.vec_id for r in Q.q_ivf_topk(spark, SF).collect()}
    recall2 = len(approx2 & set(exact)) / len(exact)
    assert recall2 >= 0.9, f"IVF n_probe=2 recall@5 degraded: {recall2}"
    approx1 = {
        r.vec_id
        for r in Q.similarity.ivf_topk(
            Q.load(spark, SF, "embeddings"),
            query_vec_id=0, k=5, n_cells=8, iters=2, n_probe=1,
        ).collect()
    }
    recall1 = len(approx1 & set(exact)) / len(exact)
    assert recall1 >= 0.6, f"IVF n_probe=1 recall@5 degraded: {recall1}"
    assert recall2 >= recall1  # more probes never lose neighbors


def test_embedding_lsh_near_dup_recall_and_pruning(spark):
    exact = {
        (r.id_a, r.id_b) for r in Q.q_cosine_near_dup_exact(spark, SF).collect()
    }
    lsh = {(r.id_a, r.id_b) for r in Q.q_cosine_near_dup(spark, SF).collect()}
    assert lsh <= exact  # verification is exact → no false positives
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.5, f"hyperplane-LSH recall degraded: {recall}"

    n = Q.load(spark, SF, "embeddings").count()
    n_cand = Q.q_embedding_lsh_candidates(spark, SF).count()
    all_pairs = n * (n - 1) / 2
    # the candidate set must be a real pruning of the pair space (the
    # 4-bit bands are sized for these 500-vector tables; see the
    # parameter-scaling note in similarity.embedding_lsh_candidates)
    assert n_cand < 0.3 * all_pairs, f"{n_cand} candidates of {all_pairs} pairs"


def test_lsh_verified_jaccard_subset_of_exact(spark):
    exact = {
        (r.id_a, r.id_b, r.jaccard)
        for r in Q.q_ngram_jaccard_exact_baseline(spark, SF).collect()
    }
    verified = {
        (r.id_a, r.id_b, r.jaccard)
        for r in Q.q_lsh_verified_pairs(spark, SF).collect()
    }
    assert verified <= exact


def test_lsh_recall_on_planted_near_dups(spark):
    """Round-2 VERDICT #4: measure recall in the regime the operator
    CLAIMS (true near-dups, cos >= 0.9) instead of only the tau=0.4
    near-uniform regime, with band widths auto-sized by lsh_params(n)
    (the log2(n) rule the docstring prescribes). Plant deterministic
    perturbed copies of real vectors (relative noise ~0.3 -> cos ~0.95)
    and require the LSH path to find >= 90% of them."""
    import hashlib

    import numpy as np
    import pandas as pd

    base = (
        Q.load(spark, SF, "embeddings")
        .orderBy("vec_id")
        .limit(120)
        .toPandas()
    )
    rows = [(int(r.vec_id), list(map(float, r.embedding))) for r in base.itertuples()]

    def noise(vid, d):  # deterministic, engine-independent
        h = int(hashlib.md5(f"plant:{vid}:{d}".encode()).hexdigest()[:8], 16)
        return h / 2**31 - 1.0

    planted = []
    for vid, v in rows[:30]:
        v = np.asarray(v)
        u = np.asarray([noise(vid, d) for d in range(len(v))])
        u = u / np.linalg.norm(u) * 0.3 * np.linalg.norm(v)
        planted.append((100000 + vid, [float(x) for x in v + u]))
    all_rows = rows + planted
    emb = spark.createDataFrame(
        pd.DataFrame(all_rows, columns=["vec_id", "embedding"])
    )

    planted_pairs = {(vid, 100000 + vid) for vid, _ in rows[:30]}
    exact = {
        (r.id_a, r.id_b)
        for r in Q.similarity.cosine_near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert planted_pairs <= exact  # the perturbation really is cos >= 0.9

    n_bands, bits = Q.similarity.lsh_params(len(all_rows))
    assert bits >= 7  # auto-sizing actually scaled past the 4-bit default
    lsh = {
        (r.id_a, r.id_b)
        for r in Q.similarity.cosine_near_dup_lsh(
            emb, threshold=0.9, n_bands=n_bands, bits_per_band=bits
        ).collect()
    }
    assert lsh <= exact  # exact verification -> zero false positives
    recall = len(lsh & planted_pairs) / len(planted_pairs)
    assert recall >= 0.9, f"planted near-dup recall {recall} (bands={n_bands}, bits={bits})"


def test_ivf_auto_sized_recall_at_5k(spark):
    """Round-3 VERDICT #5: IVF cells auto-sized by the √n rule at a
    larger n — 5000 vectors → 70 cells (vs the registry's fixed 8) —
    with planted near-dup structure: the query's true top-5 are tight
    perturbations of it, so a correct IVF must co-assign them with the
    query and recover them at n_probe=2 (a 2/70 table scan).
    recall@5 >= 0.9 required; also checks √n sizing arithmetic."""
    import hashlib

    import numpy as np
    import pandas as pd

    from crba_etl_spark.operators.similarity import auto_cells, cosine_topk, ivf_topk

    assert auto_cells(5000) == 70
    assert auto_cells(10**9) == 31622
    assert auto_cells(1) == 2

    def h(s):  # deterministic pseudo-random in [-1, 1)
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**31 - 1.0

    dim, n_base, n_plant = 32, 4960, 40
    base = np.array(
        [[h(f"v:{i}:{d}") for d in range(dim)] for i in range(n_base)]
    )
    q = base[0]
    plant = []
    for j in range(n_plant):
        u = np.array([h(f"p:{j}:{d}") for d in range(dim)])
        u = u / np.linalg.norm(u) * 0.1 * np.linalg.norm(q)
        plant.append(q + u)  # cos(q, planted) ≈ 0.995
    vecs = np.vstack([base, np.array(plant)])
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [[float(x) for x in v] for v in vecs],
            }
        )
    ).repartition(8)

    exact = [r.vec_id for r in cosine_topk(emb, query_vec_id=0, k=5).collect()]
    assert set(exact) <= set(range(n_base, n_base + n_plant))  # structure held
    approx = {
        r.vec_id
        for r in ivf_topk(
            emb, query_vec_id=0, k=5, n_cells=None, iters=2, n_probe=2
        ).collect()
    }
    recall = len(approx & set(exact)) / len(exact)
    assert recall >= 0.9, f"auto-sized IVF recall@5 at n=5000: {recall}"
