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
    approx = {r.vec_id for r in Q.q_ivf_topk(spark, SF).collect()}
    exact = [
        r.vec_id
        for r in Q.similarity.cosine_topk(
            Q.load(spark, SF, "embeddings"), query_vec_id=0, k=5
        ).collect()
    ]
    recall = len(approx & set(exact)) / len(exact)
    assert recall >= 0.6, f"IVF recall@5 degraded: {recall}"


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
