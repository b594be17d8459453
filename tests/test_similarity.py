"""ANN quality tests: k-means training must earn its keep.

Two recall gates for the IVF index (similarity/ivf.py):

1. On clustered data (the workload IVF exists for), trained cells reach
   recall@5 >= 0.9 at NPROBE=2/16 — the VERDICT round-2 target.
2. On the isotropic testdata corpus (worst case for any quantizer),
   trained cells must still beat the untrained seed slice at the same
   probe budget.

Ground truth is exact brute-force cosine (similarity/ann.cosine_topk).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestion_system_spark.similarity.ann import _as_double, cosine_topk
from data_ingestion_system_spark.similarity.ivf import (
    CENTROID_BASE,
    N_CELLS,
    ivf_topk,
    train_centroids,
)

N_QUERIES = 3
TOP_K = 5
DIM = 64


def _recall(spark, v, centroids, nprobe):
    emb = v.select("vec_id", F.col("ev").alias("embedding"))
    brute = cosine_topk(
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
        TOP_K,
    )
    truth = {(r.query_id, r.cand_id) for r in brute.collect()}
    got = {
        (r.query_id, r.cand_id)
        for r in ivf_topk(v, centroids, nprobe=nprobe, top_k=TOP_K).collect()
    }
    return len(truth & got) / len(truth)


@pytest.fixture(scope="module")
def clustered_v(spark):
    """480 vectors in 16 well-separated clusters (unit centers + 0.15σ
    noise), deterministic. vec_ids 0..2 are queries drawn from clusters;
    the CENTROID_BASE slice seeds training as in the catalog query."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(N_CELLS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(480):
        c = i % N_CELLS
        vec = centers[c] + 0.15 * rng.normal(size=DIM)
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, ev array<double>").cache()


def test_trained_ivf_recall_on_clustered_data(spark, clustered_v):
    centroids = train_centroids(clustered_v)
    rec = _recall(spark, clustered_v, centroids, nprobe=2)
    assert rec >= 0.9, f"recall@5 {rec} < 0.9 on clustered data"


def test_pq_rerank_recall_on_clustered_data(spark, clustered_v):
    """ADC shortlist + exact re-rank recovers brute-force quality: PQ
    codes collapse within-cluster neighbors (pure ADC measures ~0.6
    recall@5 here), the exact re-rank of the top-50 shortlist must reach
    >= 0.9."""
    from data_ingestion_system_spark.similarity.pq import (
        pq_rerank_topk,
        pq_topk,
        train_codebooks,
    )

    emb = clustered_v.select("vec_id", F.col("ev").alias("embedding"))
    brute = cosine_topk(
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
        TOP_K,
    )
    truth = {(r.query_id, r.cand_id) for r in brute.collect()}
    codes = train_codebooks(clustered_v)
    adc = {(r.query_id, r.cand_id) for r in pq_topk(clustered_v, codes).collect()}
    rerank = {
        (r.query_id, r.cand_id) for r in pq_rerank_topk(clustered_v, codes).collect()
    }
    adc_recall = len(truth & adc) / len(truth)
    rr_recall = len(truth & rerank) / len(truth)
    assert adc_recall >= 0.4, f"pure ADC recall {adc_recall} collapsed"
    assert rr_recall >= 0.9, f"reranked recall {rr_recall} < 0.9"
    assert rr_recall >= adc_recall


def test_ivfpq_recall_on_clustered_data(spark, clustered_v):
    """The IVF-PQ composite on clustered data: coarse pruning (2/16
    cells) stacked on 4-byte PQ codes must still find most of the true
    top-5 — the gate is looser than pure IVF (0.9) because PQ adds its
    own quantization loss on top of cell pruning."""
    from data_ingestion_system_spark.similarity.pq import ivfpq_topk, train_codebooks

    emb = clustered_v.select("vec_id", F.col("ev").alias("embedding"))
    brute = cosine_topk(
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
        TOP_K,
    )
    truth = {(r.query_id, r.cand_id) for r in brute.collect()}
    centroids = train_centroids(clustered_v)
    codes = train_codebooks(clustered_v)
    got = {
        (r.query_id, r.cand_id)
        for r in ivfpq_topk(clustered_v, centroids, codes, nprobe=2).collect()
    }
    rec = len(truth & got) / len(truth)
    assert rec >= 0.5, f"ivfpq recall@5 {rec} < 0.5 on clustered data"


def test_training_beats_untrained_seed_on_corpus(spark):
    # pinned to sf0.1: at sf0.01 the corpus is 200 vectors (12 per cell)
    # and quantizer quality on isotropic data is pure noise; at sf0.1
    # (2000 vectors) training reproducibly doubles recall (0.4 vs 0.2)
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    v = emb.select("vec_id", _as_double("embedding").alias("ev")).cache()
    untrained = v.filter(
        (F.col("vec_id") >= CENTROID_BASE) & (F.col("vec_id") < CENTROID_BASE + N_CELLS)
    ).select((F.col("vec_id") - CENTROID_BASE).alias("cell_id"), F.col("ev").alias("cv"))
    trained = train_centroids(v)
    r_untrained = _recall(spark, v, untrained, nprobe=2)
    r_trained = _recall(spark, v, trained, nprobe=2)
    v.unpersist()
    assert r_trained >= r_untrained, (r_trained, r_untrained)
    assert r_trained > 0


def test_mmr_breaks_up_near_duplicate_results(spark):
    """Pool with a near-duplicate clique: 4 near-copies of the best
    direction outrank 4 genuinely distinct directions on relevance, so
    plain top-5 returns the clique; MMR must keep rank 1 (pure
    relevance) but swap clique copies for the distinct directions,
    strictly lowering mean pairwise similarity of the selected set."""
    import numpy as np

    from data_ingestion_system_spark.similarity.ann import cosine_topk
    from data_ingestion_system_spark.similarity.mmr import mmr_topk

    rng = np.random.default_rng(11)
    d = 64
    q = rng.normal(size=d); q /= np.linalg.norm(q)

    def unit(v):
        return v / np.linalg.norm(v)

    def with_rel(target_cos, seed_vec):
        """Unit vector at the given cosine to q, perturbed along seed."""
        orth = unit(seed_vec - (seed_vec @ q) * q)
        return unit(target_cos * q + np.sqrt(1 - target_cos**2) * orth)

    rows = [(0, [float(x) for x in q])]
    base = rng.normal(size=d)
    # vec_ids 10..13: a clique of near-copies, highest relevance (~0.90)
    for i in range(4):
        v = with_rel(0.90, base + 0.02 * rng.normal(size=d))
        rows.append((10 + i, [float(x) for x in v]))
    # vec_ids 20..23: distinct directions, slightly lower relevance (~0.85)
    for i in range(4):
        v = with_rel(0.85, rng.normal(size=d))
        rows.append((20 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()
    queries = emb.filter(F.col("vec_id") == 0)
    cands = emb.filter(F.col("vec_id") > 0)
    mmr = mmr_topk(queries, cands, k=5, pool_k=8).collect()
    plain = cosine_topk(queries, cands, 5).collect()

    vecs = {r["vec_id"]: unit(np.array(r["embedding"], dtype=float)) for r in emb.collect()}

    def mean_pairwise(ids):
        vs = [vecs[i] for i in ids]
        sims = [float(vs[i] @ vs[j]) for i in range(len(vs)) for j in range(i + 1, len(vs))]
        return sum(sims) / len(sims)

    m_ids = [r["cand_id"] for r in mmr]
    p_ids = [r["cand_id"] for r in plain]
    assert len(m_ids) == 5
    # plain top-5 is dominated by the clique; MMR keeps the relevance
    # argmax at rank 1 but diversifies the rest
    m1 = next(r["cand_id"] for r in mmr if r["rank"] == 1)
    p1 = next(r["cand_id"] for r in plain if r["rank"] == 1)
    assert m1 == p1
    assert sum(1 for i in p_ids if i < 20) == 4, "plain top-5 should take the clique"
    assert sum(1 for i in m_ids if i >= 20) >= 3, "MMR should pull in distinct directions"
    assert mean_pairwise(m_ids) < mean_pairwise(p_ids)
