"""ANN tests: brute-force top-k vs numpy ground truth; LSH and IVF recall."""

import numpy as np
import pytest

from hllspark.pipeline import ann

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf01_dir):
    return spark.read.parquet(f"{sf01_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def ground(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float32)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m, mn


def exact_topk(mn, ids, q, k):
    qn = q / np.linalg.norm(q)
    sims = mn @ qn
    top = np.argsort(-sims)[:k]
    return [int(ids[i]) for i in top]


def test_brute_force_matches_numpy(spark, emb, ground):
    ids, m, mn = ground
    queries = m[:3]
    got = ann.topk_cosine(emb.repartition(6), queries, k=10)
    for qi in range(3):
        expected = exact_topk(mn, ids, m[qi], 10)
        assert [i for i, _ in got[qi]] == expected
        assert got[qi][0][0] == ids[qi] and got[qi][0][1] == pytest.approx(1.0, abs=1e-5)


def test_lsh_recall(spark, emb, ground):
    ids, m, mn = ground
    # 500 vectors → coarse code (2^4 buckets); at web scale h grows with N
    indexed = ann.lsh_index(emb, DIM, h=4).cache()
    queries = m[5:15]
    got = ann.topk_cosine_lsh(indexed, queries, DIM, k=10, h=4, probes=5)
    recalls = []
    for qi in range(len(queries)):
        expected = set(exact_topk(mn, ids, queries[qi], 10))
        found = {i for i, _ in got[qi]}
        recalls.append(len(expected & found) / 10)
    assert np.mean(recalls) >= 0.5, recalls  # multi-probe 1-bit, h=8
    # the query vector itself is always in its own bucket
    for qi in range(len(queries)):
        assert got[qi][0][0] == ids[5 + qi]


def test_ivf_recall_and_pruning(spark, emb, ground):
    ids, m, mn = ground
    cent = ann.train_ivf_centroids(emb, DIM, nlist=16)
    indexed = ann.ivf_index(emb, cent, DIM).cache()
    # partitions are real: every row assigned, lists cover all rows
    assert indexed.count() == len(ids)
    queries = m[20:30]
    got = ann.topk_cosine_ivf(indexed, cent, queries, DIM, k=10, nprobe=4)
    recalls = []
    for qi in range(len(queries)):
        expected = set(exact_topk(mn, ids, queries[qi], 10))
        found = {i for i, _ in got[qi]}
        recalls.append(len(expected & found) / 10)
    assert np.mean(recalls) >= 0.6, recalls
    for qi in range(len(queries)):
        assert got[qi][0][0] == ids[20 + qi]


def test_cosine_pairs_exact_and_lsh_recall(spark):
    """cosine_pairs (exact baseline) finds planted near-dup embeddings;
    cosine_pairs_lsh recovers ≥80% of them at h=6 scanning only same-bucket
    candidates."""
    rng = np.random.RandomState(3)
    base = rng.normal(size=(60, DIM)).astype(np.float32)
    # plant 60 near-dup partners: tiny perturbation → cosine ≈ 0.995
    near = base + rng.normal(scale=0.05, size=base.shape).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(60)] + [
        (1000 + i, near[i].tolist()) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {(r["a"], r["b"]) for r in ann.cosine_pairs(df, threshold=0.9).collect()}
    planted = {(i, 1000 + i) for i in range(60)}
    assert planted <= exact  # every planted pair found
    # random 64-dim gaussians almost never reach cosine 0.9
    assert len(exact - planted) <= 2

    lsh = {(r["a"], r["b"]) for r in ann.cosine_pairs_lsh(df, threshold=0.9, dim=DIM, h=6).collect()}
    assert lsh <= exact  # verification guarantees no false positives
    recall = len(lsh & planted) / len(planted)
    assert recall >= 0.8, recall


def test_brute_force_candidates_bounded_per_partition(spark, emb, ground):
    """Round-4 fix: the per-partition scan folds its running top-k across
    Arrow batches, so the driver merge sees ≤ P×k×Q candidate rows even when
    partitions span many small batches (forced here with a tiny Arrow batch
    size)."""
    ids, m, mn = ground
    queries = m[:4]
    P, K, Q = 6, 7, len(queries)
    prior = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")  # many batches/partition
    try:
        out: list = []
        got = ann.topk_cosine(emb.repartition(P), queries, k=K, _candidates_out=out)
        assert out[0].count() <= P * K * Q
        for qi in range(Q):
            assert [i for i, _ in got[qi]] == exact_topk(mn, ids, m[qi], K)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prior)
