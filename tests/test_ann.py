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


def test_cosine_pairs_lsh_mega_bucket_guard(spark):
    """Round-5 fix: a mega-bucket (every vector nearly identical → one LSH
    bucket) no longer self-joins quadratically.  connected mode keeps the
    planted cluster connected at bounded cost; exhaustive mode recovers the
    complete pair set within budget; bucket stats report the split."""
    rng = np.random.RandomState(7)
    center = rng.normal(size=DIM).astype(np.float32)
    n = 120
    vecs = center[None, :] + rng.normal(scale=0.01, size=(n, DIM)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # all n vectors share one bucket at h=4; max_bucket=20 forces the split
    stats = ann.cosine_lsh_bucket_stats(df, DIM, h=4, max_bucket=20).collect()[0]
    assert stats["max_bucket_size"] == n
    assert stats["n_oversized_split"] >= 1
    # multi-table stats cover EVERY table's buckets (review fix): the same
    # mega-cluster is oversized in each of the 3 tables
    mt = ann.cosine_lsh_bucket_stats(df, DIM, h=4, max_bucket=20, n_tables=3).collect()[0]
    assert mt["n_oversized_split"] >= 3
    assert mt["max_bucket_size"] == n

    # exhaustive mode: complete pair set — every pair is a near-dup here
    ex = ann.cosine_pairs_lsh(df, threshold=0.99, dim=DIM, h=4, max_bucket=20, mode="exhaustive")
    assert ex.count() == n * (n - 1) // 2

    # connected mode: bounded subset, but the cluster stays one component
    con = [(r["a"], r["b"]) for r in ann.cosine_pairs_lsh(df, threshold=0.99, dim=DIM, h=4, max_bucket=20).collect()]
    assert 0 < len(con) < n * (n - 1) // 2
    parent = list(range(2000))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in con:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n)}) == 1

    # exhaustive budget exceeded → falls back to connected treatment (subset)
    budget = ann.cosine_pairs_lsh(
        df, threshold=0.99, dim=DIM, h=4, max_bucket=20, mode="exhaustive", exhaustive_budget=100
    )
    assert budget.count() < n * (n - 1) // 2


def test_cosine_pairs_lsh_multi_table_recall(spark):
    """n_tables unions candidates from independent hyperplane sets: recall is
    monotone non-decreasing and strictly better on a seed where one table
    misses planted pairs."""
    rng = np.random.RandomState(11)
    base = rng.normal(size=(40, DIM)).astype(np.float32)
    near = base + rng.normal(scale=0.15, size=base.shape).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(40)] + [(1000 + i, near[i].tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planted = {(i, 1000 + i) for i in range(40)}
    one = {(r["a"], r["b"]) for r in ann.cosine_pairs_lsh(df, threshold=0.9, dim=DIM, h=10).collect()}
    four = {(r["a"], r["b"]) for r in ann.cosine_pairs_lsh(df, threshold=0.9, dim=DIM, h=10, n_tables=4).collect()}
    assert one <= four
    assert len(four & planted) > len(one & planted)
    assert len(four & planted) / len(planted) >= 0.9


def test_topk_driver_rows_independent_of_partitions(spark, emb, ground):
    """Round-5 fix: the Spark-side per-query fold bounds what the driver
    collects to ≤ k×Q rows regardless of partition count."""
    ids, m, mn = ground
    queries = m[:4]
    K, Q = 7, len(queries)
    for P in (3, 24):
        out: list = []
        got = ann.topk_cosine(emb.repartition(P), queries, k=K, _candidates_out=out)
        assert out[0].count() <= P * K * Q
        assert out[1].count() <= K * Q  # driver-collected rows: partition-independent
        for qi in range(Q):
            assert [i for i, _ in got[qi]] == exact_topk(mn, ids, m[qi], K)


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


def test_recommended_h_scales_with_n():
    """h must grow with N so mean bucket occupancy stays ≈ target."""
    assert ann.recommended_h(1000, 1000) == 1
    assert ann.recommended_h(2000, 1000) == 1
    assert ann.recommended_h(256_000, 1000) == 8
    assert ann.recommended_h(10**12, 1000) == 30
    # mean occupancy property: n / 2^h <= target (h rounds UP)
    for n in (10**4, 10**6, 10**9):
        h = ann.recommended_h(n, 500)
        assert n / (1 << h) <= 500
