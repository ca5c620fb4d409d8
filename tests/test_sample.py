"""Deterministic stratified sampling (pipeline.sample.stratified_sample):
hash-rank selection is a pure function of the key set — the fold and
window plans agree row-for-row, the result is invariant to partitioning,
the fold's candidate set is bounded by P×k per stratum, and a custom
SQL-replayable rank (md5) matches an independent pandas derivation."""

import hashlib

import pytest
from pyspark.sql import functions as F

from hllspark.pipeline.sample import stratified_sample


def _keyset(df, cols=("lang", "doc_id")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark, sf01_dir):
    return spark.read.parquet(f"{sf01_dir}/documents.parquet")


def test_fold_matches_window(docs):
    a = stratified_sample(docs, ["lang"], 7, ["doc_id"], seed=3, method="fold")
    b = stratified_sample(docs, ["lang"], 7, ["doc_id"], seed=3, method="window")
    assert _keyset(a) == _keyset(b)
    assert len(_keyset(a)) == 7 * docs.select("lang").distinct().count()
    # sampled rows carry the FULL original schema
    assert a.columns == docs.columns


def test_partitioning_invariance_and_k_cap(docs):
    base = _keyset(stratified_sample(docs, ["lang"], 5, ["doc_id"], seed=1))
    for parts in (1, 13):
        again = _keyset(stratified_sample(docs.repartition(parts), ["lang"], 5, ["doc_id"], seed=1))
        assert again == base, parts
    # k above the stratum size returns the whole stratum, no duplicates
    n = docs.count()
    all_rows = stratified_sample(docs, ["lang"], n + 10, ["doc_id"], seed=1)
    assert all_rows.count() == n


def test_global_sample_and_seed_sensitivity(docs):
    g1 = _keyset(stratified_sample(docs, [], 9, ["doc_id"], seed=0), cols=("doc_id",))
    g2 = _keyset(stratified_sample(docs, [], 9, ["doc_id"], seed=1), cols=("doc_id",))
    assert len(g1) == len(g2) == 9
    assert g1 != g2  # seed changes the draw


def test_candidate_bound(docs):
    """Each partition emits ≤ k rows per stratum regardless of batch size —
    pinned with tiny Arrow batches so the fold crosses many batches."""
    spark = docs.sparkSession
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        out = []
        d = docs.repartition(4)
        stratified_sample(d, ["lang"], 3, ["doc_id"], seed=2, _candidates_out=out).collect()
        cand = out[0]
        n_strata = docs.select("lang").distinct().count()
        assert cand.count() <= 4 * 3 * n_strata
        # and per (partition is gone after collect) stratum overall ≤ P×k
        per = cand.groupBy("lang").count().collect()
        assert all(r["count"] <= 4 * 3 for r in per)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_md5_rank_matches_independent_derivation(docs):
    """window method with a custom md5 rank — replayed independently in
    pure Python (hashlib) over the collected table."""
    seed = 7
    rank = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(seed))))
    got = _keyset(stratified_sample(docs, ["lang"], 4, ["doc_id"], rank=rank, method="window"))
    rows = [(r["lang"], r["doc_id"]) for r in docs.select("lang", "doc_id").collect()]
    expect = []
    by_lang = {}
    for lang, doc in rows:
        h = hashlib.md5(f"{doc}:{seed}".encode()).hexdigest()
        by_lang.setdefault(lang, []).append((h, doc))
    for lang, hs in by_lang.items():
        expect += [(lang, doc) for _, doc in sorted(hs)[:4]]
    assert got == sorted(expect)


def test_null_and_big_keys_lossless(spark):
    """NULL strata stay their own stratum; NULL and >2^53 keys survive the
    fold kernel losslessly (plain to_pandas would degrade a null-bearing
    int64 column to float64 and round big keys — the round-4 minhash
    landmine class)."""
    big = (1 << 62) + 12345
    rows = [("a", big), ("a", None), ("b", 7), (None, 8), (None, 9)]
    df = spark.createDataFrame(rows, "lang string, doc_id long").repartition(3)
    out = stratified_sample(df, ["lang"], 2, ["doc_id"], seed=0, method="fold")
    got = {(r["lang"], r["doc_id"]) for r in out.collect()}
    win = {(r["lang"], r["doc_id"]) for r in
           stratified_sample(df, ["lang"], 2, ["doc_id"], seed=0, method="window").collect()}
    assert got == win
    assert (None, 8) in got and (None, 9) in got
    assert ("a", big) in got  # k=2 takes the whole 'a' stratum, lossless


def test_validation(docs):
    with pytest.raises(ValueError, match="k must be positive"):
        stratified_sample(docs, ["lang"], 0, ["doc_id"])
    with pytest.raises(ValueError, match="lacks columns"):
        stratified_sample(docs, ["nope"], 1, ["doc_id"])
    with pytest.raises(ValueError, match="window-only"):
        stratified_sample(docs, ["lang"], 1, ["doc_id"], rank=F.lit(1), method="fold")
    with pytest.raises(ValueError, match="unknown method"):
        stratified_sample(docs, ["lang"], 1, ["doc_id"], method="sort")
