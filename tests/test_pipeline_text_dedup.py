"""Text-analysis and deduplication pipeline tests (documents table + spiked
near-duplicates with known ground truth)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hllspark.pipeline import dedup, text


@pytest.fixture(scope="module")
def docs(spark, sf01_dir):
    return spark.read.parquet(f"{sf01_dir}/documents.parquet").cache()


# ------------------------------------------------------------------ text


def test_token_count_matches_python(spark, docs):
    rows = docs.select("text", text.token_count("text").alias("tc")).collect()
    for r in rows[:100]:
        assert r["tc"] == len(r["text"].split())


def test_quality_features(spark, docs):
    q = text.quality_features(docs).select("q_chars", "q_tokens", "q_score", "q_stopword_ratio").collect()
    assert all(0.0 <= r["q_score"] <= 1.0 for r in q)
    assert all(r["q_chars"] > 0 and r["q_tokens"] > 0 for r in q)


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello, world! x2",), ("",)], "t string")
    got = [r[0] for r in df.select(text.bpe_ish_token_count("t")).collect()]
    # hello | , | world | ! | x | 2  → 6 pieces; empty → 0
    assert got == [6, 0]


def test_lang_id_on_real_samples(spark):
    samples = [
        (1, "The weather is nice today and the children are playing in the park.", "en"),
        (2, "El tiempo es agradable hoy y los niños juegan en el parque.", "es"),
        (3, "Das Wetter ist heute schön und die Kinder spielen im Park.", "de"),
        (4, "Le temps est agréable aujourd'hui et les enfants jouent dans le parc.", "fr"),
        (5, "Погода сегодня хорошая и дети играют в парке.", "ru"),
        (6, "今天天气很好孩子们在公园里玩耍非常开心。", "zh"),
        (7, "今日は天気がよくて子供たちは公園で遊んでいます。", "ja"),
    ]
    df = spark.createDataFrame(samples, "id int, t string, expected string")
    got = df.select("expected", text.lang_id(F.col("t")).alias("pred")).collect()
    acc = sum(1 for r in got if r["pred"] == r["expected"]) / len(got)
    assert acc == 1.0, [(r["expected"], r["pred"]) for r in got]


def test_lang_id_vectorized_matches_scalar_reference():
    """The batch-vectorized lang_id (one lexsort + searchsorted membership)
    must reproduce the scalar trigram-Jaccard algorithm exactly, including
    NULL/blank handling, prior ordering, dict-order tie-breaks, the
    slice-before-lower quirk, and the 'unknown' fallback."""
    import random
    import string

    from hllspark.pipeline.text import _PROFILES, _trigrams, lang_id

    def classify(s):
        if s is None or not s.strip():
            return None
        cj = sum(1 for ch in s[:200] if "一" <= ch <= "鿿")
        hira = sum(1 for ch in s[:200] if "぀" <= ch <= "ヿ")
        cyr = sum(1 for ch in s[:200] if "Ѐ" <= ch <= "ӿ")
        n = min(len(s), 200)
        if hira > 0.05 * n:
            return "ja"
        if cj > 0.3 * n:
            return "zh"
        if cyr > 0.3 * n:
            return "ru"
        grams = _trigrams(s[:1000])
        best, best_score = None, -1.0
        for lang, prof in _PROFILES.items():
            inter = len(grams & prof)
            if inter == 0:
                continue
            score = inter / len(grams | prof)
            if score > best_score:
                best, best_score = lang, score
        return best or "unknown"

    random.seed(3)
    samples = [
        None, "", "   ", "\t\n", "x", "ab",
        "the cat sat on the mat with the dog every day",
        "быстрая собака бежит по лесу каждый день на работу",
        "素早い狐は毎日犬を飛び越えます",
        "敏捷的狐狸跳过了懒惰的狗每天都这样",
        "zzzz qqqq xxxx 12345 @@@@",
        "İstanbul İİİİ " * 50,  # lower() changes the length → slice-before-lower matters
        "mixed 敏捷的棕色 text with some 中文 chars",
    ]
    alphabet = string.ascii_lowercase + " áéíóúüßабв一二"
    samples += ["".join(random.choices(alphabet, k=random.randint(1, 300))) for _ in range(150)]
    ser = pd.Series(samples, dtype=object)
    got = lang_id.func(ser)
    want = [classify(s) for s in samples]
    assert list(got) == want


def test_exact_fingerprint_normalization(spark):
    df = spark.createDataFrame([(1, "Hello   World"), (2, "hello world"), (3, "other")], "id int, t string")
    fps = [r[0] for r in df.select(text.exact_fingerprint("t")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_rolling_fingerprints_deterministic():
    a = text.rolling_fingerprints("the quick brown fox jumps over the lazy dog")
    b = text.rolling_fingerprints("the quick brown fox jumps over the lazy dog")
    c = text.rolling_fingerprints("a completely different document body here")
    assert a == b != c and len(a) <= 4


# ------------------------------------------------------------------ dedup


@pytest.fixture(scope="module")
def spiked(spark, docs):
    """documents + 40 near-duplicates (one word appended) + 20 exact dups."""
    near = (
        docs.orderBy("doc_id")
        .limit(40)
        .withColumn("doc_id", F.col("doc_id") + 100_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    exact = docs.orderBy("doc_id").limit(20).withColumn("doc_id", F.col("doc_id") + 200_000)
    return docs.unionByName(near).unionByName(exact).cache()


def test_exact_dedup(spark, spiked, docs):
    n_docs = docs.count()
    kept = dedup.exact_dedup(spiked, "text", "doc_id")
    # 20 exact dups removed; 40 near-dups kept (different text)
    assert kept.count() == n_docs + 40
    # keeps the SMALLEST id of each dup group
    assert kept.filter(F.col("doc_id") >= 200_000).count() == 0


def _exact_jaccard(ta: str, tb: str, n: int = 12) -> float:
    ga = {ta[i : i + n] for i in range(len(ta) - n + 1)}
    gb = {tb[i : i + n] for i in range(len(tb) - n + 1)}
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter) if inter else 0.0


def test_minhash_lsh_finds_spiked_near_dups(spark, spiked):
    pairs = dedup.verified_pairs(spiked, "doc_id", "text", k=128, bands=32, threshold=0.6)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # every spiked near-dup pair (i, i+100000) must be found
    expected = {(i, i + 100_000) for i in range(40)}
    found = expected & got
    assert len(found) >= 38, f"recall {len(found)}/40"  # ≥95% recall
    # exact dups are trivially found too
    assert all((i, i + 200_000) in got for i in range(20))
    # precision: every reported ORIGINAL-doc pair must be a true near-dup
    # (the documents fixture deliberately contains ~25 built-in J≥0.92 pairs)
    texts = {r["doc_id"]: r["text"] for r in spiked.filter(F.col("doc_id") < 100_000).collect()}
    for a, b in got:
        if a < 100_000 and b < 100_000:
            assert _exact_jaccard(texts[a], texts[b]) >= 0.5, (a, b)


def test_dedup_near_removes_components(spark, spiked, docs):
    kept = dedup.dedup_near(spiked, "doc_id", "text", threshold=0.6, k=128, bands=32)
    # all 20 exact dups and ≥38/40 spiked near dups removed; the ~25
    # built-in near-dup pairs in documents also collapse (one doc per pair)
    n_orig = docs.count()
    kept_orig = kept.filter(F.col("doc_id") < 100_000).count()
    assert n_orig - 30 <= kept_orig <= n_orig
    assert kept.filter(F.col("doc_id") >= 200_000).count() == 0  # exact dups gone
    assert kept.filter((F.col("doc_id") >= 100_000) & (F.col("doc_id") < 200_000)).count() <= 2


def test_simhash_near_pairs(spark, spiked):
    sim = dedup.simhash_signatures(spiked, "doc_id", "text")
    pairs = dedup.simhash_near_pairs(sim, "doc_id", max_hamming=3)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # exact dups have hamming 0
    assert all((i, i + 200_000) in got for i in range(20))
    # near dups: simhash@hamming≤3 is intentionally stricter than
    # minhash@J≥0.6 — short docs move >3 bits when 5 chars are appended,
    # so expect partial recall here (minhash is the high-recall detector)
    near_found = sum(1 for i in range(40) if (i, i + 100_000) in got)
    assert near_found >= 20, near_found
    # original-pair reports must be true near-dups (built-in J≥0.92 pairs)
    texts = {r["doc_id"]: r["text"] for r in spiked.filter(F.col("doc_id") < 100_000).collect()}
    for a, b in got:
        if a < 100_000 and b < 100_000:
            assert _exact_jaccard(texts[a], texts[b]) >= 0.5, (a, b)


def test_exhaustive_mode_complete_pair_set(spark):
    """mode="exhaustive" must enumerate the COMPLETE n·(n−1)/2 pair set of a
    5,000-member oversized bucket (the round-2 salt-split trade-off, now with
    a bounded middle path), while the budget guard falls back to connected."""
    n = 5000
    bucket = spark.createDataFrame(
        [(0, 0, list(range(n)))], "band int, bh long, ids array<bigint>"
    )
    full = dedup._split_oversized(bucket, ["band", "bh"], max_bucket=100, mode="exhaustive")
    assert full.count() == n * (n - 1) // 2
    # spot-check cross-sub-bucket membership: a handful of specific pairs
    some = {(r["a"], r["b"]) for r in full.filter(F.col("a").isin(0, 1, 4998)).collect()}
    assert (0, 4999) in some and (1, 2) in some and (4998, 4999) in some

    # budget guard: bucket exceeding exhaustive_budget → connected treatment
    # (within-sub-bucket pairs + chain edges ≪ complete set, still connected)
    capped = dedup._split_oversized(
        bucket, ["band", "bh"], max_bucket=100, mode="exhaustive", exhaustive_budget=10_000
    )
    n_capped = capped.count()
    assert n_capped < n * (n - 1) // 2 / 10
    # connectivity preserved under the fallback
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in capped.collect():
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[ra] = rb
    assert len({find(i) for i in range(n)}) == 1

    with pytest.raises(ValueError):
        dedup._split_oversized(bucket, ["band", "bh"], max_bucket=100, mode="nope")


def test_simhash_exhaustive_mode(spark):
    """SimHash side of the exhaustive middle path: an identical-simhash
    cluster above max_bucket yields its complete pair set."""
    n = 300
    rows = [(i, 12345) for i in range(n)] + [(10_000 + i, -(1 << 40) - i * 255) for i in range(5)]
    sim = spark.createDataFrame(rows, "doc_id long, simhash long")
    pairs = dedup.simhash_near_pairs(sim, "doc_id", max_hamming=3, max_bucket=50, mode="exhaustive")
    in_cluster = pairs.filter((F.col("a") < 10_000) & (F.col("b") < 10_000))
    assert in_cluster.count() == n * (n - 1) // 2


def test_mega_cluster_split_keeps_connectivity(spark):
    """Oversized LSH/SimHash buckets (crawl boilerplate mega-clusters) are
    salt-split, NOT dropped: a 500-member exact-duplicate cluster must stay
    one connected component at max_bucket=50, and dedup keeps exactly one."""
    boiler = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [(i, boiler) for i in range(500)] + [
        (1000 + i, f"unique document number {i} speaking about topic {i * 17} " * 5) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # the split path is exercised: stats show oversized buckets
    sig = dedup.minhash_signatures(df, "doc_id", "text", k=128)
    stats = dedup.lsh_bucket_stats(sig, "doc_id", bands=16, max_bucket=50).first()
    assert stats["n_oversized_split"] >= 1 and stats["max_bucket_size"] >= 500

    # connectivity through chains: union-find over the emitted pairs
    pairs = dedup.verified_pairs(df, "doc_id", "text", bands=16, threshold=0.9, max_bucket=50)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    got = [(r["a"], r["b"]) for r in pairs.collect()]
    for a, b in got:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    cluster_roots = {find(i) for i in range(500)}
    assert len(cluster_roots) == 1, f"cluster fragmented into {len(cluster_roots)} components"

    kept = dedup.dedup_near(df, "doc_id", "text", threshold=0.9, max_bucket=50)
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in kept_ids and len(kept_ids & set(range(500))) == 1
    assert all(1000 + i in kept_ids for i in range(20))

    # SimHash side: identical docs share identical simhashes (hot buckets)
    sim = dedup.simhash_signatures(df, "doc_id", "text")
    spairs = dedup.simhash_near_pairs(sim, "doc_id", max_hamming=3, max_bucket=50)
    parent.clear()
    for a, b in [(r["a"], r["b"]) for r in spairs.collect()]:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    assert len({find(i) for i in range(500)}) == 1


def test_fingerprint_documents_matches_scalar(spark):
    """The distributed winnowing operator is byte-identical to the scalar
    reference implementation, including short-doc and empty edge cases."""
    import random

    from hllspark.pipeline.text import fingerprint_documents, rolling_fingerprints

    rng = random.Random(11)
    texts = [
        "",
        "short",
        "exactly8",
        "a bit longer than the window size",
        "unicode: héllo wörld — 中文テキスト and more bytes",
    ] + ["".join(rng.choice("abcdefg hij") for _ in range(rng.randint(0, 200))) for _ in range(40)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: list(r["fps"]) for r in fingerprint_documents(df).collect()}
    for i, t in enumerate(texts):
        expected = [v - 2**64 if v >= 2**63 else v for v in rolling_fingerprints(t)]  # int64 view
        assert got[i] == expected, (i, t[:30])


def test_extract_text_byte_identical(spark, pages_small_dir):
    """input_hint invariant: extract_text(html) == text byte-for-byte on
    every row of the Common-Crawl-style fixture."""
    from pyspark.sql import functions as F

    from hllspark.pipeline.text import extract_text

    pages = spark.read.parquet(pages_small_dir)
    n = pages.count()
    match = pages.select(
        F.sum((extract_text("html") == F.col("text")).cast("long")).alias("m")
    ).first()["m"]
    assert match == n and n > 0


def test_verified_pairs_lazy_opt_out(spark, sf01_dir):
    """eager=False keeps verified_pairs fully lazy (composable into larger
    plans) and must produce the identical pair set."""
    from hllspark.pipeline import dedup

    df = spark.read.parquet(f"{sf01_dir}/documents.parquet").limit(400)
    eager = {(r["a"], r["b"]) for r in dedup.verified_pairs(df, "doc_id", "text", threshold=0.8).collect()}
    lazy_df = dedup.verified_pairs(df, "doc_id", "text", threshold=0.8, eager=False)
    assert not lazy_df.isStreaming  # plain lazy DataFrame, no action ran yet
    assert {(r["a"], r["b"]) for r in lazy_df.collect()} == eager


def test_jaccard_pairs_exact_verification(spark, spiked):
    """Round-5: jaccard_pairs verifies candidates with the EXACT char-n-gram
    set Jaccard — every reported value must equal a pure-python set
    computation over the same utf-8 bytes, and the spiked dups are found
    with their true Jaccard (exact dups at exactly 1.0)."""
    texts = {r["doc_id"]: r["text"] for r in spiked.collect()}

    def ref(a, b, n=12):
        ta, tb = texts[a].encode(), texts[b].encode()
        ga = {ta[i : i + n] for i in range(len(ta) - n + 1)}
        gb = {tb[i : i + n] for i in range(len(tb) - n + 1)}
        u = len(ga | gb)
        return len(ga & gb) / u if u else 0.0

    rows = dedup.jaccard_pairs(spiked, threshold=0.0, ngram=12, k=128, bands=32).collect()
    assert rows
    for r in rows:
        assert r["jaccard"] == pytest.approx(ref(r["a"], r["b"]), abs=1e-12), (r["a"], r["b"])

    hi = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(spiked, threshold=0.8, ngram=12, k=128, bands=32).collect()
    }
    expected = {(i, i + 100_000) for i in range(40)}
    assert len(expected & set(hi)) >= 38  # ≥95% recall on the spiked near-dups
    for i in range(20):
        assert hi[(i, i + 200_000)] == 1.0  # exact dups: true Jaccard exactly 1
