"""Deduplication operators for web-scale training-data pipelines.

Spark-first split of work:
- candidate *generation* (the O(N²) hazard) is always bucketed: LSH band
  buckets (MinHash) or pigeonhole chunks (SimHash), expressed as ordinary
  groupBy/join so Catalyst/AQE handle skew and shuffle;
- per-document *signatures* are Arrow-vectorized numpy kernels (mapInArrow):
  char-n-gram rolling hashes + one-permutation MinHash (Li, Owen & Zhang
  2012) so signature cost is O(total bytes), not O(bytes × k);
- *verification* of candidate pairs stays JVM-side: signature agreement via
  zip_with/filter, SimHash hamming via bit_count(xor).

Exact dedup is plain Spark: fingerprint → row_number → filter (dropDuplicates
semantics but deterministic keep-smallest-id).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.hash import murmur64_u64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True) -> DataFrame:
    """Keep one row (smallest id) per exact (normalized) text. JVM-only."""
    from .text import exact_fingerprint

    fp = exact_fingerprint(text_col) if normalize else F.xxhash64(F.col(text_col))
    w = Window.partitionBy(fp).orderBy(F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# MinHash signatures (one-permutation hashing over char n-grams)
# ---------------------------------------------------------------------------


def _remix(z: np.ndarray) -> np.ndarray:
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _char_ngram_hashes(flat: np.ndarray, offsets: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial hash of every char n-gram; returns (hashes, doc_id
    per hash).  O(total bytes), fully vectorized."""
    lens = offsets[1:] - offsets[:-1]
    counts = np.maximum(lens - n + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    doc_of = np.repeat(np.arange(len(lens)), counts)
    # window start positions in flat
    first = np.repeat(offsets[:-1], counts)
    within = np.arange(total) - np.repeat(np.cumsum(np.concatenate([[0], counts[:-1]])), counts)
    starts = first + within
    base = np.uint64(1099511628211)
    h = np.zeros(total, dtype=np.uint64)
    for j in range(n):  # n small (8-16): n gathers over flat
        h = h * base + flat[starts + j].astype(np.uint64)
    return _remix(h), doc_of


def _oph_signature(h: np.ndarray, doc_of: np.ndarray, ndocs: int, k: int) -> np.ndarray:
    """One-permutation MinHash: k = 2^j buckets of the hash space, min per
    (doc, bucket); empty buckets filled by *rotation densification*
    (Shrivastava & Li 2014): copy the nearest non-empty bucket to the left,
    circularly.  Fills depend only on the doc's bucket contents, so identical
    sets densify identically and disjoint sets stay uncorrelated — a naive
    global-min fill would fabricate similarity between any two docs sharing
    their minimum shingle."""
    logk = int(np.log2(k))
    assert (1 << logk) == k, "k must be a power of two"
    sig = np.full(ndocs * k, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    if len(h):
        bucket = (h >> np.uint64(64 - logk)).astype(np.int64)
        np.minimum.at(sig, doc_of * k + bucket, h)
    sig = sig.reshape(ndocs, k)
    empty = sig == np.uint64(0xFFFFFFFFFFFFFFFF)
    if empty.any():
        colidx = np.arange(k, dtype=np.int64)
        idxmat = np.where(~empty, colidx[None, :], np.int64(-1))
        # circular forward fill: nearest non-empty column index at or left of j
        ff = np.maximum.accumulate(np.concatenate([idxmat, idxmat], axis=1), axis=1)[:, k:]
        rowi = np.arange(ndocs)[:, None]
        filled = sig[rowi, np.where(ff >= 0, ff, 0)]
        # remix with the slot index so a run of copies doesn't make adjacent
        # slots trivially identical across docs with different emptiness
        filled = _remix(filled ^ (np.uint64(0x9E3779B97F4A7C15) * (colidx[None, :].astype(np.uint64) + np.uint64(1))))
        sig = np.where(empty & (ff >= 0), filled, sig)
    return sig


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 128, ngram: int = 12
) -> DataFrame:
    """DataFrame[id, sig array<bigint>] — one MinHash signature per document."""

    def gen(batches) -> Iterator:
        import pyarrow as pa

        from ..core.hash import arrow_string_buffers

        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            texts = batch.column(batch.schema.get_field_index(text_col))
            flat, offsets = arrow_string_buffers(texts.fill_null(""))
            h, doc_of = _char_ngram_hashes(flat, offsets.astype(np.int64), ngram)
            sig = _oph_signature(h, doc_of, batch.num_rows, k).view(np.int64)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.FixedSizeListArray.from_arrays(pa.array(sig.ravel()), k).cast(pa.list_(pa.int64()))],
                names=[id_col, "sig"],
            )

    id_field = df.schema[id_col]
    return df.select(id_col, text_col).mapInArrow(
        gen, schema=f"{id_col} {id_field.dataType.simpleString()}, sig array<bigint>"
    )


# ---------------------------------------------------------------------------
# LSH banding → candidate pairs → signature verification
# ---------------------------------------------------------------------------


def _pairs_from_lists(buckets: DataFrame, list_col: str = "ids") -> DataFrame:
    """array<id> per bucket → ordered candidate pairs (a < b)."""
    return (
        buckets.select(F.explode(list_col).alias("a"), F.col(list_col))
        .select("a", F.explode(list_col).alias("b_"))
        .filter(F.col("a") < F.col("b_"))
        .select("a", F.col("b_").alias("b"))
    )


def _exhaustive_bucket_pairs(big: DataFrame, bucket_cols: list[str]) -> DataFrame:
    """COMPLETE pair set of each bucket via a per-bucket self-JOIN (not a
    collect_list explosion): total work is the unavoidable Σ n_b², but no
    task ever materializes a bucket's member array or its n² pair block in
    memory — the shuffle-join streams them, so memory stays bounded while
    the quadratic cost is spread across the cluster."""
    m = big.select(*bucket_cols, F.explode("ids").alias("a"))
    m2 = m.select(*bucket_cols, F.col("a").alias("b"))
    return m.join(m2, bucket_cols).filter(F.col("a") < F.col("b")).select("a", "b")


def _split_oversized(
    big: DataFrame,
    bucket_cols: list[str],
    max_bucket: int,
    id_expr="id",
    mode: str = "connected",
    exhaustive_budget: int = 50_000_000,
) -> DataFrame:
    """Oversized-bucket pair enumeration with two modes:

    ``mode="connected"`` (default): salt-split into ≤~max_bucket sub-buckets
    by a secondary hash of the member id, emitting

      - all pairs WITHIN each sub-bucket (bounded quadratic cost), and
      - a chain of pairs between consecutive sub-bucket representatives,

    so a mega-cluster (crawl boilerplate: every member shares the band hash)
    stays CONNECTED for connected-components dedup at O(n·max_bucket) cost
    instead of O(n²).  The pair *list* for an oversized bucket is then a
    connected subset, not the complete quadratic set — by design; use
    lsh_bucket_stats to monitor how many buckets were split.

    ``mode="exhaustive"``: the COMPLETE pair set, per-bucket, through a
    memory-bounded self-join — for "give me every pair" consumers — guarded
    by ``exhaustive_budget``: a bucket whose n·(n−1)/2 exceeds the budget
    falls back to connected treatment (at crawl scale one 10M-member
    boilerplate bucket is 5·10^13 pairs; no budget means no finish)."""
    if mode == "exhaustive":
        npairs = F.size("ids").cast("bigint") * (F.size("ids") - 1) / 2
        full = _exhaustive_bucket_pairs(big.filter(npairs <= exhaustive_budget), bucket_cols)
        rest = _split_oversized(
            big.filter(npairs > exhaustive_budget), bucket_cols, max_bucket, id_expr, mode="connected"
        )
        return full.unionByName(rest)
    if mode != "connected":
        raise ValueError(f"unknown oversized-bucket mode {mode!r}")
    members = big.select(
        *bucket_cols,
        F.ceil(F.size("ids") / max_bucket).cast("int").alias("__nsb"),
        F.explode("ids").alias("id"),
    ).withColumn("__sb", F.pmod(F.xxhash64(id_expr), F.col("__nsb")))
    sub = members.groupBy(*bucket_cols, "__sb").agg(F.collect_list("id").alias("ids"))
    within = _pairs_from_lists(sub)
    reps = sub.groupBy(*bucket_cols).agg(F.sort_array(F.collect_list(F.array_min("ids"))).alias("reps"))
    chain = (
        reps.filter(F.size("reps") > 1)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("reps", 1, F.size("reps") - 1),
                    F.slice("reps", 2, F.size("reps") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    return within.unionByName(chain)


def _bucketed_pairs(
    buckets: DataFrame,
    bucket_cols: list[str],
    max_bucket: int,
    mode: str = "connected",
    exhaustive_budget: int = 50_000_000,
) -> DataFrame:
    """Candidate pairs from bucket member-lists (columns: *bucket_cols,
    ``ids`` array): direct pair explosion for small buckets, the
    salt-split/budget-guarded machinery for oversized ones.  The ONE place
    the oversized-bucket semantics live — shared by lsh_candidate_pairs and
    ann.cosine_pairs_lsh so the two paths cannot silently diverge."""
    small = _pairs_from_lists(buckets.filter(F.size("ids") <= max_bucket))
    big = _split_oversized(
        buckets.filter(F.size("ids") > max_bucket), bucket_cols, max_bucket,
        mode=mode, exhaustive_budget=exhaustive_budget,
    )
    return small.unionByName(big)


def _bucket_size_stats(sizes: DataFrame, max_bucket: int) -> DataFrame:
    """One-row bucket-size metrics from a (..., n) per-bucket count table —
    shared by lsh_bucket_stats and ann.cosine_lsh_bucket_stats."""
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("n_candidate_buckets"),
        F.sum(F.when(F.col("n") > max_bucket, 1).otherwise(0)).alias("n_oversized_split"),
        F.max("n").alias("max_bucket_size"),
    )


def _band_explode(sig_df: DataFrame, id_col: str, bands: int) -> DataFrame:
    sig = F.col("sig")
    # r (rows per band) is computed from the actual array size at runtime
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.xxhash64(F.slice(sig, j * (F.size(sig) / bands).cast("int") + 1, (F.size(sig) / bands).cast("int"))).alias(
                "bh"
            ),
        )
        for j in range(bands)
    ]
    return sig_df.select(id_col, F.explode(F.array(*band_structs)).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    max_bucket: int = 1000,
    mode: str = "connected",
    exhaustive_budget: int = 50_000_000,
) -> DataFrame:
    """Band the signature, bucket-join: pairs sharing any band bucket.

    With k slots and b bands (r = k/b rows per band), a pair with signature
    agreement s collides with probability 1-(1-s^r)^b — the standard LSH
    S-curve.  Entirely JVM-side (xxhash64 over array slices, groupBy,
    size-bounded pair explosion).

    Buckets above ``max_bucket`` members (boilerplate mega-clusters at crawl
    scale) are NOT dropped: ``mode="connected"`` (default) salt-splits them
    into bounded sub-buckets with chain edges preserving connectivity (right
    for dedup-by-components); ``mode="exhaustive"`` enumerates their complete
    pair set through a memory-bounded per-bucket join, up to
    ``exhaustive_budget`` pairs per bucket (see _split_oversized)."""
    exploded = _band_explode(sig_df, id_col, bands)
    buckets = (
        exploded.groupBy("band", "bh")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return _bucketed_pairs(
        buckets, ["band", "bh"], max_bucket, mode=mode, exhaustive_budget=exhaustive_budget
    ).distinct()


def lsh_bucket_stats(sig_df: DataFrame, id_col: str = "doc_id", bands: int = 16, max_bucket: int = 1000) -> DataFrame:
    """Monitoring companion to lsh_candidate_pairs: one row of bucket-size
    metrics, including how many buckets exceeded max_bucket (those are
    salt-split, so their pair lists are connected subsets, not exhaustive)."""
    sizes = _band_explode(sig_df, id_col, bands).groupBy("band", "bh").agg(F.count("*").alias("n"))
    return _bucket_size_stats(sizes, max_bucket)


def verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 128,
    ngram: int = 12,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    mode: str = "connected",
    exhaustive_budget: int = 50_000_000,
    eager: bool = True,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with estimated Jaccard ≥ threshold.

    Returns DataFrame[a, b, est_jaccard].  Verification = fraction of equal
    signature slots, computed JVM-side with zip_with.

    NOTE: by default calling this EXECUTES the signature job eagerly
    (localCheckpoint(eager=True) below) even before the returned DataFrame's
    first action — the signatures feed three subtrees of the final plan, so
    deferring materialization would re-run the text scan three times.
    ``eager=False`` keeps the call fully lazy for composition into a larger
    plan (the signature subtree then runs up to three times per action —
    right when the caller composes/optimizes further or never executes)."""
    # docs shorter than one shingle have no signature content — an all-empty
    # pair would otherwise report J=1.0 (e.g. NULL text vs empty string)
    df = df.filter(F.length(F.coalesce(F.col(text_col), F.lit(""))) >= ngram)
    # localCheckpoint, not cache(): signatures feed three subtrees of the
    # final plan (bucketing + both verify sides) so one materialization is
    # right — but cache() is plan-keyed (a later identical call would skip
    # the scan, poisoning timings) and never unpersisted.  Checkpoint blocks
    # are object-keyed and GC-cleaned.
    sig_df = minhash_signatures(df, id_col, text_col, k=k, ngram=ngram)
    if eager:
        sig_df = sig_df.localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(
        sig_df, id_col, bands=bands, max_bucket=max_bucket, mode=mode, exhaustive_budget=exhaustive_budget
    )
    sa = sig_df.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"))
    sb = sig_df.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"))
    joined = cand.join(sa, "a").join(sb, "b")
    agree = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
    est = (agree / F.size("sig_a")).alias("est_jaccard")
    return joined.select("a", "b", est).filter(F.col("est_jaccard") >= threshold)


def _ngram_hash_sets(texts, n: int) -> list[np.ndarray]:
    """Per-row SORTED-UNIQUE char-n-gram hash sets from a pyarrow string
    array (one _char_ngram_hashes pass + one lexsort for the whole batch;
    only the per-row dedupe slice-loop is Python)."""
    from ..core.hash import arrow_string_buffers

    flat, offsets = arrow_string_buffers(texts.fill_null(""))
    nrows = len(texts)
    h, doc_of = _char_ngram_hashes(flat, offsets.astype(np.int64), n)
    if not len(h):
        return [np.empty(0, np.uint64)] * nrows
    order = np.lexsort((h, doc_of))
    hs, ds = h[order], doc_of[order]
    starts = np.searchsorted(ds, np.arange(nrows))
    ends = np.searchsorted(ds, np.arange(nrows), side="right")
    out = []
    for i in range(nrows):
        seg = hs[starts[i] : ends[i]]  # sorted within the row already
        if len(seg):
            seg = seg[np.concatenate(([True], seg[1:] != seg[:-1]))]
        out.append(seg)
    return out


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
    k: int = 128,
    sig_ngram: int | None = None,
    bands: int = 16,
    max_bucket: int = 1000,
    mode: str = "connected",
    exhaustive_budget: int = 50_000_000,
    eager: bool = True,
) -> DataFrame:
    """EXACT char-n-gram Jaccard near-duplicate pairs.

    The third dedup verification mode next to verified_pairs (MinHash
    signature ESTIMATE) and simhash_near_pairs (hamming): candidates come
    from the same bucketed MinHash-LSH machinery (generation never goes
    quadratic — oversized buckets salt-split/budget-guarded), but each
    candidate pair is verified with the exact Jaccard of its char-n-gram
    hash SETS, computed in one Arrow-batched kernel over the joined texts.
    Returns DataFrame[a, b, jaccard (double)].

    Cost note: verification re-reads the two texts of every candidate pair
    (O(candidate pairs × doc bytes)) where verified_pairs compares k-slot
    signatures — use this when the downstream decision needs the true
    Jaccard (e.g. audit/threshold calibration), verified_pairs for bulk
    dedup.  Recall is the LSH S-curve at (k, bands), as for verified_pairs.

    ``sig_ngram``: shingle size for the candidate-generation signatures when
    it should differ from the verified shingle size (default: same)."""
    df = df.filter(F.length(F.coalesce(F.col(text_col), F.lit(""))) >= ngram)
    sig_df = minhash_signatures(df, id_col, text_col, k=k, ngram=sig_ngram or ngram)
    if eager:
        sig_df = sig_df.localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(
        sig_df, id_col, bands=bands, max_bucket=max_bucket, mode=mode,
        exhaustive_budget=exhaustive_budget,
    )
    ta = df.select(F.col(id_col).alias("a"), F.col(text_col).alias("__ta"))
    tb = df.select(F.col(id_col).alias("b"), F.col(text_col).alias("__tb"))
    joined = cand.join(ta, "a").join(tb, "b")

    def verify(batches):
        import pyarrow as pa

        for batch in batches:
            names = batch.schema.names
            sa = _ngram_hash_sets(batch.column(names.index("__ta")), ngram)
            sb = _ngram_hash_sets(batch.column(names.index("__tb")), ngram)
            jac = np.empty(batch.num_rows, dtype=np.float64)
            for i in range(batch.num_rows):
                inter = np.intersect1d(sa[i], sb[i], assume_unique=True).size
                union = sa[i].size + sb[i].size - inter
                jac[i] = inter / union if union else 0.0
            yield pa.RecordBatch.from_arrays(
                [batch.column(names.index("a")), batch.column(names.index("b")), pa.array(jac)],
                names=["a", "b", "jaccard"],
            )

    idt = df.schema[id_col].dataType.simpleString()
    out = joined.mapInArrow(verify, schema=f"a {idt}, b {idt}, jaccard double")
    return out.filter(F.col("jaccard") >= threshold)


def dedup_near(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_iter: int = 10,
    **kw,
) -> DataFrame:
    """Remove near-duplicates: connected components over verified pairs via
    iterative min-label propagation (each round one join; converges in
    O(log component-diameter) rounds), keep the component's min id.

    NOTE: eager — the candidate/verify/propagation pipeline runs AT CALL
    TIME (per-round localCheckpoint bounds the iterative lineage); only the
    final anti-join against ``df`` stays lazy in the returned DataFrame."""
    pairs = verified_pairs(df, id_col, text_col, threshold=threshold, **kw).select("a", "b")
    # label[x] = min id reachable; init label = min(neighbor ids, self).
    # Symmetrize via explode (each pair read ONCE — a self-union would run
    # the candidate+verify plan twice), then one localCheckpoint: edges is
    # what every propagation round re-reads, and checkpointing is
    # object-keyed (no cross-query plan reuse, GC-cleaned — cache() was
    # neither).  Checkpointing pairs first and column-swap-unioning it also
    # trips a Spark optimizer attribute-resolution bug.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .localCheckpoint(eager=True)
    )
    # localCheckpoint per round: the iterative joins would otherwise build an
    # O(2^rounds) lineage that at scale stalls planning and recovery; the
    # label table (only docs appearing in a pair) is small relative to df
    labels = edges.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("lbl")).localCheckpoint()
    for _ in range(max_iter):
        prop = (
            edges.join(labels.withColumnRenamed("a", "b").withColumnRenamed("lbl", "nl"), "b")
            .groupBy("a")
            .agg(F.min("nl").alias("nl"))
        )
        new_labels = (
            labels.join(prop, "a", "left")
            .select("a", F.least("lbl", F.coalesce("nl", "lbl")).alias("lbl"))
            .localCheckpoint()  # eager: also materializes for the convergence check
        )
        # existence check, not count(): isEmpty() short-circuits at the first
        # changed label (take(1) over the two materialized label tables)
        # instead of materializing the full changed-set size every round
        converged = (
            new_labels.alias("n").join(labels.alias("o"), "a").filter(F.col("n.lbl") != F.col("o.lbl")).isEmpty()
        )
        labels = new_labels
        if converged:
            break
    drop = labels.filter(F.col("a") != F.col("lbl")).select(F.col("a").alias(id_col))
    return df.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram: int = 8
) -> DataFrame:
    """DataFrame[id, simhash bigint]: 64-bit SimHash (Charikar 2002) over
    char-n-gram hashes — vectorized bit-vote accumulation."""

    def gen(batches) -> Iterator:
        import pyarrow as pa

        from ..core.hash import arrow_string_buffers

        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            texts = batch.column(batch.schema.get_field_index(text_col))
            flat, offsets = arrow_string_buffers(texts.fill_null(""))
            h, doc_of = _char_ngram_hashes(flat, offsets.astype(np.int64), ngram)
            votes = np.zeros((batch.num_rows, 64), dtype=np.int64)
            if len(h):
                for bit in range(64):
                    contrib = (((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) << 1) - 1
                    np.add.at(votes[:, bit], doc_of, contrib)
            bits = (votes > 0).astype(np.uint64)
            fp = np.zeros(batch.num_rows, dtype=np.uint64)
            for bit in range(64):
                fp |= bits[:, bit] << np.uint64(bit)
            yield pa.RecordBatch.from_arrays([ids, pa.array(fp.view(np.int64))], names=[id_col, "simhash"])

    id_field = df.schema[id_col]
    return df.select(id_col, text_col).mapInArrow(
        gen, schema=f"{id_col} {id_field.dataType.simpleString()}, simhash bigint"
    )


def simhash_near_pairs(
    sim_df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 1000,
    mode: str = "connected",
    exhaustive_budget: int = 50_000_000,
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via pigeonhole banding:
    split 64 bits into max_hamming+1 chunks — any close pair matches exactly
    on ≥1 chunk.  Verification = bit_count(xor), JVM-side.

    Hot chunk values (near-empty docs cluster their simhashes around 0) would
    make a naive self-join quadratic: buckets are materialized as member
    lists, and buckets above ``max_bucket`` are salt-split with connectivity
    chains, exactly like the MinHash-LSH side.

    Recall trade-off of the "connected" split: pair ENUMERATION inside an
    oversized bucket is not exhaustive — a close pair split across
    sub-buckets is only recovered if the chain edges (sub-bucket minima)
    also pass the hamming filter, which holds for genuine duplicate CLUSTERS
    (all members mutually close, the dedup_near use) but not for arbitrary
    mixed mega-buckets.  ``mode="exhaustive"`` recovers the complete pair
    set of oversized buckets through a memory-bounded per-bucket join, up to
    ``exhaustive_budget`` pairs per bucket (beyond that: connected
    fallback), exactly like lsh_candidate_pairs."""
    nchunks = max_hamming + 1
    width = 64 // nchunks
    sh = F.col("simhash")
    chunks = [
        F.struct(F.lit(j).alias("chunk"), F.shiftrightunsigned(sh, j * width).bitwiseAND(F.lit((1 << width) - 1)).alias("ch"))
        for j in range(nchunks)
    ]
    exploded = sim_df.select(id_col, "simhash", F.explode(F.array(*chunks)).alias("c")).select(
        F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s")).alias("m"),
        F.col("c.chunk").alias("chunk"),
        F.col("c.ch").alias("ch"),
    )
    buckets = exploded.groupBy("chunk", "ch").agg(F.collect_list("m").alias("ms")).filter(F.size("ms") > 1)

    def expand(bdf: DataFrame) -> DataFrame:
        return (
            bdf.select(F.explode("ms").alias("x"), "ms")
            .select("x", F.explode("ms").alias("y"))
            .filter(F.col("x.i") < F.col("y.i"))
            .select("x", "y")
        )

    small = expand(buckets.filter(F.size("ms") <= max_bucket))
    oversized = buckets.filter(F.size("ms") > max_bucket)
    if mode == "exhaustive":
        npairs = F.size("ms").cast("bigint") * (F.size("ms") - 1) / 2
        mx = oversized.filter(npairs <= exhaustive_budget).select(
            "chunk", "ch", F.explode("ms").alias("x")
        )
        my = mx.select("chunk", "ch", F.col("x").alias("y"))
        full = mx.join(my, ["chunk", "ch"]).filter(F.col("x.i") < F.col("y.i")).select("x", "y")
        small = small.unionByName(full)
        oversized = oversized.filter(npairs > exhaustive_budget)
    elif mode != "connected":
        raise ValueError(f"unknown oversized-bucket mode {mode!r}")
    members = (
        oversized
        .select("chunk", "ch", F.ceil(F.size("ms") / max_bucket).cast("int").alias("__nsb"), F.explode("ms").alias("m"))
        .withColumn("__sb", F.pmod(F.xxhash64("m.i"), F.col("__nsb")))
    )
    sub = members.groupBy("chunk", "ch", "__sb").agg(F.collect_list("m").alias("ms"))
    within = expand(sub)
    reps = sub.groupBy("chunk", "ch").agg(F.sort_array(F.collect_list(F.array_min("ms"))).alias("reps"))
    chain = (
        reps.filter(F.size("reps") > 1)
        .select(
            F.explode(
                F.zip_with(
                    F.slice("reps", 1, F.size("reps") - 1),
                    F.slice("reps", 2, F.size("reps") - 1),
                    lambda x, y: F.struct(x.alias("x"), y.alias("y")),
                )
            ).alias("p")
        )
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    )
    cand = small.unionByName(within).unionByName(chain)
    ham = F.bit_count(F.col("x.s").bitwiseXOR(F.col("y.s"))).alias("hamming")
    return cand.select(F.col("x.i").alias("a"), F.col("y.i").alias("b"), ham).filter(
        F.col("hamming") <= max_hamming
    ).distinct()


def shard_overlap(
    df: DataFrame,
    shard_col: str,
    value_col: str,
    k: int = 4096,
    include_self: bool = False,
) -> DataFrame:
    """Pairwise corpus-overlap matrix between shards, via theta sketches
    (hllspark/sketches/theta.py) — the distinct-value overlap of every shard
    pair (training-shard / crawl-snapshot contamination checks) in ONE pass
    over the data.

    Scale shape: the single scan builds one theta sketch per shard through
    the bounded two-phase pipeline (per-partition state <= k hashes); the
    pairwise stage cross-joins the S-row sketch table with itself — S^2/2
    CHEAP pairwise ops over <=8k-byte blobs, never S^2 passes over the
    data.  Estimates are exact while a shard's distinct count stays below
    k, and carry theta's result-scale error past it (~1/sqrt(k) relative on
    the union; intersection error scales with the intersection, not the
    union — the property inclusion-exclusion over HLLs lacks).

    Returns (shard_a, shard_b, est_a, est_b, inter_est, union_est,
    jaccard_est), upper triangle only unless include_self.
    """
    from .. import functions as hfn
    from .. import sketches

    sk = sketches.build(df, value_col, "theta", by=[shard_col], k=k)
    a = sk.select(F.col(shard_col).alias("shard_a"), F.col("sketch").alias("__sa"))
    b = sk.select(F.col(shard_col).alias("shard_b"), F.col("sketch").alias("__sb"))
    cond = F.col("shard_a") <= F.col("shard_b") if include_self else F.col("shard_a") < F.col("shard_b")
    pairs = a.crossJoin(b).where(cond)
    return pairs.select(
        "shard_a",
        "shard_b",
        hfn.theta_estimate(F.col("__sa")).alias("est_a"),
        hfn.theta_estimate(F.col("__sb")).alias("est_b"),
        hfn.theta_intersection(F.col("__sa"), F.col("__sb")).alias("inter_est"),
        hfn.theta_union_estimate(F.col("__sa"), F.col("__sb")).alias("union_est"),
        hfn.theta_jaccard(F.col("__sa"), F.col("__sb")).alias("jaccard_est"),
    )
