"""Text analysis operators for training-data pipelines (lang-ID, quality
scoring, token counting, fingerprinting) — Spark-first: everything that
Catalyst can express stays JVM-side (whole-stage codegen); only the
char-n-gram language model runs as an Arrow-vectorized kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# token counting & quality — pure Catalyst expressions (no Python at all)
# ---------------------------------------------------------------------------


def extract_text(col) -> Column:
    """Block-level text extraction from raw HTML, pure Catalyst: every run
    of consecutive tags becomes one newline (block boundary), then leading/
    trailing newlines are trimmed.  This is the per-row extraction invariant
    of the input contract — on the Common-Crawl-style pages fixture it
    reproduces the stored ``text`` column BYTE-IDENTICALLY for every row
    (tested + oracle-checked against DuckDB's independent evaluation).

    A binary ``html`` column is decoded as UTF-8 first."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c.cast("string"), r"(<[^>]*>)+", "\n")
    return F.btrim(stripped, F.lit("\n"))


def token_count(col) -> Column:
    """Whitespace token count, JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count: splits on whitespace AND at letter/digit/
    punctuation boundaries — a cheap upper proxy for BPE token counts."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_replace(c, r"([0-9]+|[^\w\s]+)", r" $1 ")
    trimmed = F.trim(pieces)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


_STOPWORDS = (
    "the of and to in a is that it was for on are as with his they at be this "
    "have from or had by word but not what all were we when your can said there "
    "use an each which she do how their if"
).split()


def quality_features(df: DataFrame, text_col: str = "text", prefix: str = "q_") -> DataFrame:
    """Append standard quality-scoring columns, all whole-stage-codegen:

    q_chars, q_tokens, q_mean_word_len, q_punct_ratio, q_digit_ratio,
    q_upper_ratio, q_stopword_ratio, q_score (a simple composite in [0,1]).
    """
    c = F.col(text_col)
    tokens = token_count(text_col)
    chars = F.length(c)
    nz = F.greatest(chars, F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]-]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    lower_words = F.split(F.lower(F.trim(c)), r"\W+")
    stop_hits = F.size(F.array_intersect(lower_words, F.array(*[F.lit(w) for w in _STOPWORDS])))
    # distinct stopwords present / 30 is a crude "natural language" signal
    out = (
        df.withColumn(f"{prefix}chars", chars)
        .withColumn(f"{prefix}tokens", tokens)
        .withColumn(
            f"{prefix}mean_word_len",
            (chars - tokens + 1) / F.greatest(tokens, F.lit(1)).cast("double"),
        )
        .withColumn(f"{prefix}punct_ratio", punct / nz)
        .withColumn(f"{prefix}digit_ratio", digits / nz)
        .withColumn(f"{prefix}upper_ratio", upper / nz)
        .withColumn(f"{prefix}stopword_ratio", stop_hits / F.lit(float(len(_STOPWORDS))))
    )
    score = (
        F.when((F.col(f"{prefix}tokens") >= 5) & (F.col(f"{prefix}tokens") <= 100_000), 0.25).otherwise(0.0)
        + F.when((F.col(f"{prefix}mean_word_len") >= 2.5) & (F.col(f"{prefix}mean_word_len") <= 12), 0.25).otherwise(0.0)
        + F.when(F.col(f"{prefix}digit_ratio") <= 0.2, 0.25).otherwise(0.0)
        + F.when(F.col(f"{prefix}punct_ratio") <= 0.2, 0.25).otherwise(0.0)
    )
    return out.withColumn(f"{prefix}score", score)


def exact_fingerprint(col) -> Column:
    """Normalization-invariant exact-duplicate fingerprint, JVM-side:
    xxhash64 of lowercased whitespace-collapsed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


# ---------------------------------------------------------------------------
# rolling-hash document fingerprint (winnowing) — vectorized kernel
# ---------------------------------------------------------------------------


def rolling_fingerprints(text: str, window: int = 8, keep: int = 4) -> list[int]:
    """Winnowing-style fingerprint (Schleimer et al. 2003): rolling polynomial
    hash over bytes, keep the ``keep`` smallest window hashes.  Scalar
    reference implementation — the distributed operator is
    ``fingerprint_documents`` (byte-identical output, property-tested)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < window:
        return [int(b.sum())] if len(b) else []
    base = np.uint64(257)
    # vectorized rolling hash: hash[i] = sum b[i+j] * base^(w-1-j)
    powers = base ** np.arange(window - 1, -1, -1, dtype=np.uint64)
    n = len(b) - window + 1
    idx = np.arange(n)[:, None] + np.arange(window)[None, :]
    h = (b[idx].astype(np.uint64) * powers[None, :]).sum(axis=1)
    return sorted(np.unique(np.sort(h)[:keep]).tolist())


def fingerprint_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    keep: int = 4,
) -> DataFrame:
    """DataFrame[id, fps array<bigint>] — rolling_fingerprints as a
    batch-vectorized operator: one rolling-hash pass over the batch's
    concatenated bytes (O(total bytes)), then the ``keep`` smallest unique
    hashes per document via a single lexsort.  Byte-identical to the scalar
    reference implementation (tested)."""
    from typing import Iterator

    def gen(batches) -> Iterator:
        import pyarrow as pa

        from ..core.hash import arrow_string_buffers

        base = np.uint64(257)
        powers = base ** np.arange(window - 1, -1, -1, dtype=np.uint64)
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            texts = batch.column(batch.schema.get_field_index(text_col)).fill_null("")
            flat, offsets = arrow_string_buffers(texts)
            offsets = offsets.astype(np.int64)
            lens = offsets[1:] - offsets[:-1]
            counts = np.maximum(lens - window + 1, 0)
            total = int(counts.sum())
            ndocs = batch.num_rows
            out_offsets = [0]
            out_vals: list[np.ndarray] = []
            if total:
                doc_of = np.repeat(np.arange(ndocs), counts)
                first = np.repeat(offsets[:-1], counts)
                within = np.arange(total) - np.repeat(
                    np.cumsum(np.concatenate([[0], counts[:-1]])), counts
                )
                starts = first + within
                h = np.zeros(total, dtype=np.uint64)
                for j in range(window):
                    h += flat[starts + j].astype(np.uint64) * powers[j]
                order = np.lexsort((h, doc_of))  # doc-major, hash ascending
                hs = h[order]
                bounds = np.searchsorted(doc_of[order], np.arange(ndocs + 1))
            for d in range(ndocs):
                if counts[d] == 0:
                    # short doc: byte-sum sentinel (scalar-impl parity)
                    n = int(lens[d])
                    vals = (
                        np.array([int(flat[offsets[d] : offsets[d] + n].sum())], dtype=np.uint64)
                        if n
                        else np.empty(0, dtype=np.uint64)
                    )
                else:
                    end = min(bounds[d] + keep, bounds[d + 1])
                    vals = np.unique(hs[bounds[d] : end])
                out_vals.append(vals.view(np.int64))
                out_offsets.append(out_offsets[-1] + len(vals))
            values = np.concatenate(out_vals) if out_vals else np.empty(0, np.int64)
            arr = pa.ListArray.from_arrays(pa.array(out_offsets, type=pa.int32()), pa.array(values))
            yield pa.RecordBatch.from_arrays([ids, arr], names=[id_col, "fps"])

    id_field = df.schema[id_col]
    return df.select(id_col, text_col).mapInArrow(
        gen, schema=f"{id_col} {id_field.dataType.simpleString()}, fps array<bigint>"
    )


# ---------------------------------------------------------------------------
# language ID — char-trigram profiles over seed text, Arrow-vectorized
# ---------------------------------------------------------------------------

_LANG_SEEDS = {
    "en": "the quick brown fox jumps over the lazy dog and this is a sentence with common english words that people write every day for work and school things",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y esta es una oración con palabras comunes en español que la gente escribe todos los días para el trabajo",
    "de": "der schnelle braune fuchs springt über den faulen hund und dies ist ein satz mit häufigen deutschen wörtern die menschen jeden tag für die arbeit schreiben",
    "fr": "le rapide renard brun saute par dessus le chien paresseux et ceci est une phrase avec des mots français courants que les gens écrivent chaque jour pour le travail",
    "ru": "быстрая коричневая лиса прыгает через ленивую собаку и это предложение с обычными русскими словами которые люди пишут каждый день для работы",
    "zh": "敏捷的棕色狐狸跳过懒狗这是一个包含人们每天为工作和学习而写的常见中文词语的句子",
    "ja": "素早い茶色の狐は怠け者の犬を飛び越えますこれは人々が毎日仕事のために書く一般的な日本語の単語を含む文です",
}


def _trigrams(s: str) -> set:
    s = f"  {s.lower()}  "
    return {s[i : i + 3] for i in range(len(s) - 2)}


_PROFILES = {lang: _trigrams(seed) for lang, seed in _LANG_SEEDS.items()}


@pandas_udf(StringType())
def lang_id(text: pd.Series) -> pd.Series:
    """Heuristic language ID: Jaccard of char trigrams vs per-language seed
    profiles (+ a Unicode-block prior for CJK/Cyrillic)."""

    def classify(s):
        if s is None or not s.strip():
            return None
        # unicode-block prior
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

    return text.map(classify)
