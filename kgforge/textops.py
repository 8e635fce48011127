"""Training-data text operations over a ``documents(doc_id, text, ...)``
table — the large-scale pipeline extensions (dedup family, language ID,
quality scoring, token counting, fingerprinting).

Everything here is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen) wherever the semantics allow; only
MinHash/SimHash signatures drop to vectorized NumPy in ``mapInPandas``.
Each SQL-expressible op has a matching DuckDB oracle in
``__spark_entry__.oracle_sql`` — the arithmetic is written identically
in both dialects so results match bit-for-bit (integer counts, IEEE
double division; no engine-ordered float accumulation in outputs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import splitmix64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def normalize_text(col):
    """Whitespace-collapse + lowercase — the exact-dedup key."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup on normalized text: survivor = min doc_id per group.

    Hash aggregation (one shuffle on the md5 key, partial agg map-side).
    Output: ``doc_id, fingerprint, group_size``.
    """
    return (
        docs.select(
            "doc_id", F.md5(normalize_text("text")).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("group_size"),
        )
        .select("doc_id", "fingerprint", "group_size")
    )


def fingerprint_docs(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of normalized text (+ lengths)."""
    return docs.select(
        "doc_id",
        F.md5(normalize_text("text")).alias("fingerprint"),
        F.length("text").cast("long").alias("len_raw"),
        F.length(normalize_text("text")).cast("long").alias("len_norm"),
    )


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish subword-regex tokens per document.

    ``n_tokens_ws``: split on whitespace runs. ``n_tokens_bpe``: count of
    ``\\w+|[^\\w\\s]`` matches (words + isolated punctuation — the
    standard pre-tokenizer shape).
    """
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens_ws"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)).cast("long").alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS = r"\b(the|and|of|to|in|is|a|that|it|for)\b"
_PUNCT = r"[^\w\s]"


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword heuristics (Gopher-rules style).

    All ratios are exact IEEE doubles from integer counts (identical in
    the DuckDB oracle). ``quality_ok`` is the boolean gate.
    """
    low = F.lower(F.col("text"))
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    n_stop = F.size(F.regexp_extract_all(low, F.lit(_STOPWORDS), 0))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(_PUNCT), 0))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_text"),
        n_tokens.cast("long").alias("n_tokens"),
        (n_chars.cast("double") / n_tokens.cast("double")).alias("mean_token_len"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        (n_punct.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
        (
            (n_tokens >= 5)
            & (n_chars >= 20)
            & ((n_punct.cast("double") / n_chars.cast("double")) < 0.2)
        ).alias("quality_ok"),
    )


# ---------------------------------------------------------------------------
# language ID (n-gram / stopword heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|is|was|with)\b",
    "fr": r"\b(le|la|les|et|est|une|dans)\b",
    "de": r"\b(der|die|das|und|ist|mit|ein)\b",
    "es": r"\b(el|los|las|es|una|con|para)\b",
}
LANG_ORDER = ["en", "fr", "de", "es"]


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word-count argmax language guess; 'und' when all zero.

    Ties break in LANG_ORDER — the oracle SQL uses the same nested CASE.
    """
    low = F.lower(F.col("text"))
    counts = {
        lang: F.size(F.regexp_extract_all(low, F.lit(rx), 0))
        for lang, rx in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in reversed(LANG_ORDER):  # earlier langs win ties -> apply last
        c = counts[lang]
        best = F.when(c >= F.greatest(best_n, F.lit(1)), F.lit(lang)).otherwise(best)
        best_n = F.greatest(best_n, c)
    cols = [counts[lang].cast("long").alias(f"n_{lang}") for lang in LANG_ORDER]
    return docs.select("doc_id", *cols, best.alias("lang_pred"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact) near-dup pairs
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs (a < b) above threshold.

    Pure DataFrame ops: tokenize → n-gram via slice/transform → explode
    distinct shingles → shingle-key self-join (the classic inverted-index
    pair generation — only docs *sharing* a shingle ever pair, never a
    full cross join) → count intersections → Jaccard via
    |A∩B| / (|A| + |B| − |A∩B|).

    Scale: the shingle join is the skew point (stop-shingles); cap with a
    document-frequency filter when corpus-scale (not needed at fixture
    scale, noted for 100 TB: drop shingles with df > threshold).
    """
    toks = docs.select(
        "doc_id",
        F.split(normalize_text("text"), r"\s+").alias("toks"),
    )
    grams = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0))),
                lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
            )
        ).alias("grams"),
    )
    sizes = grams.select("doc_id", F.size("grams").alias("n_grams"))
    ex = grams.select("doc_id", F.explode("grams").alias("g"))
    a = ex.select(F.col("doc_id").alias("a"), "g")
    b = ex.select(F.col("doc_id").alias("b"), "g")
    inter = (
        a.join(b, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = sizes.withColumn("n_grams", F.col("n_grams").cast("long"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_grams", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_grams", "nb"), "b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash + MinHash-LSH near-dup (signature-based scale path)
# ---------------------------------------------------------------------------

def simhash_docs(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens (vectorized NumPy per Arrow batch).

    Near-dups have small Hamming distance; pairing is done by banding the
    hash into 4 x 16-bit keys (exact match on any band → candidate).
    Output: ``doc_id, simhash (bigint)``.
    """
    schema = "doc_id long, simhash long"

    from .stages.canonicalize import hash_shingle

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for text in pdf["text"].str.lower().str.split():
                if not isinstance(text, list) or not text:
                    out.append(0)
                    continue
                # hash_shingle: stable FNV (process-hash is seed-randomized)
                hs = splitmix64(
                    np.array([hash_shingle(w, 42) for w in text], dtype=np.uint64)
                )
                bitmat = ((hs[:, None] >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
                sig_bits = (bitmat.sum(axis=0) * 2 > len(hs)).astype(np.uint64)
                sig = np.uint64(0)
                for i, bv in enumerate(sig_bits):
                    sig |= np.uint64(bv) << np.uint64(i)
                out.append(int(sig >> np.uint64(1)))  # keep sign-safe for long
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.select("doc_id", "text").mapInPandas(fn, schema)


def simhash_candidate_pairs(sim: DataFrame, band_bits: int = 16, max_hamming: int = 6) -> DataFrame:
    """Band the simhash into 16-bit keys; same-band docs are candidates;
    verify by exact Hamming distance (bit_count of xor)."""
    n_bands = 63 // band_bits
    banded = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a = banded.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "key")
    b = banded.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .dropDuplicates(["a", "b"])
        .where(F.col("hamming") <= max_hamming)
    )


def minhash_neardup_docs(
    docs: DataFrame, n_perm: int = 64, n_bands: int = 16, threshold: float = 0.7,
    shingle_k: int = 5, max_bucket: int = 100,
) -> DataFrame:
    """MinHash-LSH near-duplicate document pairs (scale path for dedup).

    shingle→minhash→band→bucket-join→exact-Jaccard-verify, reusing the
    B7 machinery keyed by doc_id (text joined back only for the verify).
    Output: ``a, b, jaccard`` (doc_id pairs).
    """
    from .stages.canonicalize import lsh_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(
        docs.select("doc_id", "text"), name_col="text", id_col="doc_id",
        n_perm=n_perm, k=shingle_k,
    )
    cands = lsh_candidate_pairs(sigs, "doc_id", n_bands, max_bucket)
    texts = docs.select("doc_id", normalize_text("text").alias("txt"))
    pairs = (
        cands.join(texts.withColumnRenamed("doc_id", "a").withColumnRenamed("txt", "ta"), "a")
        .join(texts.withColumnRenamed("doc_id", "b").withColumnRenamed("txt", "tb"), "b")
    )

    schema = "a long, b long, jaccard double"

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            from .stages.canonicalize import char_shingles

            sa = char_shingles(pdf["ta"], shingle_k)
            sb = char_shingles(pdf["tb"], shingle_k)
            jac = [
                (len(x & y) / len(x | y)) if (x or y) else 0.0 for x, y in zip(sa, sb)
            ]
            out = pdf[["a", "b"]].copy()
            out["jaccard"] = jac
            yield out[np.asarray(jac) >= threshold]

    return pairs.mapInPandas(verify, schema)
