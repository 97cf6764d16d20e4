"""Training-data-pipeline text operators over a documents table.

Large-scale corpus curation ops the engine exposes alongside search — all
pure DataFrame ops (JVM-side, whole-stage codegen) except where hashing
semantics require numpy (minhash/simhash), which run as Arrow-batched pandas
UDFs.  Every exact op has an ANSI-SQL twin for the correctness gate.

Ops: exact dedup (md5 hash-groupBy), n-gram Jaccard near-dup (exact),
MinHash+LSH near-dup candidates (scale path), SimHash, language ID heuristic,
quality scoring, token counting, document fingerprinting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS

# ---------------------------------------------------------------- exact dedup


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (fingerprint, n_dups, canonical_id).

    Hash-groupBy on md5 — shuffles only (hash, id), never text; at 100 TB the
    map-side projection keeps shuffle volume ~40 bytes/doc.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_dups") > 1)
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stable per-doc content fingerprint (md5 of text)."""
    return docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("fingerprint"))


# ---------------------------------------------------------- n-gram jaccard


def token_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-grams per doc via split + slide (no UDF)."""
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
    # sliding n-grams: transform over index range, joined with space
    expr = (
        f"transform(sequence(0, size(toks)-{n}), i -> "
        f"concat_ws(' ', slice(toks, i+1, {n})))"
    )
    return (
        toks.filter(F.size("toks") >= n)
        .select(F.col(id_col), F.explode(F.expr(expr)).alias("ngram"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (a < b, jaccard >= threshold).

    Self-join on shared n-grams — the exact (quadratic-in-collisions)
    baseline; the scale path is :func:`minhash_lsh_candidates`.
    """
    grams = token_ngrams(docs, id_col, text_col, n)
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    a = grams.select(F.col(id_col).alias("a"), "ngram")
    b = grams.select(F.col(id_col).alias("b"), "ngram")
    inter = (
        a.join(b, "ngram")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n_grams").alias("size_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_grams").alias("size_b")), "b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------- minhash + lsh

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    seed: int = 1,
) -> DataFrame:
    """Per-doc MinHash signature over word-shingle hashes (Arrow-batched)."""
    a, b = _minhash_params(num_perm, seed)

    @F.pandas_udf("array<long>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split(" ")
            if len(toks) < n:
                # too short to shingle: emit NULL so the doc never enters a
                # band bucket (an all-zero sentinel would make every short
                # doc a spurious near-dup of every other short doc)
                out.append(None)
                continue
            shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            hv = np.array(
                [hash_str64(s) for s in shingles], dtype=np.uint64
            )
            # (a*h + b) mod p, min over shingles, vectorized over perms
            vals = (hv[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return docs.select(F.col(id_col), sig_udf(F.col(text_col)).alias("sig")).filter(
        F.col("sig").isNotNull()
    )


def hash_str64(s: str) -> int:
    """Deterministic 64-bit FNV-1a (stable across workers, unlike hash())."""
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 1,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket → candidate pairs (a < b).

    The 100 TB near-dup path: shuffle is (band, bucket-hash) — bounded keys —
    then pairs generated within buckets only.  Verify candidates with
    :func:`ngram_jaccard_pairs` semantics on the candidate subset.
    """
    rows = num_perm // bands
    sigs = minhash_signatures(docs, id_col, text_col, n, num_perm, seed)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"transform(sequence(0, {bands - 1}), b -> slice(sig, b*{rows}+1, {rows}))")
        ).alias("band", "bucket"),
    ).select(id_col, "band", F.hash(F.concat_ws(",", F.col("bucket").cast("array<string>"))).alias("bucket_h"))
    a = banded.select(F.col(id_col).alias("a"), "band", "bucket_h")
    b = banded.select(F.col(id_col).alias("b"), "band", "bucket_h")
    return (
        a.join(b, ["band", "bucket_h"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tokens (near-dup by hamming distance)."""

    @F.pandas_udf("long")
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split(" ")
            if not toks:
                out[i] = 0
                continue
            hv = np.array([hash_str64(tok) for tok in toks], dtype=np.uint64)
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            acc = (2 * bits - 1).sum(axis=0)
            out[i] = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum().astype(np.int64))
        return pd.Series(out)

    return docs.select(F.col(id_col), sim_udf(F.col(text_col)).alias("simhash"))


# ---------------------------------------------------------- text analysis

_STOP_ARRAY = sorted(ENGLISH_STOP_WORDS)


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counts: total, distinct, stopword count — pure SQL ops."""
    toks = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))
    stop_lit = ",".join(f"'{w}'" for w in _STOP_ARRAY)
    return toks.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.expr(f"size(filter(toks, t -> array_contains(array({stop_lit}), t)))").alias("n_stop"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality: length, stopword ratio, distinct ratio — combined
    into [0,1].  Deterministic arithmetic (SQL twin exists)."""
    s = token_stats(docs, id_col, text_col)
    return s.select(
        id_col,
        "n_tokens",
        (
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
            + (F.col("n_stop") / F.col("n_tokens")) * 0.3
            + (F.col("n_distinct") / F.col("n_tokens")) * 0.3
        ).alias("quality"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic: en if >=5% English stopwords."""
    s = token_stats(docs, id_col, text_col)
    return s.select(
        id_col,
        F.when(F.col("n_stop") / F.col("n_tokens") >= 0.05, F.lit("en"))
        .otherwise(F.lit("unk"))
        .alias("lang_pred"),
    )
