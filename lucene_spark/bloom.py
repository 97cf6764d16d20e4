"""BloomFilteringPostingsFormat analog — per-segment term bloom sidecars.

Reference: lucene/codecs/bloom/BloomFilteringPostingsFormat.java:66-90
wraps a delegate postings format with a fast-fail bitset consulted before
any terms-dict seek; the set is a FuzzySet (codecs/bloom/FuzzySet.java:
40-60) — a SINGLE-hash variant of a bloom filter over a power-of-two bit
space: ``contains`` may return MAYBE falsely but never NO falsely.  At
flush the per-segment set is right-sized by OR-folding its halves while
the result's saturation stays acceptable (FuzzySet.downsize; the default
factory targets ~10% saturation, DefaultBloomFilterFactory.java:36-44).

Spark shape: the sidecar is ONE row per segment — (seg, size,
words array<long>) — built with a single distinct + hash-aggregate over
the posting keys and small enough to broadcast (10^5 segments x a few KB
at 10^12 docs).  Conjunctive-query segment pruning is then a broadcast
join: a segment whose bloom misses ANY required term's bit provably
contains no match and its postings are never decoded.  Bit positions are
the md5-base60 hash (same JVM-side Catalyst expression as the dedup
kernels, textops.base60_expr) masked by each segment's own size — the
fold trick works because ``h & (size/2 - 1)`` is exactly where both
halves' bits land.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import base60_expr

_MASK60 = (1 << 60) - 1


def build_term_blooms(
    index,
    num_bits: int = 1 << 16,
    target_saturation: float = 0.10,
    min_bits: int = 64,
) -> DataFrame:
    """Per-segment term bloom — DataFrame (seg, size, n_terms, words).

    ``num_bits`` must be a power of two (FuzzySet works over a pow2 space);
    each segment's set is independently downsized by OR-folding halves
    while the folded saturation stays <= ``target_saturation``
    (FuzzySet.downsize semantics), floored at ``min_bits``.
    """
    if num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two")
    terms = (
        index.postings.select("seg", "term").distinct()
        .withColumn("bit", base60_expr("term").bitwiseAND(F.lit(num_bits - 1)))
        .select("seg", "bit")
    )
    nb, tsat, mb = num_bits, float(target_saturation), int(min_bits)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        bits = np.unique(pdf["bit"].to_numpy(dtype=np.int64))
        size = nb
        mask = np.zeros(size, dtype=bool)
        mask[bits] = True
        while size > mb:
            half = size // 2
            folded = mask[:half] | mask[half:]
            if folded.sum() / half > tsat:
                break
            mask, size = folded, half
        nwords = (size + 63) // 64
        words = np.zeros(nwords, dtype=np.uint64)
        idx = np.nonzero(mask)[0]
        np.bitwise_or.at(
            words, idx // 64, np.left_shift(np.uint64(1), (idx % 64).astype(np.uint64))
        )
        return pd.DataFrame({
            "seg": [seg], "size": [size], "n_terms": [len(pdf)],
            "words": [words.astype(np.int64).tolist()],
        })

    return terms.groupBy("seg").applyInPandas(
        pack, schema="seg long, size int, n_terms long, words array<long>"
    )


def prune_segments(blooms: DataFrame, terms: list[str]) -> DataFrame:
    """Segments whose bloom holds EVERY term's bit — (seg) DataFrame.

    No false negatives: a segment containing all the terms always
    survives; a surviving segment may still lack a term (single-hash
    collisions), exactly the reference's MAYBE contract
    (FuzzySet.java:46-52 ContainsResult).  Shape: |terms| broadcast rows
    cross the #segments-row sidecar — no postings touched.
    """
    spark = blooms.sparkSession
    terms = sorted(set(terms))
    if not terms:
        return blooms.select("seg")
    tdf = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], "term string")
        .withColumn("h", base60_expr("term"))
    )
    j = blooms.crossJoin(tdf).withColumn(
        "bit", F.col("h").bitwiseAND(F.col("size").cast("long") - 1)
    )
    present = F.expr(
        "shiftright(element_at(words, CAST(bit / 64 AS INT) + 1), "
        "CAST(bit % 64 AS INT)) & 1"
    )
    return (
        j.withColumn("present", present)
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n"), F.min("present").alias("allset"))
        .filter((F.col("n") == len(terms)) & (F.col("allset") == 1))
        .select("seg")
    )


def bloom_pruned_score_docs(
    index, blooms: DataFrame, query, required_terms: list[str], **kw
) -> DataFrame:
    """score_docs restricted to bloom-surviving segments — the
    BloomFilteringPostingsFormat fast-fail applied at segment granularity
    (the reference fails per seekExact, :66-90; a docID-range segment
    missing a required term cannot match a conjunction over it).

    ``required_terms``: terms that MUST all occur for a doc to match
    (the conjunctive core of the query).  Identical results to a plain
    ``score_docs`` because pruning has no false negatives.
    """
    segs = [int(r["seg"]) for r in prune_segments(blooms, required_terms).collect()]
    from .search import score_docs

    return score_docs(index, query, segs=segs, **kw)
