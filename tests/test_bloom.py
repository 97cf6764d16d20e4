"""BloomFilteringPostingsFormat analog (codecs/bloom/FuzzySet.java):
per-segment term blooms, fold-downsizing, no-false-negative pruning."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.bloom import (
    bloom_pruned_score_docs, build_term_blooms, prune_segments,
)
from lucene_spark.index import build_index
from lucene_spark.search import score_docs


@pytest.fixture(scope="module")
def bloom_setup(spark):
    rows = []
    for i in range(64):
        words = [f"common{j}" for j in range(4)]
        if i % 16 == 0:
            words.append("needle")     # segs 0 and 2 only (seg_size 32)
        words.append(f"unique{i}")
        rows.append((f"u{i}", " ".join(words)))
    docs = spark.createDataFrame(rows, "url string, text string")
    idx = build_index(spark, docs, text_col="text", key_col="url",
                      seg_size=32)
    blooms = build_term_blooms(idx, num_bits=1024).persist()
    blooms.count()
    return idx, blooms


def test_no_false_negatives(bloom_setup, spark):
    idx, blooms = bloom_setup
    # every (seg, term) actually present must survive pruning on that term
    present = idx.postings.select("seg", "term").distinct().collect()
    by_term = {}
    for r in present:
        by_term.setdefault(r["term"], set()).add(r["seg"])
    for term, segs in sorted(by_term.items())[:20]:
        kept = {r["seg"] for r in prune_segments(blooms, [term]).collect()}
        assert segs <= kept, term


def test_pruning_actually_prunes(bloom_setup):
    idx, blooms = bloom_setup
    nsegs = blooms.count()
    assert nsegs == 2
    # each 'uniqueN' lives in exactly one segment; with 1024 bits and ~70
    # distinct terms per segment the false-positive rate is tiny — expect
    # a real prune (docids follow key order, so derive the home segment)
    def home(term):
        return {r["seg"] for r in idx.postings
                .filter(F.col("term") == term).select("seg").collect()}

    h5, h40 = home("unique5"), home("unique40")
    assert len(h5) == 1 and len(h40) == 1
    kept = {r["seg"] for r in prune_segments(blooms, ["unique5"]).collect()}
    assert kept == h5
    if h5 != h40:
        # conjunction across segments kills every segment
        assert prune_segments(blooms, ["unique5", "unique40"]).count() == 0


def test_downsize_fold_preserves_membership(spark):
    # tiny vocabulary + huge initial size -> folding kicks in; membership
    # must be preserved across folds (FuzzySet.downsize contract)
    docs = spark.createDataFrame(
        [(f"u{i}", f"alpha beta tok{i % 4}") for i in range(16)],
        "url string, text string")
    idx = build_index(spark, docs, text_col="text", key_col="url",
                      seg_size=8)
    blooms = build_term_blooms(idx, num_bits=1 << 14, min_bits=64)
    pdf = blooms.toPandas()
    assert (pdf["size"] < (1 << 14)).all()        # folding happened
    assert ((pdf["size"] & (pdf["size"] - 1)) == 0).all()  # still pow2
    for term in ["alpha", "beta", "tok0", "tok3"]:
        kept = {r["seg"] for r in prune_segments(blooms, [term]).collect()}
        want = {r["seg"] for r in idx.postings.filter(F.col("term") == term)
                .select("seg").distinct().collect()}
        assert want <= kept, term


def test_bloom_search_equals_plain(bloom_setup):
    idx, blooms = bloom_setup
    plain = (score_docs(idx, "common0 AND needle", precision="float64")
             .orderBy("docid").toPandas())
    pruned = (bloom_pruned_score_docs(
        idx, blooms, "common0 AND needle", ["common0", "needle"],
        precision="float64").orderBy("docid").toPandas())
    pd.testing.assert_frame_equal(plain, pruned)
    assert len(pruned) == 4
