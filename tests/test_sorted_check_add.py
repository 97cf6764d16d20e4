"""Index-sort early termination, CheckIndex audit, addIndexes append-merge."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.checkindex import check_index
from lucene_spark.index import add_indexes, build_index
from lucene_spark.search import search, sorted_topk


def _corpus(n, seed=11):
    rng = np.random.default_rng(seed)
    vocab = ["table", "hash", "part", "key", "scan", "window", "rare"]
    rows = []
    for i in range(n):
        toks = [vocab[j] for j in rng.integers(0, len(vocab) - 1, rng.integers(5, 20))]
        if i % 37 == 0:
            toks.append("rare")
        rows.append({"doc_id": i, "url": f"u{i:05d}", "text": " ".join(toks)})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(_corpus(600))
    return build_index(spark, docs, text_col="text", key_col="doc_id",
                       docid_col="doc_id", seg_size=64, with_positions=True)


# ------------------------------------------------------------- sorted_topk


def test_sorted_topk_matches_full_scan(idx, spark):
    got = sorted_topk(idx, "rare", k=10, ascending=True)
    want = sorted(
        r["docid"] for r in
        __import__("lucene_spark.search", fromlist=["match_any_docs"])
        .match_any_docs(idx, ["rare"]).collect()
    )[:10]
    assert got.tolist() == want


def test_sorted_topk_descending(idx):
    asc = sorted_topk(idx, "rare", k=1000, ascending=True).tolist()
    desc = sorted_topk(idx, "rare", k=1000, ascending=False).tolist()
    assert desc == asc[::-1]


def test_sorted_topk_early_terminates(idx):
    # 'table' is dense: the first probe round must satisfy k=5 without
    # touching the remaining segments
    docids, st = sorted_topk(idx, "table", k=5, return_stats=True)
    assert len(docids) == 5
    assert st["segments_probed"] < st["segments_total"]


def test_sorted_topk_boolean_query(idx):
    got = sorted_topk(idx, "table AND rare", k=5).tolist()
    full = search(idx, "table AND rare", k=10**6, prune=False)
    assert got == sorted(full.docids.tolist())[:5]


def test_sorted_topk_respects_tombstones(idx, spark):
    base = sorted_topk(idx, "rare", k=3).tolist()
    idx2 = idx.delete_docs(spark.createDataFrame([(base[0],)], "docid long"))
    after = sorted_topk(idx2, "rare", k=3).tolist()
    assert base[0] not in after
    assert after[:2] == base[1:3]


# ------------------------------------------------------------- check_index


def test_check_index_clean(idx):
    rep = check_index(idx)
    assert rep["status"] == "ok"
    assert rep["doc_count"] == 600
    assert not any(rep["violations"].values())
    assert rep["n_postings"] > rep["n_terms"]


def test_check_index_detects_corruption(idx, spark):
    from pyspark.sql import functions as F

    from lucene_spark.index import Index

    # corrupt df_local on one row
    bad = idx.postings.withColumn(
        "df_local",
        F.when(F.col("term") == "rare", F.col("df_local") + 1).otherwise(
            F.col("df_local")
        ),
    )
    idx2 = Index(docs=idx.docs, postings=bad, termdict=idx.termdict,
                 norms=idx.norms, doc_count=idx.doc_count,
                 sum_total_term_freq=idx.sum_total_term_freq,
                 seg_size=idx.seg_size)
    rep = check_index(idx2)
    assert rep["status"] == "corrupt"
    assert rep["violations"]["df_mismatch"] > 0
    # the inflated df_local also breaks the termdict rollup cross-check
    assert rep["violations"]["termdict"] > 0


# ------------------------------------------------------------- add_indexes


@pytest.fixture(scope="module")
def halves(spark):
    pdf = _corpus(600)
    a_docs = spark.createDataFrame(pdf.iloc[:350])
    b_docs = spark.createDataFrame(pdf.iloc[350:].assign(bid=range(250)))
    a = build_index(spark, a_docs, text_col="text", key_col="doc_id",
                    docid_col="doc_id", seg_size=64)
    b = build_index(spark, b_docs, text_col="text", key_col="doc_id",
                    docid_col="bid", seg_size=64)
    return a, b


def test_add_indexes_scores_match_single_build(halves, spark):
    a, b = halves
    combined = add_indexes(a, b)
    assert combined.doc_count == 600
    full = build_index(spark, spark.createDataFrame(_corpus(600)),
                       text_col="text", key_col="doc_id", docid_col="doc_id",
                       seg_size=64)
    for q in ["rare", "table AND hash", "table key"]:
        tc = search(combined, q, k=10, precision="float64")
        tf_ = search(full, q, k=10, precision="float64")
        # map combined docids -> original doc_id via the docs table url
        urls = {
            r["docid"]: int(r["url"])
            for r in combined.docs.filter(
                __import__("pyspark.sql.functions", fromlist=["col"]).col("docid")
                .isin([int(d) for d in tc.docids])
            ).collect()
        }
        assert [urls[int(d)] for d in tc.docids] == tf_.docids.tolist()
        assert tc.scores.tolist() == tf_.scores.tolist()


def test_add_indexes_is_metadata_only(halves):
    # the merged postings must be the union row-for-row: same blobs, shifted seg
    a, b = halves
    combined = add_indexes(a, b)
    assert combined.postings.count() == a.postings.count() + b.postings.count()
    n_segs_a = (a.doc_count + a.seg_size - 1) // a.seg_size
    max_b_seg = combined.postings.agg({"seg": "max"}).collect()[0][0]
    assert max_b_seg >= n_segs_a


def test_add_indexes_audit_clean(halves):
    a, b = halves
    rep = check_index(add_indexes(a, b))
    assert rep["status"] == "ok"


def test_split_index_inverse_of_add(spark):
    """IndexSplitter analog: split at a segment boundary, search each side,
    re-join with add_indexes — results identical to the unsplit index."""
    import pytest as _pt

    from lucene_spark.index import add_indexes, build_index, split_index
    from lucene_spark.search import count_hits, search

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} " + ("gamma " * (i % 3)), "en")
         for i in range(300)],
        "doc_id long, text string, lang string")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", seg_size=64)
    a, b = split_index(idx, at_seg=2)
    assert a.doc_count == 128 and b.doc_count == 172
    assert a.sum_total_term_freq + b.sum_total_term_freq == idx.sum_total_term_freq
    # side A: identical hits below the cut
    whole = search(idx, "gamma", k=300, precision="float64")
    ta = search(a, "gamma", k=300, precision="float64")
    want_a = [(d, s) for d, s in zip(whole.docids.tolist(), whole.scores.tolist())
              if d < 128]
    # scores differ (per-side stats) but the MATCH SET must partition
    assert sorted(ta.docids.tolist()) == sorted(d for d, _ in want_a)
    tb = search(b, "gamma", k=300, precision="float64")
    want_b = sorted(d - 128 for d in whole.docids.tolist() if d >= 128)
    assert sorted(tb.docids.tolist()) == want_b
    # counts partition exactly
    assert count_hits(a, "gamma") + count_hits(b, "gamma") == count_hits(idx, "gamma")
    # add_indexes(a, b) rebuilds the original: identical hit docids+scores
    rejoined = add_indexes(a, b)
    tr = search(rejoined, "gamma alpha", k=20, precision="float64")
    tw = search(idx, "gamma alpha", k=20, precision="float64")
    assert tr.docids.tolist() == tw.docids.tolist()
    assert tr.scores.tolist() == tw.scores.tolist()
    with _pt.raises(ValueError):
        split_index(idx, 0)
    with _pt.raises(ValueError):
        split_index(idx, 99)
