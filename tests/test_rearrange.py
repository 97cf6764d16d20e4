"""Index surgery (misc/index/PKIndexSplitter.java,
MultiPassIndexSplitter.java, IndexRearranger.java)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lucene_spark.index import build_index
from lucene_spark.rearrange import (
    multipass_split_index,
    pk_split_index,
    rearrange_index,
)
from lucene_spark.search import search


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("u%d" % i,
         ("alpha beta " if i % 2 == 0 else "gamma delta ") * (i % 3 + 1)
         + ("dup " * (i % 4)),
         "en" if i % 3 == 0 else ("fr" if i % 3 == 1 else "de"))
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "url string, text string, lang string")


@pytest.fixture(scope="module")
def idx(spark, corpus):
    return build_index(spark, corpus.select("url", "text"), seg_size=8)


def _url_scores(index, q, k=30):
    td = search(index, q, k=k, precision="float64", prune=True)
    urls = {r["docid"]: r["url"] for r in index.docs.collect()}
    return {urls[int(d)]: round(float(s), 9)
            for d, s in zip(td.docids, td.scores)}


def test_pk_split(spark, idx):
    t1, t2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        a, b = pk_split_index(spark, idx, "alpha", t1, t2, seg_size=8)
        # 'alpha' docs are the even urls: 15 of 30
        assert a.doc_count == 15 and b.doc_count == 15
        assert a.doc_count + b.doc_count == idx.doc_count
        # part stats rebuilt over survivors
        assert a.sum_total_term_freq + b.sum_total_term_freq == \
            idx.sum_total_term_freq
        # part A is searchable and contains only alpha docs
        td = search(a, "alpha", k=30, precision="float64")
        assert len(td.docids) == 15
        assert search(b, "alpha", k=5).docids.size == 0
    finally:
        shutil.rmtree(t1, ignore_errors=True)
        shutil.rmtree(t2, ignore_errors=True)


def test_multipass_split_roundrobin_and_seq(spark, idx):
    dirs = [tempfile.mkdtemp() for _ in range(3)]
    try:
        parts = multipass_split_index(spark, idx, dirs, seq=False, seg_size=8)
        assert [p.doc_count for p in parts] == [10, 10, 10]
        # round-robin: part i holds source docids ≡ i (mod 3) — verify via
        # the preserved url channel
        urls0 = {r["url"] for r in parts[0].docs.collect()}
        want0 = {r["url"] for r in
                 idx.docs.filter(F.col("docid") % 3 == 0).collect()}
        assert urls0 == want0
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
    dirs = [tempfile.mkdtemp() for _ in range(4)]
    try:
        # seq: 30 docs over 4 parts → 7,7,7,9 (last takes the remainder,
        # MultiPassIndexSplitter.java:93)
        parts = multipass_split_index(spark, idx, dirs, seq=True, seg_size=8)
        assert [p.doc_count for p in parts] == [7, 7, 7, 9]
        urls_last = {r["url"] for r in parts[-1].docs.collect()}
        want_last = {r["url"] for r in
                     idx.docs.filter(F.col("docid") >= 21).collect()}
        assert urls_last == want_last
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)


def test_rearrange_by_selector(spark, corpus, idx):
    docmap = idx.docs.select("docid", "url").join(
        corpus.select("url", "lang"), "url")
    sels = [docmap.filter(F.col("lang") == l).select("docid")
            for l in ("en", "fr", "de")]
    out = rearrange_index(idx, sels, seg_size=32)
    assert out.doc_count == 30
    # one segment per selector, docs in source order within each
    segs = {int(r["docid"]) // 32 for r in out.docs.collect()}
    assert segs == {0, 1, 2}
    n_per_seg = out.docs.groupBy((F.col("docid") / 32).cast("long")
                                 .alias("seg")).count().collect()
    assert sorted(r["count"] for r in n_per_seg) == [10, 10, 10]
    # search results identical modulo renumbering (url-keyed)
    assert _url_scores(out, "alpha OR dup") == _url_scores(idx, "alpha OR dup")
    assert _url_scores(out, "gamma AND delta") == \
        _url_scores(idx, "gamma AND delta")


def test_rearrange_preserves_positions(spark, corpus):
    idx = build_index(spark, corpus.select("url", "text"), seg_size=8,
                      with_positions=True)
    docmap = idx.docs.select("docid", "url").join(
        corpus.select("url", "lang"), "url")
    sels = [docmap.filter(F.col("lang") == l).select("docid")
            for l in ("en", "fr", "de")]
    out = rearrange_index(idx, sels, seg_size=32)
    assert _url_scores(out, '"alpha beta"') == _url_scores(idx, '"alpha beta"')


def test_rearrange_rejects_overlap_and_oversize(spark, idx):
    ids = idx.docs.select("docid")
    with pytest.raises(ValueError, match="overlap"):
        rearrange_index(idx, [ids.limit(5), ids.limit(3)], seg_size=32)
    with pytest.raises(ValueError, match="seg_size"):
        rearrange_index(idx, [ids], seg_size=8)
