"""searchAfter cursor: page N via `after=` must equal the slice of one big
search (PagingTopScoreDocCollector contract, TopScoreDocCollector.java:120-158:
skip score > afterScore || (score == afterScore && docid <= afterDoc))."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.index import build_index
from lucene_spark.search import search


@pytest.fixture(scope="module")
def paged_index(spark):
    # repeated tokens so many docs share identical scores → the docid
    # tie-break inside a score class is actually exercised
    rows = []
    for i in range(60):
        text = "common " * (1 + i % 3) + ("rare " if i % 7 == 0 else "") + f"filler{i}"
        rows.append((f"u{i:03d}", text.strip()))
    docs = spark.createDataFrame(rows, "url string, text string")
    return build_index(spark, docs, seg_size=16, with_positions=True)


def _pages_equal_slices(idx, query, k, precision):
    full = search(idx, query, k=1000, precision=precision, prune=False)
    got_docids, got_scores, after = [], [], None
    for _ in range(1 + (len(full.docids) // k)):
        page = search(idx, query, k=k, precision=precision, prune=True, after=after)
        if len(page.docids) == 0:
            break
        got_docids.extend(page.docids.tolist())
        got_scores.extend(page.scores.tolist())
        after = (float(page.scores[-1]), int(page.docids[-1]))
    assert got_docids == full.docids.tolist()
    assert got_scores == pytest.approx(full.scores.tolist())


@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_paging_walks_entire_result_set(paged_index, precision):
    _pages_equal_slices(paged_index, "common", 7, precision)


def test_paging_or_query_with_ties(paged_index):
    _pages_equal_slices(paged_index, "common OR rare", 5, "lucene")


def test_paging_phrase_query(paged_index):
    _pages_equal_slices(paged_index, '"common common"', 4, "lucene")


def test_after_cursor_excludes_cursor_doc(paged_index):
    p1 = search(paged_index, "common", k=10, precision="float64")
    cursor = (float(p1.scores[-1]), int(p1.docids[-1]))
    p2 = search(paged_index, "common", k=10, precision="float64", after=cursor)
    assert set(p1.docids.tolist()).isdisjoint(p2.docids.tolist())
    # every page-2 hit is strictly after the cursor in (score desc, docid asc)
    for d, s in zip(p2.docids.tolist(), p2.scores.tolist()):
        assert s < cursor[0] or (s == cursor[0] and d > cursor[1])


def test_paging_with_deletes(paged_index, spark):
    # the deny-mask (tombstone) kernel path must honor the cursor too
    p_all = search(paged_index, "common", k=1000, precision="float64", prune=False)
    victim = int(p_all.docids[2])
    idx = paged_index.delete_docs(spark.createDataFrame([(victim,)], "docid long"))
    full = search(idx, "common", k=1000, precision="float64", prune=False)
    assert victim not in full.docids.tolist()
    p1 = search(idx, "common", k=6, precision="float64")
    p2 = search(idx, "common", k=6, precision="float64",
                after=(float(p1.scores[-1]), int(p1.docids[-1])))
    assert p1.docids.tolist() + p2.docids.tolist() == full.docids.tolist()[:12]


def test_search_many_afters_match_single_query_paging(paged_index):
    from lucene_spark.search import search_many

    qs = {"a": "common", "b": "common OR rare"}
    p1 = search_many(paged_index, qs, k=6, precision="lucene")
    afters = {q: (float(td.scores[-1]), int(td.docids[-1])) for q, td in p1.items()}
    p2 = search_many(paged_index, qs, k=6, precision="lucene", afters=afters)
    for q in qs:
        solo = search(paged_index, qs[q], k=6, precision="lucene", after=afters[q])
        assert p2[q].docids.tolist() == solo.docids.tolist()
        assert p2[q].scores.tolist() == pytest.approx(solo.scores.tolist())


def test_after_past_last_hit_returns_empty(paged_index):
    full = search(paged_index, "rare", k=1000, precision="float64", prune=False)
    last = (float(full.scores[-1]), int(full.docids[-1]))
    tail = search(paged_index, "rare", k=10, precision="float64", after=last)
    assert len(tail.docids) == 0
