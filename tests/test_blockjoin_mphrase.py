"""Block join, MultiPhraseQuery, CommonTermsQuery."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.blockjoin import block_join_parents
from lucene_spark.index import build_index
from lucene_spark.search import common_terms_query, multi_phrase, search


@pytest.fixture(scope="module")
def bj_index(spark):
    # blocks of 3 children + 1 parent: docids 0,1,2 are children of 3, etc.
    rows = []
    texts = ["alpha beta", "beta gamma", "alpha alpha beta", "PARENT marker"]
    for block in range(40):
        for j in range(4):
            did = block * 4 + j
            rows.append({
                "doc_id": did, "url": f"u{did}",
                "text": texts[j] if j < 3 else "parentdoc",
            })
    docs = spark.createDataFrame(pd.DataFrame(rows))
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", seg_size=16, with_positions=True)
    return idx, docs


def _parents(docs):
    return docs.filter(F.col("doc_id") % 4 == 3).select(F.col("doc_id").alias("docid"))


def _children(docs):
    return docs.filter(F.col("doc_id") % 4 != 3).select(F.col("doc_id").alias("docid"))


def test_block_join_modes(bj_index, spark):
    idx, docs = bj_index
    child = search(idx, "alpha", k=10**6, prune=False, precision="float64")
    cmap = dict(zip(child.docids.tolist(), child.scores.tolist()))
    for mode, agg in [("avg", np.mean), ("total", np.sum), ("max", np.max),
                      ("min", np.min)]:
        out = block_join_parents(idx, "alpha", _parents(docs), score_mode=mode,
                                 k=100, children=_children(docs),
                                 precision="float64")
        assert len(out) == 40  # every block has an alpha child
        for r in out.itertuples():
            p = int(r.parent_docid)
            kids = [cmap[c] for c in (p - 3, p - 2, p - 1) if c in cmap]
            assert r.score == pytest.approx(float(agg(kids)), rel=1e-12)
            assert r.n_children == len(kids)


def test_block_join_none_mode(bj_index):
    idx, docs = bj_index
    out = block_join_parents(idx, "alpha", _parents(docs), score_mode="none",
                             k=5, children=_children(docs))
    assert (out["score"] == 0).all()


def test_block_join_rejects_parent_match(bj_index):
    idx, docs = bj_index
    # 'parentdoc' matches parents themselves → illegal block, per reference
    with pytest.raises(Exception, match="must not match"):
        block_join_parents(idx, "parentdoc", _parents(docs), k=5)


def test_block_join_spans_segments(bj_index):
    # seg_size=16, block stride 4 → blocks never straddle a segment; the
    # cogroup-by-seg join must find every parent
    idx, docs = bj_index
    out = block_join_parents(idx, "gamma", _parents(docs), k=100,
                             children=_children(docs))
    assert len(out) == 40


# ------------------------------------------------------------- multi-phrase


@pytest.fixture(scope="module")
def mp_index(spark):
    rows = [
        ("u0", "big data table"), ("u1", "big search table"),
        ("u2", "big index"), ("u3", "data table big"),
        ("u4", "big data big search table"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    return build_index(spark, docs, with_positions=True, seg_size=4)


def test_multi_phrase_union_position(mp_index):
    td = search(mp_index, multi_phrase(["big", ["data", "search"]]), k=10)
    assert sorted(td.docids.tolist()) == [0, 1, 4]


def test_multi_phrase_three_positions(mp_index):
    td = search(mp_index, multi_phrase([["big", "data"], ["data", "search"], "table"]), k=10)
    # 'big data table' (0), 'big search table' (1), '... big search table' (4)
    assert sorted(td.docids.tolist()) == [0, 1, 4]


def test_multi_phrase_freq_counts_union_matches(mp_index):
    # doc 4: 'big data' at 0 and 'big search' at 2 → phrase freq 2
    td = search(mp_index, multi_phrase(["big", ["data", "search"]]), k=10,
                precision="float64")
    top = td.docids[0]
    assert top == 4  # freq 2 beats freq 1 (same dl ordering here)


def test_multi_phrase_missing_alternative_ok(mp_index):
    td = search(mp_index, multi_phrase(["big", ["data", "zzz"]]), k=10)
    assert sorted(td.docids.tolist()) == [0, 4]
    # all alternatives missing → no match
    td = search(mp_index, multi_phrase(["big", ["zzz", "qqq"]]), k=10)
    assert len(td.docids) == 0


def test_multi_phrase_prune_duel(mp_index):
    q = multi_phrase(["big", ["data", "search"]])
    a = search(mp_index, q, k=10, prune=True)
    b = search(mp_index, q, k=10, prune=False)
    assert a.docids.tolist() == b.docids.tolist()
    assert a.scores.tolist() == b.scores.tolist()


# ------------------------------------------------------------- common terms


@pytest.fixture(scope="module")
def ct_index(spark):
    rows = []
    for i in range(100):
        toks = ["common"]  # df = 100%
        if i % 10 == 0:
            toks.append("rare")  # df = 10%
        if i % 2 == 0:
            toks.append("half")  # df = 50%
        rows.append((f"u{i:03d}", " ".join(toks)))
    docs = spark.createDataFrame(rows, "url string, text string")
    return build_index(spark, docs, seg_size=32)


def test_common_terms_partitions_by_df(ct_index):
    node = common_terms_query(ct_index, "rare common", max_term_frequency=0.4)
    # rare (10%) → required low clause; common (100%) → optional high clause
    td = search(ct_index, node, k=100, precision="float64")
    assert len(td.docids) == 10  # only docs with 'rare'
    # score includes the common term's contribution
    only_rare = search(ct_index, "rare", k=100, precision="float64")
    assert td.scores[0] > only_rare.scores[0]


def test_common_terms_all_high_becomes_conjunction(ct_index):
    node = common_terms_query(ct_index, "common half", max_term_frequency=0.2)
    td = search(ct_index, node, k=100)
    assert len(td.docids) == 50  # AND of the two common terms


def test_common_terms_absolute_cutoff(ct_index):
    node = common_terms_query(ct_index, "rare half", max_term_frequency=30.0)
    # absolute: df > 30 → half (50) is high, rare (10) is low
    td = search(ct_index, node, k=100)
    assert len(td.docids) == 10


def test_to_child_block_join(bj_index):
    """ToChildBlockJoinQuery: every 'parentdoc' hit propagates its score to
    the 3 children of its block; child docids are (prevParent, parent)."""
    from lucene_spark.blockjoin import block_join_children

    idx, docs = bj_index
    psc = search(idx, "parentdoc", k=10**6, prune=False, precision="float64")
    pmap = dict(zip(psc.docids.tolist(), psc.scores.tolist()))
    out = block_join_children(idx, "parentdoc", _parents(docs), k=10**6,
                              precision="float64")
    assert len(out) == 40 * 3
    for r in out.itertuples():
        p = int(r.parent_docid)
        assert int(r.child_docid) in (p - 3, p - 2, p - 1)
        assert r.score == pytest.approx(pmap[p], rel=0)
    # top-k ordering: score desc, child docid asc
    top = block_join_children(idx, "parentdoc", _parents(docs), k=5,
                              precision="float64")
    pairs = list(zip(top["score"], top["child_docid"]))
    assert pairs == sorted(pairs, key=lambda t: (-t[0], t[1]))


def test_to_child_rejects_nonparent_match(bj_index):
    from lucene_spark.blockjoin import block_join_children

    idx, docs = bj_index
    # 'alpha' matches child docs -> parent query is illegal unless composed
    # with the parent filter
    with pytest.raises(Exception, match="must not match"):
        block_join_children(idx, "alpha", _parents(docs), k=5)
    # the reference's suggested +query +filter composition: no parent
    # matches 'alpha', so the join is empty rather than illegal
    out = block_join_children(idx, "alpha", _parents(docs), k=5,
                              filter_to_parents=True)
    assert len(out) == 0


def test_parent_children_basic(bj_index, spark):
    # children of parent 7 (block 1: docids 4,5,6) matching 'alpha'
    from lucene_spark.blockjoin import parent_children

    idx, docs = bj_index
    child = search(idx, "alpha", k=10**6, prune=False, precision="float64")
    cmap = dict(zip(child.docids.tolist(), child.scores.tolist()))
    out = parent_children(idx, "alpha", _parents(docs), 7, k=10,
                          precision="float64")
    got = {int(r.child_docid): r.score for r in out.itertuples()}
    assert set(got) == {4, 6}  # texts 0 and 2 contain alpha, text 1 not
    for d, s in got.items():
        assert s == pytest.approx(cmap[d], rel=1e-12)
    # sorted score desc: doc 6 ('alpha alpha beta') beats doc 4
    assert out["child_docid"].tolist()[0] == 6


def test_parent_children_early_exits(bj_index, spark):
    from lucene_spark.blockjoin import parent_children

    idx, docs = bj_index
    parents = _parents(docs)
    # parent at a segment start (docid 16*k) has no children by contract
    # (ParentChildrenBlockJoinQuery.java:124-128); nearest parent docid at
    # a seg start here: none are (parents are %4==3), so craft one: treat
    # doc 16 as the parent id — localParentDocId == 0 -> empty
    assert len(parent_children(idx, "alpha", parents, 16, k=10)) == 0
    # adjacent parents -> firstChild == parent -> empty: add docid 2 as a
    # parent so parent 3's first child becomes 3 itself
    aug = parents.union(spark.createDataFrame([(2,)], "docid long"))
    assert len(parent_children(idx, "alpha", aug, 3, k=10)) == 0
    # per-leaf bitset floor: parent 19 sits in segment [16, 32); its
    # previous parent 15 is in the PREVIOUS segment, so firstChild floors
    # at the segment start 16 (the reference's per-leaf prevSetBit)
    out = parent_children(idx, "alpha", parents, 19, k=10, precision="float64")
    assert set(out["child_docid"].tolist()) == {16, 18}
