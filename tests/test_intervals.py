"""Interval queries: semantics duels + Spark end-to-end.

The walks in lucene_spark/intervals.py transliterate the reference's lazy
iterators (OrderedIntervalsSource.java:133-171, UnorderedIntervalsSource.
java:152-182, DisjunctionIntervalsSource.java:223-245).  These tests pin:

  - the unordered walk == the brute-force minimal-interval set (it is exact
    for every arity — fuzzed);
  - the ordered walk == minimal set for TWO single-position sources (the
    property the DuckDB gate oracles rely on), and its documented LAZY
    under-enumeration for 3+ sources (hand-pinned traces);
  - vectorized fast paths (or-of-terms, unordered pair, phrase block)
    == the per-doc walks / brute force;
  - filters, containment, extend, scoring, and the pruned Spark path ==
    the exhaustive path (CheckHits-style duel).
"""

from itertools import product
import random

import numpy as np
import pytest

from lucene_spark.intervals import (
    _unordered_pair_single_pos,
    _walk_ordered,
    _walk_unordered,
    interval_eval,
    interval_min_extent,
    interval_query,
    interval_required_groups,
    interval_stream,
    interval_terms,
    iv_contained_by,
    iv_containing,
    iv_extend,
    iv_maxgaps,
    iv_maxwidth,
    iv_not_contained_by,
    iv_not_containing,
    iv_or,
    iv_ordered,
    iv_phrase,
    iv_prefix,
    iv_term,
    iv_unordered,
    iv_unordered_no_overlaps,
)


def corpus_arrays(docs_tokens):
    terms = sorted({t for toks in docs_tokens for t in toks})
    postings, positions = {}, {}
    for t in terms:
        ds, fs, dls, pos = [], [], [], []
        for d, toks in enumerate(docs_tokens):
            ps = [i for i, w in enumerate(toks) if w == t]
            if ps:
                ds.append(d)
                fs.append(len(ps))
                dls.append(len(toks))
                pos.extend(ps)
        postings[t] = (
            np.array(ds, dtype=np.int64),
            np.array(fs, dtype=np.int64),
            np.array(dls, dtype=np.int64),
        )
        positions[t] = np.array(pos, dtype=np.int64)
    return postings, positions


def brute_min_unord(subsets):
    cands = set()
    for combo in product(*subsets):
        cands.add((min(combo), max(combo)))
    return sorted(
        c for c in cands
        if not any(o != c and o[0] >= c[0] and o[1] <= c[1] for o in cands)
    )


def brute_min_ord(subsets):
    cands = set()
    for combo in product(*subsets):
        if all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
            cands.add((combo[0], combo[-1]))
    return sorted(
        c for c in cands
        if not any(o != c and o[0] >= c[0] and o[1] <= c[1] for o in cands)
    )


def _subs(subsets):
    return [
        (np.array(s, dtype=np.int64), np.array(s, dtype=np.int64),
         np.zeros(len(s), dtype=np.int64))
        for s in subsets
    ]


# ---------------------------------------------------------------- walk duels


def test_unordered_walk_is_minimal_fuzz():
    rng = random.Random(7)
    for _ in range(800):
        n = rng.choice([2, 2, 3, 4])
        subsets = [sorted(rng.sample(range(14), rng.randint(1, 5)))
                   for _ in range(n)]
        ws, we, _ = _walk_unordered(_subs(subsets))
        assert sorted(zip(ws, we)) == brute_min_unord(subsets), subsets


def test_ordered_walk_minimal_for_pairs_fuzz():
    rng = random.Random(8)
    for _ in range(800):
        subsets = [sorted(rng.sample(range(14), rng.randint(1, 5)))
                   for _ in range(2)]
        ws, we, wg = _walk_ordered(_subs(subsets))
        assert sorted(zip(ws, we)) == brute_min_ord(subsets), subsets
        for s, e, g in zip(ws, we, wg):
            assert g == e - s - 1  # gaps = width − 2 for two single positions


def test_ordered_walk_lazy_enumeration_pinned():
    # The reference iterator's monotone cursors skip chains whose sub
    # positions were passed over (see module docstring) — pin the lazy
    # behavior so a "fix" toward full minimality fails loudly.
    ws, we, _ = _walk_ordered(_subs([[3, 4], [4, 6, 8], [3, 5, 7]]))
    assert list(zip(ws, we)) == [(3, 5)]  # NOT [(3,5), (4,7)]
    ws, we, _ = _walk_ordered(_subs([[0, 1, 3, 10], [2, 3, 10], [6, 9, 10, 11]]))
    assert list(zip(ws, we)) == [(1, 6)]
    # and every emission is still a valid ordered match
    rng = random.Random(9)
    for _ in range(400):
        n = rng.choice([3, 4])
        subsets = [sorted(rng.sample(range(12), rng.randint(1, 4)))
                   for _ in range(n)]
        ws, we, _ = _walk_ordered(_subs(subsets))
        minimal = brute_min_ord(subsets)
        got = sorted(zip(ws, we))
        assert set(got) <= set(minimal) or all(
            any(c[0] >= s and c[1] <= e for c in minimal) for s, e in got
        )
        # match decision is exact: a chain exists iff the walk emits
        assert bool(minimal) == bool(got), subsets


def test_unordered_pair_vectorized_matches_walk_fuzz():
    rng = random.Random(10)
    for _ in range(800):
        subsets = [sorted(rng.sample(range(14), rng.randint(1, 5)))
                   for _ in range(2)]
        ws, we, wg = _walk_unordered(_subs(subsets))
        streams = [
            (np.zeros(len(s), np.int64), np.array(s, dtype=np.int64),
             np.array(s, dtype=np.int64), np.zeros(len(s), np.int64))
            for s in subsets
        ]
        d, s, e, g = _unordered_pair_single_pos(*streams)
        assert sorted(zip(s.tolist(), e.tolist(), g.tolist())) == sorted(
            zip(ws, we, wg)
        ), subsets


# ------------------------------------------------------------- stream algebra


DOCS = [
    "a b c a d b".split(),
    "b a a c".split(),
    "c c d".split(),
]
PBT, POS = corpus_arrays(DOCS)


def sl(st):
    return [tuple(int(v) for v in x) for x in zip(*st)]


def test_term_and_or_streams():
    assert sl(interval_stream(iv_term("d"), PBT, POS)) == [(0, 4, 4, 0), (2, 2, 2, 0)]
    # or-of-terms = per-doc unique positions (duplicate suppression)
    got = sl(interval_stream(iv_or("a", "d"), PBT, POS))
    assert got == [(0, 0, 0, 0), (0, 3, 3, 0), (0, 4, 4, 0),
                   (1, 1, 1, 0), (1, 2, 2, 0), (2, 2, 2, 0)]


def test_or_general_matches_fast_path():
    # wrapping a sub in a no-op maxgaps forces the general suppression walk
    fast = sl(interval_stream(iv_or("a", "b"), PBT, POS))
    slow = sl(interval_stream(
        iv_or(iv_maxgaps(99, iv_term("a")), iv_term("b")), PBT, POS))
    assert sorted(fast) == sorted(slow)


def test_ordered_general_matches_term_path():
    fast = sl(interval_stream(iv_ordered("a", "b"), PBT, POS))
    slow = sl(interval_stream(
        iv_ordered(iv_maxgaps(99, iv_term("a")), iv_term("b")), PBT, POS))
    assert fast == slow
    assert fast == [(0, 0, 1, 0), (0, 3, 5, 1)]


def test_unordered_nary_and_pair():
    got = sl(interval_stream(iv_unordered("a", "b"), PBT, POS))
    assert got == [(0, 0, 1, 0), (0, 1, 3, 1), (0, 3, 5, 1), (1, 0, 1, 0)]
    got3 = sl(interval_stream(iv_unordered("a", "b", "c"), PBT, POS))
    # doc0: minimal covering {a,b,c}: [1,3] (b1,c2,a3); [2,5]? contains c2,a3,b5
    # — minimal set from the walk
    ws, we, wg = _walk_unordered(_subs([[0, 3], [1, 5], [2]]))
    assert [(0, s, e, g) for s, e, g in zip(ws, we, wg)] + [
        (1, s, e, g) for s, e, g in zip(*_walk_unordered(_subs([[1, 2], [0], [3]])))
    ] == got3


def test_phrase_block():
    assert sl(interval_stream(iv_phrase("a", "b"), PBT, POS)) == [(0, 0, 1, 0)]
    assert sl(interval_stream(iv_phrase("a", "a"), PBT, POS)) == [(1, 1, 2, 0)]
    assert sl(interval_stream(iv_phrase("c", "c"), PBT, POS)) == [(2, 0, 1, 0)]


def test_filters_and_extend():
    base = iv_ordered("a", "b")
    assert sl(interval_stream(iv_maxgaps(0, base), PBT, POS)) == [(0, 0, 1, 0)]
    assert sl(interval_stream(iv_maxwidth(2, base), PBT, POS)) == [(0, 0, 1, 0)]
    got = sl(interval_stream(iv_extend(iv_term("c"), 2, 1), PBT, POS))
    assert got == [(0, 0, 3, 0), (1, 1, 4, 0), (2, 0, 1, 0), (2, 0, 2, 0)]


def test_containment():
    big = iv_ordered("b", "c")
    got = sl(interval_stream(iv_containing(big, iv_term("a")), PBT, POS))
    assert got == [(1, 0, 3, 2)]
    got = sl(interval_stream(iv_contained_by(iv_term("a"), big), PBT, POS))
    assert got == [(1, 1, 1, 0), (1, 2, 2, 0)]
    got = sl(interval_stream(iv_not_containing(big, iv_term("a")), PBT, POS))
    assert got == [(0, 1, 2, 0)]
    got = sl(interval_stream(iv_not_contained_by(iv_term("a"), big), PBT, POS))
    assert got == [(0, 0, 0, 0), (0, 3, 3, 0)]


def test_unordered_no_overlaps_is_or_of_ordered():
    node = iv_unordered_no_overlaps(iv_term("a"), iv_term("b"))
    assert node[0] == "i_or"
    got = sl(interval_stream(node, PBT, POS))
    assert (1, 0, 1, 0) in got  # b a in doc1 (ordered(b,a))


def test_min_extent():
    assert interval_min_extent(iv_term("a")) == 1
    assert interval_min_extent(iv_ordered("a", "b", "c")) == 3
    assert interval_min_extent(iv_or(iv_term("a"), iv_ordered("b", "c"))) == 1
    assert interval_min_extent(iv_extend(iv_term("a"), 2, 1)) == 4
    assert interval_min_extent(iv_maxgaps(1, iv_unordered("a", "b"))) == 2


def test_terms_and_groups():
    n = iv_not_containing(iv_ordered("a", "b"), iv_term("c"))
    assert interval_terms(n) == ["a", "b", "c"]
    assert interval_required_groups(n) == [["a"], ["b"]]
    assert interval_required_groups(iv_or("a", "b")) == [["a", "b"]]


# ---------------------------------------------------------------- scoring


def test_eval_saturation_scoring():
    node = interval_query(iv_maxgaps(1, iv_ordered("a", "b")))
    from lucene_spark.search import rewrite

    node = rewrite(node, frozenset())
    d, s = interval_eval(node, PBT, POS, "float64")
    # doc0 intervals [0,1] g0 and [3,5] g1; minExtent 2
    # freq = 1/max(2-2+1,1) + 1/max(3-2+1,1) = 1.5; score = 1 - 1/2.5
    assert d.tolist() == [0]
    assert s[0] == pytest.approx(1 - 1 / 2.5)


def test_eval_sigmoid_and_boost():
    node = interval_query(iv_term("d"), pivot=2.0, exp=2.0, boost=3.0)
    from lucene_spark.search import rewrite

    node = rewrite(node, frozenset())
    d, s = interval_eval(node, PBT, POS, "float64")
    # freq = 1 in both docs; sigmoid = 3 * (1 - 4/(1+4)) = 3/5
    assert d.tolist() == [0, 2]
    assert np.allclose(s, 3.0 * (1 - 4.0 / 5.0))


def test_float32_accumulation_mode():
    node = interval_query(iv_term("a"))
    from lucene_spark.search import rewrite

    node = rewrite(node, frozenset())
    d32, s32 = interval_eval(node, PBT, POS, "lucene")
    d64, s64 = interval_eval(node, PBT, POS, "float64")
    assert d32.tolist() == d64.tolist()
    assert np.allclose(s32, s64, rtol=1e-6)
    assert s32.dtype == np.float64  # float32 steps, float64 carrier


# ---------------------------------------------------------------- rewrite


def test_rewrite_analysis_and_nomatch_folding():
    from lucene_spark.search import rewrite
    from lucene_spark.analysis import ENGLISH_STOP_WORDS

    # stopword sub kills a conjunction, survives in or
    node = rewrite(interval_query(iv_ordered("The", "Table")), ENGLISH_STOP_WORDS)
    assert node is None
    node = rewrite(interval_query(iv_or("the", "table")), ENGLISH_STOP_WORDS)
    assert node[1] == ("iterm", "table")
    # subtracted stopword side vanishes
    node = rewrite(
        interval_query(iv_not_containing(iv_ordered("big", "cat"), iv_term("the"))),
        ENGLISH_STOP_WORDS,
    )
    assert node[1] == ("i_ord", [("iterm", "big"), ("iterm", "cat")])
    # multi-token text becomes a block source
    node = rewrite(interval_query(iv_term("big cat")), ENGLISH_STOP_WORDS)
    assert node[1] == ("i_block", [("iterm", "big"), ("iterm", "cat")])


# ---------------------------------------------------------------- Spark e2e


def _iv_corpus():
    rng = np.random.default_rng(11)
    vocab = ["table", "hash", "part", "key", "scan", "the", "window",
             "partition", "tab"]
    docs_tokens = [
        [vocab[j] for j in rng.integers(0, len(vocab), rng.integers(8, 40))]
        for _ in range(300)
    ]
    return docs_tokens


@pytest.fixture(scope="module")
def interval_index(spark):
    import pandas as pd

    from lucene_spark.index import build_index

    rows = [
        {"doc_id": i, "url": f"u{i}", "text": " ".join(toks)}
        for i, toks in enumerate(_iv_corpus())
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    return build_index(
        spark, docs, text_col="text", key_col="doc_id", docid_col="doc_id",
        seg_size=64, with_positions=True,
    )


def _brute_interval_topk(node, docs_tokens, k=10):
    """Oracle: evaluate per doc over the raw token lists."""
    pbt, pos = corpus_arrays(docs_tokens)
    d, s = interval_eval(node, pbt, pos, "float64")
    order = np.lexsort((d, -s))[:k]
    return d[order].tolist(), s[order].tolist()


def test_spark_interval_pruned_equals_exhaustive(spark, interval_index):
    from lucene_spark.search import search

    queries = [
        interval_query(iv_maxgaps(4, iv_ordered("table", "hash"))),
        interval_query(iv_unordered("window", "scan")),
        interval_query(iv_or("table", "partition")),
        interval_query(iv_contained_by(iv_term("key"),
                                       iv_maxgaps(6, iv_ordered("table", "part")))),
        interval_query(iv_phrase("hash", "table")),
    ]
    for q in queries:
        pruned = search(interval_index, q, k=10, prune=True, precision="float64")
        exact = search(interval_index, q, k=10, prune=False, precision="float64")
        assert pruned.docids.tolist() == exact.docids.tolist(), q
        assert np.allclose(pruned.scores, exact.scores), q


def test_spark_interval_matches_brute_force(spark, interval_index):
    from lucene_spark.analysis import ENGLISH_STOP_WORDS, analyze_with_positions
    from lucene_spark.search import rewrite, search

    # analyze exactly as the index does — stopword removal leaves position
    # gaps (StopFilter position increments), which intervals must see
    pbt, pos = {}, {}
    acc: dict = {}
    for d, toks in enumerate(_iv_corpus()):
        ts, ps = analyze_with_positions(" ".join(toks), ENGLISH_STOP_WORDS)
        for t, p in zip(ts, ps):
            acc.setdefault(t, []).append((d, p))
    for t, dps in acc.items():
        dps.sort()
        docs = sorted({d for d, _ in dps})
        freqs = [sum(1 for d, _ in dps if d == dd) for dd in docs]
        pbt[t] = (np.array(docs, np.int64), np.array(freqs, np.int64),
                  np.ones(len(docs), np.int64))
        pos[t] = np.array([p for _, p in dps], np.int64)
    raw = interval_query(iv_maxgaps(4, iv_ordered("table", "hash")))
    node = rewrite(raw, ENGLISH_STOP_WORDS)
    d, s = interval_eval(node, pbt, pos, "float64")
    order = np.lexsort((d, -s))[:10]
    td = search(interval_index, raw, k=10, prune=True, precision="float64")
    assert td.docids.tolist() == d[order].tolist()
    assert np.allclose(td.scores, s[order])


def test_spark_interval_in_boolean_and_search_many(spark, interval_index):
    from lucene_spark.search import search, search_many

    q = interval_query(iv_unordered("window", "scan"))
    td1 = search(interval_index, q, k=5)
    out = search_many(interval_index, {"iv": q, "t": "table"}, k=5)
    assert out["iv"].docids.tolist() == td1.docids.tolist()
    assert np.allclose(out["iv"].scores, td1.scores)


def test_spark_interval_multiterm_expansion(spark, interval_index):
    from lucene_spark.search import search

    q = interval_query(iv_maxgaps(8, iv_ordered(iv_prefix("tab"), iv_term("hash"))))
    td = search(interval_index, q, k=10, prune=True, precision="float64")
    exact = search(interval_index, q, k=10, prune=False, precision="float64")
    assert td.docids.tolist() == exact.docids.tolist()
    assert len(td.docids) > 0


@pytest.mark.parametrize("seed", range(6))
def test_unordered_nary_batch_matches_walk(seed):
    """The lockstep n-ary single-position unordered batch emits the exact
    per-doc interval sequence (same order — float32 freq accumulation
    depends on it) as the faithful queue-walk transliteration."""
    import numpy as np

    from lucene_spark.intervals import (
        _doc_slices,
        _unordered_nary_single_pos,
        _walk_unordered,
    )

    rng = np.random.default_rng(3100 + seed)
    for _ in range(40):
        n = int(rng.integers(3, 6))
        ndocs = int(rng.integers(1, 15))
        subs = []
        for _j in range(n):
            ds, ps = [], []
            for d in range(ndocs):
                k = int(rng.integers(0, 6))
                pp = np.sort(rng.choice(25, size=k, replace=False)).astype(np.int64)
                ds.extend([d] * k)
                ps.extend(pp.tolist())
            d_arr = np.array(ds, dtype=np.int64)
            p_arr = np.array(ps, dtype=np.int64)
            subs.append((d_arr, p_arr, p_arr.copy(), np.zeros(len(p_arr), np.int64)))
        cand = np.unique(subs[0][0])
        for s in subs[1:]:
            cand = cand[np.isin(cand, s[0])]
        if len(cand) == 0:
            continue
        got = _unordered_nary_single_pos(subs, cand)
        bounds = [_doc_slices(s, cand) for s in subs]
        for ci in range(len(cand)):
            per = []
            for (lo, hi), (d, st, en, gp) in zip(bounds, subs):
                a, b = int(lo[ci]), int(hi[ci])
                per.append((st[a:b], en[a:b], gp[a:b]))
            ss, ee, _gg = _walk_unordered(per)
            m = got[0] == cand[ci]
            assert got[1][m].tolist() == ss
            assert got[2][m].tolist() == ee


# ------------------------------------------------- atLeast / positional filters

def test_atleast_hand_traces():
    from lucene_spark.intervals import _walk_atleast

    # distinct single occurrences: consecutive m-windows
    assert _walk_atleast(_subs([[1], [3], [5]]), 2) == ([1, 3], [3, 5], [1, 1])
    # tie + exhaust quirk: when the lead exhausts in the start-advancing
    # loop the background queue is NOT consulted (java:219-227) — c(7)
    # is never reached
    assert _walk_atleast(_subs([[2], [2], [7]]), 2) == ([2], [2], [-1])
    # multi-occurrence lead re-enters through the background queue
    assert _walk_atleast(_subs([[1, 10], [3], [5]]), 2) == (
        [1, 3, 5], [3, 5, 10], [1, 1, 4])


def test_atleast_m2_closed_form_fuzz():
    """For m=2 over single-position sources with globally distinct positions
    (always true for distinct terms of one field), the
    MinimumShouldMatchIntervalIterator walk emits exactly the consecutive
    hetero-source pairs of the merged position list — the closed form the
    DuckDB gate oracle encodes."""
    from lucene_spark.intervals import _walk_atleast

    rng = random.Random(7)
    for _ in range(2000):
        n = rng.choice([2, 3, 3, 4])
        used: set[int] = set()
        pls = []
        for _i in range(n):
            k = rng.randint(1, 4)
            ps: set[int] = set()
            while len(ps) < k:
                p = rng.randint(0, 20)
                if p not in used:
                    ps.add(p)
                    used.add(p)
            pls.append(sorted(ps))
        ws, we, wg = _walk_atleast(_subs(pls), 2)
        merged = sorted(
            (p, i) for i, pl in enumerate(pls) for p in pl)
        exp = [(a, b) for (a, la), (b, lb) in zip(merged, merged[1:])
               if la != lb]
        assert list(zip(ws, we)) == exp
        assert wg == [b - a - 1 for a, b in exp]


def test_atleast_factory_rewrites_and_stream():
    from lucene_spark.intervals import iv_at_least

    assert iv_at_least(2, "a", "b")[0] == "i_unord"
    assert iv_at_least(3, "a", "b")[0] == "i_none"
    with pytest.raises(ValueError):
        iv_at_least(0, "a", "b")
    docs = [["a", "x", "b", "x", "c"], ["a", "x", "x", "x", "b"],
            ["c", "x", "x", "x", "x", "a"], ["a"]]
    post, pos = corpus_arrays(docs)
    d, s, e, g = interval_stream(iv_at_least(2, "a", "b", "c"), post, pos)
    # doc0: merged a0 b2 c4 -> (0,2),(2,4); doc1: a0 b4 -> (0,4);
    # doc2: c0 a5 -> (0,5); doc3: only 'a' -> below minShouldMatch
    assert d.tolist() == [0, 0, 1, 2]
    assert s.tolist() == [0, 2, 0, 0]
    assert e.tolist() == [2, 4, 4, 5]


def test_atleast_min_extent_and_groups():
    from lucene_spark.intervals import iv_at_least

    src = iv_at_least(2, iv_ordered("a", "b"), iv_term("c"), iv_term("d"))
    # sub extents [2, 1, 1] sorted -> 1 + 1
    assert interval_min_extent(src) == 2
    assert interval_required_groups(src) == [["a", "b", "c", "d"]]
    assert sorted(interval_terms(src)) == ["a", "b", "c", "d"]


def test_before_after_offset_semantics():
    from lucene_spark.intervals import iv_after, iv_before

    docs = [["r", "s", "x", "r", "s"], ["s", "r"], ["r"], ["s"]]
    post, pos = corpus_arrays(docs)
    # before(s, r): s positions p with p <= max(0, r-1) over some r
    # doc0: r at 0,3 -> big ends max(0,-1)=0 and 2 -> s@1 qualifies (<=2),
    #        s@4 does not; doc1: r@1 -> big [0,0] -> s@0 qualifies
    d, s, e, g = interval_stream(iv_before("s", "r"), post, pos)
    assert list(zip(d.tolist(), s.tolist())) == [(0, 1), (1, 0)]
    # the position-0 quirk: ref at 0 gives big [0, max(0,-1)] = [0,0], so a
    # source occurrence AT 0 counts as "before" a reference at 0
    docs2 = [["rs", "x"]]  # impossible same-pos in real corpora; emulate:
    post2, pos2 = corpus_arrays([["s", "r"]])
    d2, s2, _, _ = interval_stream(iv_before("s", "r"), post2, pos2)
    assert (d2.tolist(), s2.tolist()) == ([0], [0])
    # after(s, r): s positions p with p >= min(r)+1
    d3, s3, _, _ = interval_stream(iv_after("s", "r"), post, pos)
    assert list(zip(d3.tolist(), s3.tolist())) == [(0, 1), (0, 4)]


def test_overlapping_non_overlapping_not_within():
    from lucene_spark.intervals import (
        iv_non_overlapping, iv_not_within, iv_overlapping)

    docs = [["a", "b", "k", "x", "a", "b"], ["a", "b", "x", "k"],
            ["a", "b"], ["k", "a", "b"]]
    post, pos = corpus_arrays(docs)
    big = iv_ordered("a", "b")  # pairs (0,1) and (4,5) in doc0, etc.
    # overlapping(ordered(a,b), k): conjunction — doc2 (no k) drops; a pair
    # overlaps k only when k's position falls inside [s, e]
    d, s, e, _ = interval_stream(iv_overlapping(big, "k"), post, pos)
    assert len(d) == 0  # k never falls inside a minimal (a,b) pair here
    wide = iv_ordered("a", "x")
    d, s, e, _ = interval_stream(iv_overlapping(wide, "k"), post, pos)
    # doc0 pair (0,3) contains k@2; doc1 pair (0,2) does not contain k@3
    assert (d.tolist(), s.tolist(), e.tolist()) == ([0], [0], [3])
    # nonOverlapping: difference — doc2 keeps its pair though k is absent
    d, s, e, _ = interval_stream(iv_non_overlapping(big, "k"), post, pos)
    assert set(zip(d.tolist(), s.tolist(), e.tolist())) == {
        (0, 0, 1), (0, 4, 5), (1, 0, 1), (2, 0, 1), (3, 1, 2)}
    # notWithin(a-b pair, 1, k): pairs with no k within 1 position of [s,e]
    d, s, e, _ = interval_stream(iv_not_within(big, 1, "k"), post, pos)
    # doc0 (0,1): k@2 within 1 -> dropped; (4,5): k@2 is 2 away -> kept
    # doc1 (0,1): k@3 is 2 away -> kept; doc3 (1,2): k@0 within 1 -> dropped
    assert set(zip(d.tolist(), s.tolist(), e.tolist())) == {
        (0, 4, 5), (1, 0, 1), (2, 0, 1)}


def test_new_sources_rewrite_and_field_prefix():
    from lucene_spark.intervals import iv_at_least, iv_before
    from lucene_spark.search import _iv_analyze, _iv_prefix_field

    # stopword sub drops out of atLeast; fewer than m left -> no match
    src = _iv_analyze(iv_at_least(2, "the", "alpha", "beta"), {"the"})
    assert src == ("i_atleast", 2, [("iterm", "alpha"), ("iterm", "beta")])
    assert _iv_analyze(iv_at_least(2, "the", "alpha", "a"),
                       {"the", "a"}) is None
    # before() composition survives analysis and field-prefixing intact
    src = _iv_analyze(iv_before("alpha", "beta"), set())
    fp = _iv_prefix_field(src, "body")
    assert interval_terms(fp) == ["body:alpha", "body:beta"]
