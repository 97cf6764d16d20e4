"""Span queries: faithful-semantics duels + Spark end-to-end.

The brute-force twins here are direct doc-at-a-time transliterations of the
reference enumeration (NearSpansOrdered.java:63-129, NearSpansUnordered.java:
31-117, SpanFirstQuery.java:38-43, SpanNotQuery.java:196-215) with explicit
cursors; the engine's vectorized streams must reproduce their spans exactly.
"""

import heapq

import numpy as np
import pytest

from lucene_spark.spans import (
    span_first,
    span_near,
    span_not,
    span_or,
    span_stream,
    span_term,
)


# ---------------------------------------------------------------- fixtures


def corpus_arrays(docs_tokens):
    """docs_tokens: list of token lists → (postings_by_term, pos_by_term)."""
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


# ------------------------------------------------- brute-force transliterations


def _sub_positions(sub, toks):
    if sub[0] == "sterm":
        return [i for i, w in enumerate(toks) if w == sub[1]]
    if sub[0] in ("sor", "spanor"):
        return sorted(i for i, w in enumerate(toks) if w in set(sub[1]))
    raise ValueError(sub)


def brute_ordered(toks, members, slop):
    """NearSpansOrdered: per lead occurrence, advance each following cursor
    monotonically to the first start >= prev end; emit width = Σ gaps when
    <= slop."""
    subs = [_sub_positions(m, toks) for m in members]
    if any(not s for s in subs):
        return []
    cursors = [0] * len(subs)
    out = []
    for lead in subs[0]:
        prev_end = lead + 1
        width = 0
        ok = True
        for i in range(1, len(subs)):
            while cursors[i] < len(subs[i]) and subs[i][cursors[i]] < prev_end:
                cursors[i] += 1
            if cursors[i] >= len(subs[i]):
                ok = False
                break
            q = subs[i][cursors[i]]
            width += q - prev_end
            prev_end = q + 1
        if not ok:
            break
        if width <= slop:
            out.append((lead, prev_end, width))
    return out


def brute_unordered(toks, members, slop):
    """NearSpansUnordered: start-ordered heap over cursors; every state tests
    maxEnd - minStart - totalSpanLength <= slop, scoring width =
    maxEnd - minStart; min cursor advances."""
    subs = [_sub_positions(m, toks) for m in members]
    if any(not s for s in subs):
        return []
    n = len(subs)
    ptr = [0] * n
    heap = [(subs[i][0], i) for i in range(n)]
    heapq.heapify(heap)
    max_end = max(subs[i][0] + 1 for i in range(n))
    out = []
    while True:
        s, i = heap[0]
        if max_end - s - n <= slop:
            out.append((s, max_end, max_end - s))
        ptr[i] += 1
        if ptr[i] >= len(subs[i]):
            return out
        ns = subs[i][ptr[i]]
        max_end = max(max_end, ns + 1)
        heapq.heapreplace(heap, (ns, i))


def stream_for_doc(stream, doc):
    d, s, e, w = stream
    m = d == doc
    return list(zip(s[m].tolist(), e[m].tolist(), w[m].tolist()))


# ---------------------------------------------------------------- unit tests


def test_javadoc_example_ordered():
    # NearSpansOrdered.java:33-45: "t1 t2 t1 t3 t2 t3" slop 1 matches twice
    toks = ["t1", "t2", "t1", "t3", "t2", "t3"]
    post, pos = corpus_arrays([toks])
    node = ("spannear", [("sterm", "t1"), ("sterm", "t2"), ("sterm", "t3")], 1, True)
    got = stream_for_doc(span_stream(node, post, pos), 0)
    assert got == brute_ordered(toks, node[1], 1)
    assert len(got) == 2


def test_ordered_zero_slop_is_exact_phrase():
    toks = "a b c a b d a x b".split()
    post, pos = corpus_arrays([toks])
    node = ("spannear", [("sterm", "a"), ("sterm", "b")], 0, True)
    got = stream_for_doc(span_stream(node, post, pos), 0)
    assert got == [(0, 2, 0), (3, 5, 0)]


def test_unordered_simple():
    toks = "x a y b z b a".split()
    post, pos = corpus_arrays([toks])
    node = ("spannear", [("sterm", "a"), ("sterm", "b")], 1, False)
    got = stream_for_doc(span_stream(node, post, pos), 0)
    assert got == brute_unordered(toks, node[1], 1)


def test_span_first_filters_by_end():
    toks = "k a k b k".split()
    post, pos = corpus_arrays([toks])
    node = ("spanfirst", ("sterm", "k"), 3)
    got = stream_for_doc(span_stream(node, post, pos), 0)
    # ends at 1 and 3 qualify (end <= 3); position 4 (end 5) does not
    assert got == [(0, 1, 0), (2, 3, 0)]


def test_span_not_pre_post():
    toks = "s e s x s".split()
    post, pos = corpus_arrays([toks])
    # exclude 'e' within [p-0, p+1]: s@0 has e@1 in window -> dropped;
    # s@2 window [2,3] has x -> kept; s@4 kept
    node = ("spannot", ("sterm", "s"), ("sterm", "e"), 0, 1)
    got = stream_for_doc(span_stream(node, post, pos), 0)
    assert [g[0] for g in got] == [2, 4]
    # pre=1: s@2 sees e@1 in [1,3] -> dropped too
    node = ("spannot", ("sterm", "s"), ("sterm", "e"), 1, 1)
    got = stream_for_doc(span_stream(node, post, pos), 0)
    assert [g[0] for g in got] == [4]


def test_or_inside_near():
    toks = "t m q t h q".split()
    post, pos = corpus_arrays([toks])
    node = ("spannear", [("sterm", "t"), ("sor", ["m", "h"]), ("sterm", "q")], 0, True)
    got = stream_for_doc(span_stream(node, post, pos), 0)
    assert got == [(0, 3, 0), (3, 6, 0)]


VOCAB = ["a", "b", "c", "d", "e"]


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_ordered_matches_reference_walk(seed):
    rng = np.random.default_rng(seed)
    docs = [
        [VOCAB[i] for i in rng.integers(0, len(VOCAB), rng.integers(5, 60))]
        for _ in range(20)
    ]
    post, pos = corpus_arrays(docs)
    members = [("sterm", "a"), ("sor", ["b", "c"]), ("sterm", "d")][: 2 + seed % 2]
    slop = int(seed % 5)
    node = ("spannear", members, slop, True)
    stream = span_stream(node, post, pos)
    for doc, toks in enumerate(docs):
        assert stream_for_doc(stream, doc) == brute_ordered(toks, members, slop), (
            f"doc {doc}: {' '.join(toks)}"
        )


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_unordered_matches_reference_walk(seed):
    rng = np.random.default_rng(100 + seed)
    docs = [
        [VOCAB[i] for i in rng.integers(0, len(VOCAB), rng.integers(5, 60))]
        for _ in range(20)
    ]
    post, pos = corpus_arrays(docs)
    members = [("sterm", "a"), ("sterm", "b"), ("sor", ["c", "e"])][: 2 + seed % 2]
    slop = int(seed % 6)
    node = ("spannear", members, slop, False)
    stream = span_stream(node, post, pos)
    for doc, toks in enumerate(docs):
        if any(not _sub_positions(m, toks) for m in members):
            assert stream_for_doc(stream, doc) == []
            continue
        assert stream_for_doc(stream, doc) == brute_unordered(toks, members, slop), (
            f"doc {doc}: {' '.join(toks)}"
        )


# ---------------------------------------------------------------- spark e2e


@pytest.fixture(scope="module")
def span_index(spark):
    import pandas as pd

    from lucene_spark.index import build_index

    rng = np.random.default_rng(7)
    vocab = ["table", "hash", "part", "key", "scan", "the", "window"]
    rows = []
    for i in range(300):
        toks = [vocab[j] for j in rng.integers(0, len(vocab), rng.integers(8, 40))]
        rows.append({"doc_id": i, "url": f"u{i}", "text": " ".join(toks)})
    docs = spark.createDataFrame(pd.DataFrame(rows))
    return build_index(
        spark, docs, text_col="text", key_col="doc_id", docid_col="doc_id",
        seg_size=64, with_positions=True,
    )


QUERIES = [
    span_near(["table", "hash"], slop=2, ordered=True),
    span_near(["table", "hash", "part"], slop=4, ordered=True),
    span_near(["key", "scan"], slop=3, ordered=False),
    span_near([span_term("table"), span_or(["hash", "key"])], slop=1, ordered=True),
    span_first("key", 5),
    span_not("scan", "table", pre=1, post=2),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_spark_span_pruned_equals_exhaustive(span_index, qi):
    from lucene_spark.search import search

    q = QUERIES[qi]
    pruned = search(span_index, q, k=10, prune=True)
    exact = search(span_index, q, k=10, prune=False)
    assert pruned.docids.tolist() == exact.docids.tolist()
    assert pruned.scores.tolist() == exact.scores.tolist()
    assert len(exact.docids) > 0  # corpus is dense enough that all match


def test_spark_span_respects_tombstones(span_index):
    from lucene_spark.search import search

    q = QUERIES[0]
    base = search(span_index, q, k=5, prune=True)
    assert len(base.docids)
    victim = int(base.docids[0])
    spark = span_index.postings.sparkSession
    idx2 = span_index.delete_docs(
        spark.createDataFrame([(victim,)], "docid long")
    )
    after = search(idx2, q, k=5, prune=True)
    assert victim not in after.docids.tolist()


def test_spark_span_stopword_analysis(span_index):
    from lucene_spark.search import search

    # 'the' is a stopword: a required sub-span analyzing away -> no match
    td = search(span_index, span_near(["table", "the"], slop=1), k=5)
    assert len(td.docids) == 0


def test_spans_in_search_many(span_index):
    from lucene_spark.search import search, search_many

    qs = {"a": QUERIES[0], "b": QUERIES[2], "c": "table"}
    batched = search_many(span_index, qs, k=10)
    for qid, q in qs.items():
        single = search(span_index, q, k=10)
        assert batched[qid].docids.tolist() == single.docids.tolist()
        assert batched[qid].scores.tolist() == single.scores.tolist()


def test_span_float32_precision_mode(span_index):
    from lucene_spark.search import search

    q = QUERIES[1]
    td32 = search(span_index, q, k=10, precision="lucene", prune=True)
    td32e = search(span_index, q, k=10, precision="lucene", prune=False)
    assert td32.docids.tolist() == td32e.docids.tolist()
    assert td32.scores.tolist() == td32e.scores.tolist()
    for s in td32.scores:
        assert s == float(np.float32(s))


# ----------------------------------------- SpanContaining / SpanWithin


def brute_contain(docs_tokens, big_node, little_node, within):
    """Per-doc O(n²) reference: filter big (or little) spans by containment."""
    post, pos = corpus_arrays(docs_tokens)
    out = []
    for d in range(len(docs_tokens)):
        bigs = [
            (s, e, w)
            for doc, s, e, w in zip(*span_stream(big_node, post, pos))
            if doc == d
        ]
        littles = [
            (s, e, w)
            for doc, s, e, w in zip(*span_stream(little_node, post, pos))
            if doc == d
        ]
        if within:
            for ls, le, lw in littles:
                if any(bs <= ls and le <= be for bs, be, _ in bigs):
                    out.append((d, ls, le, lw))
        else:
            for bs, be, bw in bigs:
                if any(bs <= ls and le <= be for ls, le, _ in littles):
                    out.append((d, bs, be, bw))
    return sorted(out)


@pytest.mark.parametrize("within", [False, True])
def test_containing_within_basic(within):
    docs = [
        "aa bb cc dd ee".split(),   # big [0,5), cc inside
        "aa bb dd dd ee cc".split(),  # big [0,5), cc outside
        "cc aa bb".split(),          # no big
        "aa cc cc ee zz".split(),    # big [0,4), two cc inside
    ]
    post, pos = corpus_arrays(docs)
    big = ("spannear", [("sterm", "aa"), ("sterm", "ee")], 3, True)
    kind = "spanwithin" if within else "spancontaining"
    node = (kind, big, ("sterm", "cc"))
    got = sorted(zip(*(a.tolist() for a in span_stream(node, post, pos))))
    assert got == brute_contain(docs, big, ("sterm", "cc"), within)
    docs_hit = sorted({d for d, *_ in got})
    assert docs_hit == [0, 3]
    if within:
        # doc 3 emits BOTH contained cc occurrences
        assert sum(1 for d, *_ in got if d == 3) == 2


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("within", [False, True])
def test_containing_within_fuzz(seed, within):
    rng = np.random.default_rng(seed)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [
        [vocab[i] for i in rng.integers(0, len(vocab), rng.integers(4, 16))]
        for _ in range(12)
    ]
    post, pos = corpus_arrays(docs)
    big = ("spannear", [("sterm", "aa"), ("sterm", "bb")], 4, True)
    little = ("sor", ["cc", "dd"])
    kind = "spanwithin" if within else "spancontaining"
    got = sorted(zip(*(a.tolist() for a in
                       span_stream((kind, big, little), post, pos))))
    assert got == brute_contain(docs, big, little, within)


def test_containing_empty_sides():
    docs = ["aa bb".split()]
    post, pos = corpus_arrays(docs)
    big = ("spannear", [("sterm", "aa"), ("sterm", "bb")], 4, True)
    for kind in ("spancontaining", "spanwithin"):
        d, s, e, w = span_stream((kind, big, ("sterm", "zz")), post, pos)
        assert len(d) == 0


def test_span_position_range(spark, span_index):
    from lucene_spark.search import search
    from lucene_spark.spans import span_first, span_position_range

    # SpanFirst(t, n) is PositionRange(t, 0, n) (SpanFirstQuery.java:38-43)
    a = search(span_index, span_first("table", 5), k=300, precision="float64")
    b = search(span_index, span_position_range("table", 0, 5), k=300,
               precision="float64")
    assert a.docids.tolist() == b.docids.tolist()
    assert a.scores.tolist() == b.scores.tolist()
    # a non-zero start must be a strict subset of the first-query matches
    c = search(span_index, span_position_range("table", 2, 5), k=300,
               precision="float64")
    assert set(c.docids.tolist()) <= set(a.docids.tolist())
