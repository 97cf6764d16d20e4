"""Oracle-duel tests: windowed block-max kernel vs exhaustive scoring.

Pattern: TestWANDScorer.java:626-668 + CheckHits.checkTopScores
(test-framework/.../search/CheckHits.java:602) — run each query with and
without pruning on randomized corpora, assert identical (docid, score) lists.
Also checks multi-segment == single-segment (TestTopDocsMerge analog).
"""

import numpy as np
import pytest

from lucene_spark.codecs import BLOCK_SIZE, encode_postings
from lucene_spark.impacts import block_frontiers
from lucene_spark.kernel import segment_topk
from lucene_spark.similarity import BM25Scorer, CollectionStats


def synth_corpus(rng, n_docs, n_terms, zipf=1.3):
    """Random (docid → token multiset) with Zipf-ish term draws."""
    probs = np.arange(1, n_terms + 1, dtype=np.float64) ** -zipf
    probs /= probs.sum()
    dls = rng.integers(1, 60, n_docs)
    docs = [rng.choice(n_terms, size=dl, p=probs) for dl in dls]
    return docs


def build_rows(docs, seg_size):
    """Corpus → per-seg {term: row} + dl array + stats (engine-format rows)."""
    n_docs = len(docs)
    dl = np.array([len(d) for d in docs], dtype=np.int64)
    postings = {}
    for docid, toks in enumerate(docs):
        vals, counts = np.unique(toks, return_counts=True)
        for t, c in zip(vals.tolist(), counts.tolist()):
            postings.setdefault(t, []).append((docid, c))
    segs = {}
    for t, plist in postings.items():
        d = np.array([p[0] for p in plist], dtype=np.int64)
        f = np.array([p[1] for p in plist], dtype=np.int64)
        for seg in np.unique(d // seg_size):
            m = (d // seg_size) == seg
            ld = d[m] - seg * seg_size
            lf = f[m]
            ldl = dl[d[m]]
            enc = encode_postings(ld, lf, ldl)
            imp_f, imp_dl, imp_off = block_frontiers(ld, lf, ldl, BLOCK_SIZE)
            segs.setdefault(int(seg), {})[f"t{t}"] = {
                "term": f"t{t}",
                "seg": int(seg),
                "df_local": len(ld),
                "nblocks": len(ld) // BLOCK_SIZE,
                "n_tail": enc["n_tail"],
                "doc_blob": enc["doc_blob"],
                "freq_blob": enc["freq_blob"],
                "dl_blob": enc["dl_blob"],
                "tail_blob": enc["tail_blob"],
                "block_last_docid": enc["block_last_docid"],
                "imp_freqs": imp_f,
                "imp_dls": imp_dl,
                "imp_offsets": imp_off,
            }
    dfs = {f"t{t}": len(pl) for t, pl in postings.items()}
    stats = CollectionStats(n_docs, int(dl.sum()))
    return segs, dl, dfs, stats


def run_query(node, segs, dl, dfs, stats, seg_size, k, precision, prune, window_bits=6):
    terms = set()

    def collect(n):
        if n[0] == "term":
            terms.add(n[1])
        elif n[0] == "and":
            terms.update(n[1])
        elif n[0] == "not":
            collect(n[1])
            terms.update(n[2])
        else:
            for c in n[1]:
                collect(c)

    collect(node)
    scorers = {t: BM25Scorer(dfs[t], stats, precision=precision) for t in terms if t in dfs}
    if node[0] == "and" and any(t not in dfs for t in node[1]):
        return np.empty(0, dtype=np.int64), np.empty(0)
    results = []
    for seg, rows in segs.items():
        sub = {t: r for t, r in rows.items() if t in scorers}
        if not sub:
            continue
        lo = seg * seg_size
        d, s = segment_topk(node, sub, scorers, seg_size, k,
                            precision=precision, prune=prune, window_bits=window_bits)
        results.append((d + lo, s))
    if not results:
        return np.empty(0, dtype=np.int64), np.empty(0)
    alld = np.concatenate([d for d, _ in results])
    alls = np.concatenate([s for _, s in results])
    order = np.lexsort((alld, -alls))[:k]
    return alld[order], alls[order]


QUERIES = [
    ("term", "t0"),
    ("term", "t5"),
    ("and", ["t0", "t1"]),
    ("and", ["t0", "t1", "t2"]),
    ("and", ["t3", "t7"]),
    ("or", [("term", "t0"), ("term", "t1")]),
    ("or", [("term", "t2"), ("term", "t5"), ("term", "t9")]),
    ("or", [("and", ["t0", "t1"]), ("term", "t4")]),
    ("or", [("and", ["t2", "t3"]), ("and", ["t5", "t6"])]),
    ("not", ("term", "t0"), ["t3"]),
    ("not", ("or", [("term", "t1"), ("term", "t2")]), ["t0"]),
]


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_duel_pruned_vs_exhaustive(seed, precision):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(200, 1200))
    docs = synth_corpus(rng, n_docs, n_terms=25)
    seg_size = 256
    segs, dl, dfs, stats = build_rows(docs, seg_size)
    for node in QUERIES:
        for k in (1, 10, 100):
            d1, s1 = run_query(node, segs, dl, dfs, stats, seg_size, k, precision, prune=False)
            d2, s2 = run_query(node, segs, dl, dfs, stats, seg_size, k, precision, prune=True)
            np.testing.assert_array_equal(d1, d2, err_msg=f"{node} k={k} docids")
            np.testing.assert_array_equal(s1, s2, err_msg=f"{node} k={k} scores")


@pytest.mark.parametrize("seed", range(3))
def test_segment_count_invariance(seed):
    """Results must not depend on how docID space is cut into segments."""
    rng = np.random.default_rng(100 + seed)
    docs = synth_corpus(rng, 800, n_terms=20)
    node = ("or", [("term", "t0"), ("term", "t3"), ("and", ["t1", "t2"])])
    ref = None
    for seg_size in (100, 400, 800):
        segs, dl, dfs, stats = build_rows(docs, seg_size)
        d, s = run_query(node, segs, dl, dfs, stats, seg_size, 20, "lucene", prune=True)
        if ref is None:
            ref = (d, s)
        else:
            np.testing.assert_array_equal(ref[0], d)
            np.testing.assert_array_equal(ref[1], s)


def test_tie_break_by_docid():
    """Identical docs ⇒ identical scores ⇒ ascending docID order in top-k."""
    docs = [np.array([0, 1, 1])] * 50  # 50 identical docs
    segs, dl, dfs, stats = build_rows(docs, 16)
    d, s = run_query(("term", "t1"), segs, dl, dfs, stats, 16, 10, "lucene", prune=True)
    np.testing.assert_array_equal(d, np.arange(10))
    assert len(np.unique(s)) == 1


@pytest.mark.parametrize(
    "sim_name",
    ["classic", "boolean", "lmd", "lmjm", "dfr", "ib", "ax", "sweetspot",
     "legacy_bm25", "ax_f1exp", "ax_f1log", "ax_f2log",
     "dfi_standardized", "dfi_saturated", "dfi_chisquared"])
@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_duel_other_similarities(sim_name, precision):
    """Pruned kernel == exhaustive under non-BM25 similarities: the SimScorer
    contract (score monotone increasing in freq, decreasing in length) keeps
    the impact frontiers valid upper bounds for ANY similarity
    (ClassicSimilarity.java:37-46, BooleanSimilarity.java:58-60,
    LMDirichletSimilarity.java:70-76 — clamped-at-0 keeps bounds valid)."""
    from lucene_spark.similarity import SIMILARITIES

    sim_cls = SIMILARITIES[sim_name]
    rng = np.random.default_rng(77)
    docs = synth_corpus(rng, 900, n_terms=25)
    seg_size = 256
    segs, dl, dfs, stats = build_rows(docs, seg_size)
    cfs: dict = {}
    if getattr(sim_cls, "NEEDS_CF", False):
        for toks in docs:
            vals, counts = np.unique(toks, return_counts=True)
            for v, c in zip(vals, counts):
                t = f"t{v}"
                cfs[t] = cfs.get(t, 0) + int(c)

    def run(node, k, prune):
        terms = set()

        def collect(n):
            if n[0] == "term":
                terms.add(n[1])
            elif n[0] == "and":
                terms.update(n[1])
            elif n[0] == "not":
                collect(n[1])
                terms.update(n[2])
            else:
                for c in n[1]:
                    collect(c)

        collect(node)
        scorers = {
            t: sim_cls(dfs[t], stats, precision=precision,
                       **({"cf": cfs[t]} if cfs else {}))
            for t in terms if t in dfs
        }
        results = []
        for seg, rows in segs.items():
            sub = {t: r for t, r in rows.items() if t in scorers}
            if not sub:
                continue
            d, s = segment_topk(node, sub, scorers, seg_size, k,
                                precision=precision, prune=prune, window_bits=6)
            results.append((d + seg * seg_size, s))
        alld = np.concatenate([d for d, _ in results])
        alls = np.concatenate([s for _, s in results])
        order = np.lexsort((alld, -alls))[:k]
        return alld[order], alls[order]

    for node in QUERIES:
        for k in (1, 10, 50):
            d1, s1 = run(node, k, prune=False)
            d2, s2 = run(node, k, prune=True)
            np.testing.assert_array_equal(d1, d2, err_msg=f"{sim_name} {node} k={k}")
            np.testing.assert_array_equal(s1, s2, err_msg=f"{sim_name} {node} k={k}")


def test_classic_scorer_values():
    """ClassicSimilarity float64 formula: w * sqrt(tf) / sqrt(dl),
    w = ln((N+1)/(df+1)) + 1 (ClassicSimilarity.java:43-65)."""
    import math

    from lucene_spark.similarity import ClassicScorer

    stats = CollectionStats(1000, 50_000)
    sc = ClassicScorer(9, stats, precision="float64", boost=2.0)
    got = sc.score_from_dl(np.array([9]), np.array([16]))
    want = 2.0 * (math.log(1001 / 10) + 1.0) * 3.0 / 4.0
    np.testing.assert_allclose(got, [want], rtol=1e-12)


def run_query_after(node, segs, dfs, stats, seg_size, k, precision, prune, after):
    """run_query twin with a searchAfter cursor (global docid space)."""
    terms = set()

    def collect(n):
        if n[0] == "term":
            terms.add(n[1])
        elif n[0] == "and":
            terms.update(n[1])
        elif n[0] == "not":
            collect(n[1])
            terms.update(n[2])
        else:
            for c in n[1]:
                collect(c)

    collect(node)
    scorers = {t: BM25Scorer(dfs[t], stats, precision=precision) for t in terms if t in dfs}
    if node[0] == "and" and any(t not in dfs for t in node[1]):
        return np.empty(0, dtype=np.int64), np.empty(0)
    results = []
    for seg, rows in segs.items():
        sub = {t: r for t, r in rows.items() if t in scorers}
        if not sub:
            continue
        lo = seg * seg_size
        seg_after = (after[0], after[1] - lo) if after is not None else None
        d, s = segment_topk(node, sub, scorers, seg_size, k, precision=precision,
                            prune=prune, window_bits=6, after=seg_after)
        results.append((d + lo, s))
    if not results:
        return np.empty(0, dtype=np.int64), np.empty(0)
    alld = np.concatenate([d for d, _ in results])
    alls = np.concatenate([s for _, s in results])
    order = np.lexsort((alld, -alls))[:k]
    return alld[order], alls[order]


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_fuzz_paging_equals_sliced_full_run(seed, precision):
    """searchAfter fuzz (PagingTopScoreDocCollector contract): walking the
    whole result set in k-sized pages — pruned kernel, cursor carried across
    pages — must reproduce one exhaustive full-depth run exactly, for random
    Zipf corpora and every duel query shape.  Tie-heavy short docs make the
    (score, docid) tie-break do real work."""
    rng = np.random.default_rng(1000 + seed)
    n_docs = int(rng.integers(150, 900))
    docs = synth_corpus(rng, n_docs, n_terms=12, zipf=1.1)
    seg_size = 128
    segs, dl, dfs, stats = build_rows(docs, seg_size)
    for node in QUERIES:
        full_d, full_s = run_query(node, segs, dl, dfs, stats, seg_size,
                                   10**6, precision, prune=False)
        k = int(rng.integers(3, 17))
        got_d, got_s, after = [], [], None
        for _ in range(len(full_d) // k + 2):
            d, s = run_query_after(node, segs, dfs, stats, seg_size, k,
                                   precision, prune=True, after=after)
            if len(d) == 0:
                break
            got_d.extend(d.tolist())
            got_s.extend(s.tolist())
            after = (float(s[-1]), int(d[-1]))
        np.testing.assert_array_equal(np.array(got_d), full_d,
                                      err_msg=f"{node} k={k} paged docids")
        np.testing.assert_array_equal(np.array(got_s), full_s,
                                      err_msg=f"{node} k={k} paged scores")
