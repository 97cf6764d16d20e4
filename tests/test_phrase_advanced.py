"""Positions channel + advanced query operators: phrase / dismax / msm / syn.

Oracle-duel pattern (CheckHits.java:602): every operator is checked three
ways — pruned kernel vs exhaustive kernel vs an independent brute-force
Python implementation computed straight from the token sequences.
"""

import numpy as np
import pytest

from lucene_spark.codecs import (
    BLOCK_SIZE,
    decode_positions,
    encode_positions,
    encode_postings,
    read_vints,
    read_vints_all,
    write_vints,
)
from lucene_spark.impacts import block_frontiers
from lucene_spark.kernel import segment_topk
from lucene_spark.similarity import BM25Scorer, CollectionStats


# --- codec level ---------------------------------------------------------------


@pytest.mark.parametrize("seed", range(5))
def test_read_vints_all_matches_loop_reader(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2**40, size=500).astype(np.uint64)
    blob = write_vints(vals)
    out = read_vints_all(blob)
    np.testing.assert_array_equal(out, vals)
    loop, _ = read_vints(blob, len(vals))
    np.testing.assert_array_equal(out, loop)


@pytest.mark.parametrize("seed", range(5))
def test_positions_roundtrip(seed):
    rng = np.random.default_rng(100 + seed)
    n_postings = int(rng.integers(1, 50))
    freqs = rng.integers(1, 8, size=n_postings)
    pos = np.concatenate(
        [np.sort(rng.choice(10_000, size=f, replace=False)) for f in freqs]
    )
    blob = encode_positions(pos, freqs)
    np.testing.assert_array_equal(decode_positions(blob, freqs), pos)


def test_positions_empty():
    assert encode_positions(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)) == b""
    assert len(decode_positions(b"", np.empty(0, dtype=np.int64))) == 0


# --- kernel level ----------------------------------------------------------------


def synth_sequences(rng, n_docs, n_terms, zipf=1.2):
    """Random ordered token sequences (positions = sequence index)."""
    probs = np.arange(1, n_terms + 1, dtype=np.float64) ** -zipf
    probs /= probs.sum()
    dls = rng.integers(2, 40, n_docs)
    return [rng.choice(n_terms, size=dl, p=probs) for dl in dls]


def build_rows_pos(docs, seg_size):
    """Sequences → per-seg engine rows WITH the positions channel."""
    n_docs = len(docs)
    dl = np.array([len(d) for d in docs], dtype=np.int64)
    post = {}  # term -> list[(docid, positions array)]
    for docid, seqs in enumerate(docs):
        seen = {}
        for i, t in enumerate(seqs.tolist()):
            seen.setdefault(t, []).append(i)
        for t, ps in seen.items():
            post.setdefault(t, []).append((docid, np.array(ps, dtype=np.int64)))
    segs = {}
    for t, plist in post.items():
        d = np.array([p[0] for p in plist], dtype=np.int64)
        for seg in np.unique(d // seg_size):
            sub = [(di, ps) for di, ps in plist if di // seg_size == seg]
            ld = np.array([di for di, _ in sub], dtype=np.int64) - seg * seg_size
            lf = np.array([len(ps) for _, ps in sub], dtype=np.int64)
            ldl = dl[[di for di, _ in sub]]
            enc = encode_postings(ld, lf, ldl)
            imp_f, imp_dl, imp_off = block_frontiers(ld, lf, ldl, BLOCK_SIZE)
            segs.setdefault(int(seg), {})[f"t{t}"] = {
                "term": f"t{t}", "seg": int(seg), "df_local": len(ld),
                "nblocks": len(ld) // BLOCK_SIZE, "n_tail": enc["n_tail"],
                "doc_blob": enc["doc_blob"], "freq_blob": enc["freq_blob"],
                "dl_blob": enc["dl_blob"], "tail_blob": enc["tail_blob"],
                "pos_blob": encode_positions(
                    np.concatenate([ps for _, ps in sub]), lf
                ),
                "block_last_docid": enc["block_last_docid"],
                "imp_freqs": imp_f, "imp_dls": imp_dl, "imp_offsets": imp_off,
            }
    dfs = {f"t{t}": len(pl) for t, pl in post.items()}
    return segs, dl, dfs, CollectionStats(n_docs, int(dl.sum()))


def run(node, segs, dfs, stats, seg_size, k, precision, prune, scorers_extra=None):
    terms = set()

    def collect(n):
        kind = n[0]
        if kind == "term":
            terms.add(n[1])
        elif kind in ("and", "msm", "syn"):
            terms.update(n[1] if kind != "syn" else n[1])
        elif kind in ("phrase", "sloppy"):
            terms.update(t for t, _ in n[1])
        elif kind in ("not", "reqopt"):
            collect(n[1]); terms.update(n[2])
        else:
            for c in n[1]:
                collect(c)

    collect(node)
    scorers = {t: BM25Scorer(dfs[t], stats, precision=precision) for t in terms if t in dfs}
    results = []
    for seg, rows in segs.items():
        sub = {t: r for t, r in rows.items() if t in scorers}
        if not sub:
            continue
        d, s = segment_topk(node, sub, scorers, seg_size, k,
                            precision=precision, prune=prune, window_bits=5)
        results.append((d + seg * seg_size, s))
    if not results:
        return np.empty(0, dtype=np.int64), np.empty(0)
    alld = np.concatenate([d for d, _ in results])
    alls = np.concatenate([s for _, s in results])
    order = np.lexsort((alld, -alls))[:k]
    return alld[order], alls[order]


def brute_phrase_freq(docs, term_ids, qoffs):
    """Naive per-doc count of positions p with term_i at p + qoff_i."""
    out = {}
    for docid, seq in enumerate(docs):
        cnt = 0
        for p in range(len(seq)):
            ok = True
            for t, off in zip(term_ids, qoffs):
                j = p + off - qoffs[0]
                if j >= len(seq) or seq[j] != t:
                    ok = False
                    break
            if ok:
                cnt += 1
        if cnt:
            out[docid] = cnt
    return out


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_phrase_duel_and_bruteforce(seed, precision):
    rng = np.random.default_rng(seed)
    docs = synth_sequences(rng, int(rng.integers(150, 600)), n_terms=8)
    seg_size = 128
    segs, dl, dfs, stats = build_rows_pos(docs, seg_size)
    for term_ids, qoffs in [((0, 1), (0, 1)), ((1, 0), (0, 1)), ((0, 1, 2), (0, 1, 2)),
                            ((0, 2), (0, 2))]:  # last: gap phrase (stopword hole)
        members = [(f"t{t}", o) for t, o in zip(term_ids, qoffs)]
        scorer = BM25Scorer.for_terms([dfs[m] for m, _ in members], stats,
                                      precision=precision)
        node = ("phrase", members, scorer)
        d1, s1 = run(node, segs, dfs, stats, seg_size, 10, precision, prune=False)
        d2, s2 = run(node, segs, dfs, stats, seg_size, 10, precision, prune=True)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(s1, s2)
        # brute force: same matching docs + exact scores
        want = brute_phrase_freq(docs, term_ids, qoffs)
        want_scores = {}
        for docid, f in want.items():
            want_scores[docid] = float(
                scorer.score_from_dl(np.array([f]), np.array([dl[docid]]))[0]
            )
        got_all_d, got_all_s = run(node, segs, dfs, stats, seg_size, 10**6,
                                   precision, prune=False)
        assert set(got_all_d.tolist()) == set(want)
        for docid, s in zip(got_all_d.tolist(), got_all_s.tolist()):
            assert s == pytest.approx(want_scores[docid], rel=0, abs=0)


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_dismax_msm_syn_duel(seed, precision):
    rng = np.random.default_rng(50 + seed)
    docs = synth_sequences(rng, int(rng.integers(200, 800)), n_terms=12)
    seg_size = 200
    segs, dl, dfs, stats = build_rows_pos(docs, seg_size)
    syn_scorer = BM25Scorer(max(dfs["t0"], dfs["t3"]), stats, precision=precision)
    nodes = [
        ("dismax", [("term", "t0"), ("term", "t1")], 0.1),
        ("dismax", [("term", "t2"), ("and", ["t0", "t1"]), ("term", "t5")], 0.3),
        ("msm", ["t0", "t1", "t2", "t4"], 2),
        ("msm", ["t1", "t3", "t5"], 3),
        ("syn", ["t0", "t3"], syn_scorer),
        ("or", [("syn", ["t0", "t3"], syn_scorer), ("term", "t2")]),
    ]
    for node in nodes:
        for k in (1, 10, 50):
            d1, s1 = run(node, segs, dfs, stats, seg_size, k, precision, prune=False)
            d2, s2 = run(node, segs, dfs, stats, seg_size, k, precision, prune=True)
            np.testing.assert_array_equal(d1, d2, err_msg=f"{node[0]} k={k}")
            np.testing.assert_array_equal(s1, s2, err_msg=f"{node[0]} k={k}")


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_sloppy_duel(seed, precision):
    rng = np.random.default_rng(200 + seed)
    docs = synth_sequences(rng, int(rng.integers(150, 500)), n_terms=6)
    seg_size = 128
    segs, dl, dfs, stats = build_rows_pos(docs, seg_size)
    for slop in (1, 2, 4):
        members = [("t0", 0), ("t1", 1)]
        scorer = BM25Scorer.for_terms([dfs["t0"], dfs["t1"]], stats, precision=precision)
        node = ("sloppy", members, slop, scorer)
        d1, s1 = run(node, segs, dfs, stats, seg_size, 20, precision, prune=False)
        d2, s2 = run(node, segs, dfs, stats, seg_size, 20, precision, prune=True)
        np.testing.assert_array_equal(d1, d2, err_msg=f"slop={slop}")
        np.testing.assert_array_equal(s1, s2, err_msg=f"slop={slop}")


def test_sloppy_hand_case():
    """doc0 = [t0 t1 ...] exact (ml=0, w=1); doc1 = [t0 x t1] (ml=1, w=0.5);
    doc2 = [t1 t0] reversed (ml=2, w=1/3); doc3 = no t1 -> no match."""
    docs = [np.array([0, 1, 2, 2]), np.array([0, 3, 1, 2]), np.array([1, 0, 2, 3]),
            np.array([0, 2, 3, 4])]
    segs, dl, dfs, stats = build_rows_pos(docs, 10)
    scorer = BM25Scorer.for_terms([dfs["t0"], dfs["t1"]], stats, precision="float64")
    for slop, expect in [
        (0, {0: 1.0}),
        (1, {0: 1.0, 1: 0.5}),
        (2, {0: 1.0, 1: 0.5, 2: 1.0 / 3.0}),
    ]:
        node = ("sloppy", [("t0", 0), ("t1", 1)], slop, scorer)
        d, s = run(node, segs, dfs, stats, 10, 10, "float64", prune=False)
        assert set(d.tolist()) == set(expect), f"slop={slop}"
        for docid, sc in zip(d.tolist(), s.tolist()):
            want = scorer.score_from_dl(
                np.array([expect[docid]]), np.array([len(docs[docid])])
            )[0]
            assert sc == pytest.approx(float(want), abs=0), f"slop={slop} doc={docid}"


def test_filter_clause_mask():
    """allow= masks before ranking; scores of surviving docs unchanged."""
    rng = np.random.default_rng(42)
    docs = synth_sequences(rng, 300, n_terms=8)
    seg_size = 64
    segs, dl, dfs, stats = build_rows_pos(docs, seg_size)
    node = ("or", [("term", "t0"), ("term", "t1")])
    full_d, full_s = run(node, segs, dfs, stats, seg_size, 10**6, "float64", prune=False)
    full = dict(zip(full_d.tolist(), full_s.tolist()))
    allow_global = np.array(sorted(d for d in full if d % 3 == 0), dtype=np.int64)

    from lucene_spark.kernel import segment_topk
    from lucene_spark.similarity import BM25Scorer as S

    scorers = {t: S(dfs[t], stats, precision="float64") for t in ("t0", "t1")}
    got = {}
    for seg, rows in segs.items():
        lo = seg * seg_size
        mask = (allow_global >= lo) & (allow_global < lo + seg_size)
        d, s = segment_topk(node, rows, scorers, seg_size, 10**6,
                            precision="float64", prune=True, window_bits=5,
                            allow=allow_global[mask] - lo)
        for dd, ss in zip((d + lo).tolist(), s.tolist()):
            got[dd] = ss
    assert set(got) == {d for d in full if d % 3 == 0}
    for d, s in got.items():
        assert s == full[d]


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_reqopt_duel(seed, precision):
    rng = np.random.default_rng(300 + seed)
    docs = synth_sequences(rng, int(rng.integers(200, 600)), n_terms=10)
    segs, dl, dfs, stats = build_rows_pos(docs, 150)
    nodes = [
        ("reqopt", ("term", "t0"), ["t1", "t2"]),
        ("reqopt", ("and", ["t0", "t1"]), ["t4"]),
    ]
    for node in nodes:
        for k in (1, 10, 100):
            d1, s1 = run(node, segs, dfs, stats, 150, k, precision, prune=False)
            d2, s2 = run(node, segs, dfs, stats, 150, k, precision, prune=True)
            np.testing.assert_array_equal(d1, d2, err_msg=f"{node} k={k}")
            np.testing.assert_array_equal(s1, s2, err_msg=f"{node} k={k}")
        # required semantics: every hit matches the required clause; score
        # >= pure-required score (optional terms only add)
        d_req, s_req = run(node[1], segs, dfs, stats, 150, 10**6, precision, prune=False)
        d_all, s_all = run(node, segs, dfs, stats, 150, 10**6, precision, prune=False)
        assert set(d_all.tolist()) == set(d_req.tolist())
        req_map = dict(zip(d_req.tolist(), s_req.tolist()))
        assert all(s >= req_map[d] - 1e-9 for d, s in zip(d_all.tolist(), s_all.tolist()))


def test_msm_counts_and_scores():
    """msm=2 keeps only docs matching >= 2 terms; score = sum of matches."""
    docs = [np.array(x) for x in ([0, 1], [0, 2], [0], [1, 2, 0])]
    segs, dl, dfs, stats = build_rows_pos(docs, 10)
    node = ("msm", ["t0", "t1", "t2"], 2)
    d, s = run(node, segs, dfs, stats, 10, 10, "float64", prune=False)
    assert set(d.tolist()) == {0, 1, 3}
    # doc 3 matches all three terms; its score equals the OR-sum
    d_or, s_or = run(("or", [("term", "t0"), ("term", "t1"), ("term", "t2")]),
                     segs, dfs, stats, 10, 10, "float64", prune=False)
    or_map = dict(zip(d_or.tolist(), s_or.tolist()))
    msm_map = dict(zip(d.tolist(), s.tolist()))
    assert msm_map[3] == or_map[3]


def test_syn_sums_freqs():
    """syn(t0,t1) on a doc with tf0=2, tf1=3 scores like one term with tf=5."""
    docs = [np.array([0, 0, 1, 1, 1]), np.array([2, 2, 2, 2, 2])]
    segs, dl, dfs, stats = build_rows_pos(docs, 10)
    scorer = BM25Scorer(max(dfs["t0"], dfs["t1"]), stats, precision="float64")
    d, s = run(("syn", ["t0", "t1"], scorer), segs, dfs, stats, 10, 10,
               "float64", prune=False)
    assert d.tolist() == [0]
    expect = scorer.score_from_dl(np.array([5]), np.array([5]))[0]
    assert s[0] == pytest.approx(float(expect), abs=0)


# --- Lucene-exact sloppy phrase matcher ---------------------------------------


def _closed_form_2term(adj_a, adj_b, slop):
    """Independent 2-term model — the alternating-run process the PhraseQueue
    walk reduces to for two terms (end == max(posA, posB) invariant):
    runner = list holding the smaller head, y = other head; each run emits
    ONE match with matchLength = y - (runner's last element <= y); then
    y := runner's first element > y and roles swap.  This is also the shape
    of the ft_phrase_sloppy recursive-CTE oracle."""
    lists = [sorted(int(v) for v in adj_a), sorted(int(v) for v in adj_b)]
    ha, hb = lists[0][0], lists[1][0]
    y, ylist = (hb, 1) if hb >= ha else (ha, 0)
    freq = 0.0
    while True:
        runner = 1 - ylist
        r_last = max(v for v in lists[runner] if v <= y)
        ml = y - r_last
        if ml <= slop:
            freq += 1.0 / (1.0 + ml)
        nxt = [v for v in lists[runner] if v > y]
        if not nxt:
            return freq
        y, ylist = nxt[0], runner


def test_sloppy_javadoc_example():
    # SloppyPhraseMatcher.java:40-44: doc "x a b a y", query "a b"~2 matches
    # twice — "a b" at distance 0 and "b a" at distance 2
    from lucene_spark.kernel import lucene_sloppy_freq

    adj_a = np.array([1, 3])       # 'a' at 1, 3; offset 0
    adj_b = np.array([2 - 1])      # 'b' at 2; offset 1
    freq = lucene_sloppy_freq([adj_a, adj_b], [0, 1], ["a", "b"], 2, f32=False)
    assert freq == pytest.approx(1.0 + 1.0 / 3.0)


@pytest.mark.parametrize("seed", range(20))
def test_sloppy_walker_matches_closed_form_2term(seed):
    from lucene_spark.kernel import lucene_sloppy_freq

    rng = np.random.default_rng(seed)
    na, nb = rng.integers(1, 8, 2)
    adj_a = np.unique(rng.integers(0, 25, na))
    adj_b = np.unique(rng.integers(0, 25, nb))
    for slop in (0, 1, 2, 4, 30):
        got = lucene_sloppy_freq([adj_a, adj_b], [0, 1], ["t0", "t1"], slop, f32=False)
        want = _closed_form_2term(adj_a, adj_b, slop)
        assert got == pytest.approx(want), (adj_a, adj_b, slop)


def test_sloppy_slop0_equals_exact_phrase_freq():
    from lucene_spark.kernel import lucene_sloppy_freq

    rng = np.random.default_rng(7)
    for _ in range(10):
        pos_a = np.unique(rng.integers(0, 30, 6))
        pos_b = np.unique(rng.integers(0, 30, 6))
        # exact "a b": count of p with a@p and b@p+1
        exact = len(np.intersect1d(pos_a, pos_b - 1))
        got = lucene_sloppy_freq(
            [pos_a, pos_b - 1], [0, 1], ["a", "b"], 0, f32=False
        )
        assert got == pytest.approx(float(exact))


def test_sloppy_repeated_term_phrase_runs():
    # "a b a"~2 over "a b a b a": repeat group handling (j-th pp advanced j
    # times, collisions resolved by advancing the lesser) must terminate and
    # produce a sane positive freq; exact value asserted stable
    from lucene_spark.kernel import lucene_sloppy_freq

    pos_a = np.array([0, 2, 4])
    pos_b = np.array([1, 3])
    adjs = [pos_a - 0, pos_b - 1, pos_a - 2]
    f1 = lucene_sloppy_freq(adjs, [0, 1, 2], ["a", "b", "a"], 2, f32=False)
    f2 = lucene_sloppy_freq(adjs, [0, 1, 2], ["a", "b", "a"], 2, f32=False)
    assert f1 == f2 and f1 > 0


def test_synonym_graph_expansion(spark):
    """Query-time SynonymGraphFilter (QueryBuilder.analyzeGraphBoolean,
    util/QueryBuilder.java:539-588): single-token syns blend into one
    SynonymQuery; multi-word syns become phrase paths; paths OR."""
    import numpy as np
    import pytest as _pt

    from lucene_spark.index import build_index
    from lucene_spark.search import expand_synonyms, search

    corpus = [
        (0, "nyc pizza slice", "en"),
        (1, "new york pizza crust", "en"),
        (2, "newyork bagel", "en"),
        (3, "boston chowder", "en"),
        (4, "york new pizza", "en"),  # wrong order: no phrase match
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", with_positions=True)
    node = expand_synonyms(
        ("term", "nyc"), {"nyc": ["newyork", "new york"]})
    assert node[0] == "or" and node[1][0] == ("syn", ["nyc", "newyork"])
    assert node[1][1][0] == "phrase"
    td = search(idx, node, k=10, precision="float64", prune=True)
    hits = dict(zip(td.docids.tolist(), td.scores.tolist()))
    # docs 0 (nyc), 1 (phrase "new york"), 2 (newyork) match; 3 and 4 don't
    assert set(hits) == {0, 1, 2}
    # pruned == exhaustive through the mixed node
    te = search(idx, node, k=10, precision="float64", prune=False)
    assert td.docids.tolist() == te.docids.tolist()
    assert td.scores.tolist() == te.scores.tolist()
    # no-synonym terms pass through untouched
    assert expand_synonyms(("term", "pizza"), {"nyc": ["x"]}) == ("term", "pizza")
    # compound rewrite
    n2 = expand_synonyms(("and", ["nyc", "pizza"]), {"nyc": ["newyork"]})
    assert n2[0] == "andn" and n2[1][0] == ("syn", ["nyc", "newyork"])


def test_phrase_wildcard_query(spark):
    """PhraseWildcardQuery (sandbox/search/PhraseWildcardQuery.java:60-75):
    wildcard members expand to union positions; empty expansion ->
    MatchNoDocs."""
    from lucene_spark.index import build_index
    from lucene_spark.search import phrase_wildcard_query, search

    corpus = [
        (0, "spark window aggregation", "en"),
        (1, "spark windmill aggregation", "en"),
        (2, "spark window join", "en"),
        (3, "window spark aggregation", "en"),  # wrong order
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", with_positions=True)
    node = phrase_wildcard_query(idx, ["spark", "wind*", "aggregation"])
    assert node[0] == "mphrase_raw"
    assert sorted(node[1][1]) == ["windmill", "window"]
    td = search(idx, node, k=10, precision="float64")
    assert sorted(td.docids.tolist()) == [0, 1]
    # '?' single-char wildcard
    node2 = phrase_wildcard_query(idx, ["spark", "windo?"])
    td2 = search(idx, node2, k=10, precision="float64")
    assert sorted(td2.docids.tolist()) == [0, 2]
    # empty expansion -> MatchNoDocs
    assert phrase_wildcard_query(idx, ["spark", "zz*"]) == ("match_none",)


def test_complex_phrase_parser(spark):
    """ComplexPhraseQueryParser subset: wildcards inside quoted phrases in
    the string syntax expand to MultiPhrase unions."""
    import pytest as _pt

    from lucene_spark.index import build_index
    from lucene_spark.search import parse_complex_phrase, search

    corpus = [
        (0, "spark window aggregation plus", "en"),
        (1, "spark windmill aggregation", "en"),
        (2, "nothing spark window here", "en"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", with_positions=True)
    node = parse_complex_phrase(idx, '"spark wind*" AND plus')
    td = search(idx, node, k=10, precision="float64")
    assert td.docids.tolist() == [0]
    node2 = parse_complex_phrase(idx, '"spark wind*"')
    td2 = search(idx, node2, k=10, precision="float64")
    assert sorted(td2.docids.tolist()) == [0, 1, 2]
    # plain phrases still route through the classic path
    td3 = search(idx, parse_complex_phrase(idx, '"spark window"'), k=10,
                 precision="float64")
    assert sorted(td3.docids.tolist()) == [0, 2]
    with _pt.raises(ValueError):
        parse_complex_phrase(idx, '"spark wind*"~2')


@pytest.mark.parametrize("seed", range(8))
def test_sloppy_batch_matches_scalar_walk(seed):
    """The vectorized 2-term lockstep leapfrog (_sloppy_freqs_2term_batch)
    is bit-identical to the faithful scalar PhraseQueue walk on random
    position lists, in BOTH float32 (lucene) and float64 accumulation."""
    from lucene_spark.kernel import (
        _sloppy_freqs_2term_batch,
        lucene_sloppy_freq,
    )

    rng = np.random.default_rng(1000 + seed)
    for _ in range(60):
        ndocs = int(rng.integers(1, 25))
        docs = np.arange(ndocs, dtype=np.int64)
        offs = rng.choice(5, size=2, replace=False).tolist()
        offA, offB = (sorted(offs) if rng.random() < 0.5 else offs)
        posA_l, posB_l, fa, fb = [], [], [], []
        for _d in range(ndocs):
            na, nb = int(rng.integers(1, 9)), int(rng.integers(1, 9))
            posA_l.append(np.sort(rng.choice(30, size=na, replace=False)).astype(np.int64))
            posB_l.append(np.sort(rng.choice(30, size=nb, replace=False)).astype(np.int64))
            fa.append(na)
            fb.append(nb)
        fA, fB = np.array(fa, dtype=np.int64), np.array(fb, dtype=np.int64)
        posA, posB = np.concatenate(posA_l), np.concatenate(posB_l)
        dl = np.full(ndocs, 30, dtype=np.int64)
        arrs = [
            (docs, fA, dl, posA, np.cumsum(fA) - fA),
            (docs, fB, dl, posB, np.cumsum(fB) - fB),
        ]
        slop = int(rng.integers(0, 7))
        for f32 in (True, False):
            got = _sloppy_freqs_2term_batch(arrs, [offA, offB], docs, slop, f32)
            for i in range(ndocs):
                want = lucene_sloppy_freq(
                    [posA_l[i] - offA, posB_l[i] - offB],
                    [offA, offB], ["a", "b"], slop, f32,
                )
                assert got[i] == want, (slop, f32, posA_l[i], posB_l[i])
