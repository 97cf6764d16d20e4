"""TermAutomatonQuery tests (reference: sandbox/src/test/.../search/
TestTermAutomatonQuery.java — basic graph match, anyTerm gaps, illegal
automatons, equivalence with phrase/synonym shapes)."""

import numpy as np
import pytest

from lucene_spark.termautomaton import TermAutomatonQuery, count_matches


def wifi_query():
    # s0 -wifi-> ACC ; s0 -wi-> s1 -fi-> ACC  (the testBasic synonym graph)
    q = TermAutomatonQuery()
    s1 = q.create_state()
    s2 = q.create_state()
    q.add_transition(0, s2, "wifi")
    q.add_transition(0, s1, "wi")
    q.add_transition(s1, s2, "fi")
    q.set_accept(s2, True)
    return q.finish()


def test_illegal_automatons():
    q = TermAutomatonQuery()
    s = q.create_state()
    q.add_any_transition(0, s)
    q.set_accept(s, True)
    with pytest.raises(ValueError, match="lead with an ANY"):
        q.finish()

    q = TermAutomatonQuery()
    s = q.create_state()
    a = q.create_state()
    q.add_transition(0, s, "x")
    q.add_any_transition(s, a)
    q.set_accept(a, True)
    with pytest.raises(ValueError, match="end with an ANY"):
        q.finish()

    q = TermAutomatonQuery()
    q.set_accept(0, True)
    q.add_transition(0, q.create_state(), "x")
    with pytest.raises(ValueError, match="empty string"):
        q.finish()


def _freq(node, events):
    spec = node[1]
    tid = {t: i for i, t in enumerate(spec["terms"])}
    evs = [(p, tid[t]) for p, t in events]
    return count_matches(evs, spec["trans"], spec["accept"], spec["any_sym"])


def test_count_matches_walk():
    node = wifi_query()
    assert _freq(node, [(0, "wifi")]) == 1
    assert _freq(node, [(0, "wi"), (1, "fi")]) == 1
    assert _freq(node, [(0, "wi"), (2, "fi")]) == 0       # gap, no ANY
    assert _freq(node, [(0, "wifi"), (3, "wifi")]) == 2
    assert _freq(node, [(0, "wi"), (1, "fi"), (2, "wifi")]) == 2
    # 'wi fi fi': second fi cannot continue (state consumed)
    assert _freq(node, [(0, "wi"), (1, "fi"), (2, "fi")]) == 1


def test_any_transition_walk():
    # fast <ANY> network
    q = TermAutomatonQuery()
    a, b, c = q.create_state(), q.create_state(), q.create_state()
    q.add_transition(0, a, "fast")
    q.add_any_transition(a, b)
    q.add_transition(b, c, "network")
    q.set_accept(c, True)
    node = q.finish()
    # fast X network: positions 0,2 for the terms, gap at 1 is ANY
    assert _freq(node, [(0, "fast"), (2, "network")]) == 1
    # adjacent (no gap token): ANY must consume exactly one position
    assert _freq(node, [(0, "fast"), (1, "network")]) == 0
    # two gaps: ANY consumes one only
    assert _freq(node, [(0, "fast"), (3, "network")]) == 0
    # ANY may consume a query term's own position too — and the reference
    # double-counts here: the state at the middle 'fast' position is stepped
    # BOTH by its term arc (ANY arcs match every term after the finish()
    # rewrite, TermAutomatonQuery.java:175-195) AND by the next event's
    # gap-advance loop, which starts from the previous term position
    # (TermAutomatonScorer.java:278-301) — two convergent paths, freq 2
    assert _freq(node, [(0, "fast"), (1, "fast"), (2, "network")]) == 2


@pytest.fixture(scope="module")
def ta_index(spark):
    from lucene_spark.index import build_index

    rows = [
        ("u0", "fast wifi network here"),
        ("u1", "fast wi fi network"),
        ("u2", "the wifi is fast wifi"),
        ("u3", "wi fi speed"),
        ("u4", "fast food"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    return build_index(spark, pages, with_positions=True)


def test_spark_e2e_and_parity(spark, ta_index):
    from lucene_spark.search import search

    node = wifi_query()
    pruned = search(ta_index, node, k=10, precision="float64", prune=True)
    exact = search(ta_index, node, k=10, precision="float64", prune=False)
    assert pruned.docids.tolist() == exact.docids.tolist()
    np.testing.assert_allclose(pruned.scores, exact.scores)
    assert set(pruned.docids.tolist()) == {0, 1, 2, 3}

    # doc 2 has freq 2 (two wifi) — must outrank same-dl freq-1 docs
    by_doc = dict(zip(pruned.docids.tolist(), pruned.scores.tolist()))
    assert by_doc[2] == max(by_doc.values())

    q = TermAutomatonQuery()
    a, b, c = q.create_state(), q.create_state(), q.create_state()
    q.add_transition(0, a, "fast")
    q.add_any_transition(a, b)
    q.add_transition(b, c, "network")
    q.set_accept(c, True)
    td = search(ta_index, q.finish(), k=10, precision="float64")
    assert td.docids.tolist() == [0]

    # automaton whose terms are all unindexed -> MatchNoDocs
    q2 = TermAutomatonQuery()
    z = q2.create_state()
    q2.add_transition(0, z, "zzzz")
    q2.set_accept(z, True)
    assert search(ta_index, q2.finish(), k=10).docids.tolist() == []
