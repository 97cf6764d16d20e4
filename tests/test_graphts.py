"""GraphTokenStreamFiniteStrings port — reference goldens from
core TestGraphTokenStreamFiniteStrings.java (token = (term, posInc,
posLength))."""

import pytest

from lucene_spark.graphts import GraphTokenStream


def strings(g, start=0, end=None):
    return [([t for t, _ in p], [i for _, i in p])
            for p in g.finite_strings(start, end)]


def test_illegal_stacked_start():
    with pytest.raises(ValueError):
        GraphTokenStream([("a", 0, 1), ("b", 1, 1)])


def test_wifi_graph():
    g = GraphTokenStream([
        ("fast", 1, 1), ("wi", 1, 1), ("wifi", 0, 2), ("fi", 1, 1),
        ("network", 1, 1)])
    assert strings(g) == [
        (["fast", "wi", "fi", "network"], [1, 1, 1, 1]),
        (["fast", "wifi", "network"], [1, 1, 1]),
    ]
    assert g.articulation_points() == [1, 3]
    assert not g.has_side_path(0)
    assert strings(g, 0, 1) == [(["fast"], [1])]
    assert g.terms(0) == ["fast"]
    assert g.has_side_path(1)
    assert strings(g, 1, 3) == [(["wi", "fi"], [1, 1]), (["wifi"], [1])]
    assert not g.has_side_path(3)
    assert strings(g, 3) == [(["network"], [1])]
    assert g.terms(3) == ["network"]


def test_single_graph_with_gap():
    # "hey the fast wifi network" with "the" stopped out: the dangling gap
    # state is dead-state-removed and everything renumbers
    g = GraphTokenStream([
        ("hey", 1, 1), ("fast", 2, 1), ("wi", 1, 1), ("wifi", 0, 2),
        ("fi", 1, 1), ("network", 1, 1)])
    assert strings(g) == [
        (["hey", "fast", "wi", "fi", "network"], [1, 2, 1, 1, 1]),
        (["hey", "fast", "wifi", "network"], [1, 2, 1, 1]),
    ]
    assert g.articulation_points() == [1, 2, 4]
    assert not g.has_side_path(0)
    assert strings(g, 0, 1) == [(["hey"], [1])]
    assert not g.has_side_path(1)
    assert strings(g, 1, 2) == [(["fast"], [2])]
    assert g.has_side_path(2)
    assert strings(g, 2, 4) == [(["wi", "fi"], [1, 1]), (["wifi"], [1])]
    assert not g.has_side_path(4)
    assert strings(g, 4) == [(["network"], [1])]


def test_graph_and_gap_same_token():
    g = GraphTokenStream([
        ("fast", 1, 1), ("wi", 2, 1), ("wifi", 0, 2), ("fi", 1, 1),
        ("network", 1, 1)])
    assert strings(g) == [
        (["fast", "wi", "fi", "network"], [1, 2, 1, 1]),
        (["fast", "wifi", "network"], [1, 2, 1]),
    ]


def test_stacked_tokens_inherit_head_increment():
    # stacked token after a hole keeps the head's increment (build :236-241)
    g = GraphTokenStream([("a", 1, 1), ("b", 2, 1), ("c", 0, 1)])
    assert strings(g) == [(["a", "b"], [1, 2]), (["a", "c"], [1, 2])]


def test_linear_no_articulation_single_edge():
    g = GraphTokenStream([("a", 1, 1), ("b", 0, 1)])
    assert strings(g) == [(["a"], [1]), (["b"], [1])]
    assert g.articulation_points() == []


def test_graph_boolean_query_ast():
    from lucene_spark.search import graph_boolean_query

    # wifi graph -> one term segment + one side-path segment + one term
    toks = [("fast", 1, 1), ("wi", 1, 1), ("wifi", 0, 2), ("fi", 1, 1),
            ("network", 1, 1)]
    node = graph_boolean_query(toks)
    assert node == ("or", [
        ("term", "fast"),
        ("or", [("and", ["wi", "fi"]), ("term", "wifi")]),
        ("term", "network"),
    ])
    # MUST operator wraps the same segments conjunctively
    assert graph_boolean_query(toks, operator="must")[0] == "andn"
    # auto_phrase: multi-token side paths become position-faithful phrases
    node = graph_boolean_query(toks, auto_phrase=True)
    assert node[1][1] == ("or", [("phrase", [("wi", 0), ("fi", 1)]),
                                 ("term", "wifi")])
    # stacked single tokens at one position -> SynonymQuery
    node = graph_boolean_query([("a", 1, 1), ("b", 0, 1), ("c", 1, 1)])
    assert node == ("or", [("syn", ["a", "b"]), ("term", "c")])
    # flat single-term stream -> the bare term
    assert graph_boolean_query([("x", 1, 1)]) == ("term", "x")


def test_graph_boolean_query_end_to_end(spark):
    from lucene_spark.index import build_index
    from lucene_spark.search import graph_boolean_query, search

    pages = spark.createDataFrame(
        [("0", "fast wi fi network"), ("1", "fast wifi network"),
         ("2", "slow wifi network"), ("3", "fast cable network"),
         ("4", "nothing here")],
        "url string, text string")
    idx = build_index(spark, pages, with_positions=True)
    toks = [("fast", 1, 1), ("wi", 1, 1), ("wifi", 0, 2), ("fi", 1, 1),
            ("network", 1, 1)]
    td = search(idx, graph_boolean_query(toks, operator="must"), k=10,
                precision="float64")
    urls = {r["docid"]: r["url"] for r in idx.docs.select("docid", "url").collect()}
    # MUST: every segment required -> docs 0 and 1 only
    assert sorted(urls[d] for d in td.docids.tolist()) == ["0", "1"]
    td = search(idx, graph_boolean_query(toks), k=10, precision="float64")
    # SHOULD: anything matching any segment
    assert sorted(urls[d] for d in td.docids.tolist()) == ["0", "1", "2", "3"]


def test_graph_phrase_query_ast():
    from lucene_spark.search import graph_phrase_query

    toks = [("fast", 1, 1), ("wi", 1, 1), ("wifi", 0, 2), ("fi", 1, 1),
            ("network", 1, 1)]
    node = graph_phrase_query(toks)
    assert node == ("or", [
        ("phrase", [("fast", 0), ("wi", 1), ("fi", 2), ("network", 3)]),
        ("phrase", [("fast", 0), ("wifi", 1), ("network", 2)]),
    ])
    # slop routes to sloppy nodes; a hole keeps its gap in the positions
    node = graph_phrase_query(
        [("hey", 1, 1), ("fast", 2, 1), ("wi", 1, 1), ("wifi", 0, 2),
         ("fi", 1, 1), ("network", 1, 1)], slop=1)
    assert node[1][0] == ("sloppy", [("hey", 0), ("fast", 2), ("wi", 3),
                                     ("fi", 4), ("network", 5)], 1)


def test_graph_phrase_end_to_end(spark):
    from lucene_spark.index import build_index
    from lucene_spark.search import graph_phrase_query, search

    pages = spark.createDataFrame(
        [("0", "fast wi fi network"), ("1", "fast wifi network"),
         ("2", "wifi fast network"), ("3", "fast wifi here network")],
        "url string, text string")
    idx = build_index(spark, pages, with_positions=True)
    toks = [("fast", 1, 1), ("wi", 1, 1), ("wifi", 0, 2), ("fi", 1, 1),
            ("network", 1, 1)]
    td = search(idx, graph_phrase_query(toks), k=10, precision="float64")
    urls = {r["docid"]: r["url"] for r in idx.docs.select("docid", "url").collect()}
    assert sorted(urls[d] for d in td.docids.tolist()) == ["0", "1"]
    td = search(idx, graph_phrase_query(toks, slop=1), k=10,
                precision="float64")
    assert sorted(urls[d] for d in td.docids.tolist()) == ["0", "1", "3"]


def test_finite_strings_count_fuzz():
    """Random well-formed graphs: the number of finite strings equals the
    product over articulation segments of each segment's path count (paths
    through independent segments compose multiplicatively)."""
    import random

    from lucene_spark.graphts import GraphTokenStream

    rng = random.Random(9)
    for _ in range(200):
        toks = []
        i = 0
        for seg in range(rng.randint(1, 4)):
            if rng.random() < 0.5:
                toks.append((f"w{i}", 1, 1))
                i += 1
            else:  # a wi/fi-style side path
                toks.append((f"w{i}", 1, 1))
                toks.append((f"s{i}", 0, 2))
                toks.append((f"w{i + 1}", 1, 1))
                i += 2
        g = GraphTokenStream(toks)
        paths = list(g.finite_strings())
        pts = g.articulation_points()
        total = 1
        last = 0
        for j in range(len(pts) + 1):
            start = last
            end = pts[j] if j < len(pts) else None
            last = end
            total *= sum(1 for _ in g.finite_strings(start, end))
        assert len(paths) == total
        # every path is a valid walk: terms all come from the input
        in_terms = {t for t, _, _ in toks}
        for p in paths:
            assert all(t in in_terms for t, _ in p)
