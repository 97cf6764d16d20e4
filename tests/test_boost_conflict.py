"""Same term under two boosts — Lucene scores each clause's weight
independently (two leaf weights); the engine now routes conflicted terms
through per-node single-member synonym scorers."""

import math

import pytest

from lucene_spark.index import build_index
from lucene_spark.search import apply_boosts, parse_query, search


def test_apply_boosts_conflict_rewrite():
    node, boosts = apply_boosts(
        ("or", [("boost", ("term", "a"), 2.0), ("term", "a"),
                ("term", "b")]))
    assert node == ("or", [("syn", ["a"], 2.0), ("syn", ["a"], 1.0),
                           ("term", "b")])
    assert boosts == {}
    # unconflicted terms keep the cheap shared-map path
    node, boosts = apply_boosts(
        ("or", [("boost", ("term", "a"), 2.0), ("term", "b")]))
    assert node == ("or", [("term", "a"), ("term", "b")])
    assert boosts == {"a": 2.0}


def test_same_term_two_boosts_scores_like_lucene(spark):
    pages = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(
            ["alpha beta", "alpha alpha gamma", "beta gamma", "alpha"])],
        "url string, text string")
    idx = build_index(spark, pages)
    # "alpha^2 alpha" = two SHOULD clauses -> 3x the single-clause score
    q = parse_query("alpha^2 alpha")
    td = search(idx, q, k=10, precision="float64", prune=False)
    base = search(idx, "alpha", k=10, precision="float64", prune=False)
    bmap = {int(d): s for d, s in zip(base.docids, base.scores)}
    for d, s in zip(td.docids, td.scores):
        assert math.isclose(s, 3.0 * bmap[int(d)], rel_tol=1e-12)
    # pruned and exhaustive agree
    tdp = search(idx, q, k=10, precision="float64", prune=True)
    assert tdp.docids.tolist() == td.docids.tolist()
    assert [round(x, 9) for x in tdp.scores.tolist()] == \
        [round(x, 9) for x in td.scores.tolist()]
