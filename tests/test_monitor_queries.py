"""Full-query Monitor: presearcher term extraction + MemoryIndex
verification (monitor/TermFilteredPresearcher.java + CandidateMatcher)."""

import pytest

from lucene_spark.monitor import ANYTOKEN, monitor_match_queries, \
    presearcher_terms
from lucene_spark.search import parse_query, rewrite


def _pre(q):
    return presearcher_terms(rewrite(parse_query(q)))


def test_presearcher_extraction():
    assert _pre("hello world") == {"hello", "world"}
    # conjunction: one representative child suffices
    assert len(_pre("quick AND brown")) == 1
    assert _pre("quick AND brown") <= {"quick", "brown"}
    # phrase: one member term
    assert _pre('"exact phrase"') <= {"exact", "phrase"}
    # a wildcard alone is unbounded
    assert _pre("bear*") == {ANYTOKEN}
    # but a conjunction with an anchored term uses the term
    assert _pre("bear* AND anchor") == {"anchor"}
    # pure negation: the required side drives the filter
    assert "term" in _pre("quick -bears") | _pre("term -neg")


@pytest.mark.spark
def test_monitor_match_queries(spark):
    docs = spark.createDataFrame([
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a slow green turtle walks past"),
        (2, "quick quick brown bears"),
        (3, "exact phrase matching works here"),
    ], "doc_id long, text string")
    queries = [
        ("q_and", "quick AND brown"),
        ("q_phrase", '"exact phrase"'),
        ("q_or", "turtle fox"),
        ("q_wild", "bear*"),
        ("q_neg", "quick -bears"),
        ("q_none", "zebra AND quick"),
    ]
    out = monitor_match_queries(spark, docs, queries)
    rows = sorted((r["qid"], r["doc_id"]) for r in out.collect())
    assert rows == [("q_and", 0), ("q_and", 2), ("q_neg", 0),
                    ("q_or", 0), ("q_or", 1), ("q_phrase", 3),
                    ("q_wild", 2)]
    # scores are real MemoryIndex scores, all positive
    assert all(r["score"] > 0 for r in out.collect())


def test_multipass_presearcher_pass_sets():
    from lucene_spark.monitor import presearcher_pass_terms, presearcher_terms
    from lucene_spark.search import parse_query, rewrite

    node = rewrite(parse_query("alpha AND beta AND gamma"), {"the"})
    p = presearcher_pass_terms(node, 2)
    assert len(p) == 2 and p[0] != p[1]
    assert p[0] == presearcher_terms(node)  # pass 0 == single-pass set
    # cycling beyond the conjunction's arity repeats (advancePhase quiet)
    p3 = presearcher_pass_terms(rewrite(parse_query("alpha AND beta"),
                                        set()), 3)
    assert p3[0] == p3[2]
    # disjunctions are invariant across passes
    pd = presearcher_pass_terms(rewrite(parse_query("alpha beta"), set()), 2)
    assert pd[0] == pd[1] == {"alpha", "beta"}


def test_multipass_matches_equal_single_pass(spark):
    from lucene_spark.monitor import monitor_match_queries

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma here"), (1, "alpha only text"),
         (2, "beta gamma pair"), (3, "alpha beta both"),
         (4, "nothing relevant")],
        "doc_id long, text string")
    queries = [("q1", "alpha AND beta"), ("q2", "gamma"),
               ("q3", '"alpha beta"'), ("q4", "al*")]
    one = {(r["qid"], r["doc_id"]) for r in monitor_match_queries(
        spark, docs, queries, passes=1).collect()}
    two = {(r["qid"], r["doc_id"]) for r in monitor_match_queries(
        spark, docs, queries, passes=2).collect()}
    assert one == two  # multipass narrows candidates, never matches
    assert ("q1", 0) in one and ("q1", 3) in one and ("q1", 1) not in one


def test_query_decomposer():
    from lucene_spark.monitor import decompose_query
    from lucene_spark.search import parse_query, rewrite

    def q(s):
        return rewrite(parse_query(s), set())

    # pure disjunction splits; duplicates collapse (the reference's Set)
    assert decompose_query(q("alpha beta alpha")) == [
        ("term", "alpha"), ("term", "beta")]
    # conjunctions are atomic
    assert decompose_query(q("alpha AND beta")) == [("and",
                                                     ["alpha", "beta"])]
    # MUST mixed with SHOULD is atomic
    node = q("+alpha beta")
    assert decompose_query(node) == [node]
    # exclusions re-attach to every disjunct
    node = q("alpha beta -gamma")
    got = decompose_query(node)
    assert got == [("not", ("term", "alpha"), ["gamma"]),
                   ("not", ("term", "beta"), ["gamma"])]
    # boost re-wraps
    assert decompose_query(("boost", ("or", [("term", "a"),
                                             ("term", "b")]), 2.0)) == [
        ("boost", ("term", "a"), 2.0), ("boost", ("term", "b"), 2.0)]
    # nested disjunctions flatten
    assert decompose_query(("or", [("or", [("term", "a"), ("term", "b")]),
                                   ("term", "c")])) == [
        ("term", "a"), ("term", "b"), ("term", "c")]
