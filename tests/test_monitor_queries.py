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
