"""CoveringQuery: per-document dynamic minimumNumberShouldMatch.

Reference semantics (sandbox/src/java/org/apache/lucene/search/
CoveringQuery.java:42-118 + CoveringScorer):
- a doc matches when #matching clauses >= max(1, minimumNumberMatch(doc))
- the score is the SUM of the matching sub-scorers' scores
- a per-doc minimum above the clause count is NOT clamped -> no match
- docs absent from the LongValuesSource read 0 -> the max(1, .) floor
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.covering import covering_query
from lucene_spark.index import build_index
from lucene_spark.search import search


@pytest.fixture(scope="module")
def cov_index(spark):
    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},   # matches all 4
        {"doc_id": 1, "text": "alpha beta gamma"},          # matches 3
        {"doc_id": 2, "text": "alpha beta"},                # matches 2
        {"doc_id": 3, "text": "alpha"},                     # matches 1
        {"doc_id": 4, "text": "zeta eta"},                  # matches 0
        {"doc_id": 5, "text": "alpha beta gamma delta"},    # matches all 4
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", seg_size=4)
    return idx, docs


CLAUSES = ["alpha", "beta", "gamma", "delta"]


def _mm(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["docid", "value"]))


def _hits(df):
    return {r["docid"]: r["score"] for r in df.collect()}


def test_per_doc_minimum(cov_index, spark):
    idx, _ = cov_index
    # doc 0 requires 4 (has 4 -> in), doc 1 requires 4 (has 3 -> out),
    # doc 2 requires 2 (has 2 -> in), doc 3 requires 2 (has 1 -> out)
    mm = _mm(spark, [(0, 4), (1, 4), (2, 2), (3, 2), (5, 1)])
    got = _hits(covering_query(idx, CLAUSES, mm, k=10))
    assert set(got) == {0, 2, 5}


def test_minimum_floors_at_one(cov_index, spark):
    idx, _ = cov_index
    # value 0 and negative values floor to 1 (max(1, .)); docs absent from
    # the values frame read 0 -> also floor to 1
    mm = _mm(spark, [(0, 0), (1, -5)])
    got = _hits(covering_query(idx, CLAUSES, mm, k=10))
    assert set(got) == {0, 1, 2, 3, 5}


def test_minimum_above_clause_count_never_matches(cov_index, spark):
    idx, _ = cov_index
    mm = _mm(spark, [(0, 5), (5, 5), (1, 1)])
    got = _hits(covering_query(idx, CLAUSES, mm, k=10))
    assert set(got) == {1, 2, 3}


def test_score_is_sum_of_matching_clauses(cov_index, spark):
    idx, _ = cov_index
    # with minimum 1 everywhere the score equals the plain SHOULD-union
    # (BooleanQuery OR) score for every matching doc
    mm = _mm(spark, [(d, 1) for d in range(6)])
    got = _hits(covering_query(idx, CLAUSES, mm, k=10,
                               precision="float64"))
    td = search(idx, "alpha beta gamma delta", k=10, precision="float64")
    want = dict(zip(td.docids.tolist(), td.scores.tolist()))
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_empty_clauses(cov_index, spark):
    idx, _ = cov_index
    out = covering_query(idx, [], _mm(spark, [(0, 1)]), k=10)
    assert out.count() == 0
