"""FunctionScoreQuery / QueryRescorer semantics (queries/function/
FunctionScoreQuery.java:44-103, search/QueryRescorer.java:49-140):

- function_score REPLACES the wrapped score with the source expression;
  docs with no source value score 0 (javadoc :41-42)
- boostByValue multiplies, preserving hits MISSING from the values table
  (MultiplicativeBoostValuesSource contract, :74-75)
- boostByQuery multiplies only docs that also match the boosting query;
  a factor in (0,1) demotes (:91-96)
- rescore combines first + weight x second over the first-pass window only,
  reordering by (score desc, docid asc) (:113-127, sugar :175+)
"""

import numpy as np
import pytest

from lucene_spark.funcscore import (
    boost_by_query,
    boost_by_value,
    function_score,
    rescore,
)
from lucene_spark.index import build_index
from lucene_spark.search import search


@pytest.fixture(scope="module")
def fs_index(spark):
    rows = [
        ("u1", "alpha beta alpha"),
        ("u2", "alpha gamma"),
        ("u3", "beta beta gamma"),
        ("u4", "alpha delta delta"),
        ("u5", "epsilon"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    return build_index(spark, docs, seg_size=2)


def _base_scores(idx):
    td = search(idx, "alpha", k=10, precision="float64", prune=False)
    return {int(d): float(s) for d, s in zip(td.docids, td.scores)}


def test_function_score_replaces_score(spark, fs_index):
    # source ignores the BM25 score entirely: score = docid value
    vals = spark.createDataFrame(
        [(0, 7.0), (1, 3.0), (3, 11.0)], "docid long, v double"
    )
    td = function_score(fs_index, "alpha", "v", values=vals, k=10,
                        precision="float64")
    got = {int(d): float(s) for d, s in zip(td.docids, td.scores)}
    # docs 0,1,3 match 'alpha'; all have values → replaced scores
    assert got == {3: 11.0, 0: 7.0, 1: 3.0}
    assert td.docids.tolist() == [3, 0, 1]  # score desc


def test_function_score_missing_value_scores_zero(spark, fs_index):
    vals = spark.createDataFrame([(0, 7.0)], "docid long, v double")
    td = function_score(fs_index, "alpha", "v", values=vals, k=10)
    got = {int(d): float(s) for d, s in zip(td.docids, td.scores)}
    assert got[0] == 7.0
    assert got[1] == 0.0 and got[3] == 0.0  # matched, no value → 0


def test_boost_by_value_multiplies_and_preserves_missing(spark, fs_index):
    base = _base_scores(fs_index)
    vals = spark.createDataFrame([(0, 2.0), (1, 0.5)], "docid long, boost double")
    td = boost_by_value(fs_index, "alpha", vals, "boost", k=10,
                        precision="float64")
    got = {int(d): float(s) for d, s in zip(td.docids, td.scores)}
    assert got[0] == base[0] * 2.0
    assert got[1] == base[1] * 0.5
    assert got[3] == base[3]  # missing from values → preserved as-is


def test_boost_by_query_boosts_only_comatches(spark, fs_index):
    base = _base_scores(fs_index)
    # 'gamma' matches docs 1 and 2; of the alpha hits only doc 1 co-matches
    td = boost_by_query(fs_index, "alpha", "gamma", 5.0, k=10,
                        precision="float64")
    got = {int(d): float(s) for d, s in zip(td.docids, td.scores)}
    assert got[1] == base[1] * 5.0
    assert got[0] == base[0] and got[3] == base[3]
    assert 2 not in got  # boosting query does not ADD matches


def test_boost_by_query_demotes_with_fractional_factor(spark, fs_index):
    base = _base_scores(fs_index)
    td = boost_by_query(fs_index, "alpha", "gamma", 0.1, k=10,
                        precision="float64")
    got = {int(d): float(s) for d, s in zip(td.docids, td.scores)}
    assert got[1] == pytest.approx(base[1] * 0.1)
    assert got[1] < min(got[0], got[3])


def test_rescore_combines_window_only(spark, fs_index):
    first = search(fs_index, "alpha", k=2, precision="float64")  # window of 2
    w = set(int(d) for d in first.docids)
    second_full = search(fs_index, "gamma", k=10, precision="float64",
                         prune=False)
    smap = {int(d): float(s) for d, s in zip(second_full.docids,
                                             second_full.scores)}
    td = rescore(fs_index, first, "gamma", top_n=10, weight=2.0,
                 precision="float64")
    assert set(int(d) for d in td.docids) == w  # never grows past the window
    fmap = {int(d): float(s) for d, s in zip(first.docids, first.scores)}
    for d, s in zip(td.docids, td.scores):
        d = int(d)
        want = fmap[d] + (2.0 * smap[d] if d in smap else 0.0)
        assert float(s) == want
    # reordered (score desc, docid asc)
    assert list(td.scores) == sorted(td.scores, reverse=True)


def test_rescore_empty_first_pass(fs_index):
    import numpy as np

    from lucene_spark.search import TopDocs

    empty = TopDocs(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    td = rescore(fs_index, empty, "gamma", top_n=5)
    assert len(td.docids) == 0
