"""ValueSource / FunctionQuery framework (queries/function/*.java):

- FunctionQuery matches ALL docs, score = boost * value (FunctionQuery.java:110)
- FunctionRangeQuery matches in-range values, score = value
  (FunctionRangeQuery.java:32)
- FunctionMatchQuery matches a predicate at constant score
  (FunctionMatchQuery.java:89)
- function nodes: linear, reciprocal a/(m*x+b), rangemap, scale (corpus
  min/max traversal), sum/product/max/min/div/pow, if, query-score source
  with defVal, term-stat constants (docfreq/idf/ttf/sttf/numdocs/maxdoc),
  tf=sqrt(freq) / raw termfreq, norm decode, bool compare/and/or/not, def.
"""

import math

import pytest

from lucene_spark import valuesource as vs
from lucene_spark.index import build_index


@pytest.fixture(scope="module")
def vs_index(spark):
    rows = [
        ("u1", "alpha beta alpha"),
        ("u2", "alpha gamma"),
        ("u3", "beta beta gamma"),
        ("u4", "alpha delta delta"),
        ("u5", "epsilon"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    return build_index(spark, docs, seg_size=2)


@pytest.fixture(scope="module")
def vals(spark):
    # docid 4 has NO value row (missing-value semantics)
    return spark.createDataFrame(
        [(0, 10.0, 2.0), (1, 20.0, 4.0), (2, 5.0, 1.0), (3, 40.0, 8.0)],
        "docid long, price double, qty double",
    )


def _as_dict(td):
    return {int(d): float(s) for d, s in zip(td.docids, td.scores)}


def test_function_query_matches_all_docs(vs_index, vals):
    td = vs.function_query(vs_index, vs.field("price"), values=vals, k=10)
    got = _as_dict(td)
    # all 5 docs match; missing value scores 0 (FunctionValues default)
    assert got == {3: 40.0, 1: 20.0, 0: 10.0, 2: 5.0, 4: 0.0}


def test_function_query_boost(vs_index, vals):
    td = vs.function_query(vs_index, vs.field("qty"), values=vals, k=2,
                           boost=3.0)
    assert _as_dict(td) == {3: 24.0, 1: 12.0}


def test_linear_recip_rangemap(vs_index, vals):
    td = vs.function_query(
        vs_index, vs.linear(vs.field("price"), 2.0, 1.0), values=vals, k=1)
    assert _as_dict(td) == {3: 81.0}
    # recip: a/(m*x+b) = 100/(1*price+0)
    td = vs.function_query(
        vs_index, vs.recip(vs.field("price"), 1.0, 100.0, 0.0),
        values=vals, k=1)
    assert _as_dict(td) == {2: 20.0}
    # rangemap: price in [10,20] → 1, else 0
    td = vs.function_query(
        vs_index, vs.rangemap(vs.field("price"), 10.0, 20.0, 1.0, 0.0),
        values=vals, k=10)
    got = _as_dict(td)
    assert got[0] == 1.0 and got[1] == 1.0 and got[3] == 0.0
    # rangemap default=None keeps the source value (RangeMapFloatFunction:29)
    td = vs.function_query(
        vs_index, vs.rangemap(vs.field("price"), 10.0, 20.0, 1.0),
        values=vals, k=10)
    assert _as_dict(td)[3] == 40.0


def test_scale_traverses_corpus(vs_index, vals):
    # price spans [5,40] over docs WITH a value → scaled to [0,1]
    td = vs.function_query(
        vs_index, vs.scale(vs.field("price"), 0.0, 1.0), values=vals, k=10)
    got = _as_dict(td)
    assert got[3] == 1.0 and got[2] == 0.0
    assert abs(got[1] - (20.0 - 5.0) / 35.0) < 1e-12


def test_composites(vs_index, vals):
    src = vs.vs_sum(vs.field("price"), vs.vs_product(vs.field("qty"),
                                                     vs.const(2.0)))
    td = vs.function_query(vs_index, src, values=vals, k=1)
    assert _as_dict(td) == {3: 56.0}
    td = vs.function_query(
        vs_index, vs.vs_max(vs.field("price"), vs.const(15.0)),
        values=vals, k=10)
    assert _as_dict(td)[2] == 15.0
    td = vs.function_query(
        vs_index, vs.vs_div(vs.field("price"), vs.field("qty")),
        values=vals, k=10)
    assert _as_dict(td)[0] == 5.0
    td = vs.function_query(
        vs_index, vs.vs_pow(vs.field("qty"), vs.const(2.0)),
        values=vals, k=1)
    assert _as_dict(td) == {3: 64.0}


def test_if_and_bools(vs_index, vals):
    # if(price > 15, qty, 0)
    src = vs.vs_if(vs.vs_cmp("gt", vs.field("price"), vs.const(15.0)),
                   vs.field("qty"), vs.const(0.0))
    got = _as_dict(vs.function_query(vs_index, src, values=vals, k=10))
    assert got[3] == 8.0 and got[1] == 4.0 and got[0] == 0.0
    src = vs.vs_if(
        vs.vs_and(vs.vs_cmp("gte", vs.field("price"), vs.const(10.0)),
                  vs.vs_not(vs.vs_cmp("eq", vs.field("qty"), vs.const(8.0)))),
        vs.const(1.0), vs.const(0.0))
    got = _as_dict(vs.function_query(vs_index, src, values=vals, k=10))
    assert got[0] == 1.0 and got[1] == 1.0 and got[3] == 0.0


def test_query_value_source(vs_index):
    # QueryValueSource: BM25('alpha') score where matching, defVal=-1 else
    src = vs.query_vs("alpha", defval=-1.0)
    got = _as_dict(vs.function_query(vs_index, src, k=10))
    assert got[2] == -1.0 and got[4] == -1.0
    assert got[0] > got[1] > 0  # tf=2 beats tf=1 under equal dl? dl differs
    # defFunction: first defined — price, else qty*100
    # (doc 4 missing from vals entirely → falls through to 0 via coalesce)


def test_term_stats_and_tf(vs_index):
    # docfreq('alpha')=3, numdocs=5, idf=ln(6/4)+1
    got = _as_dict(vs.function_query(vs_index, vs.docfreq("alpha"), k=1))
    assert set(got.values()) == {3.0}
    got = _as_dict(vs.function_query(vs_index, vs.idf("alpha"), k=1))
    assert abs(list(got.values())[0] - (math.log(6 / 4) + 1)) < 1e-12
    got = _as_dict(vs.function_query(vs_index, vs.numdocs(), k=1))
    assert set(got.values()) == {5.0}
    got = _as_dict(vs.function_query(vs_index, vs.totaltermfreq("alpha"), k=1))
    assert set(got.values()) == {4.0}  # cf: 2+1+1
    got = _as_dict(vs.function_query(vs_index, vs.sumtotaltermfreq(), k=1))
    assert set(got.values()) == {12.0}  # total tokens: 3+2+3+3+1
    # tf: sqrt(freq), 0 on non-match (TFValueSource.java:153-157)
    got = _as_dict(vs.function_query(vs_index, vs.tf("alpha"), k=10))
    assert abs(got[0] - math.sqrt(2)) < 1e-12
    assert got[1] == 1.0 and got[2] == 0.0
    got = _as_dict(vs.function_query(vs_index, vs.termfreq("alpha"), k=10))
    assert got[0] == 2.0 and got[2] == 0.0


def test_norm_decode(vs_index):
    from lucene_spark.smallfloat import byte4_to_int, int_to_byte4

    got = _as_dict(vs.function_query(vs_index, vs.norm(), k=10))
    # doc 4 'epsilon' has dl=1 → norm byte encodes 1 → 1/sqrt(1)=1
    assert got[4] == 1.0
    want = 1.0 / math.sqrt(byte4_to_int(int_to_byte4(3)))
    assert abs(got[0] - want) < 1e-12


def test_function_range_query(vs_index, vals):
    td = vs.function_range_query(vs_index, vs.field("price"),
                                 lower=10.0, upper=40.0,
                                 include_upper=False, values=vals, k=10)
    assert _as_dict(td) == {1: 20.0, 0: 10.0}
    td = vs.function_range_query(vs_index, vs.field("price"),
                                 lower=10.0, upper=40.0,
                                 include_lower=False, values=vals, k=10)
    assert _as_dict(td) == {3: 40.0, 1: 20.0}


def test_function_match_query(vs_index, vals):
    td = vs.function_match_query(vs_index, vs.field("price"),
                                 "v >= 10.0 AND v < 40.0",
                                 values=vals, k=10, boost=2.5)
    assert _as_dict(td) == {0: 2.5, 1: 2.5}
