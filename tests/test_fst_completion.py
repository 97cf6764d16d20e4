"""FSTCompletion analog — lookup goldens from suggest/fst
TestFSTCompletion.java and the discretization rule of
FSTCompletionLookup.build (:194-236)."""

import pytest

from lucene_spark.suggest import (
    fst_completion_buckets, fst_completion_lookup, fst_lookup_from_buckets,
)

KEYS = [  # TestFSTCompletion.evalKeys (term, bucket)
    ("one", 0), ("oneness", 1), ("onerous", 1), ("onesimus", 1),
    ("two", 1), ("twofold", 1), ("twonk", 1), ("thrive", 1),
    ("through", 1), ("threat", 1), ("three", 1), ("foundation", 1),
    ("fourblah", 1), ("fourteen", 1), ("four", 0), ("fourier", 0),
    ("fourty", 0), ("xo", 1),
]


@pytest.fixture(scope="module")
def bk(spark):
    return spark.createDataFrame(KEYS, "key string, bucket long")


def test_exact_match_high_priority(bk):
    assert fst_lookup_from_buckets(bk, "two", 1) == [("two", 1)]


def test_exact_match_low_priority_promoted(bk):
    assert fst_lookup_from_buckets(bk, "one", 2) == [
        ("one", 0), ("oneness", 1)]


def test_exact_match_reordering(bk):
    assert fst_lookup_from_buckets(bk, "four", 4) == [
        ("four", 0), ("fourblah", 1), ("fourteen", 1), ("fourier", 0)]


def test_no_promotion(bk):
    assert fst_lookup_from_buckets(bk, "one", 2, exact_first=False) == [
        ("oneness", 1), ("onerous", 1)]


def test_miss(bk):
    assert fst_lookup_from_buckets(bk, "xyz", 1) == []


def test_weight_discretization(spark):
    # FSTCompletionLookup.build: line i (sorted weight asc, key asc) gets
    # bucket i*buckets//count; an equal-weight run shares its first line's
    # bucket
    entries = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5), ("d", 7), ("e", 9), ("f", 9),
         ("g", 11), ("h", 20), ("i", 30), ("j", 40)],
        "key string, weight long")
    got = dict((r["key"], r["bucket"]) for r in
               fst_completion_buckets(entries, buckets=10).collect())
    # lines: a0 b1 c2 (share bucket 0), d3 -> 3, e4 f5 (share 4), g6 -> 6,
    # h7 -> 7, i8 -> 8, j9 -> 9
    assert got == {"a": 0, "b": 0, "c": 0, "d": 3, "e": 4, "f": 4,
                   "g": 6, "h": 7, "i": 8, "j": 9}


def test_lookup_from_weights(spark):
    entries = spark.createDataFrame(
        [("four", 1), ("fourblah", 50), ("fourteen", 50), ("fourier", 2),
         ("zzz", 99)],
        "key string, weight long")
    # buckets: four line0 -> 0, fourier line1 -> 2, fourblah/fourteen
    # lines 2,3 share bucket 4, zzz line4 -> 8
    got = fst_completion_lookup(entries, "four", n=4)
    assert got == [("four", 0), ("fourblah", 4), ("fourteen", 4),
                   ("fourier", 2)]


def test_prefix_match_batch():
    from lucene_spark.regexp import LuceneRegexp

    rx = LuceneRegexp("ab*c")
    got = rx.prefix_match_batch(
        ["ac", "acxyz", "abbbc", "abbbcd", "ab", "abd", "xc", None, ""])
    assert got.tolist() == [True, True, True, True, False, False, False,
                            False, False]
    # empty-accepting regex: every non-None key has the empty prefix
    rx2 = LuceneRegexp("x*")
    assert rx2.prefix_match_batch(["", "q", None]).tolist() == [
        True, True, False]


def test_regex_suggest(spark):
    from lucene_spark.suggest import regex_suggest

    entries = spark.createDataFrame(
        [("ace", 9), ("abc", 5), ("abbcx", 7), ("abd", 3), ("zc", 8)],
        "key string, weight long")
    got = [(r["key"], r["weight"])
           for r in regex_suggest(entries, "ab*c", n=10).collect()]
    # prefix-accepted: abc (whole), abbcx (prefix abbc), ace? a-c-e: 'ac'
    # is accepted as prefix -> yes.  abd/zc no.
    assert got == [("ace", 9), ("abbcx", 7), ("abc", 5)]


def test_document_dictionary(spark):
    from lucene_spark.suggest import document_dictionary, fst_completion_lookup
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("sort", 10, "p1"), ("sorted", 20, None), (None, 5, "x"),
         ("scan", None, "y")],
        "title string, pop long, extra string")
    d = document_dictionary(docs, "title", "pop", payload="extra")
    rows = {(r["key"], r["weight"]) for r in d.collect()}
    assert rows == {("sort", 10), ("sorted", 20)}  # null key/weight dropped
    # value-source weight (computed expression)
    d2 = document_dictionary(docs, "title", F.length("title") * 2)
    assert {(r["key"], r["weight"]) for r in d2.collect()} == {
        ("sort", 8), ("sorted", 12), ("scan", 8)}
    # feeds the completion pipeline directly
    got = fst_completion_lookup(d, "sort", n=2, buckets=2)
    assert [k for k, _ in got] == ["sort", "sorted"]


def test_wfst_lookup(spark):
    from lucene_spark.suggest import wfst_lookup

    entries = spark.createDataFrame(
        [("four", 1), ("fourblah", 50), ("fourteen", 50), ("fourier", 2)],
        "key string, weight long")
    # weight desc, key-order ties, exact promoted despite lowest weight
    assert wfst_lookup(entries, "four", n=3) == [
        ("four", 1), ("fourblah", 50), ("fourteen", 50)]
    assert wfst_lookup(entries, "four", n=3, exact_first=False) == [
        ("fourblah", 50), ("fourteen", 50), ("fourier", 2)]
    assert wfst_lookup(entries, "fourt", n=2) == [("fourteen", 50)]
    assert wfst_lookup(entries, "zzz", n=2) == []
