"""SuggestStopFilter, SpanPayloadCheckQuery, ConfusionMatrix, and
DatasetSplitter analogs."""

import pytest

from lucene_spark.classify import (
    ConfusionMatrix,
    confusion_matrix_df,
    dataset_splitter,
)
from lucene_spark.suggest import suggest_stop_filter


def test_suggest_stop_filter():
    stops = {"a", "the", "to"}
    # TestSuggestStopFilter: trailing "to" kept (user may be typing "tool")
    toks, flags = suggest_stop_filter(
        ["go", "to"], [2, 5], 5, stops)
    assert toks == ["go", "to"] and flags == [False, True]
    # trailing stopword followed by whitespace → complete word → dropped
    toks, flags = suggest_stop_filter(
        ["go", "to"], [2, 5], 6, stops)
    assert toks == ["go"] and flags == [False]
    # interior stopwords always dropped
    toks, flags = suggest_stop_filter(
        ["go", "to", "the", "school"], [2, 5, 9, 16], 16, stops)
    assert toks == ["go", "school"]


def test_confusion_matrix_reference_semantics():
    # 2-class example: 8 a→a, 2 a→b, 1 b→a, 9 b→b
    cm = ConfusionMatrix([("a", "a", 8), ("a", "b", 2),
                          ("b", "a", 1), ("b", "b", 9)])
    assert cm.recall("a") == 0.8
    assert cm.recall("b") == 0.9
    assert cm.precision("a") == 8 / 9
    assert cm.precision("b") == 9 / 11
    f1 = cm.f1("a")
    assert abs(f1 - (2 * (8 / 9) * 0.8 / ((8 / 9) + 0.8))) < 1e-12
    # reference accuracy formula: (tp + tn) / (tfp + fn + tn) with its
    # per-(class, row) true-negative counting — 17/23 here, NOT the naive
    # diagonal/total 17/20 (ConfusionMatrixGenerator.java getAccuracy)
    assert abs(cm.accuracy() - 17 / 23) < 1e-12
    # unseen class
    assert cm.precision("zzz") == 0.0 and cm.recall("zzz") == 0.0


@pytest.mark.spark
def test_confusion_matrix_df_and_splitter(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de", "en" if i % 5 else "de")
         for i in range(60)], "id long, lang string, pred string")
    counts, cm = confusion_matrix_df(df, "lang", "pred")
    rows = {(r["actual"], r["predicted"]): r["cnt"]
            for r in counts.collect()}
    assert sum(rows.values()) == 60
    assert cm.recall("en") == rows.get(("en", "en"), 0) / (
        rows.get(("en", "en"), 0) + rows.get(("en", "de"), 0))

    train, test, cv = dataset_splitter(df, 0.2, 0.2, "lang", "id")
    n_train, n_test, n_cv = train.count(), test.count(), cv.count()
    assert n_train + n_test + n_cv == 60
    assert n_train > n_test and n_train > n_cv
    # deterministic: same split on re-run
    train2, _, _ = dataset_splitter(df, 0.2, 0.2, "lang", "id")
    assert sorted(r["id"] for r in train.collect()) == \
        sorted(r["id"] for r in train2.collect())


@pytest.mark.spark
def test_payload_check_docs(spark):
    from lucene_spark.payloads import build_payload_sidecar, \
        payload_check_docs

    pages = spark.createDataFrame(
        [(0, "quick|2.0 brown|3.0 fox|4.0"),
         (1, "quick|1.0 brown|3.0 fox|4.0"),
         (2, "quick|2.0 red fox|4.0"),
         (3, "brown|3.0 quick|2.0 fox|4.0")],
        "docid long, text string")
    sidecar = build_payload_sidecar(pages, stopwords=frozenset())
    # EQ on the full span payload sequence
    got = {r["docid"] for r in payload_check_docs(
        sidecar, ["quick", "brown", "fox"], [2.0, 3.0, 4.0]).collect()}
    assert got == {0}
    # GTE accepts doc 0 only (doc 1 has quick=1.0)
    got = {r["docid"] for r in payload_check_docs(
        sidecar, ["quick", "brown", "fox"], [2.0, 3.0, 4.0],
        operation="gte").collect()}
    assert got == {0}
    got = {r["docid"] for r in payload_check_docs(
        sidecar, ["quick", "brown", "fox"], [2.0, 3.0, 4.0],
        operation="lte").collect()}
    assert got == {0, 1}
    # None in the reference list requires an ABSENT payload
    got = {r["docid"] for r in payload_check_docs(
        sidecar, ["quick", "red"], [2.0, None]).collect()}
    assert got == {2}
    # span adjacency still required: doc 3 has the terms out of order
    got = {r["docid"] for r in payload_check_docs(
        sidecar, ["quick", "brown"], [2.0, 3.0]).collect()}
    assert got == {0}


def test_analyzing_suggester_keyword():
    # TestAnalyzingSuggester.testKeyword: dup surfaces keep max weight,
    # exactFirst beats higher-weighted longer completions
    from lucene_spark.suggest import analyzing_suggest

    keys = [("foo", 50), ("bar", 10), ("barbar", 10), ("barbar", 12),
            ("barbara", 6), ("bar", 5), ("barbara", 1)]
    kw = lambda s: [s]  # noqa: E731
    assert analyzing_suggest(keys, "f", kw, 2) == [("foo", 50)]
    assert analyzing_suggest(keys, "bar", kw, 1) == [("bar", 10)]
    assert analyzing_suggest(keys, "b", kw, 2) == [
        ("barbar", 12), ("bar", 10)]
    assert analyzing_suggest(keys, "ba", kw, 3) == [
        ("barbar", 12), ("bar", 10), ("barbara", 6)]


def test_analyzing_suggester_standard_stopwords():
    # TestAnalyzingSuggester.testStandard: analyzed-form matching lets
    # stopword-omitting prefixes still reach the surface form
    from lucene_spark.suggest import analyzing_suggest
    from lucene_spark.tokenizers import ENGLISH_STOP_WORDS

    an = lambda s: [t for t in s.lower().split()  # noqa: E731
                    if t not in ENGLISH_STOP_WORDS]
    inp = "the ghost of christmas past the"
    for q in (inp, "the ghost of chris", "ghost of chris", "ghost chris",
              "ghost christmas past the"):
        assert analyzing_suggest([(inp, 50)], q, an, 1) == [(inp, 50)]


def test_context_query():
    # TestContextQuery.testSimpleContextQuery: score = weight × boost
    from lucene_spark.suggest import context_suggest

    ents = [("suggestion1", 8, "type1"), ("suggestion2", 7, "type2"),
            ("suggestion3", 6, "type3"), ("suggestion4", 5, "type4")]
    got = context_suggest(ents, "sugg",
                          {"type1": 1, "type2": 2, "type3": 3, "type4": 4},
                          5)
    assert got == [("suggestion4", "type4", 20.0),
                   ("suggestion3", "type3", 18.0),
                   ("suggestion2", "type2", 14.0),
                   ("suggestion1", "type1", 8.0)]
    # no contexts → all match with boost 1
    got = context_suggest(ents, "sugg", None, 2)
    assert got[0] == ("suggestion1", "type1", 8.0)
    # filtering
    assert context_suggest(ents, "sugg", {"type2": 1}, 5) == [
        ("suggestion2", "type2", 7.0)]


@pytest.mark.spark
def test_doc_term_freq_vectors(spark):
    from lucene_spark.classify import doc_term_freq_vectors

    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "dog dog dog")],
        "doc_id long, text string")
    dense = {r["doc_id"]: (r["terms"], r["vector"])
             for r in doc_term_freq_vectors(docs).collect()}
    assert dense[0][0] == ["cat", "mat", "on", "sat", "the"]
    assert dense[0][1] == [1.0, 1.0, 1.0, 1.0, 2.0]
    assert dense[1] == (["dog"], [3.0])
    sparse = {r["doc_id"]: r["vector"] for r in doc_term_freq_vectors(
        docs, vocab=["cat", "dog", "the"]).collect()}
    assert sparse[0] == [1.0, 0.0, 2.0]
    assert sparse[1] == [0.0, 3.0, 0.0]


@pytest.mark.spark
def test_payload_span_util(spark):
    from lucene_spark.payloads import build_payload_sidecar, \
        payload_span_util

    pages = spark.createDataFrame(
        [(0, "quick|2.0 brown|3.0 fox quick|9.0 brown|8.0"),
         (1, "brown|1.0 quick|1.0")],
        "docid long, text string")
    sidecar = build_payload_sidecar(pages, stopwords=frozenset())
    rows = sorted((r["docid"], r["position"], r["term"], r["payload"])
                  for r in payload_span_util(
                      sidecar, ["quick", "brown"]).collect())
    # doc 0 matches the span twice (positions 0-1 and 3-4); doc 1 has the
    # terms out of order → no rows
    assert rows == [(0, 0, "quick", 2.0), (0, 1, "brown", 3.0),
                    (0, 3, "quick", 9.0), (0, 4, "brown", 8.0)]
