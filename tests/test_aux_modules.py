"""monitor (percolator) / suggest / highlight / classify module tests."""

import pytest

from lucene_spark.classify import classify_knn
from lucene_spark.highlight import highlight
from lucene_spark.index import build_index
from lucene_spark.monitor import StoredQuery, match_documents
from lucene_spark.suggest import suggest_fuzzy, suggest_terms


CORPUS = [
    (0, "spark streaming window agg", "en"),
    (1, "spark batch join", "en"),
    (2, "window join the agg", "de"),
    (3, "totally unrelated words here", "fr"),
    (4, "spark spark spark window", "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def aidx(spark, docs):
    idx = build_index(spark, docs, text_col="text", key_col="doc_id", docid_col="doc_id")
    idx.postings = idx.postings.persist()
    idx.termdict = idx.termdict.persist()
    idx.postings.count()
    return idx


def test_monitor_matches(spark, docs):
    out = match_documents(
        spark, docs,
        [
            StoredQuery("all_sw", "spark window", mode="all"),
            StoredQuery("any_sw", "spark window", mode="any"),
            StoredQuery("stop_only", "the and", mode="any"),  # analyzes away
        ],
    )
    got = {(r["qid"], r["doc_id"]) for r in out.collect()}
    assert {(q, d) for q, d in got if q == "all_sw"} == {("all_sw", 0), ("all_sw", 4)}
    assert {d for q, d in got if q == "any_sw"} == {0, 1, 2, 4}
    assert not any(q == "stop_only" for q, _ in got)


def test_suggest(aidx):
    rows = suggest_terms(aidx, "sp", 5).collect()
    assert rows[0]["term"] == "spark" and rows[0]["cf"] == 5
    fz = suggest_fuzzy(aidx, "spork", 1, 3).collect()
    assert fz[0]["term"] == "spark"


def test_highlight(spark, docs):
    out = highlight(docs, ["spark", "window"], window=3)
    snips = {r["doc_id"]: r["snippet"] for r in out.collect()}
    assert 3 not in snips  # no query terms
    assert "**spark**" in snips[0] or "**window**" in snips[0]
    assert snips[4].count("**") >= 4  # dense hits window


def test_classify(aidx, docs):
    out = classify_knn(aidx, "spark window", docs.select("doc_id", "lang"), k=3,
                       precision="float64").collect()
    assert len(out) == 1
    assert out[0]["label"] == "en"
