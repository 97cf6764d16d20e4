"""Multi-field indexing: field-namespaced terms, per-field stats, routing.

Reference model: terms are (field, term) pairs in one dictionary
(index/Term.java:30); each field carries its own norms and collection
statistics (search/IndexSearcher.java:395), and the classic QueryParser
routes `field:` prefixes (queryparser/.../QueryParserBase.java:112);
MultiFieldQueryParser expands bare terms across fields with SHOULD
(queryparser/.../MultiFieldQueryParser.java:42-80).
"""

import math

import numpy as np
import pytest

from lucene_spark.index import build_multifield_index, read_index, write_index
from lucene_spark.search import (
    count_hits,
    expand_terms,
    multi_field_query,
    search,
    search_many,
)


@pytest.fixture(scope="module")
def mf_index(spark):
    rows = [
        ("u1", "alpha beta gamma alpha", "news flash"),
        ("u2", "beta alpha", "daily blog"),
        ("u3", "gamma delta alpha", "news digest"),
        ("u4", "delta epsilon", "wiki"),
        ("u5", "epsilon alpha beta", "breaking news"),
    ]
    docs = spark.createDataFrame(rows, "url string, body string, head string")
    return build_multifield_index(
        spark, docs, fields={"text": "body", "title": "head"},
        key_col="url", default_field="text", with_positions=True,
    )


def test_field_stats_semantics(mf_index):
    # title docCount = docs with >= 1 title token (all 5), sttf = total tokens
    assert mf_index.field_stats == {"title": (5, 9)}


def test_field_term_routing(mf_index):
    td = search(mf_index, "title:news", k=10)
    assert sorted(td.docids.tolist()) == [0, 2, 4]
    # same word absent from the default field
    assert len(search(mf_index, "news", k=10).docids) == 0
    # unknown field matches nothing, like an unindexed Lucene field
    assert len(search(mf_index, "bogus:news", k=10).docids) == 0


def test_field_scoring_uses_field_stats(mf_index):
    td = search(mf_index, "title:wiki", k=10, precision="float64")
    assert td.docids.tolist() == [3]
    # hand-computed BM25 under title stats: n=5, df=1, avgdl=9/5, dl=1
    w = math.log(1 + (5 - 1 + 0.5) / (1 + 0.5))
    inv = 1.0 / (1.2 * (0.25 + 0.75 * 1 / (9 / 5)))
    assert td.scores[0] == pytest.approx(w - w / (1 + 1 * inv), rel=1e-12)


def test_cross_field_and(mf_index):
    td = search(mf_index, "alpha AND title:news", k=10)
    assert sorted(td.docids.tolist()) == [0, 2, 4]
    td = search(mf_index, "delta AND title:wiki", k=10)
    assert td.docids.tolist() == [3]


def test_field_phrase_and_wildcard(mf_index):
    assert search(mf_index, 'title:"news flash"', k=10).docids.tolist() == [0]
    assert sorted(search(mf_index, "title:d*", k=10).docids.tolist()) == [1, 2]
    assert sorted(expand_terms(mf_index, like="d%", field="title")) == [
        "title:daily", "title:digest"
    ]
    # field range through the string syntax
    assert sorted(search(mf_index, "title:[daily TO digest]", k=10).docids.tolist()) == [1, 2]


def test_multi_field_query_expansion(mf_index):
    # 'beta' lives only in text; 'news' only in title — MFQP finds both
    td = search(mf_index, multi_field_query("beta news", ["text", "title"]), k=10)
    assert sorted(td.docids.tolist()) == [0, 1, 2, 4]


def test_multi_field_and_semantics(mf_index):
    # (text:alpha OR title:alpha) AND (text:news OR title:news)
    td = search(mf_index, multi_field_query("alpha AND news", ["text", "title"]), k=10)
    assert sorted(td.docids.tolist()) == [0, 2, 4]


def test_count_and_search_many(mf_index):
    assert count_hits(mf_index, "title:news") == 3
    out = search_many(mf_index, {"a": "title:news", "b": "alpha"}, k=10)
    assert sorted(out["a"].docids.tolist()) == [0, 2, 4]
    assert len(out["b"].docids) == 4


def test_multifield_prune_equals_exhaustive(mf_index):
    for q in ["title:news", "alpha AND title:news",
              multi_field_query("alpha news", ["text", "title"])]:
        a = search(mf_index, q, k=10, prune=True)
        b = search(mf_index, q, k=10, prune=False)
        assert a.docids.tolist() == b.docids.tolist()
        assert a.scores.tolist() == b.scores.tolist()


def test_multifield_persistence_roundtrip(mf_index, spark, tmp_path):
    out = str(tmp_path / "mfidx")
    write_index(mf_index, out)
    idx2 = read_index(spark, out)
    assert idx2.field_stats == mf_index.field_stats
    a = search(mf_index, "title:news", k=10)
    b = search(idx2, "title:news", k=10)
    assert a.docids.tolist() == b.docids.tolist()
    assert a.scores.tolist() == b.scores.tolist()


def test_multifield_tombstones(mf_index, spark):
    idx2 = mf_index.delete_docs(spark.createDataFrame([(0,)], "docid long"))
    assert sorted(search(idx2, "title:news", k=10).docids.tolist()) == [2, 4]


def test_multi_field_query_boosts_map(mf_index):
    """MultiFieldQueryParser boosts-map constructor
    (MultiFieldQueryParser.java:58-80): per-field leaves wrap in BoostQuery;
    the boosted expansion must equal the hand-written ^boost string query."""
    from lucene_spark.search import multi_field_query, search

    flds = sorted(set(mf_index.field_stats) | {"text"}) if mf_index.field_stats else ["text"]
    assert len(flds) >= 2
    other = [f for f in flds if f != "text"][0]
    q = multi_field_query("news", flds, boosts={other: 3.0})
    td = search(mf_index, q, k=10, precision="float64")
    manual = search(mf_index, f"news OR {other}:news^3", k=10, precision="float64")
    assert td.docids.tolist() == manual.docids.tolist()
    assert td.scores.tolist() == manual.scores.tolist()
    unboosted = search(mf_index, multi_field_query("news", flds), k=10,
                       precision="float64")
    assert td.scores.tolist() != unboosted.scores.tolist()


def test_combined_field_query(spark):
    """CombinedFieldQuery / BM25F (sandbox/search/CombinedFieldQuery.java):
    weighted-union freq and dl, max-df pseudo stats — duel vs a pure-Python
    twin on a tiny corpus."""
    import math

    import pytest as _pt

    from lucene_spark.analysis import analyze
    from lucene_spark.index import build_multifield_index, read_index, write_index
    from lucene_spark.search import combined_field_score, combined_field_topk

    rows = [
        (0, "spark window join", "spark guide"),
        (1, "window join batch", "window"),
        (2, "spark spark window", ""),
        (3, "unrelated words", "spark spark"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, title string")
    idx = build_multifield_index(
        spark, docs, fields={"text": "text", "title": "title"},
        key_col="doc_id", docid_col="doc_id")
    W = {"text": 1.0, "title": 2.0}
    got = {r.docid: r.score
           for r in combined_field_score(idx, "spark", W).collect()}

    # pure-Python twin
    texts = [analyze(t) for _, t, _ in rows]
    titles = [analyze(t) for _, _, t in rows]
    dfs = [sum(1 for t in texts if "spark" in t),
           sum(1 for t in titles if "spark" in t)]
    df = max(dfs)
    n = max(len([t for t in texts if t]), len([t for t in titles if t]))
    sttf = 1.0 * sum(map(len, texts)) + 2.0 * sum(map(len, titles))
    avgdl = sttf / n
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    want = {}
    for i in range(4):
        cf = 1.0 * texts[i].count("spark") + 2.0 * titles[i].count("spark")
        if cf == 0:
            continue
        cdl = 1.0 * len(texts[i]) + 2.0 * len(titles[i])
        inv = 1.0 / (1.2 * (0.25 + 0.75 * cdl / avgdl))
        want[i] = idf - idf / (1.0 + cf * inv)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == _pt.approx(want[i], rel=1e-12), i

    top = combined_field_topk(idx, "spark", W, k=2).collect()
    order = sorted(want, key=lambda d: (-want[d], d))[:2]
    assert [r.docid for r in top] == order

    # weight floor + missing field_docs guards
    with _pt.raises(ValueError):
        combined_field_score(idx, "spark", {"text": 0.5})
    # persistence round-trip keeps the per-field dl channel
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        write_index(idx, d)
        idx2 = read_index(spark, d)
        got2 = {r.docid: r.score
                for r in combined_field_score(idx2, "spark", W).collect()}
        assert got2 == got
