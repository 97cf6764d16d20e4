"""FreeTextSuggester analog: n-gram model build + stupid-backoff lookup
(FreeTextSuggester.java:214-596)."""

import pytest

from lucene_spark.freetext import ALPHA, build_freetext, freetext_lookup


CORPUS = [
    (0, "foo bar baz"),
    (1, "foo bar boo"),
    (2, "foo bar bar"),
    (3, "boo far baz"),
]


@pytest.fixture(scope="module")
def model(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    m = build_freetext(docs, grams=2)
    m.grams = m.grams.persist()
    m.grams.count()
    return m


def test_model_counts(model):
    rows = {(r.gram, r.n): r.cnt for r in model.grams.collect()}
    assert rows[("foo", 1)] == 3 and rows[("bar", 1)] == 4
    assert rows[("foo bar", 2)] == 3 and rows[("bar bar", 2)] == 1
    # totTokens = sum of unigram counts
    assert model.tot_tokens == sum(
        c for (g, n), c in rows.items() if n == 1)


def test_lookup_backoff_scores(model):
    """Query 'foo b': bigram model completes 'foo b*' scored
    count/count('foo'); unigram model backs off at ALPHA, skipping last
    tokens the bigram model already predicted (seen-dedup)."""
    out = [(r.gram, r.score) for r in freetext_lookup(model, "foo b", 10).collect()]
    got = dict(out)
    # bigram prediction: 'foo bar' cnt=3, ctx 'foo' cnt=3
    assert got["foo bar"] == pytest.approx(3 / 3)
    # unigram backoff at ALPHA: 'bar' seen from the bigram order; baz/boo
    # (cnt 2 each of totTokens 12) survive
    assert got["baz"] == pytest.approx(ALPHA * 2 / model.tot_tokens)
    assert got["boo"] == pytest.approx(ALPHA * 2 / model.tot_tokens)
    assert set(got) == {"foo bar", "baz", "boo"}
    # order: score desc then gram asc (baz before boo on the tie)
    assert [g for g, _ in out] == ["foo bar", "baz", "boo"]

    # unseen context -> pure unigram at ALPHA
    out2 = dict(
        (r.gram, r.score)
        for r in freetext_lookup(model, "zzz b", 10).collect()
    )
    assert out2["bar"] == pytest.approx(ALPHA * 4 / model.tot_tokens)

    # trailing space = predict the NEXT token from the full context
    out3 = [r.gram for r in freetext_lookup(model, "foo ", 10).collect()]
    assert out3[0] == "foo bar"
    # no unigram predictions from an empty fragment
    assert all(" " in g for g in out3)


def test_lookup_seen_dedup_across_orders(spark):
    """A last-token predicted by the bigram order must not reappear from
    the unigram order even when the unigram score would rank higher."""
    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "bb cc"), (2, "bb dd"), (3, "bb ee")],
        "doc_id long, text string")
    m = build_freetext(docs, grams=2)
    out = [(r.gram, r.score) for r in freetext_lookup(m, "aa b", 10).collect()]
    grams = [g for g, _ in out]
    assert "aa bb" in grams
    # 'bb' (unigram, high count) must be skipped as seen
    assert "bb" not in grams
