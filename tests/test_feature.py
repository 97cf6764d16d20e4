"""FeatureField/FeatureQuery tests (document/FeatureField.java,
document/FeatureQuery.java): freq-encoding roundtrip, score functions,
pruned == exhaustive, persistence through write/read, combination with BM25.
Pattern: TestFeatureField.java (document/TestFeatureField.java)."""

import math

import numpy as np
import pytest

from lucene_spark.feature import (
    FeatureScorer,
    add_feature_field,
    decode_feature_np,
    encode_feature_np,
    feature_query,
    feature_term,
)


def test_encode_decode_roundtrip_small_ints():
    # integers < 512 need <= 8 mantissa bits -> the 15-bit truncation is
    # lossless (FeatureField.java:164-166, 209-218)
    v = np.arange(1, 512, dtype=np.float64)
    assert np.array_equal(decode_feature_np(encode_feature_np(v)), v.astype(np.float32))


def test_encode_monotone_lossy_above():
    v = np.array([1.0, 513.7, 1e6, 3e38])
    f = encode_feature_np(v)
    assert np.all(np.diff(f) > 0)
    d = decode_feature_np(f)
    assert np.all(np.diff(d) > 0)
    # truncation only ever rounds DOWN (mantissa bits dropped)
    assert np.all(d <= v.astype(np.float32))


def test_encode_rejects_nonpositive():
    for bad in ([0.0], [-1.0], [float("nan")], [float("inf")]):
        with pytest.raises(ValueError):
            encode_feature_np(np.array(bad))


def test_scorer_functions_float64():
    freqs = encode_feature_np(np.array([4.0]))
    dl = np.array([1])
    assert FeatureScorer("linear", {}, "float64").score_from_dl(freqs, dl)[0] == 4.0
    assert FeatureScorer("log", {"scaling_factor": 1.0}, "float64").score_from_dl(
        freqs, dl
    )[0] == pytest.approx(math.log(5.0), rel=1e-12)
    assert FeatureScorer("saturation", {"pivot": 4.0}, "float64").score_from_dl(
        freqs, dl
    )[0] == pytest.approx(0.5, rel=1e-12)
    assert FeatureScorer("sigmoid", {"pivot": 4.0, "exp": 2.0}, "float64").score_from_dl(
        freqs, dl
    )[0] == pytest.approx(0.5, rel=1e-12)


def test_scorer_lucene_float32():
    freqs = encode_feature_np(np.array([10.0]))
    s = FeatureScorer("saturation", {"pivot": 8.0, "boost": 2.0}, "lucene")
    got = s.score_from_dl(freqs, np.array([1]))
    want = np.float32(2.0) * (np.float32(1.0) - np.float32(8.0) / np.float32(18.0))
    assert got.dtype == np.float32 and got[0] == want


def test_scorer_monotone_in_freq():
    freqs = encode_feature_np(np.linspace(0.5, 1000, 200))
    for fn, params in (("linear", {}), ("log", {"scaling_factor": 1.0}),
                       ("saturation", {"pivot": 8.0}),
                       ("sigmoid", {"pivot": 8.0, "exp": 2.0})):
        s = FeatureScorer(fn, params, "lucene").score_from_dl(freqs, np.ones(200))
        assert np.all(np.diff(s) >= 0), fn


@pytest.fixture(scope="module")
def feat_index(spark):
    from lucene_spark.index import build_index

    pages = spark.createDataFrame(
        [(f"u{i}", "spark text " + ("law " * (i % 5))) for i in range(40)],
        "url string, text string",
    )
    idx = build_index(spark, pages, seg_size=16)
    feats = spark.createDataFrame(
        [(i, float((i * 37) % 200 + 1)) for i in range(40)], "docid long, value double"
    )
    return add_feature_field(idx, "prank", feats)


def test_feature_only_query_ranking(spark, feat_index):
    from lucene_spark.search import search

    td = search(feat_index, feature_query("prank", "saturation", pivot=8.0),
                k=5, precision="float64")
    vals = [(i * 37) % 200 + 1 for i in range(40)]
    want = sorted(range(40), key=lambda i: (-(1 - 8 / (vals[i] + 8)), i))[:5]
    assert td.docids.tolist() == want
    np.testing.assert_allclose(
        td.scores, [1 - 8.0 / (vals[i] + 8.0) for i in want], rtol=1e-12
    )


def test_feature_or_bm25_pruned_identical(spark, feat_index):
    from lucene_spark.search import search

    node = ("or", [("term", "law"), feature_query("prank", "log", scaling_factor=1.0)])
    a = search(feat_index, node, k=10, prune=True)
    b = search(feat_index, node, k=10, prune=False)
    assert a.docids.tolist() == b.docids.tolist()
    assert a.scores.tolist() == b.scores.tolist()


def test_feature_persists_through_write_read(spark, feat_index, tmp_path):
    from lucene_spark.index import read_index, write_index
    from lucene_spark.search import search

    out = str(tmp_path / "fidx")
    write_index(feat_index, out)
    reread = read_index(spark, out)
    q = feature_query("prank", "saturation", pivot=8.0)
    a = search(feat_index, q, k=5, precision="float64")
    b = search(reread, q, k=5, precision="float64")
    assert a.docids.tolist() == b.docids.tolist()
    assert a.scores.tolist() == b.scores.tolist()


def test_missing_feature_field_matches_nothing(spark, feat_index):
    from lucene_spark.search import search

    td = search(feat_index, feature_query("nope", "linear"), k=5)
    assert len(td.docids) == 0


def test_feature_term_never_collides_with_analyzer(spark, feat_index):
    # the \0 prefix cannot come out of the analyzer; text searches for the
    # raw feature name hit the TEXT term, not the pseudo-term
    assert feature_term("prank").startswith("\x00")
    from lucene_spark.search import search

    td = search(feat_index, "prank", k=5)
    assert len(td.docids) == 0  # 'prank' the word is not in any doc
