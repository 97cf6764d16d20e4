"""Flexible (Standard) query parser: default-op AND, PointsConfig, multi-field."""

import numpy as np
import pytest

from lucene_spark.flexible import (
    StandardConfig,
    parse_standard,
    points_filter,
)
from lucene_spark.search import parse_query, search


def test_or_default_matches_classic():
    cfg = StandardConfig()
    for q in ("key dup", "key AND dup", "key OR dup", "+key dup -junk",
              '"a phrase"~2 key^2'):
        assert parse_standard(q, cfg)[0] == parse_query(q)


def test_and_default_operator():
    cfg = StandardConfig(default_operator="AND")
    assert parse_standard("key dup", cfg)[0] == ("and", ["key", "dup"])
    # OR demotes both neighbors to SHOULD
    assert parse_standard("key OR dup", cfg)[0] == (
        "or", [("term", "key"), ("term", "dup")])
    # explicit modifiers still win
    assert parse_standard("key -dup", cfg)[0] == (
        "not", ("term", "key"), ["dup"])
    # mixed: a OR b c -> (a OR b) AND-ish: c MUST, a b SHOULD
    node = parse_standard("key OR window dup", cfg)[0]
    assert node == ("reqopt", ("term", "dup"), ["key", "window"])


def test_points_extraction_and_errors():
    cfg = StandardConfig(default_operator="AND",
                         points_config={"n": "long", "x": "double"})
    node, preds = parse_standard("key dup n:[5 TO 10] x:{1.5 TO *}", cfg)
    assert node == ("and", ["key", "dup"])
    assert preds == [("n", 5, 10, True, True, "long"),
                     ("x", 1.5, None, False, False, "double")]
    # single scoring clause survives
    node, preds = parse_standard("key AND n:[1 TO 2]", cfg)
    assert node == ("term", "key") and len(preds) == 1
    for bad in ("n:[1 TO 2]", "key OR n:[1 TO 2]", "key -n:[1 TO 2]",
                "key (dup OR n:[1 TO 2])"):
        with pytest.raises(ValueError):
            parse_standard(bad, cfg)


def test_multifield_expansion_shape():
    cfg = StandardConfig(multi_fields=[("text", 1.0), ("title", 2.0)])
    node, _ = parse_standard("key", cfg)
    assert node == ("or", [
        ("term", "key"),
        ("boost", ("field", "title", ("term", "key")), 2.0)])
    # explicitly qualified clauses are left alone
    cfg2 = StandardConfig(multi_fields=[("text", 1.0), ("title", 1.0)])
    node2, _ = parse_standard("title:key", cfg2, fields=["title"])
    assert node2 == ("field", "title", ("term", "key"))


@pytest.fixture(scope="module")
def small_index(spark):
    from lucene_spark.index import build_index

    rows = [(i, f"u{i}",
             ("key window " if i % 2 == 0 else "key ") + f"w{i} filler text",
             100 + i * 10)
            for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string, size long")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", seg_size=16)
    return idx, docs


def test_standard_search_with_points_filter(spark, small_index):
    idx, docs = small_index
    cfg = StandardConfig(default_operator="AND",
                         points_config={"size": "long"})
    node, preds = parse_standard("key window size:[150 TO 300]", cfg)
    fdocs = points_filter(
        docs.selectExpr("doc_id AS docid", "size"), preds)
    td = search(idx, node, k=20, precision="float64", filter_docs=fdocs)
    got = sorted(int(d) for d in td.docids)
    # docs with both terms (even ids) and 150 <= 100+10i <= 300
    assert got == [i for i in range(5, 21) if i % 2 == 0]
    # scores equal the unfiltered conjunction's scores on the same docs
    tdu = search(idx, ("and", ["key", "window"]), k=40, precision="float64")
    ref = {int(d): float(s) for d, s in zip(tdu.docids, tdu.scores)}
    for d, s in zip(td.docids, td.scores):
        assert float(s) == pytest.approx(ref[int(d)], abs=0)


def test_multifield_search_equivalence(spark):
    from lucene_spark.index import build_multifield_index

    rows = [(i, f"head{i % 3} lead", f"key body w{i} text common")
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, title string, text string")
    idx = build_multifield_index(
        spark, docs, fields={"text": "text", "title": "title"},
        key_col="doc_id", default_field="text", docid_col="doc_id",
        seg_size=16)
    cfg = StandardConfig(multi_fields=[("text", 1.0), ("title", 2.0)])
    node, preds = parse_standard("key head0", cfg)
    assert preds == []
    td = search(idx, node, k=10, precision="float64")
    explicit = ("or", [
        ("or", [("term", "key"),
                ("boost", ("field", "title", ("term", "key")), 2.0)]),
        ("or", [("term", "head0"),
                ("boost", ("field", "title", ("term", "head0")), 2.0)]),
    ])
    te = search(idx, explicit, k=10, precision="float64")
    assert np.array_equal(td.docids, te.docids)
    assert np.array_equal(td.scores, te.scores)
