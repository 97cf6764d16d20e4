"""Cross-feature integration: the new operators composed with each other."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.index import add_indexes, build_index, build_multifield_index
from lucene_spark.search import multi_phrase, search, sorted_topk
from lucene_spark.spans import span_near


@pytest.fixture(scope="module")
def combo_index(spark):
    rows = [
        ("u1", "alpha beta gamma delta", "intro alpha"),
        ("u2", "beta alpha beta", "body beta"),
        ("u3", "gamma alpha beta delta", "intro gamma"),
        ("u4", "delta epsilon", "body delta"),
    ]
    docs = spark.createDataFrame(rows, "url string, body string, section string")
    return build_multifield_index(
        spark, docs, fields={"text": "body", "sec": "section"},
        key_col="url", default_field="text", with_positions=True,
    )


def test_field_scoped_span_query(combo_index):
    # ("field", f, span) — span members namespaced into the field
    q = ("field", "sec", span_near(["intro", "alpha"], slop=0))
    td = search(combo_index, q, k=10)
    assert td.docids.tolist() == [0]
    q2 = ("field", "sec", span_near(["intro", "gamma"], slop=0))
    assert search(combo_index, q2, k=10).docids.tolist() == [2]


def test_field_scoped_multi_phrase(combo_index):
    q = ("field", "sec", multi_phrase(["intro", ["alpha", "gamma"]]))
    td = search(combo_index, q, k=10)
    assert sorted(td.docids.tolist()) == [0, 2]


def test_span_query_mixed_with_field_term(combo_index):
    # span on the default field AND a field term
    q = ("andn", [span_near(["alpha", "beta"], slop=0),
                  ("field", "sec", ("term", "intro"))])
    td = search(combo_index, q, k=10)
    # doc0 "alpha beta ..." and doc2 "... alpha beta delta" both have the
    # adjacent span AND sec:intro; doc1/doc3 fail one clause each.
    assert sorted(td.docids.tolist()) == [0, 2]


def test_sorted_topk_on_phrase_query(combo_index):
    got = sorted_topk(combo_index, '"alpha beta"', k=5).tolist()
    full = search(combo_index, '"alpha beta"', k=100, prune=False)
    assert got == sorted(full.docids.tolist())[:5]


def test_sorted_topk_on_span_query(combo_index):
    got = sorted_topk(combo_index, span_near(["beta", "delta"], slop=2), k=5).tolist()
    full = search(combo_index, span_near(["beta", "delta"], slop=2), k=100, prune=False)
    assert got == sorted(full.docids.tolist())[:5]
    assert len(got) > 0


def test_add_indexes_preserves_field_stats(spark):
    rows_a = [("a1", "x y", "news"), ("a2", "y z", "blog")]
    rows_b = [("b1", "x z", "news"), ("b2", "z z", "news")]
    mk = lambda rows: build_multifield_index(  # noqa: E731
        spark,
        spark.createDataFrame(rows, "url string, body string, cat string"),
        fields={"text": "body", "cat": "cat"}, key_col="url",
    )
    a, b = mk(rows_a), mk(rows_b)
    if a.seg_size != b.seg_size:
        pytest.skip("unequal auto seg sizes")
    c = add_indexes(a, b)
    assert c.field_stats == {"cat": (4, 4)}
    td = search(c, "cat:news", k=10)
    assert len(td.docids) == 3
