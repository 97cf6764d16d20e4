"""Numeric doc-values updates (IndexWriter.updateNumericDocValue,
NumericDocValuesFieldUpdates): latest-gen read-through + materialize."""

import pytest

from lucene_spark.docvalues import NumericDocValues
from lucene_spark.index import build_index


@pytest.fixture(scope="module")
def dv_idx(spark):
    docs = spark.createDataFrame(
        [(i, "alpha " + ("beta " if i % 2 else "") + f"w{i}", i * 10)
         for i in range(8)],
        "doc_id long, text string, nv long")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id")
    return idx, docs


def test_dv_update_lifecycle(spark, dv_idx):
    idx, docs = dv_idx
    dv = NumericDocValues(docs, id_col="doc_id", val_col="nv")
    base = {r.docid: r.value for r in dv.resolve().collect()}
    assert base == {i: i * 10 for i in range(8)}
    # update all docs matching 'beta' (odd ids)
    g1 = dv.update_by_term(idx, "beta", 777)
    got = {r.docid: r.value for r in dv.resolve().collect()}
    assert got == {i: (777 if i % 2 else i * 10) for i in range(8)}
    # a later generation overrides for an explicit doc set
    ids = spark.createDataFrame([(1,)], "docid long")
    g2 = dv.update_docs(ids, 5)
    assert g2 == g1 + 1
    got = {r.docid: r.value for r in dv.resolve().collect()}
    assert got[1] == 5 and got[3] == 777
    # unknown-term update touches nothing
    dv.update_by_term(idx, "zzz_missing", 1)
    assert {r.docid: r.value for r in dv.resolve().collect()} == got
    # materialize folds generations into a fresh base
    m = dv.materialize()
    assert not m._updates
    assert {r.docid: r.value for r in m.resolve().collect()} == got


def test_doc_values_stats(spark, dv_idx):
    """DocValuesStats (misc/search/DocValuesStats.java): count/missing/
    min/max/sum/mean/population-variance over a match set."""
    import statistics

    from lucene_spark.docvalues import doc_values_stats

    idx, docs = dv_idx
    dv = docs.select("doc_id", "nv")
    row = doc_values_stats(dv, id_col="doc_id", val_col="nv").collect()[0]
    vals = [i * 10 for i in range(8)]
    assert row["count"] == 8 and row["missing"] == 0
    assert row["vmin"] == 0 and row["vmax"] == 70 and row["vsum"] == sum(vals)
    assert row["mean"] == statistics.mean(vals)
    assert abs(row["variance"] - statistics.pvariance(vals)) < 1e-9
    # match set restriction + missing counting
    m = spark.createDataFrame([(1,), (3,), (99,)], "docid long")
    row = doc_values_stats(dv, match=m, id_col="doc_id", val_col="nv").collect()[0]
    assert row["count"] == 2 and row["missing"] == 1  # 99 has no value
    assert row["vsum"] == 40 and row["vmin"] == 10 and row["vmax"] == 30
