"""End-to-end: Spark index build + distributed search vs the pandas oracle.

The full-pipeline analog of the reference's TestBoolean2 / TestTopDocsMerge:
synthesize pages (FIXTURES.md), build the index with Spark, run the reference
query set, assert (docid, url, score) lists identical to the exhaustive
oracle.  Also: docID determinism, partition-count invariance, checkpoint
resume, and parquet write/read roundtrip.
"""

import numpy as np
import pytest

from lucene_spark.corpus import generate_pages, generate_queries
from lucene_spark.index import assign_docids, build_index, build_or_resume, read_index, write_index
from lucene_spark.oracle import OracleIndex
from lucene_spark.search import search

N_DOCS = 900  # small but multi-segment, exercises blocks + tails


@pytest.fixture(scope="module")
def pages_pdf():
    return generate_pages(N_DOCS, seed=42, n_stems=300)


@pytest.fixture(scope="module")
def oracle(pages_pdf):
    return OracleIndex(pages_pdf["url"].tolist(), pages_pdf["text"].tolist())


@pytest.fixture(scope="module")
def index(spark, pages_pdf):
    pages = spark.createDataFrame(pages_pdf).repartition(4)
    idx = build_index(spark, pages, seg_size=256)
    idx.postings = idx.postings.persist()
    idx.termdict = idx.termdict.persist()
    idx.norms = idx.norms.persist()
    idx.postings.count()
    return idx


def test_docid_assignment_deterministic(spark, pages_pdf):
    pages = spark.createDataFrame(pages_pdf)
    a = assign_docids(pages.repartition(3)).select("url", "docid").collect()
    b = assign_docids(pages.repartition(7)).select("url", "docid").collect()
    ma = {r["url"]: r["docid"] for r in a}
    mb = {r["url"]: r["docid"] for r in b}
    assert ma == mb
    # contract: rank over url order, dense 0..N-1
    urls = sorted(ma)
    assert [ma[u] for u in urls] == list(range(len(urls)))


def test_stats_match_oracle(index, oracle):
    assert index.doc_count == oracle.doc_count
    assert index.sum_total_term_freq == oracle.sum_ttf


def test_termdict_matches_oracle(index, oracle):
    rows = index.termdict.collect()
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    want = {
        t: (len(d), int(f.sum())) for t, (d, f, _) in oracle.postings.items()
    }
    assert got == want


@pytest.mark.parametrize("precision", ["lucene", "float64"])
def test_search_matches_oracle_full_query_set(index, oracle, precision):
    queries = generate_queries()
    for _, row in queries.iterrows():
        q, k = row["query"], int(row["k"])
        want = oracle.search(q, k=k, precision=precision)
        got = search(index, q, k=k, precision=precision, prune=True)
        np.testing.assert_array_equal(
            got.docids, want["docid"].to_numpy(dtype=np.int64), err_msg=f"q={q!r}"
        )
        np.testing.assert_array_equal(
            got.scores, want["score"].to_numpy(), err_msg=f"q={q!r} scores"
        )


def test_search_with_urls(index, oracle):
    got = search(index, "court AND law", k=5, with_urls=True)
    want = oracle.search("court AND law", k=5)
    assert got.urls == want["url"].tolist()


def test_write_read_roundtrip(tmp_path, spark, index, oracle):
    out = str(tmp_path / "idx")
    write_index(index, out)
    idx2 = read_index(spark, out)
    got = search(idx2, "court law news", k=10)
    want = oracle.search("court law news", k=10)
    np.testing.assert_array_equal(got.docids, want["docid"].to_numpy(dtype=np.int64))
    np.testing.assert_array_equal(got.scores, want["score"].to_numpy())


def test_term_filter_pushdown_on_parquet_index(tmp_path, spark, index):
    """Query-term lookups must reach the parquet scan (the BlockTree/FST
    analog: sorted files + row-group stats pruning — SURVEY §4)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "idx_pd")
    write_index(index, out)
    idx2 = read_index(spark, out)
    plan = (
        idx2.postings.filter(F.col("term").isin(["court", "law"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [In(term, [court,law])]" in plan
    plan2 = (
        idx2.termdict.filter(F.col("term") == "court")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan2 and "EqualTo(term,court)" in plan2


def test_build_or_resume_checkpointing(tmp_path, spark, pages_pdf, oracle):
    out = str(tmp_path / "ckpt")
    pages = spark.createDataFrame(pages_pdf)
    r1 = build_or_resume(spark, pages, out, seg_size=256)
    assert r1["built"] == r1["segments"] > 1
    # resume: nothing to do
    r2 = build_or_resume(spark, pages, out, seg_size=256)
    assert r2["built"] == 0 and r2["skipped"] == r1["segments"]
    idx = read_index(spark, out)
    got = search(idx, "court", k=10)
    want = oracle.search("court", k=10)
    np.testing.assert_array_equal(got.docids, want["docid"].to_numpy(dtype=np.int64))
    np.testing.assert_array_equal(got.scores, want["score"].to_numpy())


def test_resume_cleans_orphan_segments(tmp_path, spark, pages_pdf, oracle):
    """Crash between data-append and lineage-write must not duplicate
    segments: resume removes seg partitions not covered by lineage."""
    import os
    import shutil

    out = str(tmp_path / "ckpt_orphan")
    pages = spark.createDataFrame(pages_pdf)
    build_or_resume(spark, pages, out, seg_size=256)

    # simulate the crash window: data for one segment exists, lineage lost
    shutil.rmtree(f"{out}/lineage")
    os.makedirs(f"{out}/postings/seg=999", exist_ok=True)
    with open(f"{out}/postings/seg=999/junk.parquet", "w") as f:
        f.write("junk")

    r = build_or_resume(spark, pages, out, seg_size=256)
    assert r["built"] == r["segments"]  # everything rebuilt exactly once
    assert not os.path.isdir(f"{out}/postings/seg=999")
    idx = read_index(spark, out)
    got = search(idx, "court law", k=10)
    want = oracle.search("court law", k=10)
    np.testing.assert_array_equal(got.docids, want["docid"].to_numpy(dtype=np.int64))
    np.testing.assert_array_equal(got.scores, want["score"].to_numpy())
    # doc count not duplicated
    assert idx.docs.count() == idx.doc_count


def test_head_term_skew_bounded(spark):
    """A term in EVERY doc (worst head-term skew) must still produce bounded
    (term, seg) groups — the docID-range segmentation IS the salting
    (SURVEY §4 skew row): no posting row may exceed seg_size."""
    import pandas as pd

    n, seg_size = 3000, 256
    pdf = pd.DataFrame({
        "url": [f"u{i:05d}" for i in range(n)],
        "text": [f"common w{i % 97} filler{i % 13}" for i in range(n)],
    })
    idx = build_index(spark, spark.createDataFrame(pdf).repartition(6), seg_size=seg_size)
    rows = idx.postings.filter("term = 'common'").select("seg", "df_local").collect()
    assert len(rows) == (n + seg_size - 1) // seg_size  # one bounded row per segment
    assert all(r["df_local"] <= seg_size for r in rows)
    got = search(idx, "common AND w13", k=5)
    assert len(got.docids) == 5


def test_partition_count_invariance(spark, pages_pdf, oracle):
    pages2 = spark.createDataFrame(pages_pdf).repartition(2)
    idx2 = build_index(spark, pages2, seg_size=450)
    got = search(idx2, "(court AND law) OR ships", k=10)
    want = oracle.search("(court AND law) OR ships", k=10)
    np.testing.assert_array_equal(got.docids, want["docid"].to_numpy(dtype=np.int64))
    np.testing.assert_array_equal(got.scores, want["score"].to_numpy())
