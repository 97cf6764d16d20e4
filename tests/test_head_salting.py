"""Head-salted encode shuffle (index.estimate_head_terms /
balanced_bin_expr / merge_partials_stage) — the north rule's explicit
head-term salting: correctness-neutral placement, exact partition targeting,
and round-robin spread of head-term (term, seg) groups."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark import index as ix
from lucene_spark.corpus import generate_pages
from lucene_spark.index import (
    balanced_bin_expr,
    build_index,
    estimate_head_terms,
    _partition_salts,
)


def test_partition_salts_land_exactly(spark):
    for parts in (8, 64):
        salts = _partition_salts(spark, parts)
        assert len(salts) == parts
        got = (
            spark.createDataFrame([(s,) for s in salts], "s int")
            .select(F.pmod(F.hash(F.col("s").cast("int")), F.lit(parts)).alias("b"))
            .toPandas()["b"]
            .tolist()
        )
        assert got == list(range(parts))


def test_salted_build_rank_identical(spark, monkeypatch):
    """balance_heads placement changes WHERE groups encode, never WHAT —
    postings, termdict and search results are identical to the unsalted
    build."""
    monkeypatch.setattr(ix, "HEAD_SALT_MIN_DOCS", 1)
    pages = spark.createDataFrame(generate_pages(3000, seed=11, zipf_s=1.6))
    salted = build_index(spark, pages)
    assert salted.head_terms  # the sketch found heads on a zipf corpus
    plain = build_index(spark, pages, balance_heads=False)
    assert plain.head_terms is None

    cols = ["term", "seg", "df_local", "cf_local", "doc_blob", "freq_blob"]
    a = salted.postings.select(cols).toPandas().sort_values(
        ["term", "seg"]).reset_index(drop=True)
    b = plain.postings.select(cols).toPandas().sort_values(
        ["term", "seg"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    from lucene_spark.search import search

    ra = search(salted, "court law", k=10, precision="lucene").to_pandas()
    rb = search(plain, "court law", k=10, precision="lucene").to_pandas()
    pd.testing.assert_frame_equal(ra, rb)


def test_head_round_robin_spread(spark):
    """Every head term's (term, seg) groups land in pairwise-distinct bins
    whenever n_segs <= parts, and cycle deterministically: bin =
    (seg * n_heads + rank) % parts realized through the salt ints."""
    heads = ["alpha", "beta", "gamma"]
    parts = 8
    rows = [(t, s) for t in heads + ["tail1", "tail2"] for s in range(4)]
    df = spark.createDataFrame(rows, "term string, seg long")
    binned = df.withColumn("__bin", balanced_bin_expr(spark, parts, heads))
    out = binned.repartition(parts, "__bin").withColumn(
        "pid", F.spark_partition_id()).toPandas()
    n_heads = len(heads)
    for r, t in enumerate(heads):
        sub = out[out.term == t].sort_values("seg")
        expect = [(int(s) * n_heads + r) % parts for s in sub.seg]
        assert sub.pid.tolist() == expect
    # light terms keep the legacy hash placement exactly
    legacy = (
        df.filter(F.col("term").startswith("tail"))
        .repartition(parts, "term", "seg")
        .withColumn("pid", F.spark_partition_id())
        .toPandas().set_index(["term", "seg"])["pid"]
    )
    for (t, s), pid in legacy.items():
        got = out[(out.term == t) & (out.seg == s)].pid.iloc[0]
        assert got == pid


def test_estimate_head_terms_finds_zipf_heads(spark):
    pages = spark.createDataFrame(generate_pages(4000, seed=3, zipf_s=2.0))
    base = pages.select("url", "text")
    from lucene_spark.analysis import ENGLISH_STOP_WORDS

    heads = estimate_head_terms(base, "text", ENGLISH_STOP_WORDS, 4000)
    assert heads, "zipf 2.0 corpus must expose head terms"
    assert len(heads) <= 64
    # the sketch must rank the true rank-1 stem first or near-first
    from pyspark.sql import functions as FF

    true = (
        pages.select(FF.explode(FF.split("text", " ")).alias("t"))
        .groupBy("t").count().orderBy(FF.desc("count")).limit(3).toPandas()["t"]
        .tolist()
    )
    assert set(heads[:2]) & set(true)
