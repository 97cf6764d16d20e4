"""Term-vectors-with-offsets tests (the offsets channel): spans slice back
to the original token text, filters don't move offsets, pushdown fetch, and
the offsets-based highlighter (FastVectorHighlighter analog) marks hits
without re-analysis."""

import pyspark.sql.functions as F
import pytest

from lucene_spark.analysis import analyze_with_offsets, english_analyzer
from lucene_spark.termvectors import (
    build_term_vectors,
    fetch_term_vectors,
    first_occurrence_offsets,
    highlight_offsets,
)


def test_offsets_slice_to_raw_tokens():
    text = "The Committee's  meetings ran 3.14 late"
    toks, poss, starts, ends = analyze_with_offsets(text)
    assert toks == ["committee's", "meetings", "ran", "3.14", "late"]
    assert [text[s:e] for s, e in zip(starts, ends)] == [
        "Committee's", "meetings", "ran", "3.14", "late"
    ]
    # positions count removed stopwords ('The' leaves a gap at 0)
    assert poss == [1, 2, 3, 4, 5]


def test_offsets_survive_filters():
    # stemming rewrites the TERM but the offset span stays on the raw text
    text = "the committees were meeting"
    toks, _, starts, ends = analyze_with_offsets(text, english_analyzer())
    assert toks == ["committe", "were", "meet"]
    assert [text[s:e] for s, e in zip(starts, ends)] == [
        "committees", "were", "meeting"
    ]


def test_build_and_fetch(spark):
    pages = spark.createDataFrame(
        [(0, "alpha beta alpha gamma"), (1, "beta beta delta")],
        "docid long, text string",
    )
    tv = build_term_vectors(pages)
    r = {(x["docid"], x["term"]): x for x in tv.collect()}
    assert r[(0, "alpha")]["positions"] == [0, 2]
    assert r[(0, "alpha")]["starts"] == [0, 11]
    assert r[(1, "beta")]["positions"] == [0, 1]
    fetched = fetch_term_vectors(tv, [0], ["alpha", "delta"]).collect()
    assert {x["term"] for x in fetched} == {"alpha"}


def test_first_occurrence_and_highlight(spark):
    pages = spark.createDataFrame(
        [(0, "x y target z target"), (1, "target first here")],
        "docid long, text string",
    )
    tv = build_term_vectors(pages)
    f = {r["docid"]: (r["start"], r["end"])
         for r in first_occurrence_offsets(tv, [0, 1], ["target"]).collect()}
    assert f == {0: (4, 10), 1: (0, 6)}
    hl = {r["docid"]: r["snippet"]
          for r in highlight_offsets(tv, pages, ["target"]).collect()}
    assert hl[0] == "x y <b>target</b> z <b>target</b>"
    assert hl[1] == "<b>target</b> first here"


def test_fetch_pushes_down(spark):
    """Both isin predicates must reach the parquet scan (PushedFilters) —
    the property that makes a k-doc highlight O(k) at corpus scale."""
    import tempfile

    pages = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(50)], "docid long, text string"
    )
    with tempfile.TemporaryDirectory(prefix="ls_tv_") as d:
        build_term_vectors(pages).write.parquet(f"{d}/tv")
        tv = spark.read.parquet(f"{d}/tv")
        plan = fetch_term_vectors(tv, [3, 7], ["common"])._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan
        assert "In(docid" in plan
        # a single-term isin simplifies to EqualTo — either form is pushed
        assert "In(term" in plan or "EqualTo(term" in plan


# ------------------------------------------------ reversed-term sidecar


def test_reversed_terms_sidecar(spark, tmp_path):
    from lucene_spark.index import add_reversed_terms, build_index, read_index, write_index
    from lucene_spark.search import expand_terms, search

    pages = spark.createDataFrame(
        [(f"u{i}", f"alpha{i} common ending{i % 3}suffix") for i in range(20)],
        "url string, text string",
    )
    idx = build_index(spark, pages)
    ridx = add_reversed_terms(idx)
    a = sorted(expand_terms(idx, like="%suffix"))
    b = sorted(expand_terms(ridx, like="%suffix"))
    assert a == b and len(a) == 3
    # string syntax *suffix goes through the sidecar transparently
    t1 = search(idx, "*0suffix", k=50)
    t2 = search(ridx, "*0suffix", k=50)
    assert t1.docids.tolist() == t2.docids.tolist()
    # patterns the sidecar cannot serve fall back to LIKE
    assert sorted(expand_terms(ridx, like="%nding0%")) == sorted(
        expand_terms(idx, like="%nding0%")
    )
    out = str(tmp_path / "ridx")
    write_index(ridx, out)
    r = read_index(spark, out)
    assert r.rterms is not None
    plan = (
        r.rterms.filter(r.rterms["rterm"].startswith("xiffus"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "StringStartsWith(rterm" in plan


def test_offsets_through_html_char_filter():
    """CharFilter.correctOffset: spans over HTML-stripped analysis point at
    the RAW text (BaseCharFilter binary-search delta semantics, including
    the end-at-tag-boundary jump the reference exhibits)."""
    from lucene_spark.analysis import Analyzer, analyze_with_offsets
    from lucene_spark.filters import HTMLStripCharFilter

    a = Analyzer(char_filters=(HTMLStripCharFilter(),))
    raw = "<html><p>key <b>window</b> batch</p></html>"
    toks, poss, starts, ends = analyze_with_offsets(raw, a)
    assert toks == ["key", "window", "batch"]
    for t, s in zip(toks, starts):
        assert raw[s:s + len(t)] == t
    # 'window' ends exactly at the </b> boundary: the corrected end jumps
    # past the closing tag (BaseCharFilter.correct on the boundary offset)
    assert ends[toks.index("window")] == raw.index("</b>") + len("</b>")
    # a plain str->str char filter cannot correct offsets: refused
    from lucene_spark.filters import html_strip

    with pytest.raises(ValueError, match="filter_with_offsets"):
        analyze_with_offsets(raw, Analyzer(char_filters=(html_strip,)))


def test_correct_offset_binary_search_semantics():
    import numpy as np

    from lucene_spark.filters import HTMLStripCharFilter

    f = HTMLStripCharFilter()
    out, offs, diffs = f.filter_with_offsets("<b>hi</b> there")
    assert out == "hi there"
    assert f.correct_offset(0, offs, diffs) == 3
    assert f.correct_offset(1, offs, diffs) == 4
    assert f.correct_offset(2, offs, diffs) == 9   # end boundary jumps tag
    assert list(f.correct_offset(np.array([3, 7]), offs, diffs)) == [10, 14]
    # adjacent tags collapse into one correction entry
    out2, offs2, diffs2 = f.filter_with_offsets("<a><b>x</b></a>")
    assert out2 == "x" and list(offs2) == [0, 1] and list(diffs2) == [6, 14]
