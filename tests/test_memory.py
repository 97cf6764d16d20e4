"""MemoryIndex analog (memory/.../MemoryIndex.java:60-161): single-doc
in-RAM index; search(query) -> score or 0.0; single-doc statistics
(docCount=1, df=1, avgdl=dl); classic-parser queries incl. fuzzy/wildcard
expansion against the in-memory term set; multi-field routing."""

import math

import pytest

from lucene_spark.memory import MemoryIndex, memory_search


def _expected(tfs: list[int]) -> float:
    # df=1, docCount=1 → idf = ln(1 + 0.5/1.5); avgdl == dl → inv = 1/1.2
    idf = math.log(1 + 0.5 / 1.5)
    return sum(idf * (1.0 - 1.0 / (1.0 + tf / 1.2)) for tf in tfs)


def test_single_term_score_exact():
    s = memory_search("alpha beta alpha gamma", "alpha", precision="float64")
    assert s == pytest.approx(_expected([2]), rel=1e-12)


def test_no_match_returns_zero():
    assert memory_search("alpha beta", "delta") == 0.0
    assert memory_search("alpha beta", "the") == 0.0  # stopword-only


def test_or_sums_and_must_kills():
    s = memory_search("alpha beta alpha", "alpha beta", precision="float64")
    assert s == pytest.approx(_expected([2, 1]), rel=1e-12)
    assert memory_search("alpha beta", "alpha AND delta") == 0.0
    assert memory_search("alpha beta", "alpha NOT beta") == 0.0


def test_phrase():
    assert memory_search("alpha beta gamma", '"alpha beta"') > 0.0
    assert memory_search("beta alpha gamma", '"alpha beta"') == 0.0
    # stopword gap preserved: 'alpha the beta' has positions 0,2
    assert memory_search("alpha the beta", '"alpha beta"') == 0.0
    assert memory_search("alpha the beta", '"alpha beta"~2') > 0.0


def test_fuzzy_and_wildcard_expand_against_doc_terms():
    # the reference javadoc example shape (MemoryIndex.java:104-119)
    assert memory_search("readings about salmons manuals", "salmon~") > 0.0
    assert memory_search("readings about salmons manuals", "manu*") > 0.0
    assert memory_search("readings about salmons manuals", "zz*") == 0.0
    assert memory_search("readings about salmons manuals", "[r TO s]") > 0.0


def test_multi_field_routing():
    idx = (
        MemoryIndex()
        .add_field("text", "readings about salmons")
        .add_field("author", "tales of james")
    )
    assert idx.search("author:james") > 0.0
    assert idx.search("author:salmons") == 0.0  # term is in text, not author
    assert idx.search("james") == 0.0           # default field is text
    assert idx.search("author:james AND salmons") > 0.0
    assert idx.search("nosuch:james") == 0.0


def test_field_stats_use_field_length():
    # same tf, different field lengths → same score here because avgdl==dl
    # cancels the length normalization (single-doc property); assert that
    # invariant holds, it IS the MemoryIndex semantic
    short = MemoryIndex().add_field("text", "alpha beta")
    long_ = MemoryIndex().add_field(
        "text", "alpha beta " + " ".join(f"w{i}" for i in range(20))
    )
    a = short.search("alpha", precision="float64")
    b = long_.search("alpha", precision="float64")
    assert a == pytest.approx(b, rel=1e-12)


def test_duplicate_field_raises():
    idx = MemoryIndex().add_field("text", "alpha")
    with pytest.raises(ValueError):
        idx.add_field("text", "beta")
