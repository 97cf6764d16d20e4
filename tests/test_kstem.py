"""KStem: full parity with the reference's kstem_examples.txt (12,130
word/stem pairs produced by the original java kstemmer — en/TestKStemmer
.java), plus the KStemFilter token contract."""

import os
import zipfile

import pytest

from lucene_spark.kstem import kstem, kstem_filter

_ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/en/kstemTestData.zip")


def test_full_vocabulary_parity():
    if not os.path.exists(_ZIP):
        pytest.skip("reference vocabulary not available")
    with zipfile.ZipFile(_ZIP) as z:
        lines = z.read("kstem_examples.txt").decode("utf-8").splitlines()
    pairs = [ln.split("\t") for ln in lines if ln.strip()]
    assert len(pairs) >= 12000
    for w, want in pairs:
        assert kstem(w) == want, w


def test_dictionary_gating():
    # a transformation is accepted only when the root is an attested word
    assert kstem("memorial") == "memorial"   # not memory
    assert kstem("memorized") == "memorize"
    assert kstem("immunity") == "immune"     # -ity with attested -e root
    assert kstem("capacity") == "capacity"   # capac is not a word


def test_exception_words():
    # aide is an exception root: aides keeps it, aided conflates to aid
    assert kstem("aides") == "aide"
    assert kstem("aided") == "aid"


def test_direct_and_nationality():
    assert kstem("fled") == "flee"
    assert kstem("italians") == "italy"
    assert kstem("japanese") == "japan"


def test_non_stemmable_passthrough():
    assert kstem("ab") == "ab"              # too short
    assert kstem("C3PO") == "C3PO"          # non-alpha
    assert kstem("Paris") == "Paris"        # not lowercase (filter contract)
    assert kstem("x" * 50) == "x" * 50      # at MaxWordLen


def test_filter_stream():
    assert kstem_filter(["the", "aids", "spreading"]) == \
        ["the", "aids", "spread"]


def test_english_analyzer_kstem_chain():
    from lucene_spark.analysis import english_analyzer

    an = english_analyzer(stemmer="kstem")
    toks, _ = an.analyze_text("The memorial's flags were waving")
    assert toks == ["memorial", "flag", "were", "wave"]
