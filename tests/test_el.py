"""Greek stemmer: every TestGreekStemmer golden (342 checkOneTerm pairs),
run through the GreekLowerCaseFilter + GreekStemFilter chain exactly as the
reference test does."""

import os
import re

import pytest

from lucene_spark.el import greek_analyzer, greek_stem
from lucene_spark.filters import greek_lowercase

_SRC = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/el/TestGreekStemmer.java")


def test_all_reference_goldens():
    if not os.path.exists(_SRC):
        pytest.skip("reference test source not available")
    src = open(_SRC, encoding="utf-8").read()
    pairs = re.findall(r'checkOneTerm\(a,\s*"([^"]+)",\s*"([^"]+)"\)', src)
    assert len(pairs) >= 340
    for w, want in pairs:
        assert greek_stem(greek_lowercase(w)) == want, w


def test_short_words_unchanged():
    assert greek_stem("για") == "για"  # len < 4


def test_rule_interplay():
    # rule1 exception set (γιαγι): the -αδ is NOT added back
    assert greek_stem(greek_lowercase("γιαγιάδες")) == "γιαγι"
    # rule1 add-back for stems outside the set
    assert greek_stem(greek_lowercase("ομάδες")) == "ομαδ"
    # rule5: -ια removed, -ι kept only after a vowel
    assert greek_stem(greek_lowercase("βιβλία")) == "βιβλ"


def test_greek_analyzer_chain():
    toks, _ = greek_analyzer().analyze_text("Οι άνθρωποι γράφουν βιβλία")
    assert "ανθρωπ" in toks and "βιβλ" in toks
