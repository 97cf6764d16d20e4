"""Bengali and Sorani Kurdish analysis: every reference test golden
(TestBengaliStemmer/Normalizer, TestSoraniStemFilter/NormalizationFilter),
extracted straight from the reference test sources."""

import os
import re

import pytest

from lucene_spark.intl import (bengali_normalize, bengali_stem,
                               sorani_normalize, sorani_stem)

_T = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"


def _unesc(s):
    # decode ONLY \-uXXXX escapes; leave literal UTF-8 text alone
    return re.sub(r"\\u([0-9a-fA-F]{4})",
                  lambda m: chr(int(m.group(1), 16)), s)


def _pairs(path, pattern):
    if not os.path.exists(path):
        pytest.skip("reference test source not available")
    src = open(path, encoding="utf-8").read()
    return [(_unesc(a), _unesc(b)) for a, b in re.findall(pattern, src)]


_CHECK = r'check\("((?:[^"\\]|\\.)+)", "((?:[^"\\]|\\.)+)"\)'
_CHECK1 = r'checkOneTerm\(a,\s*"((?:[^"\\]|\\.)+)",\s*"((?:[^"\\]|\\.)+)"\)'


def test_bengali_stemmer_goldens():
    pairs = _pairs(f"{_T}/bn/TestBengaliStemmer.java", _CHECK)
    assert len(pairs) >= 16
    for w, want in pairs:
        assert bengali_stem(w) == want, w


def test_bengali_normalizer_goldens():
    pairs = _pairs(f"{_T}/bn/TestBengaliNormalizer.java", _CHECK)
    assert len(pairs) >= 17
    for w, want in pairs:
        assert bengali_normalize(w) == want, w


def test_sorani_stemmer_goldens():
    # the reference test runs the full SoraniAnalyzer chain:
    # lowercase -> normalize -> stem
    pairs = _pairs(f"{_T}/ckb/TestSoraniStemFilter.java", _CHECK1)
    assert len(pairs) >= 21
    for w, want in pairs:
        assert sorani_stem(sorani_normalize(w.lower())) == want, w


def test_sorani_normalizer_goldens():
    pairs = _pairs(f"{_T}/ckb/TestSoraniNormalizationFilter.java", _CHECK1)
    assert len(pairs) >= 12
    for w, want in pairs:
        assert sorani_normalize(w) == want, w


def test_analyzer_factories():
    from lucene_spark.intl import bengali_analyzer, sorani_analyzer

    # the full chain normalizes (ষ -> স) before stemming, like the
    # reference BengaliAnalyzer
    toks, _ = bengali_analyzer().analyze_text("মানুষগুলি")
    assert toks == ["মানুস"]
    toks, _ = sorani_analyzer().analyze_text("پیاوەکان")
    assert toks == ["پیاو"]


def test_indic_normalizer_goldens():
    # in/TestIndicNormalizer.java testBasics — split-matra composition
    # across Devanagari plus the Bengali khanda-ta row
    from lucene_spark.intl import indic_normalize

    pairs = _pairs(f"{_T}/in/TestIndicNormalizer.java", _CHECK)
    assert len(pairs) >= 7
    for w, want in pairs:
        assert indic_normalize(w) == want, w
    assert indic_normalize("") == ""


def test_indic_in_hi_and_bn_chains():
    # HindiAnalyzer.java:119 / BengaliAnalyzer.java:119 both run
    # IndicNormalizationFilter ahead of the language normalizer
    from lucene_spark.intl import bengali_analyzer, intl_analyzer

    # Indic composes अा+ै -> औ, then HindiNormalizer.java:168 maps ौ -> ो
    toks, _ = intl_analyzer("hi").analyze_text("अाैर")
    assert toks == ["ओर"]
    # Indic composes ta+virama+ZWJ -> khanda-ta, then
    # BengaliNormalizer.java:142 maps khanda-ta back to plain ta
    toks, _ = bengali_analyzer().analyze_text("ত্‍")
    assert toks == ["ত"]
