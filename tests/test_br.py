"""Brazilian stemmer: every TestBrazilianAnalyzer golden (84 check pairs),
lowercased first like the analyzer chain."""

import os
import re

import pytest

from lucene_spark.br import brazilian_analyzer, brazilian_stem

_SRC = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/br/TestBrazilianAnalyzer.java")


def test_all_reference_goldens():
    if not os.path.exists(_SRC):
        pytest.skip("reference test source not available")
    src = open(_SRC, encoding="utf-8").read()
    pairs = re.findall(r'check\("([^"]+)",\s*"([^"]+)"\)', src)
    assert len(pairs) >= 84
    for w, want in pairs:
        assert brazilian_stem(w.lower()) == want, w


def test_refusals_pass_through():
    assert brazilian_stem("ab") == "ab"            # too short
    assert brazilian_stem("x" * 30) == "x" * 30    # too long
    assert brazilian_stem("r2d2") == "r2d2"        # non-letters


def test_logias_quirk():
    # the reference discards the "logias" replacement result but still
    # reports step1 success, so only step3/5 cleanup runs afterwards
    assert brazilian_stem("biologias") == brazilian_stem("biologias")
    from lucene_spark.br import _BR_STEP1

    assert ("logias", "r2", "DISCARDED", None) in _BR_STEP1


def test_analyzer_chain():
    toks, _ = brazilian_analyzer().analyze_text("Boa noite")
    assert toks == ["boa", "noit"]
