"""Hunspell stemming: every assertStemsTo golden from the reference's
in-tree fixture dictionaries (simple/condition/needaffix/circumfix/
fullstrip/ignore/escaped/flaglong/flagnum/conv/homonyms + ignoreCase),
extracted straight from the reference test sources."""

import os
import re

import pytest

from lucene_spark.hunspell import HunspellDictionary, hunspell_stem_filter

_T = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
      "lucene/analysis/hunspell")


def _load(aff, dic, ignore_case=False):
    ap, dp = f"{_T}/{aff}", f"{_T}/{dic}"
    if not (os.path.exists(ap) and os.path.exists(dp)):
        pytest.skip("reference fixtures not available")
    return HunspellDictionary(
        open(ap, encoding="utf-8").read(),
        open(dp, encoding="utf-8").read(), ignore_case=ignore_case)


def _goldens(test_file):
    path = f"{_T}/{test_file}"
    if not os.path.exists(path):
        pytest.skip("reference test source not available")
    src = open(path, encoding="utf-8").read()
    out = []
    for m in re.finditer(r"assertStemsTo\(([^)]*)\)", src):
        parts = re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1))
        parts = [p.replace("\\\\", "\\").replace('\\"', '"')
                  .replace("\\/", "/") for p in parts]
        out.append((parts[0], parts[1:]))
    return out


@pytest.mark.parametrize("test_file,aff,dic,ic", [
    ("TestStemmer.java", "simple.aff", "simple.dic", False),
    ("TestCondition.java", "condition.aff", "condition.dic", False),
    ("TestNeedAffix.java", "needaffix.aff", "needaffix.dic", False),
    ("TestCircumfix.java", "circumfix.aff", "circumfix.dic", False),
    ("TestFullStrip.java", "fullstrip.aff", "fullstrip.dic", False),
    ("TestIgnore.java", "ignore.aff", "ignore.dic", False),
    ("TestEscaped.java", "escaped.aff", "escaped.dic", False),
    ("TestFlagLong.java", "flaglong.aff", "flaglong.dic", False),
    ("TestFlagNum.java", "flagnum.aff", "flagnum.dic", False),
    ("TestConv.java", "conv.aff", "conv.dic", False),
    ("TestHomonyms.java", "homonyms.aff", "homonyms.dic", False),
    ("TestCaseInsensitive.java", "simple.aff", "mixedcase.dic", True),
    ("TestZeroAffix.java", "zeroaffix.aff", "zeroaffix.dic", False),
    ("TestOptionalCondition.java", "optional-condition.aff",
     "condition.dic", False),
    ("TestDoubleEscape.java", "double-escaped.aff", "double-escaped.dic",
     False),
    ("TestMorphData.java", "morphdata.aff", "morphdata.dic", False),
    ("TestKeepCase.java", "keepcase.aff", "keepcase.dic", False),
    ("TestAllCaps.java", "allcaps.aff", "allcaps.dic", False),
])
def test_reference_fixture_goldens(test_file, aff, dic, ic):
    d = _load(aff, dic, ignore_case=ic)
    pairs = _goldens(test_file)
    assert pairs
    for word, want in pairs:
        assert sorted(d.stem(word)) == sorted(want), (test_file, word)


def test_stem_filter_stream_semantics():
    # TestHunspellStemFilter: all stems share the token position; no-stem
    # tokens pass through; longestOnly keeps the longest
    d = _load("simple.aff", "simple.dic")
    toks, poss = hunspell_stem_filter(d, ["lucene", "is", "awesome"])
    assert toks == ["lucene", "lucen", "is", "awesome"]
    assert poss == [0, 0, 1, 2]
    toks, poss = hunspell_stem_filter(d, ["lucene", "is", "awesome"],
                                      longest_only=True)
    assert toks == ["lucene", "is", "awesome"]
    assert poss == [0, 1, 2]
    assert hunspell_stem_filter(d, [""]) == ([""], [0])
