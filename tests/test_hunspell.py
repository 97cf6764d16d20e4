"""Hunspell stemming: every assertStemsTo golden from the reference's
in-tree fixture dictionaries — all 35 stemming test suites, extracted
straight from the reference test sources (files are loaded as BYTES so the
SET-directive charset path is exercised, e.g. checksharps is ISO-8859-1)."""

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
        open(ap, "rb").read(), open(dp, "rb").read(),
        ignore_case=ignore_case)


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
    # COMPLEXPREFIXES double-prefix chains
    ("TestComplexPrefix.java", "complexprefix.aff", "complexprefix.dic",
     False),
    ("TestCondition2.java", "condition2.aff", "condition2.dic", False),
    # two-fold suffix stripping via continuation classes
    ("TestTwoFold.java", "twofold.aff", "morph.dic", False),
    ("TestTwoSuffixes.java", "twosuffixes.aff", "twosuffixes.dic", False),
    ("TestDependencies.java", "dependencies.aff", "dependencies.dic", False),
    # LANG tr alternate casing (dotted/dotless i)
    ("TestAlternateCasing.java", "alternate-casing.aff",
     "alternate-casing.dic", False),
    ("TestBaseUtf.java", "base_utf.aff", "base_utf.dic", False),
    # hidden twins shadowed by real homonyms
    ("TestCaseSensitive.java", "casesensitive.aff", "casesensitive.dic",
     False),
    # CHECKSHARPS ss↔ß variation + ISO-8859-1 SET decoding
    ("TestCheckSharpS.java", "checksharps.aff", "checksharps.dic", False),
    ("TestDutchIJ.java", "IJ.aff", "IJ.dic", False),
    ("TestMorph.java", "morph.aff", "morph.dic", False),
    # AM morphological aliases resolving to st: exceptions
    ("TestMorphAlias.java", "morphalias.aff", "morphalias.dic", False),
    ("TestOnlyInCompound.java", "onlyincompound.aff", "onlyincompound.dic",
     False),
    # entries containing spaces (morphBoundary scan)
    ("TestSpaces.java", "spaces.aff", "spaces.dic", False),
    ("TestStrangeOvergeneration.java", "strange-overgeneration.aff",
     "strange-overgeneration.dic", False),
    ("TestZeroAffix2.java", "zeroaffix2.aff", "zeroaffix2.dic", False),
    # AF aliases declared before FLAG long (lazy alias resolution)
    ("TestCompressed.java", "compressed.aff", "compressed.dic", False),
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


def test_str_and_bytes_inputs_equivalent():
    ap, dp = f"{_T}/simple.aff", f"{_T}/simple.dic"
    if not os.path.exists(ap):
        pytest.skip("reference fixtures not available")
    d1 = HunspellDictionary(open(ap, "rb").read(), open(dp, "rb").read())
    d2 = HunspellDictionary(open(ap, encoding="utf-8").read(),
                            open(dp, encoding="utf-8").read())
    for w in ("lucene", "solr", "ab", "apach"):
        assert d1.stem(w) == d2.stem(w)
