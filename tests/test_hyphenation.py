"""HyphenationCompoundWordTokenFilter: Liang-pattern decompounding asserted
against the reference's TestCompoundWordTokenFilter goldens, with the same
in-tree Danish pattern XML the reference tests load."""

import os

import pytest

from lucene_spark.hyphenation import (
    HyphenationTree,
    hyphenation_compound,
    parse_fop_xml,
)

_TD = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
       "lucene/analysis/compound")


def _tree(name="da_UTF8.xml"):
    path = f"{_TD}/{name}"
    if not os.path.exists(path):
        pytest.skip("reference pattern XML not available")
    return HyphenationTree.from_fop_xml(open(path, encoding="utf-8").read())


def test_hyphenation_compound_words_da():
    # testHyphenationCompoundWordsDA
    f = hyphenation_compound(_tree(), dictionary=["læse", "hest"])
    toks, pos = f("min veninde som er lidt af en læsehest".split(),
                  list(range(8)))
    assert toks == ["min", "veninde", "som", "er", "lidt", "af", "en",
                    "læsehest", "læse", "hest"]
    assert pos == [0, 1, 2, 3, 4, 5, 6, 7, 7, 7]


def test_hyphenation_compound_words_longest_match():
    # testHyphenationCompoundWordsDELongestMatch: basket suppressed
    f = hyphenation_compound(
        _tree(), dictionary=["basketball", "basket", "ball", "kurv"],
        max_subword_size=40, only_longest_match=True)
    assert f(["basketballkurv"], [0]) == (
        ["basketballkurv", "basketball", "ball", "kurv"], [0, 0, 0, 0])


def test_hyphenation_only_min_max_subword():
    # testHyphenationOnly: no dictionary, size bounds control the nonsense
    t = _tree()
    f = hyphenation_compound(t, min_subword_size=2, max_subword_size=4)
    assert f(["basketballkurv"], [0])[0] == [
        "basketballkurv", "ba", "sket", "bal", "ball", "kurv"]
    f = hyphenation_compound(t, min_subword_size=4, max_subword_size=6)
    assert f(["basketballkurv"], [0])[0] == [
        "basketballkurv", "basket", "sket", "ball", "lkurv", "kurv"]
    f = hyphenation_compound(t, min_subword_size=4, max_subword_size=10)
    assert f(["basketballkurv"], [0])[0] == [
        "basketballkurv", "basket", "basketbal", "basketball", "sket",
        "sketbal", "sketball", "ball", "ballkurv", "lkurv", "kurv"]


def test_lucene_8124_german_patterns():
    # testLucene8124 (the duplicated original is the reference's own
    # acknowledged quirk — hyp point pairs (0,4),(0,11),(4,11))
    f = hyphenation_compound(_tree("hyphenation-LUCENE-8124.xml"))
    assert f(["Rindfleisch"], [0])[0] == [
        "Rindfleisch", "Rind", "Rindfleisch", "fleisch"]


def test_min_word_size_and_no_points():
    t = _tree()
    f = hyphenation_compound(t, dictionary=["hest"])
    # below minWordSize (5): untouched
    assert f(["hest"], [0]) == (["hest"], [0])
    # a word the patterns cannot hyphenate passes through
    assert f(["zzzzzzz"], [0])[0] == ["zzzzzzz"]


def test_parse_fop_xml_sections():
    path = f"{_TD}/da_UTF8.xml"
    if not os.path.exists(path):
        pytest.skip("reference pattern XML not available")
    classes, patterns, exceptions = parse_fop_xml(
        open(path, encoding="utf-8").read())
    assert "aA" in classes and len(patterns) > 500 and exceptions == []


def test_exception_stoplist():
    t = HyphenationTree()
    t.add_class("aA")
    for c in "sociate":
        t.add_class(c + c.upper())
    t.add_exception("as-so-ciate")
    assert t.hyphenate("associate") == [0, 2, 4, 9]
