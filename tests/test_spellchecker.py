"""Classic n-gram SpellChecker: the reference TestSpellChecker goldens over
the same English-number corpus (test-framework English.intToEnglish)."""

import pytest

from lucene_spark.spellchecker import (
    SpellChecker,
    file_dictionary,
    levenshtein_distance_score,
    plain_text_dictionary,
)
from lucene_spark.suggest import jaro_winkler_distance, ngram_distance

_ONES = ["", "one ", "two ", "three ", "four ", "five ", "six ", "seven ",
         "eight ", "nine ", "ten ", "eleven ", "twelve ", "thirteen ",
         "fourteen ", "fifteen ", "sixteen ", "seventeen ", "eighteen ",
         "nineteen "]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]


def int_to_english(i: int) -> str:
    """test-framework English.intToEnglish (the subset needed for
    0..1000)."""
    if i == 0:
        return "zero"
    out = []
    if i >= 1000:
        out.append(int_to_english(i // 1000).strip() + " ")
        out.append("thousand, ")
        i %= 1000
    if i >= 100:
        out.append(int_to_english(i // 100).strip() + " ")
        out.append("hundred ")
        i %= 100
    if i >= 20:
        out.append(_TENS[i // 10])
        i %= 10
        out.append(" " if i == 0 else "-")
    if 0 < i < 20:
        out.append(_ONES[i])
    return "".join(out)


def _corpus():
    """The reference test's user index: three fields of token lists."""
    field1, field2, field3 = [], [], []
    for i in range(1000):
        field1.append(int_to_english(i).split())
        field2.append(int_to_english(i + 1).replace(",", "").split())
        field3.append(["fvei"] + (["five"] if i % 2 == 0 else []))
    field1 += [["eight"], ["twenty-one", "twenty-one"], ["twenty"]]
    return field1, field2, field3


def _terms(docs):
    return sorted({t for d in docs for t in d})


def _df(docs):
    out = {}
    for d in docs:
        for t in set(d):
            out[t] = out.get(t, 0) + 1
    return out


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.fixture(scope="module")
def sc12(corpus):
    """spell index over field1 then field2 (testBuild's addwords calls)."""
    field1, field2, _ = corpus
    sc = SpellChecker()
    sc.index_dictionary(_terms(field1))
    n1 = len(sc.words)
    sc.index_dictionary(_terms(field2))
    # field2 contributes exactly one new word: "thousand"
    assert len(sc.words) == n1 + 1
    return sc


def test_common_suggestions(sc12, corpus):
    field1, field2, _ = corpus
    assert sc12.suggest_similar("fvie", 2)[0] == "five"
    sim = sc12.suggest_similar("five", 2)
    if sim:
        assert sim[0] != "five"  # don't suggest a word for itself
    assert sc12.suggest_similar("fiv", 2)[0] == "five"
    assert sc12.suggest_similar("fives", 2)[0] == "five"
    assert sc12.suggest_similar("fie", 2)[0] == "five"
    # field restraint: thousand exists only in field2
    assert sc12.suggest_similar("tousand", 10, _df(field1)) == []
    assert len(sc12.suggest_similar("tousand", 10, _df(field2))) == 1


def test_levenshtein_suggestions(sc12):
    assert sc12.suggest_similar("fvie", 2) == ["five"]
    assert sc12.suggest_similar("five", 2) == ["nine"]
    assert sc12.suggest_similar("fiv", 2) == ["five"]
    assert sc12.suggest_similar("ive", 2) == ["five", "nine"]
    assert sc12.suggest_similar("fives", 2) == ["five"]
    assert sc12.suggest_similar("fie", 2) == ["five", "nine"]
    assert sc12.suggest_similar("fi", 2) == ["five"]
    assert sc12.suggest_similar("onety", 2) == ["ninety", "one"]


def test_jaro_winkler_and_ngram_distances(sc12):
    jw = SpellChecker(accuracy=0.8, distance=jaro_winkler_distance)
    jw.words, jw._word_set = sc12.words, sc12._word_set
    jw._postings = sc12._postings
    assert jw.suggest_similar("onety", 2) == ["one", "ninety"]
    # the best result for fvie under JW scores 0.925
    assert jw.suggest_similar("fvie", 2, accuracy=0.93) == []
    assert len(jw.suggest_similar("fvie", 2, accuracy=0.92)) == 1
    assert jw.suggest_similar("fiv", 2)[0] == "five"

    ng = SpellChecker(accuracy=0.5,
                      distance=lambda a, b: ngram_distance(a, b, 2))
    ng.words, ng._word_set = sc12.words, sc12._word_set
    ng._postings = sc12._postings
    assert ng.suggest_similar("onety", 2) == ["one", "ninety"]


def test_suggest_modes(corpus):
    field1, _, _ = corpus
    sc = SpellChecker()
    sc.index_dictionary(_terms(field1))
    df1 = _df(field1)
    assert sc.suggest_similar("eighty", 2, df1) == ["eighty"]
    assert sc.suggest_similar("eight", 2, df1) == ["eight"]
    sim = sc.suggest_similar("eighty", 5, df1, mode="SUGGEST_MORE_POPULAR")
    assert len(sim) == 5 and sim[0] == "eight"
    assert sc.suggest_similar("twenty", 5, df1,
                              mode="SUGGEST_MORE_POPULAR") == ["twenty-one"]
    assert sc.suggest_similar("eight", 5, df1,
                              mode="SUGGEST_MORE_POPULAR") == []
    sim = sc.suggest_similar("eighty", 5, df1, mode="SUGGEST_ALWAYS")
    assert len(sim) == 5 and sim[0] == "eight"
    sim = sc.suggest_similar("eight", 5, df1, mode="SUGGEST_ALWAYS")
    assert len(sim) == 5 and sim[0] == "eighty"


def test_frequency_comparator(corpus):
    # testComparator: five and fvei tie on score, fvei is more frequent
    _, _, field3 = corpus
    sc = SpellChecker(comparator="frequency")
    sc.index_dictionary(_terms(field3))
    sim = sc.suggest_similar("fvie", 2, _df(field3))
    assert sim == ["fvei", "five"]
    # bogus field: no frequencies → nothing survives WHEN_NOT_IN_INDEX
    assert sc.suggest_similar("fvie", 2, {}) == []


def test_short_words_skipped_and_exist():
    sc = SpellChecker()
    sc.index_dictionary(["ab", "abc", "abc"])
    assert sc.words == ["abc"]
    assert sc.exist("abc") and not sc.exist("ab")


def test_distance_and_dictionaries():
    assert levenshtein_distance_score("fvie", "five") == 0.5
    assert levenshtein_distance_score("", "") == 1.0
    assert levenshtein_distance_score("", "x") == 0.0
    assert plain_text_dictionary("one\n\ntwo\n") == ["one", "two"]
    assert file_dictionary("word1\t100\nword2\nword3\t50") == [
        ("word1", 100), ("word2", 0), ("word3", 50)]
