"""Hunspell spell-checking: every .good word must spell, every .wrong word
must not — the reference TestSpellChecking's own fixture protocol, run over
ALL 49 in-tree fixture suites (compounding, compound rules, break
decomposition, forbidden words, forced case, sharp-S, kept case, …)."""

import os

import pytest

from lucene_spark.hunspell import HunspellDictionary

_T = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
      "lucene/analysis/hunspell")

_SUITES = [
    "IJ", "allcaps", "base", "base_utf", "break", "breakdefault",
    "breakoff", "checkcompoundcase", "checkcompounddup",
    "checkcompoundpattern", "checkcompoundpattern2", "checkcompoundpattern3",
    "checkcompoundrep", "checkcompoundtriple", "checksharps",
    "compoundflag", "compoundforbid", "compoundrule", "compoundrule2",
    "compoundrule3", "compoundrule4", "compoundrule5", "compoundrule6",
    "compoundrule7", "compoundrule8", "dotless_i", "forbiddenword",
    "forceucase", "germancompounding", "i53643", "i58202", "keepcase",
    "keyDefault", "map", "maxNGramSugsDefault", "needaffix5", "ngram",
    "nosuggest", "oconv", "onlyincompound2", "opentaal_forbiddenword1",
    "opentaal_forbiddenword2", "ph", "ph2", "rep", "simplifiedtriple",
    "sug", "sug2", "wordpair",
]


def _lines(path):
    return [ln.strip()
            for ln in open(path, "rb").read().decode("utf-8").splitlines()
            if ln.strip()]


@pytest.mark.parametrize("name", _SUITES)
def test_spell_fixture(name):
    aff, dic = f"{_T}/{name}.aff", f"{_T}/{name}.dic"
    if not os.path.exists(aff):
        pytest.skip("reference fixtures not available")
    d = HunspellDictionary(open(aff, "rb").read(), open(dic, "rb").read())
    ran = 0
    for suffix, want in ((".good", True), (".wrong", False)):
        path = f"{_T}/{name}{suffix}"
        if not os.path.exists(path):
            continue
        for word in _lines(path):
            assert d.spell(word) == want, (name, word, want)
            ran += 1
    assert ran > 0


def test_spell_basics():
    d = HunspellDictionary("SET UTF-8\n", "1\nfoo\n")
    assert d.spell("")                      # empty is fine
    assert d.spell("42") and d.spell("3.14") and d.spell("1,5")
    assert not d.spell(".5")
    assert d.spell("5.")  # trailing dot: spells via the bare "5"
    assert d.spell("foo") and not d.spell("bar")
    assert d.spell("foo.") and d.spell("foo...")    # trailing dots
    assert d.spell("foo-foo")               # default middle break "-"
    assert not d.spell("foo-bar")


_SUG_SUITES = [
    "IJ", "allcaps", "base_utf", "breakdefault", "checksharps",
    "forceucase", "i58202", "keepcase", "keyDefault", "map",
    "maxNGramSugsDefault", "ngram", "nosuggest", "oconv",
    "opentaal_forbiddenword1", "opentaal_forbiddenword2", "ph", "ph2",
    "rep", "sug", "sug2",
]


@pytest.mark.parametrize("name", _SUG_SUITES)
def test_suggestion_fixture(name):
    """TestSpellChecking's .sug protocol: for each .wrong word, the
    suggestion list (joined ', ') must equal the fixture line."""
    aff = f"{_T}/{name}.aff"
    if not os.path.exists(aff):
        pytest.skip("reference fixtures not available")
    d = HunspellDictionary(open(aff, "rb").read(),
                           open(f"{_T}/{name}.dic", "rb").read())
    wrong = _lines(f"{_T}/{name}.wrong")
    got = "\n".join(", ".join(d.suggest(w)) for w in wrong
                    if d.suggest(w))
    want = open(f"{_T}/{name}.sug", "rb").read().decode("utf-8").strip()
    assert got == want, name


@pytest.mark.parametrize("name", [
    "base", "base_utf", "keepcase", "allcaps", "rep", "forceucase",
    "checksharps", "map", "sug", "sug2", "nosuggest", "ngram",
])
def test_suggestions_always_spell(name):
    """Invariant: every suggestion for a misspelled word must itself
    spell (the reference's suggesters verify candidates through the same
    speller before emitting them)."""
    aff = f"{_T}/{name}.aff"
    if not os.path.exists(aff):
        pytest.skip("reference fixtures not available")
    d = HunspellDictionary(open(aff, "rb").read(),
                           open(f"{_T}/{name}.dic", "rb").read())
    if d.oconv:
        pytest.skip("OCONV rewrites output tokens before spelling")
    wrong_path = f"{_T}/{name}.wrong"
    if not os.path.exists(wrong_path):
        pytest.skip("no .wrong fixture")
    for word in _lines(wrong_path):
        for sug in d.suggest(word):
            # split suggestions are verified part-wise by the
            # reference; case-adjusted space candidates skip the final
            # spell check (Hunspell.adjustSuggestionCase), so accept the
            # lowercase form too
            for chunk in sug.replace("-", " ").split(" "):
                if chunk:
                    assert d.spell(chunk) or d.spell(chunk.lower()), \
                        (name, word, sug, chunk)
