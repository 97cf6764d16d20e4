"""Greek/Turkish/Irish lowercase filter golden vectors (reference tests:
el/TestGreekLowerCaseFilterFactory.java, tr/TestTurkishLowerCaseFilter.java,
ga/TestIrishLowerCaseFilter.java). Decomposed forms built from explicit
escapes so no editor normalization can change what is being tested."""

import pytest

from lucene_spark.filters import (
    greek_lowercase,
    irish_lowercase,
    turkish_lowercase,
)

DOT = "̇"    # combining dot above
GRAVE = "̖"  # combining grave below (any other NSM works)


@pytest.mark.parametrize("w,want", [
    ("Μάϊος", "μαιοσ"),
    ("ΜΆΪΟΣ", "μαιοσ"),
    ("", ""),
])
def test_greek_lowercase(w, want):
    assert greek_lowercase(w) == want


@pytest.mark.parametrize("w,want", [
    # composed (testTurkishLowerCaseFilter)
    ("İSTANBUL", "istanbul"),
    ("İZMİR", "izmir"),
    ("ISPARTA", "ısparta"),
    # decomposed (testDecomposed)
    ("I" + DOT + "STANBUL", "istanbul"),
    ("I" + DOT + "ZMI" + DOT + "R", "izmir"),
    # decomposed with intervening accents (testDecomposed2)
    ("I" + GRAVE + DOT + "STANBUL", "i" + GRAVE + "stanbul"),
    ("I" + GRAVE + "SPARTA", "ı" + GRAVE + "sparta"),
    # bare I + dot (testDecomposed3)
    ("I" + DOT, "i"),
    ("", ""),
])
def test_turkish_lowercase(w, want):
    assert turkish_lowercase(w) == want


@pytest.mark.parametrize("w,want", [
    ("nAthair", "n-athair"),
    ("tUISCE", "t-uisce"),
    ("hARD", "hard"),
    ("nÁ", "n-á"),  # fada vowel triggers prothesis too
    ("nathair", "nathair"),   # lowercase vowel: no hyphen
    ("", ""),
])
def test_irish_lowercase(w, want):
    assert irish_lowercase(w) == want
