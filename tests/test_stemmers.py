"""Light-stemmer tests: full reference vocabulary parity (es/de/fr) plus
the inline reference test vectors (TestFrenchLightStemFilter etc.)."""

import os
import zipfile

import pytest

from lucene_spark.stemmers import (
    LIGHT_STEMMERS,
    french_light_stem,
    german_light_stem,
    light_stem_analyzer,
    spanish_light_stem,
)

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"


@pytest.mark.parametrize(
    "lang", ["es", "de", "fr", "it", "pt", "sv", "ru", "fi", "hu"])
def test_full_reference_vocabulary(lang):
    """Every (word, stem) pair from the reference impl's vocabulary file
    (the same data TestXLightStemFilter.testVocabulary asserts against) —
    311,639 pairs across the nine languages, compared raw (the reference
    filters are case-sensitive: uppercase accents do not fold)."""
    zp = f"{_REF}/{lang}/{lang}lighttestdata.zip"
    if not os.path.exists(zp):
        pytest.skip("reference vocabulary not available")
    stem = LIGHT_STEMMERS[lang]
    with zipfile.ZipFile(zp) as z:
        txt = [n for n in z.namelist() if n.endswith(".txt")][0]
        data = z.read(txt).decode("utf-8")
    n = 0
    for line in data.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t") if "\t" in line else line.split()
        if len(parts) != 2:
            continue
        w, want = parts
        assert stem(w) == want, (lang, w)
        n += 1
    assert n > 10000  # the vocabularies are 20k-50k pairs each


def test_inline_vectors():
    # TestFrenchLightStemFilter.java:56-151 highlights
    for w, want in [("chevaux", "cheval"), ("chantés", "chant"),
                    ("justificatrice", "justifi"), ("folle", "fou"),
                    ("ritualisation", "rituel"), ("créées", "cre"),
                    ("abcccddeef", "abcdef"), ("22hh00", "22h00"),
                    ("1234555", "1234555")]:
        assert french_light_stem(w) == want, w
    # SpanishLightStemmer rules: vowel drop, -es, -ces -> z
    assert spanish_light_stem("casa") == "casa"  # len < 5 untouched
    assert spanish_light_stem("casas") == "cas"
    assert spanish_light_stem("veces") == "vez"
    assert spanish_light_stem("meses") == "mes"
    assert spanish_light_stem("canción") == "cancion"  # ó folds, -n kept
    # GermanLightStemmer steps
    assert german_light_stem("häuser") == "haus"
    assert german_light_stem("bücher") == "buch"


def test_analyzer_factory():
    an = light_stem_analyzer("es")
    assert an.analyze_text("las casas grandes")[0] == ["las", "cas", "grand"]
    with pytest.raises(ValueError):
        light_stem_analyzer("xx")
    # 'en' routes to the Porter chain
    assert light_stem_analyzer("en").analyze_text("running")[0] == ["run"]


def test_norwegian_vocabulary():
    """nb/nn light + minimal vocabulary files from the reference tests."""
    from lucene_spark.stemmers import (
        BOKMAAL,
        NYNORSK,
        norwegian_light_stem,
        norwegian_minimal_stem,
    )

    base = f"{_REF}/no"
    if not os.path.exists(base):
        pytest.skip("reference vocabulary not available")
    for fn, factory, flags in [("nb_light.txt", norwegian_light_stem, BOKMAAL),
                               ("nn_light.txt", norwegian_light_stem, NYNORSK),
                               ("nb_minimal.txt", norwegian_minimal_stem, BOKMAAL),
                               ("nn_minimal.txt", norwegian_minimal_stem, NYNORSK)]:
        stem = factory(flags)
        n = 0
        with open(f"{base}/{fn}", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split("\t") if "\t" in line else line.split()
                if len(parts) != 2:
                    continue
                w, want = parts
                assert stem(w) == want, (fn, w)
                n += 1
        assert n > 50
    with pytest.raises(ValueError):
        norwegian_light_stem(0)


def test_english_minimal():
    # TestEnglishMinimalStemFilter.java:51-59 + algorithm edge cases
    from lucene_spark.stemmers import english_minimal_stem as em

    for w, want in [("queries", "query"), ("phrases", "phrase"),
                    ("corpus", "corpus"), ("stress", "stress"),
                    ("kings", "king"), ("panels", "panel"),
                    ("aerodynamics", "aerodynamic"), ("congress", "congress"),
                    ("serious", "serious"), ("dies", "dy"), ("does", "does"),
                    ("goes", "goes"), ("aies", "aies"), ("", "")]:
        assert em(w) == want, w


@pytest.mark.parametrize("lang,zname", [("de", "deminimal"), ("fr", "frminimal")])
def test_minimal_reference_vocabulary(lang, zname):
    from lucene_spark.stemmers import MINIMAL_STEMMERS

    zp = f"{_REF}/{lang}/{zname}testdata.zip"
    if not os.path.exists(zp):
        pytest.skip("reference vocabulary not available")
    stem = MINIMAL_STEMMERS[lang]
    with zipfile.ZipFile(zp) as z:
        txt = [n for n in z.namelist() if n.endswith(".txt")][0]
        data = z.read(txt).decode("utf-8")
    n = 0
    for line in data.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t") if "\t" in line else line.split()
        if len(parts) != 2:
            continue
        w, want = parts
        assert stem(w) == want, (lang, w)
        n += 1
    assert n > 10000


def test_porter2_english_zip_parity():
    """Full-vocabulary parity for the English Snowball ("Porter2") stemmer
    against the reference's own test data — the same 2000 (voc, output)
    pairs TestSnowballVocab runs for SnowballFilter(in, "English")
    (analysis/common/src/test/.../snowball/english.zip)."""
    from lucene_spark.stemmers import porter2_stem

    zp = f"{_REF}/snowball/english.zip"
    if not os.path.exists(zp):
        pytest.skip("reference vocabulary not available")
    with zipfile.ZipFile(zp) as z:
        voc = z.read("voc.txt").decode("utf-8").split()
        out = z.read("output.txt").decode("utf-8").split()
    assert len(voc) == len(out) == 2000
    for w, want in zip(voc, out):
        assert porter2_stem(w) == want, w


def test_porter2_exception_lists():
    """The algorithm's verbatim exception entries (published spec)."""
    from lucene_spark.stemmers import porter2_stem

    for w, want in [("skis", "ski"), ("skies", "sky"), ("dying", "die"),
                    ("lying", "lie"), ("tying", "tie"), ("idly", "idl"),
                    ("gently", "gentl"), ("ugly", "ugli"), ("early", "earli"),
                    ("only", "onli"), ("singly", "singl"), ("sky", "sky"),
                    ("news", "news"), ("atlas", "atlas"), ("inning", "inning"),
                    ("proceed", "proceed"), ("exceed", "exceed")]:
        assert porter2_stem(w) == want, w


def test_porter2_analyzer_wiring():
    """english_analyzer(stemmer="porter2") swaps the final stage."""
    from lucene_spark.analysis import english_analyzer

    a1 = english_analyzer()
    a2 = english_analyzer(stemmer="porter2")
    t1, _ = a1.analyze_text("the generously negotiated conditional agreement")
    t2, _ = a2.analyze_text("the generously negotiated conditional agreement")
    assert t2 == ["generous", "negoti", "condit", "agreement"]
    assert t1 != t2  # porter1: generos
