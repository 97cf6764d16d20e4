"""Snowball stemmer family: full reference vocabulary parity.

Each language is checked against the reference's own Snowball test data
(analysis/common/src/test/.../snowball/<lang>.zip — the same 2,000
(voc, output) pairs TestSnowballVocab runs for SnowballFilter(in, name)).
"""

import os
import zipfile

import pytest

from lucene_spark.snowball import SNOWBALL_STEMMERS, snowball_stem

_ZIPS = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
         "lucene/analysis/snowball")


def _pairs(lang):
    zp = f"{_ZIPS}/{lang}.zip"
    if not os.path.exists(zp):
        pytest.skip("reference vocabulary not available")
    with zipfile.ZipFile(zp) as z:
        voc = z.read("voc.txt").decode("utf-8").split()
        out = z.read("output.txt").decode("utf-8").split()
    assert len(voc) == len(out) >= 1999
    return list(zip(voc, out))


@pytest.mark.parametrize("lang", sorted(SNOWBALL_STEMMERS))
def test_full_vocabulary_parity(lang):
    stem = SNOWBALL_STEMMERS[lang]
    for w, want in _pairs(lang):
        assert stem(w) == want, (lang, w)


def test_snowball_stem_lookup():
    assert snowball_stem("German")("aufeinanderfolgender") == "aufeinanderfolg"
    with pytest.raises(ValueError):
        snowball_stem("klingon")


def test_snowball_analyzer_wiring():
    from lucene_spark.snowball import snowball_analyzer

    an = snowball_analyzer("german")
    toks, _ = an.analyze_text("Aufeinanderfolgende Bücher")
    assert toks == ["aufeinanderfolg", "buch"]


def test_german2_umlaut_digraphs():
    # german2 prelude: ae/oe/ue → umlaut (except ue after q or a vowel)
    from lucene_spark.snowball import german2_stem, german_stem

    assert german2_stem("schoene") == german2_stem("schöne")
    assert german_stem("schoene") != german_stem("schöne")
    # 'ue' after a vowel or q stays literal: same result as plain german
    assert german2_stem("feuer") == german_stem("feuer")
    assert german2_stem("quelle") == german_stem("quelle")
