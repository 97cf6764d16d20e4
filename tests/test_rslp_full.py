"""Full RSLP / RSLG stemmers: complete reference vocabulary parity
(ptrslptestdata.zip 32,016 pairs; gltestdata.zip 9,416 pairs — the data
TestPortugueseStemFilter / TestGalicianStemFilter assert against)."""

import os
import zipfile

import pytest

from lucene_spark.rslp import galician_rslp_stem, portuguese_rslp_stem

_BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
         "lucene/analysis")


def _pairs(zp, inner):
    path = f"{_BASE}/{zp}"
    if not os.path.exists(path):
        pytest.skip("reference vocabulary not available")
    data = zipfile.ZipFile(path).read(inner).decode("utf-8")
    return [ln.split("\t") for ln in data.splitlines() if ln.strip()]


def test_portuguese_full_vocabulary():
    pairs = _pairs("pt/ptrslptestdata.zip", "ptrslp.txt")
    assert len(pairs) >= 32000
    for w, want in pairs:
        assert portuguese_rslp_stem(w) == want, w


def test_galician_full_vocabulary():
    pairs = _pairs("gl/gltestdata.zip", "gl.txt")
    assert len(pairs) >= 9400
    for w, want in pairs:
        assert galician_rslp_stem(w) == want, w


def test_step_flow_differences():
    # pt: Vowel runs only when Noun AND Verb both did nothing
    assert portuguese_rslp_stem("menino") == "menin"
    # gl: Augmentative runs to a fixpoint and Vowel always runs
    # (RSLG accent removal does not touch ñ, unlike the pt table)
    assert galician_rslp_stem("cariñosamente") == "cariñ"
