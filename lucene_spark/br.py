"""Brazilian Portuguese stemmer — analysis/br/BrazilianStemmer.java
(the Lucene Brazilian stemmer; accent-folding + R1/R2/RV suffix cascade).

Distinct from the RSLP-S plural reducer (stemmers.py) and the Portuguese
light/minimal stemmers: this is the BrazilianAnalyzer's stem stage.  Every
TestBrazilianAnalyzer golden is asserted in tests/test_br.py, including the
reference's own quirks (the discarded "logias" replacement, and R1/R2/RV
snapshots that are never recomputed after edits).
"""

from __future__ import annotations

__all__ = ["brazilian_stem", "brazilian_analyzer"]

_VOWELS = "aeiou"

_FOLD = str.maketrans({
    "\u00e1": "a", "\u00e2": "a", "\u00e3": "a",
    "\u00e9": "e", "\u00ea": "e",
    "\u00ed": "i",
    "\u00f3": "o", "\u00f4": "o", "\u00f5": "o",
    "\u00fa": "u", "\u00fc": "u",
    "\u00e7": "c",
    "\u00f1": "n",
})

_PUNCT = "\"'-,;.?!"

_BR_VERB = (  # step2 verb suffixes, reference order (first hit wins)
    "issemos essemos assemos ariamos eriamos iriamos iremos eremos aremos "
    "avamos iramos eramos aramos asseis esseis isseis arieis erieis irieis "
    "irmos iamos armos ermos areis ereis ireis asses esses isses astes "
    "assem essem issem ardes erdes irdes ariam eriam iriam arias erias "
    "irias estes istes areis aveis aria eria iria asse esse isse aste este "
    "iste arei erei irei aram eram iram avam arem erem irem ando endo indo "
    "arao erao irao adas idas aras eras iras avas ares eres ires ados idos "
    "amos emos imos iras ieis ada ida ara era ira iam ado ido ias ais eis "
    "ira ear ia ei am em ar er ir as es is eu iu iu ou").split()

# step1 nominal suffixes: (suffix, region, replacement, preceded-by).
# region "r2"/"r1" checks the R1/R2 snapshot; "rv+e" additionally requires
# the suffix preceded by "e" in CT and checks the RV snapshot.
_BR_STEP1 = (
    ("uciones", "r2", "u", None),
    ("imentos", "r2", "", None), ("amentos", "r2", "", None),
    ("adores", "r2", "", None), ("adoras", "r2", "", None),
    ("logias", "r2", "DISCARDED", None),  # reference bug: result dropped
    ("encias", "r2", "ente", None),
    ("amente", "r1", "", None),
    ("idades", "r2", "", None),
    ("acoes", "r2", "", None), ("imento", "r2", "", None),
    ("amento", "r2", "", None), ("adora", "r2", "", None),
    ("ismos", "r2", "", None), ("istas", "r2", "", None),
    ("logia", "r2", "log", None), ("ucion", "r2", "u", None),
    ("encia", "r2", "ente", None), ("mente", "r2", "", None),
    ("idade", "r2", "", None),
    ("acao", "r2", "", None), ("ezas", "r2", "", None),
    ("icos", "r2", "", None), ("icas", "r2", "", None),
    ("ismo", "r2", "", None), ("avel", "r2", "", None),
    ("ivel", "r2", "", None), ("ista", "r2", "", None),
    ("osos", "r2", "", None), ("osas", "r2", "", None),
    ("ador", "r2", "", None), ("ivas", "r2", "", None),
    ("ivos", "r2", "", None),
    ("iras", "rv", "ir", "e"),
    ("eza", "r2", "", None), ("ico", "r2", "", None),
    ("ica", "r2", "", None), ("oso", "r2", "", None),
    ("osa", "r2", "", None), ("iva", "r2", "", None),
    ("ivo", "r2", "", None),
    ("ira", "rv", "ir", "e"),
)

# the reference's per-length gates in step1: suffixes of each length are
# only tried when len(CT) >= gate
_BR_STEP1_GATE = {7: 0, 6: 6, 5: 5, 4: 4, 3: 3}


def _r1(v: str) -> str | None:
    """Region after the first non-vowel following a vowel — with the
    reference's exact scan (both scans stop before the LAST index)."""
    if v is None:
        return None
    i = len(v) - 1
    j = 0
    while j < i and not v[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and v[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return v[j + 1:]


def _rv(v: str) -> str | None:
    if v is None:
        return None
    i = len(v) - 1
    if i > 0 and v[1] not in _VOWELS:
        j = 2
        while j < i and v[j] not in _VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 1 and v[0] in _VOWELS and v[1] in _VOWELS:
        j = 2
        while j < i and v[j] in _VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 2:
        return v[3:]
    return None


def _ends(v: str | None, suf: str) -> bool:
    return v is not None and len(suf) <= len(v) and v.endswith(suf)


def _rm(v: str, suf: str) -> str:
    return v[:-len(suf)] if _ends(v, suf) else v


def brazilian_stem(term: str) -> str:
    """BrazilianStemFilter contract: returns the stemmed discriminator, or
    the input unchanged when the stemmer refuses (non-letters, too
    short/long)."""
    ct = term.lower().translate(_FOLD)
    if len(ct) >= 2 and ct[0] in _PUNCT:
        ct = ct[1:]
    if len(ct) >= 2 and ct[-1] in _PUNCT:
        ct = ct[:-1]

    if not (2 < len(ct) < 30):
        return term
    if not ct.isalpha():
        return ct

    r1 = _r1(ct)
    r2 = _r1(r1)
    rv = _rv(ct)

    # step1: nominal suffixes against the R1/R2/RV snapshots
    altered = False
    for suf, region, repl, prec in _BR_STEP1:
        if len(ct) < _BR_STEP1_GATE.get(len(suf), len(suf)):
            continue
        if not _ends(ct, suf):
            continue
        if region == "r1":
            if not _ends(r1, suf):
                continue
        elif region == "r2":
            if not _ends(r2, suf):
                continue
        else:  # rv (+ preceded-by)
            if not _ends(rv, suf) or not _ends(ct[:-len(suf)], prec):
                continue
        if repl != "DISCARDED":
            ct = _rm(ct, suf) + repl
        altered = True
        break

    # step2: verb suffixes matched against the RV snapshot, removed from CT
    if not altered and rv is not None:
        for suf in _BR_VERB:
            if _ends(rv, suf):
                ct = _rm(ct, suf)
                altered = True
                break

    if altered:
        # step3: -i after c (in RV)
        if rv is not None and _ends(rv, "i") and _ends(rv[:-1], "c"):
            ct = _rm(ct, "i")
    else:
        # step4: residual suffix in RV
        if rv is not None:
            for suf in ("os", "a", "i", "o"):
                if _ends(rv, suf):
                    ct = _rm(ct, suf)
                    break

    # step5: final -e in RV, absorbing a preceding gu/ci
    if rv is not None and _ends(rv, "e"):
        if _ends(rv[:-1], "gu"):
            ct = _rm(ct, "e")
            ct = _rm(ct, "u")
        elif _ends(rv[:-1], "ci"):
            ct = _rm(ct, "e")
            ct = _rm(ct, "i")
        else:
            ct = _rm(ct, "e")
    return ct


def brazilian_analyzer():
    """BrazilianAnalyzer.java chain: standard tokenize -> lowercase ->
    (stop) -> BrazilianStemFilter."""
    from .analysis import Analyzer

    return Analyzer(post_filters=(brazilian_stem,))
