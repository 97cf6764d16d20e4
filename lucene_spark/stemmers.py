"""Language-specific light stemmers (UniNE / Savoy algorithms).

Reference (lucene/analysis/common/src/java/org/apache/lucene/analysis/...):
  es/SpanishLightStemmer.java  — "Report on CLEF-2001 Experiments", J. Savoy
  de/GermanLightStemmer.java   — "Light Stemming Approaches for the French,
  fr/FrenchLightStemmer.java      Portuguese, German and Hungarian
                                  Languages", J. Savoy

Each is a plain ``str -> str`` post-filter for the Analyzer chain; the
``light_stem_analyzer(lang)`` factory routes 'es'/'de'/'fr' to its stemmer
(and 'en' to the Porter chain), giving the corpus's ``lang`` column a real
per-language analysis path alongside the CJK routing in analysis.py.
Accent folding is part of each algorithm (the reference folds in stem()),
so these do NOT need a separate ASCIIFolding stage.
"""

from __future__ import annotations

_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaoooo" "eeeeuuuuiiii")
_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")

_DE_ST_END = frozenset("bdfghklmnt")  # GermanLightStemmer.stEnding


def spanish_light_stem(w: str) -> str:
    """SpanishLightStemmer.java:62-113."""
    if len(w) < 5:
        return w
    w = w.translate(_ES_FOLD)
    last = w[-1]
    if last in "oae":
        return w[:-1]
    if last == "s":
        if w[-2] == "e" and w[-3] == "s" and w[-4] == "e":
            return w[:-2]
        if w[-2] == "e" and w[-3] == "c":
            return w[:-3] + "z"
        if w[-2] in "oae":
            return w[:-2]
    return w


def german_light_stem(w: str) -> str:
    """GermanLightStemmer.java:62-141 (fold, step1, step2)."""
    w = w.translate(_DE_FOLD)
    # step1 (:112-127)
    if len(w) > 5 and w.endswith("ern"):
        w = w[:-3]
    elif len(w) > 4 and w[-2] == "e" and w[-1] in "mnrs":
        w = w[:-2]
    elif len(w) > 3 and w[-1] == "e":
        w = w[:-1]
    elif len(w) > 3 and w[-1] == "s" and w[-2] in _DE_ST_END:
        w = w[:-1]
    # step2 (:129-140)
    if len(w) > 5 and w.endswith("est"):
        w = w[:-3]
    elif len(w) > 4 and (w.endswith("er") or w.endswith("en")):
        w = w[:-2]
    elif len(w) > 4 and w.endswith("st") and w[-3] in _DE_ST_END:
        w = w[:-2]
    return w


def _fr_norm(s: list[str]) -> list[str]:
    """FrenchLightStemmer.norm (:213-257): fold accents, collapse runs of
    equal letters, strip trailing ie/r/e/e/double."""
    if len(s) > 4:
        s = list("".join(s).translate(_FR_FOLD))
        out = [s[0]]
        for c in s[1:]:
            if c == out[-1] and c.isalpha():
                continue
            out.append(c)
        s = out
    if len(s) > 4 and s[-2] == "i" and s[-1] == "e":
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(w: str) -> str:
    """FrenchLightStemmer.java:63-210: the ordered suffix cascade, each
    arm ending in norm()."""
    s = list(w)
    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s[-2] = "l"
        s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]

    def ends(suf: str) -> bool:
        return "".join(s).endswith(suf)

    n = len(s)
    if n > 9 and ends("issement"):
        s = s[:-6]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 8 and ends("issant"):
        s = s[:-4]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 6 and ends("ement"):
        s = s[:-4]
        if len(s) > 3 and ends("ive"):
            s = s[:-1]
            s[-1] = "f"
        return "".join(_fr_norm(s))
    if n > 11 and ends("ficatrice"):
        s = s[:-5]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 10 and ends("ficateur"):
        s = s[:-4]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 9 and ends("catrice"):
        s = s[:-3]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        return "".join(_fr_norm(s))
    if n > 8 and ends("cateur"):
        s = s[:-2]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 8 and ends("atrice"):
        s = s[:-4]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 7 and ends("ateur"):
        s = s[:-3]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 6 and ends("trice"):
        s = s[:-1]
        s[-3] = "e"
        s[-2] = "u"
        s[-1] = "r"
        n = len(s)
    if n > 5 and ends("ième"):
        return "".join(_fr_norm(s[:-4]))
    if n > 7 and ends("teuse"):
        s = s[:-2]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 6 and ends("teur"):
        s = s[:-1]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if n > 5 and ends("euse"):
        return "".join(_fr_norm(s[:-2]))
    if n > 8 and ends("ère"):
        s = s[:-1]
        s[-2] = "e"
        return "".join(_fr_norm(s))
    if n > 7 and ends("ive"):
        s = s[:-1]
        s[-1] = "f"
        return "".join(_fr_norm(s))
    if n > 4 and (ends("folle") or ends("molle")):
        s = s[:-2]
        s[-1] = "u"
        return "".join(_fr_norm(s))
    if n > 9 and ends("nnelle"):
        return "".join(_fr_norm(s[:-5]))
    if n > 9 and ends("nnel"):
        return "".join(_fr_norm(s[:-3]))
    if n > 4 and ends("ète"):
        s = s[:-1]
        s[-2] = "e"
        n = len(s)
    if n > 8 and ends("ique"):
        s = s[:-4]
        n = len(s)
    if n > 8 and ends("esse"):
        return "".join(_fr_norm(s[:-3]))
    if n > 7 and ends("inage"):
        return "".join(_fr_norm(s[:-3]))
    if n > 9 and ends("isation"):
        s = s[:-7]
        if len(s) > 5 and "".join(s).endswith("ual"):
            s[-2] = "e"
        return "".join(_fr_norm(s))
    if n > 9 and ends("isateur"):
        return "".join(_fr_norm(s[:-7]))
    if n > 8 and ends("ation"):
        return "".join(_fr_norm(s[:-5]))
    if n > 8 and ends("ition"):
        return "".join(_fr_norm(s[:-5]))
    return "".join(_fr_norm(s))


LIGHT_STEMMERS = {
    "es": spanish_light_stem,
    "de": german_light_stem,
    "fr": french_light_stem,
}


def light_stem_analyzer(lang: str):
    """Per-language analyzer: 'es'/'de'/'fr' → standard chain + that
    language's light stemmer (SpanishAnalyzer.java:118-126 chain shape,
    minus the per-language stop list — the corpus vocabulary is synthetic);
    'en' → the EnglishAnalyzer Porter chain."""
    from .analysis import Analyzer, english_analyzer

    if lang == "en":
        return english_analyzer()
    if lang in LIGHT_STEMMERS:
        return Analyzer(post_filters=(LIGHT_STEMMERS[lang],))
    raise ValueError(f"no light stemmer for lang {lang!r}")
