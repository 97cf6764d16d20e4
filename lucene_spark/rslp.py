"""Full RSLP stemming — pt/RSLPStemmerBase.java (the step/rule grammar
engine), pt/PortugueseStemmer.java and gl/GalicianStemmer.java (the step
flows), driving the published rule files ``portuguese.rslp`` /
``galician.rslp`` (Orengo & Huyck, *A Stemming Algorithm for the Portuguese
Language*; the RSLG Galician adaptation) shipped as Lucene resources and
embedded here under ``data/``.

Distinct from the RSLP-S plural-only reducers in ``stemmers.py``
(PortugueseMinimalStemmer): these run the complete Plural → Adverb →
Feminine → Augmentative → Noun → Verb → Vowel cascade plus accent removal.
Full vocabulary parity (ptrslptestdata 32k pairs, gltestdata 9.4k pairs)
is asserted in tests/test_rslp_full.py.
"""

from __future__ import annotations

import os
import re

__all__ = ["portuguese_rslp_stem", "galician_rslp_stem"]

_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",'
                  r'\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$')


class _Rule:
    __slots__ = ("suffix", "min", "replacement", "exc", "exc_is_words")

    def __init__(self, suffix, mn, repl, exc=None, exc_is_words=True):
        self.suffix = suffix
        self.min = mn
        self.replacement = repl
        self.exc = tuple(exc) if exc else ()
        self.exc_is_words = exc_is_words

    def matches(self, w: str) -> bool:
        if len(w) - len(self.suffix) < self.min or not w.endswith(self.suffix):
            return False
        if self.exc:
            if self.exc_is_words:
                if w in self.exc:
                    return False
            elif w.endswith(self.exc):
                return False
        return True

    def replace(self, w: str) -> str:
        return w[:len(w) - len(self.suffix)] + self.replacement


class _Step:
    __slots__ = ("name", "rules", "min", "suffixes")

    def __init__(self, name, rules, mn, suffixes):
        self.name = name
        self.rules = rules
        if mn == 0:  # auto: smallest rule min + suffix length
            mn = min(r.min + len(r.suffix) for r in rules)
        self.min = mn
        self.suffixes = tuple(suffixes) if suffixes else None

    def apply(self, w: str) -> str:
        if len(w) < self.min:
            return w
        if self.suffixes is not None and not w.endswith(self.suffixes):
            return w
        for r in self.rules:
            if r.matches(w):
                return r.replace(w)
        return w


def _parse_list(s: str):
    if not s:
        return None
    return [p.strip()[1:-1] for p in s.split(",")]


def _parse(path: str) -> dict[str, _Step]:
    lines = [ln.strip() for ln in open(path, encoding="utf-8")
             if ln.strip() and not ln.strip().startswith("#")]
    steps: dict[str, _Step] = {}
    i = 0
    while i < len(lines):
        m = _HEADER.match(lines[i])
        if not m:
            raise ValueError(f"bad step header: {lines[i]}")
        name, mn, typ = m.group(1), int(m.group(2)), int(m.group(3))
        suffixes = _parse_list(m.group(4))
        rules = []
        i += 1
        while i < len(lines):
            ln = lines[i]
            if (m := _STRIP.match(ln)):
                rules.append(_Rule(m.group(1), int(m.group(2)), ""))
            elif (m := _REP.match(ln)):
                rules.append(_Rule(m.group(1), int(m.group(2)), m.group(3)))
            elif (m := _EXC.match(ln)):
                rules.append(_Rule(m.group(1), int(m.group(2)), m.group(3),
                                   _parse_list(m.group(4)),
                                   exc_is_words=(typ == 1)))
            else:
                raise ValueError(f"bad rule: {ln}")
            i += 1
            if ln.endswith(";"):
                break
        steps[name] = _Step(name, rules, mn, suffixes)
        i += 0
    return steps


_DATA = os.path.join(os.path.dirname(__file__), "data")
_PT: dict[str, _Step] | None = None
_GL: dict[str, _Step] | None = None

_PT_ACCENTS = str.maketrans("àáâãäåçèéêëìíîïñòóôõöùúûüýÿ",
                            "aaaaaaceeeeiiiinooooouuuuyy")
_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")


def portuguese_rslp_stem(word: str) -> str:
    """PortugueseStemmer.stem flow (PortugueseStemmer.java:51-67):
    plural, adverb, feminine, augmentative; then noun, else verb, else
    final-vowel; then accent removal."""
    global _PT
    if _PT is None:
        _PT = _parse(os.path.join(_DATA, "portuguese.rslp"))
    s = _PT
    w = word
    w = s["Plural"].apply(w)
    w = s["Adverb"].apply(w)
    w = s["Feminine"].apply(w)
    w = s["Augmentative"].apply(w)
    w2 = s["Noun"].apply(w)
    if w2 == w:
        w2 = s["Verb"].apply(w)
        if w2 == w:
            w2 = s["Vowel"].apply(w)
    return w2.translate(_PT_ACCENTS)


def galician_rslp_stem(word: str) -> str:
    """GalicianStemmer.stem flow (GalicianStemmer.java:48-66): plural,
    unification, adverb, augmentative-to-fixpoint; noun else verb; vowel;
    RSLG accent removal."""
    global _GL
    if _GL is None:
        _GL = _parse(os.path.join(_DATA, "galician.rslp"))
    s = _GL
    w = word
    w = s["Plural"].apply(w)
    w = s["Unification"].apply(w)
    w = s["Adverb"].apply(w)
    while True:
        w2 = s["Augmentative"].apply(w)
        if w2 == w:
            break
        w = w2
    w2 = s["Noun"].apply(w)
    if w2 == w:
        w2 = s["Verb"].apply(w)
    w2 = s["Vowel"].apply(w2)
    return w2.translate(_GL_ACCENTS)
