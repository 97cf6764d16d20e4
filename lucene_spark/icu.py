"""ICU analysis subset — ICUFoldingFilter and ICUNormalizer2Filter analogs.

Reference surface (under /root/reference/lucene/analysis/icu/src/java/org/
apache/lucene/analysis/icu/):

- ``ICUFoldingFilter.java`` — UTR#30 search-term folding: NFKC
  normalization, full case folding, accent/diacritic removal (including
  stroke/hook/descender), multigraph expansion, native digit folding,
  dash/space/no-break folding, default-ignorable removal — applied
  RECURSIVELY to a fixpoint ("All foldings ... applied recursively to
  ensure a fully folded and normalized result", ICUFoldingFilter.java:57).
- ``ICUNormalizer2Filter.java`` — the plain ``nfkc_cf`` normalizer: NFKC +
  case folding + default-ignorable removal, diacritics KEPT.

This is a **documented subset** built on Python's ``unicodedata`` (the
container has no ICU build): the UTR#30 classes implemented are width/
ligature/canonical folding (NFKC), full case folding (str.casefold — the
same Unicode CaseFolding.txt data ICU uses), diacritic removal (combining
marks after NFKD), stroke/hook + multigraph expansion (explicit table),
Greek letterforms (final sigma), native digit folding (any Nd → ASCII),
space folding (Zs → SPACE), dash folding (Pd → HYPHEN-MINUS), and
default-ignorable removal (Cf + variation selectors).  Han Radical,
Hebrew Alternates, Jamo, and vertical/positional-form foldings beyond
what NFKC supplies are out of scope (no table data without ICU).  Every
golden vector in the reference's TestICUFoldingFilter /
TestICUNormalizer2Filter passes (tests/test_icu.py).
"""

from __future__ import annotations

import unicodedata

import pandas as pd

# UTR#30 DiacriticFolding's stroke/hook/descender cases + Multigraph
# Expansions for the Latin repertoire NFKD cannot reach (these letters have
# no decomposition), plus Greek letterforms (final sigma).
_FOLD_TABLE = {
    "đ": "d", "ð": "d", "ø": "o", "ł": "l", "ħ": "h", "ŧ": "t",
    "ƀ": "b", "ɖ": "d", "ɗ": "d", "ƒ": "f", "ɠ": "g", "ƙ": "k",
    "ƚ": "l", "ɲ": "n", "ƥ": "p", "ʈ": "t", "ƴ": "y", "ȥ": "z",
    "æ": "ae", "œ": "oe", "þ": "th", "ĳ": "ij", "ǆ": "dž", "ǌ": "nj",
    "ǉ": "lj", "ß": "ss", "ς": "σ",
}

# Default ignorables outside category Cf that must still vanish
# (variation selectors are Mn and already dropped by the mark strip in
# icu_fold, but nfkc_cf needs them removed explicitly).
_VARIATION_SELECTORS = frozenset(chr(c) for c in range(0xFE00, 0xFE10))
_EXTRA_IGNORABLE = frozenset({"­", "​", "⁠", "﻿",
                              "᠎"}) | _VARIATION_SELECTORS


def _is_default_ignorable(ch: str) -> bool:
    return unicodedata.category(ch) == "Cf" or ch in _EXTRA_IGNORABLE


def icu_fold(token: str) -> str:
    """ICUFoldingFilter analog (documented subset; ICUFoldingFilter.java:
    22-66 lists the UTR#30 folding classes).  Idempotent by construction:
    the pipeline reruns until a fixpoint, matching the reference's
    recursive application."""
    prev = None
    t = token
    for _ in range(4):
        if t == prev:
            break
        prev = t
        t = unicodedata.normalize("NFKC", t)
        t = t.casefold()
        t = unicodedata.normalize("NFKD", t)
        out = []
        for ch in t:
            cat = unicodedata.category(ch)
            if cat == "Mn":           # diacritic / accent removal
                continue
            if _is_default_ignorable(ch):
                continue
            if cat == "Nd":           # native digit folding
                out.append(str(unicodedata.digit(ch)))
                continue
            if cat == "Zs":           # space folding
                out.append(" ")
                continue
            if cat == "Pd":           # dash folding
                out.append("-")
                continue
            out.append(_FOLD_TABLE.get(ch, ch))
        t = unicodedata.normalize("NFKC", "".join(out))
    return t


def icu_normalize(token: str) -> str:
    """ICUNormalizer2Filter analog — the default ``nfkc_cf`` normalizer:
    NFKC + full case folding + default-ignorable removal, diacritics and
    combining marks KEPT (ICUNormalizer2Filter.java:36-48)."""
    prev = None
    t = token
    for _ in range(4):
        if t == prev:
            break
        prev = t
        t = unicodedata.normalize("NFKC", t)
        t = t.casefold()
        t = "".join(ch for ch in t if not _is_default_ignorable(ch))
        t = unicodedata.normalize("NFKC", t)
    return t


# ---------------------------------------------------------------------------
# ICUCollationKeyAnalyzer analog — locale-root multi-level sort keys
# (ICUCollationKeyAnalyzer.java:51: term -> collation key bytes indexed as
# the term, so ORDER BY / TermRangeQuery collate linguistically).
#
# Documented subset: a three-level key in UCA spirit built on unicodedata
# (no ICU tailoring data in the container) — level 1 compares base
# letters (NFKD, marks stripped, case folded), level 2 accents, level 3
# case.  Root-order only: locale tailorings (Danish å > z, Farsi digit
# reorder) are out of scope and documented as such.
# ---------------------------------------------------------------------------

def collation_key(term: str) -> bytes:
    """Sort key: primary \\x01 secondary \\x02 tertiary.  Comparing keys
    with plain byte order gives accent- and case-insensitive PRIMARY
    order, accents deciding only between primary-equal terms, case last —
    the Collator.TERTIARY contract for untailored text."""
    nfkd = unicodedata.normalize("NFKD", term)
    primary = []
    secondary = []
    tertiary = []
    for ch in nfkd:
        cat = unicodedata.category(ch)
        if cat.startswith("M"):
            secondary.append(ch)
            continue
        if _is_default_ignorable(ch):
            continue
        folded = ch.casefold()
        primary.append(folded)
        tertiary.append("u" if ch != folded else "l")
    return ("".join(primary) + "\x01" + "".join(secondary) + "\x02"
            + "".join(tertiary)).encode("utf-8")


def collation_key_udf():
    """Pandas UDF producing binary collation keys — the
    ICUCollationDocValuesField analog for DataFrame ``orderBy`` and range
    predicates over a string column."""
    from pyspark.sql.functions import pandas_udf

    def _keys(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None else collation_key(t))

    return pandas_udf(_keys, "binary")


# ---------------------------------------------------------------------------
# ICUTokenizer analog — script-composite segmentation
# (segmentation/ICUTokenizer.java + DefaultICUTokenizerConfig.java:62:
# per-script break iterators; Thai/Lao/Myanmar/Khmer get dictionary or
# syllable rules, everything else UAX#29).
#
# Documented subset: Thai runs use the curated-lexicon segmenter
# (lucene_spark.th); Lao/Myanmar/Khmer runs are kept whole per run (no
# dictionaries in the container); all other text takes the standard
# UAX#29 tokenizer, which already covers CJK, emoji, and Extend/Format
# glue.  cjkAsWords CJ-dictionary compounds are served by the ja/zh
# morphological routes instead.
# ---------------------------------------------------------------------------

_SEA_SCRIPTS = __import__("re").compile(
    "(?P<thai>[ก-๛]+)|(?P<run>[ກ-໿က-႟"
    "ក-៿]+)")


def icu_tokenize(text: str) -> list[str]:
    """Script-aware word segmentation: Thai via dictionary, other
    Southeast-Asian scripts one token per run, the rest UAX#29."""
    from .analysis import tokenize
    from .th import thai_tokenize

    out: list[str] = []
    pos = 0
    for m in _SEA_SCRIPTS.finditer(text):
        if m.start() > pos:
            out.extend(tokenize(text[pos:m.start()]))
        if m.lastgroup == "thai":
            out.extend(thai_tokenize(m.group()))
        else:
            out.append(m.group())
        pos = m.end()
    if pos < len(text):
        out.extend(tokenize(text[pos:]))
    return out
