"""International analysis: normalizers and light stemmers for Arabic,
Persian, Hindi, Indonesian, Czech, and Bulgarian.

Each function is a faithful per-token reimplementation of the reference
filter (cited per function), written as a plain ``str -> str`` transform so
it slots into :class:`lucene_spark.analysis.Analyzer` ``post_filters`` and
runs inside the vectorized Arrow analysis UDF — the same execution shape as
every other token filter in the engine.  Golden vectors from the reference's
own analysis tests pin the behavior (tests/test_intl.py).

Scale note: these are pure per-token string functions with no lookahead and
no shared state, so the 100 TB story is unchanged — they execute inside the
existing per-partition tokenize UDF, add no shuffle, and the per-language
routing (``intl_analyzer`` via ``analysis.RoutingAnalyzer``) keeps each
partition's work independent.
"""

from __future__ import annotations

# --- Arabic (analysis/ar/ArabicNormalizer.java:32-88,
#              analysis/ar/ArabicStemmer.java:30-126) -----------------------

_AR_ALEF = "ا"
_AR_NORM_MAP = str.maketrans({
    "آ": _AR_ALEF,   # alef madda
    "أ": _AR_ALEF,   # alef hamza above
    "إ": _AR_ALEF,   # alef hamza below
    "ى": "ي",   # dotless yeh -> yeh
    "ة": "ه",   # teh marbuta -> heh
    "ـ": None,       # tatweel deleted
    "ً": None, "ٌ": None, "ٍ": None,  # -atan/-utan/-itan
    "َ": None, "ُ": None, "ِ": None,  # fatha/damma/kasra
    "ّ": None, "ْ": None,                  # shadda/sukun
})


def arabic_normalize(w: str) -> str:
    """ArabicNormalizer.normalize: fold alef/yeh/teh-marbuta variants and
    delete tatweel + harakat (ArabicNormalizer.java:60-88)."""
    return w.translate(_AR_NORM_MAP)


# prefix list in scan order (ArabicStemmer.java:41-49); only the FIRST
# match is stripped (stemPrefix returns on hit, :84-87)
_AR_PREFIXES = ("ال", "وال", "بال",
                "كال", "فال", "لل",
                "و")
# suffix list in scan order (ArabicStemmer.java:52-63); EVERY entry is
# checked once, in order, against the shrinking buffer (stemSuffix :95-99)
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_stem(w: str) -> str:
    """ArabicStemmer.stem: strip one definite-article/conjunction prefix,
    then the ordered suffix cascade.  Length guards per
    startsWithCheckLength (single-char 'waw' needs len>=4, others need two
    chars left after the strip, :105-117) and endsWithCheckLength (two
    chars must remain, :120-129)."""
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if len(w) >= 4 and w.startswith(p):
                w = w[1:]
                break
        elif len(w) >= len(p) + 2 and w.startswith(p):
            w = w[len(p):]
            break
    for s in _AR_SUFFIXES:
        if len(w) >= len(s) + 2 and w.endswith(s):
            w = w[: -len(s)]
    return w


# --- Persian (analysis/fa/PersianNormalizer.java:33-76) --------------------

_FA_NORM_MAP = str.maketrans({
    "ی": "ي",   # farsi yeh -> yeh
    "ے": "ي",   # yeh barree -> yeh
    "ک": "ك",   # keheh -> kaf
    "ۀ": "ه",   # heh+yeh -> heh
    "ہ": "ه",   # heh goal -> heh
    "ٔ": None,       # hamza above deleted
})


def persian_normalize(w: str) -> str:
    """PersianNormalizer.normalize (PersianAnalyzer runs it AFTER
    ArabicNormalizationFilter — PersianAnalyzer.java:121-127)."""
    return w.translate(_FA_NORM_MAP)


# --- Hindi (analysis/hi/HindiNormalizer.java:43-130,
#             analysis/hi/HindiStemmer.java:25-115) -------------------------

_HI_NORM_MAP = str.maketrans({
    "ँ": "ं",               # candrabindu -> bindu
    "़": None,                   # nukta deleted
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",  # precomposed nukta forms
    "‍": None, "‌": None,   # zwj / zwnj deleted
    "्": None,                   # virama deleted
    "ॅ": "े", "ॆ": "े",  # chandra/short e -> e
    "ॉ": "ो", "ॊ": "ो",  # chandra/short o -> o
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ",  # long -> short ind. vowels
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
})


def hindi_normalize(w: str) -> str:
    """HindiNormalizer.normalize: the Ramanathan & Rao orthographic
    normalizations — nukta/virama/zwj deletion, candrabindu folding, and
    long->short vowel folding.  The dead-n rule (n + virama -> bindu,
    HindiNormalizer.java:49-53) needs one-token lookahead so it runs before
    the char map."""
    w = w.replace("न्", "ं")
    return w.translate(_HI_NORM_MAP)


# suffix tiers, longest first (HindiStemmer.java:27-113); within a tier the
# guard is len > tier_len + 1 and only the first match strips
_HI_SUFFIX_TIERS = (
    ("ाएंगी", "ाएंगे",
     "ाऊंगी", "ाऊंगा",
     "ाइयाँ", "ाइयों",
     "ाइयां"),
    ("ाएगी", "ाएगा",
     "ाओगी", "ाओगे",
     "एंगी", "ेंगी",
     "एंगे", "ेंगे",
     "ूंगी", "ूंगा",
     "ातीं", "नाओं",
     "नाएं", "ताओं",
     "ताएं", "ियाँ",
     "ियों", "ियां"),
    ("ाकर", "ाइए", "ाईं",
     "ाया", "ेगी", "ेगा",
     "ोगी", "ोगे", "ाने",
     "ाना", "ाते", "ाती",
     "ाता", "तीं", "ाओं",
     "ाएं", "ुओं", "ुएं",
     "ुआं"),
    ("कर", "ाओ", "िए", "ाई",
     "ाए", "ने", "नी", "ना",
     "ते", "ीं", "ती", "ता",
     "ाँ", "ां", "ों", "ें"),
    ("ो", "े", "ू", "ु", "ी", "ि", "ा"),
)


def hindi_stem(w: str) -> str:
    """HindiStemmer.stem: the lightweight suffix strip — tiers of length
    5..1, first match in the first applicable tier wins
    (HindiStemmer.java:27-113)."""
    for tier in _HI_SUFFIX_TIERS:
        tl = len(tier[0])
        if len(w) > tl + 1:
            for s in tier:
                if w.endswith(s):
                    return w[:-tl]
    return w


# --- Indonesian (analysis/id/IndonesianStemmer.java:30-244) -----------------

_ID_VOWELS = frozenset("aeiou")
_REMOVED_KE, _REMOVED_PENG, _REMOVED_DI = 1, 2, 4
_REMOVED_MENG, _REMOVED_TER, _REMOVED_BER, _REMOVED_PE = 8, 16, 32, 64


def indonesian_stem(w: str, derivational: bool = True) -> str:
    """IndonesianStemmer.stem (Tala 2003): inflectional particles and
    possessive pronouns always; derivational prefixes/suffixes when
    ``derivational`` (the filter's stemDerivational flag).  Faithful
    syllable budget (vowel count, decremented per removal) and the
    prefix-removal flags that veto conflicting suffixes
    (IndonesianStemmer.java:44-57 driver, :200-244 vetoes)."""
    syl = sum(1 for c in w if c in _ID_VOWELS)
    flags = 0

    def particle(t: str) -> str:
        nonlocal syl
        if t.endswith(("kah", "lah", "pun")):
            syl -= 1
            return t[:-3]
        return t

    def possessive(t: str) -> str:
        nonlocal syl
        if t.endswith(("ku", "mu")):
            syl -= 1
            return t[:-2]
        if t.endswith("nya"):
            syl -= 1
            return t[:-3]
        return t

    def first_prefix(t: str) -> str:
        # IndonesianStemmer.removeFirstOrderPrefix (:110-180): ordered
        # meng-/meny-/men-/mem-/me-, peng-/peny-/pen-/pem-, di-, ter-, ke-
        # with the nasal-substitution cases (meny+V -> s..., pen+V -> t...)
        nonlocal syl, flags
        if t.startswith("meng"):
            flags |= _REMOVED_MENG; syl -= 1; return t[4:]
        if t.startswith("meny") and len(t) > 4 and t[4] in _ID_VOWELS:
            flags |= _REMOVED_MENG; syl -= 1; return "s" + t[4:]
        if t.startswith(("men", "mem")):
            flags |= _REMOVED_MENG; syl -= 1; return t[3:]
        if t.startswith("me"):
            flags |= _REMOVED_MENG; syl -= 1; return t[2:]
        if t.startswith("peng"):
            flags |= _REMOVED_PENG; syl -= 1; return t[4:]
        if t.startswith("peny") and len(t) > 4 and t[4] in _ID_VOWELS:
            flags |= _REMOVED_PENG; syl -= 1; return "s" + t[4:]
        if t.startswith("peny"):
            flags |= _REMOVED_PENG; syl -= 1; return t[4:]
        if t.startswith("pen") and len(t) > 3 and t[3] in _ID_VOWELS:
            flags |= _REMOVED_PENG; syl -= 1; return "t" + t[3:]
        if t.startswith(("pen", "pem")):
            flags |= _REMOVED_PENG; syl -= 1; return t[3:]
        if t.startswith("di"):
            flags |= _REMOVED_DI; syl -= 1; return t[2:]
        if t.startswith("ter"):
            flags |= _REMOVED_TER; syl -= 1; return t[3:]
        if t.startswith("ke"):
            flags |= _REMOVED_KE; syl -= 1; return t[2:]
        return t

    def second_prefix(t: str) -> str:
        # removeSecondOrderPrefix (:183-222): ber-, belajar, beCer-, per-,
        # pelajar, pe-
        nonlocal syl, flags
        if t.startswith("ber"):
            flags |= _REMOVED_BER; syl -= 1; return t[3:]
        if t == "belajar":
            flags |= _REMOVED_BER; syl -= 1; return t[3:]
        if (t.startswith("be") and len(t) > 4 and t[2] not in _ID_VOWELS
                and t[3] == "e" and t[4] == "r"):
            flags |= _REMOVED_BER; syl -= 1; return t[2:]
        if t.startswith("per"):
            syl -= 1; return t[3:]
        if t == "pelajar":
            syl -= 1; return t[3:]
        if t.startswith("pe"):
            flags |= _REMOVED_PE; syl -= 1; return t[2:]
        return t

    def suffix(t: str) -> str:
        # removeSuffix (:225-244): -kan / -an / -i with prefix vetoes
        nonlocal syl
        if (t.endswith("kan") and not flags & (_REMOVED_KE | _REMOVED_PENG
                                               | _REMOVED_PE)):
            syl -= 1
            return t[:-3]
        if (t.endswith("an") and not flags & (_REMOVED_DI | _REMOVED_MENG
                                              | _REMOVED_TER)):
            syl -= 1
            return t[:-2]
        if (t.endswith("i") and not t.endswith("si")
                and not flags & (_REMOVED_BER | _REMOVED_KE
                                 | _REMOVED_PENG)):
            syl -= 1
            return t[:-1]
        return t

    if syl > 2:
        w = particle(w)
    if syl > 2:
        w = possessive(w)
    if derivational:
        old = w
        if syl > 2:
            w = first_prefix(w)
        if w != old:                       # a first-order rule fired
            old = w
            if syl > 2:
                w = suffix(w)
            if w != old and syl > 2:       # a suffix rule fired too
                w = second_prefix(w)
        else:                              # no first-order prefix
            if syl > 2:
                w = second_prefix(w)
            if syl > 2:
                w = suffix(w)
    return w


# --- Czech (analysis/cz/CzechStemmer.java:27-160) ---------------------------

_CZ_CASE_5 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
              "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
              "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_CASE_4 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
              "mi", "ou")
_CZ_VOWELY = frozenset("aeiouůyáéíýě")


def czech_stem(w: str) -> str:
    """CzechStemmer.stem (Dolamic & Savoy): removeCase -> removePossessives
    -> normalize, with the palatalization rewrites (čt->ck, št->sk, c/č->k,
    z/ž->h, e-insertion removal, ů->o) (CzechStemmer.java:34-160)."""
    n = len(w)
    if n > 7 and w.endswith("atech"):
        w = w[:-5]
    elif n > 6 and w.endswith(("ětem", "etem", "atům")):
        w = w[:-4]
    elif n > 5 and w.endswith(_CZ_CASE_5):
        w = w[:-3]
    elif n > 4 and w.endswith(_CZ_CASE_4):
        w = w[:-2]
    elif n > 3 and w[-1] in _CZ_VOWELY:
        w = w[:-1]
    if len(w) > 5 and w.endswith(("ov", "in", "ův")):
        w = w[:-2]
    if not w:
        return w
    # normalize (:121-160)
    if w.endswith("čt"):
        return w[:-2] + "ck"
    if w.endswith("št"):
        return w[:-2] + "sk"
    if w[-1] in "cč":
        return w[:-1] + "k"
    if w[-1] in "zž":
        return w[:-1] + "h"
    if len(w) > 1 and w[-2] == "e":
        return w[:-2] + w[-1]
    if len(w) > 2 and w[-2] == "ů":
        return w[:-2] + "o" + w[-1]
    return w


# --- Bulgarian (analysis/bg/BulgarianStemmer.java:28-135) -------------------

def bulgarian_stem(w: str) -> str:
    """BulgarianStemmer.stem (Savoy BUIR light stemmer): article removal,
    plural removal, trailing-vowel strips, ен->н, and the ъN->N shift, with
    the reference's exact length guards (BulgarianStemmer.java:34-135)."""
    n = len(w)
    if n < 4:
        return w
    if n > 5 and w.endswith("ища"):
        return w[:-3]
    # removeArticle (:68-85)
    if n > 6 and w.endswith("ият"):
        w = w[:-3]
    elif n > 5 and w.endswith(("ът", "то", "те", "та", "ия")):
        w = w[:-2]
    elif n > 4 and w.endswith("ят"):
        w = w[:-2]
    # removePlural (:88-120)
    n = len(w)
    if n > 6 and w.endswith("овци"):
        w = w[:-3]
    elif n > 6 and w.endswith("ове"):
        w = w[:-3]
    elif n > 6 and w.endswith("еве"):
        w = w[:-3] + "й"
    elif n > 5 and w.endswith("ища"):
        w = w[:-3]
    elif n > 5 and w.endswith("та"):
        w = w[:-2]
    elif n > 5 and w.endswith("ци"):
        w = w[:-2] + "к"
    elif n > 5 and w.endswith("зи"):
        w = w[:-2] + "г"
    elif n > 5 and w[-3] == "е" and w[-1] == "и":
        w = w[:-3] + "я" + w[-2]
    elif n > 4 and w.endswith("си"):
        w = w[:-2] + "х"
    elif n > 4 and w.endswith("и"):
        w = w[:-1]
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w.endswith(("а", "о", "е")):
            w = w[:-1]
    if len(w) > 4 and w.endswith("ен"):
        w = w[:-2] + "н"
    if len(w) > 5 and w[-2] == "ъ":
        w = w[:-2] + w[-1]
    return w


# --- per-language analyzer factory ------------------------------------------

def intl_analyzer(lang: str):
    """Analyzer chains per the reference language analyzers:

    - ``ar``: ArabicAnalyzer.java:121-131 — normalize then stem
    - ``fa``: PersianAnalyzer.java:121-127 — Arabic normalize then Persian
      normalize (no stemmer)
    - ``hi``: HindiAnalyzer.java:109-119 — normalize then stem
    - ``id``: IndonesianAnalyzer.java:103-110 — derivational stemmer
    - ``cs``: CzechAnalyzer.java:107-114
    - ``bg``: BulgarianAnalyzer.java:99-106

    Per-language stop sets are omitted (synthetic corpus vocabulary); the
    standard English stop list applies as elsewhere in the engine.
    """
    from .analysis import Analyzer

    chains = {
        "ar": (arabic_normalize, arabic_stem),
        "fa": (arabic_normalize, persian_normalize),
        "hi": (hindi_normalize, hindi_stem),
        "id": (indonesian_stem,),
        "cs": (czech_stem,),
        "bg": (bulgarian_stem,),
    }
    if lang not in chains:
        raise ValueError(f"no intl analyzer for lang {lang!r}")
    return Analyzer(post_filters=chains[lang])


STEMMERS = {
    "ar": arabic_stem,
    "hi": hindi_stem,
    "id": indonesian_stem,
    "cs": czech_stem,
    "bg": bulgarian_stem,
}
NORMALIZERS = {
    "ar": arabic_normalize,
    "fa": persian_normalize,
    "hi": hindi_normalize,
}


def routing_analyzer_with_intl(extra_routes: dict | None = None):
    """A :class:`analysis.RoutingAnalyzer` preloaded with every language
    chain the engine ships: the CJK script-detected route plus explicit
    ``for_lang`` routes for ar/fa/hi/id/cs/bg (this module), the nine
    LIGHT_STEMMERS languages, lv, and the pt/gl RSLP-S minimals — the
    PerFieldAnalyzerWrapper-style entry point for lang-partitioned builds
    over a web corpus with a ``lang`` column."""
    from .analysis import (
        Analyzer, RoutingAnalyzer, cjk_analyzer, english_analyzer,
    )
    from .stemmers import LIGHT_STEMMERS, MINIMAL_STEMMERS

    from .ja import JapaneseAnalyzer
    from .ko import KoreanAnalyzer

    routes: dict = {"en": english_analyzer(), "cjk": cjk_analyzer(),
                    "ja": JapaneseAnalyzer(), "ko": KoreanAnalyzer()}
    for lang, fn in LIGHT_STEMMERS.items():
        routes[lang] = Analyzer(post_filters=(fn,))
    for lang in ("ar", "fa", "hi", "id", "cs", "bg"):
        routes[lang] = intl_analyzer(lang)
    for lang in ("pt", "gl"):
        routes[lang] = Analyzer(post_filters=(MINIMAL_STEMMERS[lang],))
    # languages whose reference *Analyzer stems with SnowballFilter in
    # createComponents (ru/da/nl/no/sv/fi/hu/ro/tr/ga — e.g.
    # RussianAnalyzer.java, DanishAnalyzer.java); the stemmers carry full
    # reference-vocabulary parity (tests/test_snowball.py)
    from .snowball import snowball_analyzer

    for lang, sb in (("ru", "russian"), ("da", "danish"), ("nl", "dutch"),
                     ("no", "norwegian"), ("sv", "swedish"),
                     ("fi", "finnish"), ("hu", "hungarian"),
                     ("ro", "romanian"), ("tr", "turkish"),
                     ("ga", "irish"), ("ne", "nepali")):
        routes.setdefault(lang, snowball_analyzer(sb))
    # GreekAnalyzer chain (el/GreekAnalyzer.java): GreekLowerCaseFilter +
    # GreekStemFilter, all 342 reference stemmer goldens (tests/test_el.py)
    from .el import greek_analyzer

    routes.setdefault("el", greek_analyzer())
    if extra_routes:
        routes.update(extra_routes)

    # script detection: kana is a Japanese-only signal and hangul a
    # Korean-only one → the morphological routes; Han without either
    # stays on the CJK-bigram zh fallback
    import re as _re

    kana_re = _re.compile(r"[぀-ヿ]")
    hangul_re = _re.compile(r"[가-힣ᄀ-ᇿㄱ-ㆎ]")
    from .analysis import _HIRA, _IDEO

    cjk_re = _re.compile(rf"[{_IDEO}{_HIRA}]")

    def detect(text: str):
        if kana_re.search(text):
            return "ja"
        if hangul_re.search(text):
            return "ko"
        if cjk_re.search(text):
            return "cjk"
        return None

    return RoutingAnalyzer(routes=routes, detect=detect)
