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
    - ``hi``: HindiAnalyzer.java:109-120 — Indic normalize, Hindi
      normalize, then stem
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
        "hi": (indic_normalize, hindi_normalize, hindi_stem),
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
# ---------------------------------------------------------------------------
# Bengali — bn/BengaliNormalizer.java (UzZaman & Khan double-metaphone
# normalization) and bn/BengaliStemmer.java (Sengupta & Chaudhuri verb-
# phrase suffixes + Savoy light-stemmer criteria).  All reference
# TestBengaliStemmer / TestBengaliFilters goldens in tests/test_intl_bn_ckb.py.
# ---------------------------------------------------------------------------

# (min length guard, suffix group); first matching group wins, the whole
# suffix is removed
_BN_GROUPS = (
    (9, ("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন", "ইয়াছিলেন")),
    (8, ("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা", "িয়াছিলি", "য়েদেরকে")),
    (7, ("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন", "েদেরকে")),
    (6, ("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি", "িয়াছা", "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে")),
    (5, ("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে", "ছিলা", "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি", "য়েরা", "েদের")),
    (4, ("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা", "তাম", "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা", "ইবা", "িবি", "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন", "য়ের", "েরা", "দের")),
    (3, ("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে", "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের", "তে", "রা", "কে")),
    (2, ("ি", "ী", "া", "ো", "ে", "ব", "ত")),
)


def bengali_stem(word: str) -> str:
    n = len(word)
    for guard, sufs in _BN_GROUPS:
        if n > guard and word.endswith(sufs):
            for s in sufs:
                if word.endswith(s):
                    return word[:n - len(s)]
    return word


def bengali_normalize(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\u0981":  # chandrabindu: delete
            del s[i]
            continue
        if c == "\u09c0":  # dirgho-i -> rossho-i
            s[i] = "\u09bf"
        elif c == "\u09c2":  # dirgho-u -> rossho-u
            s[i] = "\u09c1"
        elif c == "\u0995":  # khio (ka + hoshonto + murdorno-sh)
            if i + 2 < len(s) and s[i + 1] == "\u09cd" and s[i + 2] == "\u09bf":
                if i == 0:
                    s[i] = "\u0996"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "\u0996"
                    del s[i + 2]
        elif c == "\u0999":  # nga -> anusvara
            s[i] = "\u0982"
        elif c == "\u09af":  # ja phala
            if i == 2 and s[i - 1] == "\u09cd":
                s[i - 1] = "\u09c7"
                if i + 1 < len(s) and s[i + 1] == "\u09be":
                    del s[i + 1]
                del s[i]
                continue
            elif i >= 1 and s[i - 1] == "\u09cd":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
        elif c == "\u09ac":  # ba phala
            if i == 0 or s[i - 1] != "\u09cd":
                pass
            elif i == 2:
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i >= 5 and s[i - 3] == "\u09cd":
                del s[i]
                del s[i - 1]
                i -= 1
                continue
            elif i >= 2:
                s[i - 1] = s[i - 2]
                del s[i]
                continue
        elif c == "\u0983":  # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "\u09b9"
                else:
                    del s[i]
                    continue
            else:
                s[i] = s[i + 1]
        elif c in "\u09b6\u09b7":  # sh -> s
            s[i] = "\u09b8"
        elif c == "\u09a3":  # murdhanya na -> na
            s[i] = "\u09a8"
        elif c in "\u09dc\u09dd":  # rra/rha -> ra
            s[i] = "\u09b0"
        elif c == "\u09ce":  # khanda-ta -> ta
            s[i] = "\u09a4"
        i += 1
    return "".join(s)


# ---------------------------------------------------------------------------
# Sorani Kurdish — ckb/SoraniNormalizer.java (yeh/kaf/heh/reh unification,
# harakat + format-char removal) and ckb/SoraniStemmer.java (light stemmer:
# postposition, possessive, ezafe/definite/plural articles).
# ---------------------------------------------------------------------------

_CKB_HARAKAT = "\u0640\u064b\u064c\u064d\u064e\u064f\u0650\u0651\u0652"


def sorani_normalize(word: str) -> str:
    import unicodedata

    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c in "\u064a\u0649":  # yeh variants -> farsi yeh
            s[i] = "\u06cc"
        elif c == "\u0643":  # kaf -> keheh
            s[i] = "\u06a9"
        elif c == "\u200c":  # zwnj: preceding heh becomes ae
            if i > 0 and s[i - 1] == "\u0647":
                s[i - 1] = "\u06d5"
            del s[i]
            continue
        elif c == "\u0647":  # word-final heh -> ae
            if i == len(s) - 1:
                s[i] = "\u06d5"
        elif c == "\u0629":  # teh marbuta -> ae
            s[i] = "\u06d5"
        elif c == "\u06be":  # heh doachashmee -> heh
            s[i] = "\u0647"
        elif c == "\u0631":  # word-initial reh -> rreh
            if i == 0:
                s[i] = "\u0695"
        elif c == "\u0692":  # rreh-above -> rreh
            s[i] = "\u0695"
        elif c in _CKB_HARAKAT:
            del s[i]
            continue
        elif unicodedata.category(c) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(word: str) -> str:
    w = word
    n = len(w)
    # postposition
    if n > 5 and w.endswith("\u062f\u0627"):
        w = w[:-2]
    elif n > 4 and w.endswith("\u0646\u0627"):
        w = w[:-1]
    elif n > 6 and w.endswith("\u06d5\u0648\u06d5"):
        w = w[:-3]
    # possessive pronoun
    n = len(w)
    if n > 6 and (w.endswith("\u0645\u0627\u0646")
                  or w.endswith("\u06cc\u0627\u0646")
                  or w.endswith("\u062a\u0627\u0646")):
        w = w[:-3]
    n = len(w)
    # ezafe / articles: first match returns
    for guard, suf in (
        (6, "\u06ce\u06a9\u06cc"),          # indefinite singular ezafe
        (7, "\u06cc\u06d5\u06a9\u06cc"),
        (5, "\u06ce\u06a9"),                  # indefinite singular
        (6, "\u06cc\u06d5\u06a9"),
        (6, "\u06d5\u06a9\u06d5"),          # definite singular
        (5, "\u06a9\u06d5"),
        (7, "\u06d5\u06a9\u0627\u0646"),   # definite plural
        (6, "\u06a9\u0627\u0646"),
        (7, "\u06cc\u0627\u0646\u06cc"),   # indefinite plural ezafe
        (6, "\u0627\u0646\u06cc"),
        (6, "\u06cc\u0627\u0646"),          # indefinite plural
        (5, "\u0627\u0646"),
        (7, "\u06cc\u0627\u0646\u06d5"),   # demonstrative plural
        (6, "\u0627\u0646\u06d5"),
    ):
        if n > guard and w.endswith(suf):
            return w[:n - len(suf)]
    # demonstrative singular
    if n > 5 and (w.endswith("\u0627\u06cc\u06d5")
                  or w.endswith("\u06d5\u06cc\u06d5")):
        return w[:-2]
    if n > 4 and w.endswith("\u06d5"):
        return w[:-1]
    # absolute singular ezafe
    if n > 4 and w.endswith("\u06cc"):
        return w[:-1]
    return w


def bengali_analyzer():
    """BengaliAnalyzer.java chain stages that apply here: Indic normalize
    (BengaliAnalyzer.java:119) + Bengali normalize + stem."""
    from .analysis import Analyzer

    return Analyzer(post_filters=(indic_normalize, bengali_normalize,
                                  bengali_stem))


def sorani_analyzer():
    """SoraniAnalyzer.java chain stages that apply here: normalize + stem."""
    from .analysis import Analyzer

    return Analyzer(post_filters=(sorani_normalize, sorani_stem))


# ---------------------------------------------------------------------------
# IndicNormalizer — in/IndicNormalizer.java (Unicode 5.2 ch.6 South Asian
# scripts: compose split matras / nukta letters / chillus into standard
# form across nine Indic scripts).  HindiAnalyzer runs this BEFORE
# HindiNormalizationFilter (hi/HindiAnalyzer.java:119-120).
# ---------------------------------------------------------------------------

# (ch0, ch1, ch2-or-minus-1, composed, script-flag-mask); offsets are
# relative to the script block base; 0xFF in ch2 means ZWJ
_INDIC_ROWS = (
    (5, 62, 69, 17, 9), (5, 62, 70, 18, 1), (5, 62, 71, 19, 9),
    (5, 62, 72, 20, 9), (5, 62, -1, 6, 31), (5, 69, -1, 114, 1),
    (5, 69, -1, 13, 8), (5, 70, -1, 4, 1), (5, 71, -1, 15, 8),
    (5, 72, -1, 16, 12), (5, 73, -1, 17, 9), (5, 74, -1, 18, 1),
    (5, 75, -1, 19, 9), (5, 76, -1, 20, 13), (6, 69, -1, 17, 9),
    (6, 70, -1, 18, 1), (6, 71, -1, 19, 9), (6, 72, -1, 20, 9),
    (7, 87, -1, 8, 256), (9, 65, -1, 10, 1), (9, 87, -1, 10, 288),
    (14, 70, -1, 16, 256), (15, 69, -1, 13, 1), (15, 70, -1, 14, 1),
    (15, 71, -1, 16, 1), (15, 87, -1, 16, 16), (18, 62, -1, 19, 256),
    (18, 76, -1, 20, 192), (18, 85, -1, 19, 64), (18, 87, -1, 20, 288),
    (19, 87, -1, 20, 16), (21, 60, -1, 88, 1), (22, 60, -1, 89, 5),
    (23, 60, -1, 90, 5), (28, 60, -1, 91, 5), (33, 60, -1, 92, 19),
    (34, 60, -1, 93, 19), (35, 77, 255, 122, 256), (36, 77, 255, 78, 2),
    (40, 60, -1, 41, 1), (40, 77, 255, 123, 256), (43, 60, -1, 94, 5),
    (47, 60, -1, 95, 3), (44, 65, 65, 11, 64), (48, 60, -1, 49, 1),
    (48, 77, 255, 124, 256), (50, 77, 255, 125, 256), (51, 60, -1, 52, 1),
    (51, 77, 255, 126, 256), (53, 65, -1, 46, 64), (62, 69, -1, 73, 9),
    (62, 70, -1, 74, 1), (62, 71, -1, 75, 9), (62, 72, -1, 76, 9),
    (63, 85, -1, 64, 128), (65, 65, -1, 66, 4), (70, 62, -1, 74, 288),
    (70, 66, 85, 75, 128), (70, 66, -1, 74, 128), (70, 70, -1, 72, 256),
    (70, 85, -1, 71, 192), (70, 86, -1, 72, 192), (70, 87, -1, 76, 288),
    (71, 62, -1, 75, 306), (71, 87, -1, 76, 18), (74, 85, -1, 75, 128),
    (114, 63, -1, 7, 4), (114, 64, -1, 8, 4), (114, 71, -1, 15, 4),
    (115, 65, -1, 9, 4), (115, 66, -1, 10, 4), (115, 75, -1, 19, 4),
)

# script base -> flag; each block spans base..base+0x7F
_INDIC_SCRIPTS = {0x0900: 1, 0x0980: 2, 0x0A00: 4, 0x0A80: 8, 0x0B00: 16,
                  0x0B80: 32, 0x0C00: 64, 0x0C80: 128, 0x0D00: 256}

_INDIC_MASK = {}
for _r in _INDIC_ROWS:
    for _base, _fl in _INDIC_SCRIPTS.items():
        if _r[4] & _fl:
            _INDIC_MASK.setdefault(_base, set()).add(_r[0])


def indic_normalize(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        cp = ord(s[i])
        base = cp & ~0x7F
        fl = _INDIC_SCRIPTS.get(base)
        if fl is not None and (cp - base) in _INDIC_MASK.get(base, ()):
            ch0 = cp - base
            if i + 1 < len(s):
                cp1 = ord(s[i + 1])
                if (cp1 & ~0x7F) == base:
                    ch1 = cp1 - base
                    ch2 = -1
                    if i + 2 < len(s):
                        cp2 = ord(s[i + 2])
                        if cp2 == 0x200D:
                            ch2 = 0xFF
                        elif (cp2 & ~0x7F) == base:
                            ch2 = cp2 - base
                    for a, b, c, res, flags in _INDIC_ROWS:
                        if a == ch0 and (flags & fl) and b == ch1 \
                                and (c < 0 or c == ch2):
                            s[i] = chr(base + res)
                            del s[i + 1]
                            if c >= 0:
                                del s[i + 1]
                            break
        i += 1
    return "".join(s)

NORMALIZERS = {
    "ar": arabic_normalize,
    "bn": bengali_normalize,
    "indic": indic_normalize,
    "ckb": sorani_normalize,
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
                     ("ga", "irish"), ("ne", "nepali"),
                     ("lt", "lithuanian"), ("hy", "armenian"),
                     ("eu", "basque"), ("ca", "catalan"),
                     ("et", "estonian")):
        routes.setdefault(lang, snowball_analyzer(sb))
    # GreekAnalyzer chain (el/GreekAnalyzer.java): GreekLowerCaseFilter +
    # GreekStemFilter, all 342 reference stemmer goldens (tests/test_el.py)
    from .el import greek_analyzer

    routes.setdefault("el", greek_analyzer())
    # SerbianAnalyzer chain (sr/SerbianAnalyzer.java:111-112): Snowball
    # Serbian stemmer + SerbianNormalizationFilter
    from .sr import serbian_analyzer

    routes.setdefault("sr", serbian_analyzer())
    # ThaiAnalyzer chain (th/ThaiAnalyzer.java:93-99): dictionary word
    # segmentation + decimal-digit fold + Thai stop set
    from .th import thai_analyzer

    routes.setdefault("th", thai_analyzer())
    # BengaliAnalyzer / SoraniAnalyzer chains (normalize + stem, all
    # reference goldens — tests/test_bn_ckb.py)
    routes.setdefault("bn", bengali_analyzer())
    routes.setdefault("ckb", sorani_analyzer())
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
