"""Language-specific light stemmers (UniNE / Savoy algorithms).

Reference (lucene/analysis/common/src/java/org/apache/lucene/analysis/...):
  es/SpanishLightStemmer.java, it/ItalianLightStemmer.java — "Report on
      CLEF-2001 Experiments", J. Savoy
  de/GermanLightStemmer.java, fr/FrenchLightStemmer.java,
  pt/PortugueseLightStemmer.java, hu/HungarianLightStemmer.java — "Light
      Stemming Approaches for the French, Portuguese, German and Hungarian
      Languages", J. Savoy (the "UniNE" algorithms)
  sv/SwedishLightStemmer.java, fi/FinnishLightStemmer.java — "Report on
      CLEF-2003 Monolingual Tracks", J. Savoy
  ru/RussianLightStemmer.java — "Indexing and Searching Strategies for the
      Russian Language", Dolamic & Savoy

All nine reproduce the reference vocabulary files exactly (311,639 pairs,
zero diffs — tests/test_stemmers.py).

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
    """Per-language analyzer: the nine LIGHT_STEMMERS languages → the
    standard chain + that language's light stemmer (SpanishAnalyzer.java:
    118-126 chain shape, minus the per-language stop list — the corpus
    vocabulary is synthetic); 'en' → the EnglishAnalyzer Porter chain."""
    from .analysis import Analyzer, english_analyzer

    if lang == "en":
        return english_analyzer()
    if lang in LIGHT_STEMMERS:
        return Analyzer(post_filters=(LIGHT_STEMMERS[lang],))
    raise ValueError(f"no light stemmer for lang {lang!r}")


_IT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaoooo" "eeeeuuuuiiii")
_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaooooo" "eeeeuuuuiiiic")
_FI_FOLD = str.maketrans("äåö", "aao")
_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")

_VOWELS_Y = frozenset("aeiouy")


def italian_light_stem(w: str) -> str:
    """ItalianLightStemmer.java:62-115 (Savoy CLEF-2001)."""
    if len(w) < 6:
        return w
    w = w.translate(_IT_FOLD)
    last, prev = w[-1], w[-2]
    if last == "e":
        return w[:-2] if prev in "ih" else w[:-1]
    if last == "i":
        return w[:-2] if prev in "hi" else w[:-1]
    if last == "a":
        return w[:-2] if prev == "i" else w[:-1]
    if last == "o":
        return w[:-2] if prev == "i" else w[:-1]
    return w


def swedish_light_stem(w: str) -> str:
    """SwedishLightStemmer.java:63-100 (Savoy CLEF-2003)."""
    if len(w) > 4 and w[-1] == "s":
        w = w[:-1]
    n = len(w)
    if n > 7 and (w.endswith("elser") or w.endswith("heten")):
        return w[:-5]
    if n > 6 and w[-4:] in ("arne", "erna", "ande", "else", "aste", "orna",
                            "aren"):
        return w[:-4]
    if n > 5 and w[-3:] in ("are", "ast", "het"):
        return w[:-3]
    if n > 4 and w[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


def portuguese_light_stem(w: str) -> str:
    """PortugueseLightStemmer.java:63-209 (UniNE): removeSuffix →
    normFeminine → final vowel strip → accent fold."""
    if len(w) < 4:
        return w
    s = list(w)

    def ends(suf):
        return "".join(s).endswith(suf)

    # removeSuffix (:121-167)
    n = len(s)
    if n > 4 and ends("es") and s[-3] in "rslz":
        s = s[:-2]
    elif n > 3 and ends("ns"):
        s = s[:-1]
        s[-1] = "m"
    elif n > 4 and (ends("eis") or ends("éis")):
        s = s[:-1]
        s[-2] = "e"
        s[-1] = "l"
    elif n > 4 and ends("ais"):
        s = s[:-1]
        s[-1] = "l"
    elif n > 4 and ends("óis"):
        s = s[:-1]
        s[-2] = "o"
        s[-1] = "l"
    elif n > 4 and ends("is"):
        s[-1] = "l"
    elif n > 3 and (ends("ões") or ends("ães")):
        s = s[:-1]
        s[-2] = "ã"
        s[-1] = "o"
    elif n > 6 and ends("mente"):
        s = s[:-5]
    elif n > 3 and s[-1] == "s":
        s = s[:-1]

    # normFeminine (:169-208)
    if len(s) > 3 and s[-1] == "a":
        n = len(s)
        if n > 7 and (ends("inha") or ends("iaca") or ends("eira")):
            s[-1] = "o"
        elif n > 6:
            if (ends("osa") or ends("ica") or ends("ida") or ends("ada")
                    or ends("iva") or ends("ama")):
                s[-1] = "o"
            elif ends("ona"):
                s = s[:-1]
                s[-2] = "ã"
                s[-1] = "o"
            elif ends("ora"):
                s = s[:-1]
            elif ends("esa"):
                s = s[:-1]
                s[-2] = "ê"
            elif ends("na"):
                s[-1] = "o"

    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return "".join(s).translate(_PT_FOLD)


def russian_light_stem(w: str) -> str:
    """RussianLightStemmer.java:63-148 (Dolamic & Savoy): removeCase +
    normalize over Cyrillic."""
    n = len(w)
    if n > 6 and w[-4:] in ("иями", "оями"):
        w = w[:-4]
    elif n > 5 and w[-3:] in (
            "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
            "ери", "ими", "ого", "ому", "ыми", "оев"):
        w = w[:-3]
    elif n > 4 and w[-2:] in (
            "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою",
            "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
            "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми"):
        w = w[:-2]
    elif n > 3 and w[-1] in "аеиоуйыяь":
        w = w[:-1]
    # normalize (:68-78)
    if len(w) > 3:
        if w[-1] in "ьи":
            return w[:-1]
        if w[-1] == "н" and w[-2] == "н":
            return w[:-1]
    return w


def finnish_light_stem(w: str) -> str:
    """FinnishLightStemmer.java:63-233 (Savoy CLEF-2003): fold, step1-3,
    norm1-2 (incl. the k/p/t duplicate collapse)."""
    if len(w) < 4:
        return w
    s = list(w.translate(_FI_FOLD))

    def ends(suf):
        return "".join(s).endswith(suf)

    # step1 (:84-95) — recursive kin/ko strip
    while True:
        n = len(s)
        if n > 8 and ends("kin"):
            s = s[:-3]
            continue
        if n > 8 and ends("ko"):
            s = s[:-2]
            continue
        break
    n = len(s)
    if n > 11 and ends("dellinen"):
        s = s[:-8]
    elif n > 11 and ends("dellisuus"):
        s = s[:-9]
    # step2 (:97-108)
    n = len(s)
    if n > 5:
        if ends("lla") or ends("tse") or ends("sti"):
            s = s[:-3]
        elif ends("ni"):
            s = s[:-2]
        elif ends("aa"):
            s = s[:-1]
    # step3 (:110-166)
    n = len(s)
    done = False
    if n > 8 and not done:
        if ends("nnen"):
            s = s[:-3]
            s[-1] = "s"
            done = True
        elif ends("ntena"):
            s = s[:-4]
            s[-1] = "s"
            done = True
        elif ends("tten"):
            s = s[:-4]
            done = True
        elif ends("eiden"):
            s = s[:-5]
            done = True
    if len(s) > 6 and not done:
        if (ends("neen") or ends("niin") or ends("seen") or ends("teen")
                or ends("inen")):
            s = s[:-4]
            done = True
        elif s[-3] == "h" and s[-2] in _VOWELS_Y and s[-1] == "n":
            s = s[:-3]
            done = True
        elif ends("den"):
            s = s[:-2]
            s[-1] = "s"
            done = True
        elif ends("ksen"):
            s = s[:-3]
            s[-1] = "s"
            done = True
        elif (ends("ssa") or ends("sta") or ends("lla") or ends("lta")
                or ends("tta") or ends("ksi") or ends("lle")):
            s = s[:-3]
            done = True
    if len(s) > 5 and not done:
        if ends("na") or ends("ne"):
            s = s[:-2]
            done = True
        elif ends("nei"):
            s = s[:-3]
            done = True
    if len(s) > 4 and not done:
        if ends("ja") or ends("ta"):
            s = s[:-2]
        elif s[-1] == "a":
            s = s[:-1]
        elif s[-1] == "n" and s[-2] in _VOWELS_Y:
            s = s[:-2]
        elif s[-1] == "n":
            s = s[:-1]
    # norm1 (:168-190)
    if len(s) > 5 and ends("hde"):
        s[-3] = "k"
        s[-2] = "s"
        s[-1] = "i"
    skipped_norm1 = False
    if len(s) > 4 and (ends("ei") or ends("at")):
        s = s[:-2]
        skipped_norm1 = True
    if not skipped_norm1 and len(s) > 3 and s[-1] in "tsjeai":
        s = s[:-1]
        skipped_norm1 = True
    # norm2 (:192-210)
    if not skipped_norm1:
        pass
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            out = [s[0]]
            for c in s[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            s = out
    return "".join(s)


def hungarian_light_stem(w: str) -> str:
    """HungarianLightStemmer.java:62-242 (UniNE): fold, removeCase,
    removePossessive, removePlural, normalize."""
    s = w.translate(_HU_FOLD)

    def vowel(c):
        return c in _VOWELS_Y

    # removeCase (:96-146)
    n = len(s)
    if n > 6 and s.endswith("kent"):
        s = s[:-4]
    else:
        done = False
        if n > 5:
            if s[-3:] in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                          "ben", "bol", "nal", "nel", "hoz", "hez", "tol"):
                s = s[:-3]
                done = True
            elif s[-2:] in ("al", "el") and not vowel(s[-3]) and s[-3] == s[-4]:
                s = s[:-3]
                done = True
        if not done and n > 4:
            if s[-2:] in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                          "be", "ul", "ig"):
                s = s[:-2]
            elif s[-2:] in ("on", "en") and not vowel(s[-3]):
                s = s[:-2]
            elif s[-1] in "tn":
                s = s[:-1]
            elif s[-1] in "ae" and s[-2] == s[-3] and not vowel(s[-2]):
                s = s[:-2]
    # removePossessive (:148-196)
    n = len(s)
    done = False
    if n > 6:
        if not vowel(s[-5]) and s[-4:] in ("atok", "otok", "etek"):
            s = s[:-4]
            done = True
        elif s[-4:] in ("itek", "itok"):
            s = s[:-4]
            done = True
    if not done and n > 5:
        if not vowel(s[-4]) and s[-3:] in ("unk", "tok", "tek"):
            s = s[:-3]
            done = True
        elif vowel(s[-4]) and s[-3:] == "juk":
            s = s[:-3]
            done = True
        elif s[-3:] == "ink":
            s = s[:-3]
            done = True
    if not done and n > 4:
        if not vowel(s[-3]) and s[-2:] in ("am", "em", "om", "ad", "ed",
                                           "od", "uk"):
            s = s[:-2]
            done = True
        elif vowel(s[-3]) and s[-2:] in ("nk", "ja", "je"):
            s = s[:-2]
            done = True
        elif s[-2:] in ("im", "id", "ik"):
            s = s[:-2]
            done = True
    if not done and n > 3:
        if s[-1] in "ae" and not vowel(s[-2]):
            s = s[:-1]
        elif s[-1] in "md" and vowel(s[-2]):
            s = s[:-1]
        elif s[-1] == "i":
            s = s[:-1]
    # removePlural (:198-209) — the intentional fallthrough: -2 only for
    # a/o/e endings when len > 4, else -1
    if len(s) > 3 and s[-1] == "k":
        if s[-2] in "aoe" and len(s) > 4:
            s = s[:-2]
        else:
            s = s[:-1]
    # normalize (:211-220)
    if len(s) > 3 and s[-1] in "aeio":
        s = s[:-1]
    return s


LIGHT_STEMMERS.update({
    "it": italian_light_stem,
    "pt": portuguese_light_stem,
    "sv": swedish_light_stem,
    "ru": russian_light_stem,
    "fi": finnish_light_stem,
    "hu": hungarian_light_stem,
})


BOKMAAL, NYNORSK = 1, 2


def norwegian_light_stem(flags: int = BOKMAAL):
    """NorwegianLightStemmer.java:84-181 — hand-crafted light stemmer for
    Bokmål (flags=1), Nynorsk (flags=2), or both (3): possessive -s, the
    het/heit/leik/dom/else noun-forming suffixes, adjective comparison
    endings, and definite/indefinite noun endings."""
    if flags <= 0 or flags > BOKMAAL + NYNORSK:
        raise ValueError("invalid flags")
    bm = bool(flags & BOKMAAL)
    nn = bool(flags & NYNORSK)

    def stem(w: str) -> str:
        if len(w) > 4 and w[-1] == "s":
            w = w[:-1]
        n = len(w)
        if n > 7 and ((w.endswith("heter") and bm)
                      or (w.endswith("heten") and bm)
                      or (w.endswith("heita") and nn)):
            return w[:-5]
        if n > 8 and nn and (w.endswith("heiter") or w.endswith("leiken")
                             or w.endswith("leikar")):
            return w[:-6]
        if n > 5 and (w.endswith("dom") or (w.endswith("het") and bm)):
            return w[:-3]
        if n > 6 and nn and (w.endswith("heit") or w.endswith("semd")
                             or w.endswith("leik")):
            return w[:-4]
        if n > 7 and (w.endswith("elser") or w.endswith("elsen")):
            return w[:-5]
        if n > 6 and ((w.endswith("ende") and bm)
                      or (w.endswith("ande") and nn)
                      or w.endswith("else")
                      or (w.endswith("este") and bm)
                      or (w.endswith("aste") and nn)
                      or (w.endswith("eren") and bm)
                      or (w.endswith("aren") and nn)):
            return w[:-4]
        if n > 5 and ((w.endswith("ere") and bm)
                      or (w.endswith("are") and nn)
                      or (w.endswith("est") and bm)
                      or (w.endswith("ast") and nn)
                      or w.endswith("ene")
                      or (w.endswith("ane") and nn)):
            return w[:-3]
        if n > 4 and (w.endswith("er") or w.endswith("en") or w.endswith("et")
                      or (w.endswith("ar") and nn)
                      or (w.endswith("st") and bm)
                      or w.endswith("te")):
            return w[:-2]
        if n > 3 and w[-1] in "aen":
            return w[:-1]
        return w

    return stem


def norwegian_minimal_stem(flags: int = BOKMAAL):
    """NorwegianMinimalStemmer.java:81-110 — known noun plural forms and
    genitive -s only."""
    if flags <= 0 or flags > BOKMAAL + NYNORSK:
        raise ValueError("invalid flags")
    nn = bool(flags & NYNORSK)

    def stem(w: str) -> str:
        if len(w) > 4 and w[-1] == "s":
            w = w[:-1]
        n = len(w)
        if n > 5 and (w.endswith("ene") or (w.endswith("ane") and nn)):
            return w[:-3]
        if n > 4 and (w.endswith("er") or w.endswith("en") or w.endswith("et")
                      or (w.endswith("ar") and nn)):
            return w[:-2]
        if n > 3 and w[-1] in "ae":
            return w[:-1]
        return w

    return stem


def english_minimal_stem(w: str) -> str:
    """EnglishMinimalStemmer.java:26-44 (S-stemmer, Harman 1991): plural-
    only stemming — drop -s except -us/-ss, -ies → y (but not -aies/-eies),
    keep -ies/-aes/-oes/-ees len-3 forms."""
    if len(w) < 3 or w[-1] != "s":
        return w
    p = w[-2]
    if p in "us":
        return w
    if p == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in "ae":
            return w[:-3] + "y"
        if w[-3] in "iaoe":
            return w
    return w[:-1]


LIGHT_STEMMERS.update({
    "nb": norwegian_light_stem(BOKMAAL),
    "nn": norwegian_light_stem(NYNORSK),
    "no": norwegian_light_stem(BOKMAAL),
})


_DE_MIN_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(w: str) -> str:
    """GermanMinimalStemmer.java:62-105 ("Morphologie et recherche
    d'information", Savoy): umlaut fold, -nen, the en/se/es/er pairs, then
    single n/e/s/r."""
    if len(w) < 5:
        return w
    w = w.translate(_DE_MIN_FOLD)
    if len(w) > 6 and w.endswith("nen"):
        return w[:-3]
    if len(w) > 5 and w[-2:] in ("en", "se", "es", "er"):
        return w[:-2]
    if w[-1] in "nesr":
        return w[:-1]
    return w


def french_minimal_stem(w: str) -> str:
    """FrenchMinimalStemmer.java:61-76 ("A Stemming procedure and stopword
    list for general French corpora", Savoy): -x (aux→al), then sequential
    s/r/e/é strips and a final double-letter strip."""
    if len(w) < 6:
        return w
    s = list(w)
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            s[-2] = "l"
        return "".join(s[:-1])
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":
        s = s[:-1]
    if s[-1] == s[-2] and s[-1].isalpha():
        s = s[:-1]
    return "".join(s)


MINIMAL_STEMMERS = {
    "en": english_minimal_stem,
    "de": german_minimal_stem,
    "fr": french_minimal_stem,
    "nb": norwegian_minimal_stem(BOKMAAL),
    "nn": norwegian_minimal_stem(NYNORSK),
}


_LV_VOWELS = frozenset("aeiouāīēū")
# (affix, vowel-count threshold, palatalizes) in scan order —
# LatvianStemmer.java:48-66; only the FIRST match strips (stem :34-43)
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)


def _lv_unpalatalize(w: str, removed: str) -> str:
    """LatvianStemmer.unpalatalize (:75-135): undo declension II/V/VI
    palatalization after a palatalizing suffix strip; ``removed`` is the
    first char of the removed suffix (the s[len] the reference checks)."""
    if removed == "u":
        if w.endswith("kš"):
            return w[:-2] + "kst"
        if w.endswith("ņņ"):
            return w[:-2] + "nn"
    if w.endswith(("pj", "bj", "mj", "vj")):
        return w[:-1]
    for pal, plain in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                       ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if w.endswith(pal):
            return w[:-2] + plain
    if w and w[-1] in "čļņ":
        return w[:-1] + {"č": "c", "ļ": "l", "ņ": "n"}[w[-1]]
    return w


def latvian_stem(w: str) -> str:
    """LatvianStemmer (analysis/lv/LatvianStemmer.java:32-43, light version
    of Kreslins' thesis algorithm): first affix in scan order whose vowel
    threshold and length guard pass strips, with unpalatalization on the
    declension II/V/VI suffixes."""
    nv = sum(1 for c in w if c in _LV_VOWELS)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            stem = w[: -len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if pal else stem
    return w


LIGHT_STEMMERS["lv"] = latvian_stem


def _rslp_plural(rules):
    """Tiny RSLP-S engine (pt/RSLPStemmerBase.java Step.apply :214-235 +
    RuleWithSetExceptions): step gate = len >= 3 and ends with 's'; first
    rule whose suffix matches with post-strip stem >= min and whose
    whole-word exception set doesn't contain the word fires; a rule blocked
    by an exception or a min-length guard FALLS THROUGH to later rules
    (which is why 'mães' — an ães-rule exception — still plural-strips to
    'mãe' via the generic s-rule)."""
    compiled = tuple((suf, mn, rep, frozenset(exc)) for suf, mn, rep, exc
                     in rules)

    def stem(w: str) -> str:
        if len(w) < 3 or not w.endswith("s"):
            return w
        for suf, mn, rep, exc in compiled:
            if (w.endswith(suf) and len(w) - len(suf) >= mn
                    and w not in exc):
                return w[: -len(suf)] + rep
        return w

    return stem


# resources/org/apache/lucene/analysis/pt/portuguese.rslp "Plural" step
portuguese_minimal_stem = _rslp_plural((
    ("ns", 1, "m", ()),
    ("ões", 3, "ão", ()),
    ("ães", 1, "ão", ("mães",)),
    ("ais", 1, "al", ("cais", "mais")),
    ("éis", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("óis", 2, "ol", ()),
    ("is", 2, "il", ("lápis", "cais", "mais", "crúcis", "biquínis",
                     "pois", "depois", "dois", "leis")),
    ("les", 3, "l", ()),
    ("res", 3, "r", ("árvores",)),
    ("s", 2, "", ("aliás", "pires", "lápis", "cais", "mais", "mas",
                  "menos", "férias", "fezes", "pêsames", "crúcis", "gás",
                  "atrás", "moisés", "através", "convés", "ês", "país",
                  "após", "ambas", "ambos", "messias", "depois")),
))

# resources/org/apache/lucene/analysis/gl/galician.rslp "Plural" step
galician_minimal_stem = _rslp_plural((
    ("ns", 1, "n", ("luns", "furatapóns", "furatapons")),
    ("ós", 3, "ón", ()),
    ("ões", 3, "ón", ()),
    ("ães", 1, "ão", ("mães", "magalhães")),
    ("ais", 2, "al", ("cais", "tais", "mais", "pais", "ademais")),
    ("áis", 2, "al", ("cáis", "táis", "máis", "páis", "ademáis")),
    ("éis", 2, "el", ()),
    ("eis", 2, "el", ()),
    ("óis", 2, "ol", ("escornabóis",)),
    ("ois", 2, "ol", ("escornabois",)),
    ("ís", 2, "il", ("país",)),
    ("is", 2, "il", ("menfis", "pais", "kinguis")),
    ("les", 2, "l", ("ingles", "marselles", "montreales", "senegales",
                     "manizales", "móstoles", "nápoles")),
    ("res", 3, "r", ("petres", "henares", "cáceres", "baleares",
                     "linares", "londres", "mieres", "miraflores",
                     "mércores", "venres", "pires")),
    ("ces", 2, "z", ()),
    ("zes", 2, "z", ()),
    ("ises", 3, "z", ()),
    ("ás", 1, "al", ("más",)),
    ("ses", 2, "s", ()),
    ("s", 2, "", ("barbadés", "barcelonés", "cantonés", "gabonés",
                  "llanés", "medinés", "escocés", "escocês", "francês",
                  "barcelonês", "cantonês", "macramés", "reves",
                  "barcelones", "cantones", "gabones", "llanes",
                  "magallanes", "medines", "escoces", "frances", "xoves",
                  "martes", "aliás", "pires", "lápis", "cais", "mais",
                  "mas", "menos", "férias", "pêsames", "crúcis", "país",
                  "cangas", "atenas", "asturias", "canarias", "filipinas",
                  "honduras", "molucas", "caldas", "mascareñas",
                  "micenas", "covarrubias", "psoas", "óculos", "nupcias",
                  "xoves", "martes", "llanes")),
))

MINIMAL_STEMMERS["pt"] = portuguese_minimal_stem
MINIMAL_STEMMERS["gl"] = galician_minimal_stem


# --------------------------------------------------------------- Porter2
# English Snowball stemmer ("Porter2") — the published snowballstem.org
# english algorithm, the one SnowballFilter(in, "English") runs (reference
# analysis/common/src/java/org/apache/lucene/analysis/snowball/
# SnowballFilter.java:47 dispatching to org/tartarus/snowball/ext/
# EnglishStemmer.java).  Full-vocabulary parity asserted against the
# reference test data (analysis/common/src/test/.../snowball/english.zip).

_P2_V = frozenset("aeiouy")
_P2_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_P2_LI = frozenset("cdeghkmnrt")
_P2_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_P2_EXC2 = frozenset(
    "inning outing canning herring earring proceed exceed succeed".split())
_P2_STEP2 = [  # (suffix, replacement, extra-precondition char set or None)
    ("ization", "ize", None), ("ational", "ate", None),
    ("fulness", "ful", None), ("ousness", "ous", None),
    ("iveness", "ive", None), ("tional", "tion", None),
    ("biliti", "ble", None), ("lessli", "less", None),
    ("entli", "ent", None), ("fulli", "ful", None), ("ousli", "ous", None),
    ("alism", "al", None), ("aliti", "al", None), ("ation", "ate", None),
    ("iviti", "ive", None), ("izer", "ize", None), ("ator", "ate", None),
    ("abli", "able", None), ("alli", "al", None), ("anci", "ance", None),
    ("enci", "ence", None), ("ogi", "og", frozenset("l")),
    ("bli", "ble", None), ("li", "", _P2_LI),
]
_P2_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),  # None → R2 delete
    ("ical", "ic"), ("ness", ""), ("ful", ""),
]
_P2_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


def _p2_short_syllable_end(w: str) -> bool:
    """True when ``w`` ends in a short syllable: non-vowel other than
    w/x/Y preceded by a vowel preceded by a non-vowel — or, for a 2-char
    word, vowel at the beginning followed by a non-vowel."""
    n = len(w)
    if n >= 3:
        return (w[-1] not in _P2_V and w[-1] not in "wxY"
                and w[-2] in _P2_V and w[-3] not in _P2_V)
    return n == 2 and w[0] in _P2_V and w[1] not in _P2_V


def porter2_stem(word: str) -> str:
    """English Snowball / Porter2 stem of one (already-lowercased) token."""
    if word in _P2_EXC1:
        return _P2_EXC1[word]
    if len(word) < 3:
        return word
    w = word
    # prelude: drop one leading apostrophe; mark consonant y as Y
    if w.startswith("'"):
        w = w[1:]
    buf = list(w)
    y_found = False
    for i, c in enumerate(buf):
        if c == "y" and (i == 0 or buf[i - 1] in _P2_V):
            buf[i] = "Y"
            y_found = True
    w = "".join(buf)

    # R1 / R2 (R1 fast-forwarded past the exceptional prefixes)
    def _region(s: str, start: int) -> int:
        i, n = start, len(s)
        while i < n and s[i] not in _P2_V:
            i += 1
        while i < n and s[i] in _P2_V:
            i += 1
        return min(i + 1, n)

    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            p1 = len(pre)
            break
    else:
        p1 = _region(w, 0)
    p2 = _region(w, p1)

    def in_r1(pos: int) -> bool:
        return pos >= p1

    def in_r2(pos: int) -> bool:
        return pos >= p2

    # step 0: longest of 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) - 3 > 1 else "ie")
    elif w.endswith(("ss", "us")):
        pass
    elif w.endswith("s"):
        if any(c in _P2_V for c in w[:-2]):
            w = w[:-1]

    # exception list 2 applies to the whole word between steps 1a and 1b
    if w in _P2_EXC2:
        return w

    # step 1b
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("eed", "eedly"):
            if in_r1(pos):
                w = w[:pos] + "ee"
        elif any(c in _P2_V for c in w[:pos]):
            w = w[:pos]
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif w.endswith(_P2_DOUBLE):
                w = w[:-1]
            elif len(w) == p1 and _p2_short_syllable_end(w):
                w += "e"
        break

    # step 1c: y/Y → i after a non-vowel that is not the first letter
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _P2_V:
        w = w[:-1] + "i"

    # step 2 (longest suffix; condition failure means NO action)
    for suf, rep, need in _P2_STEP2:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if in_r1(pos) and (need is None
                               or (pos > 0 and w[pos - 1] in need)):
                w = w[:pos] + rep
            break

    # step 3
    for suf, rep in _P2_STEP3:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if in_r1(pos):
                if rep is None:  # ative: delete only when in R2
                    if in_r2(pos):
                        w = w[:pos]
                else:
                    w = w[:pos] + rep
            break

    # step 4
    for suf in _P2_STEP4:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if in_r2(pos) and (suf != "ion"
                               or (pos > 0 and w[pos - 1] in "st")):
                w = w[:pos]
            break

    # step 5
    if w.endswith("e"):
        pos = len(w) - 1
        if in_r2(pos) or (in_r1(pos)
                          and not _p2_short_syllable_end(w[:pos])):
            w = w[:pos]
    elif w.endswith("l") and in_r2(len(w) - 1) and len(w) >= 2 \
            and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y") if y_found else w


_ES_MIN_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîïñ",
                             "aaaaoooo" + "eeee" + "uuuu" + "iiii" + "n")


def spanish_minimal_stem(w: str) -> str:
    """SpanishMinimalStemmer (es/SpanishMinimalStemFilter.java +
    SpanishMinimalStemmer.java:28-75): plural-only stemming — fold accented
    vowels/ñ, then strip -s after a/o, -es (with ces→z respelling and
    eses→es), else bare -s."""
    if len(w) < 4 or not w.endswith("s"):
        return w
    w = w.translate(_ES_MIN_FOLD)
    if w[-2] in "ao":
        return w[:-1]
    if w[-2] == "e":
        if w[-3] == "s" and w[-4] == "e":
            return w[:-2]
        if w[-3] == "c":
            return w[:-3] + "z"
        return w[:-2]
    return w[:-1]
