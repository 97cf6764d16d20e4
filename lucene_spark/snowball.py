"""Snowball stemmers (the SnowballFilter family) as plain Python
``str -> str`` functions for the analyzer chain's Arrow batch path.

Reference: ``analysis/common/src/java/org/tartarus/snowball/ext/*.java``
(machine-generated from the published Snowball sources; the shipped
revision is the pre-2021 classic algorithm set — e.g. German step 1 has
no ``erin/erinnen`` suffixes) wired through
``analysis/common/src/java/org/apache/lucene/analysis/snowball/
SnowballFilter.java:47``.  Each function here is written from the
published algorithm description at snowballstem.org (regions R1/R2/RV +
longest-suffix groups), NOT a translation of the generated Java, and is
parity-tested against the reference's own full test vocabularies
(``analysis/common/src/test/.../snowball/<lang>.zip`` — 2,000
(voc, output) pairs per language) in tests/test_snowball.py.

English ("Porter2") lives in :mod:`lucene_spark.stemmers` (round-4,
english.zip parity); the original Porter stemmer in
:mod:`lucene_spark.filters`.
"""

from __future__ import annotations

__all__ = ["SNOWBALL_STEMMERS", "snowball_stem", "snowball_analyzer"]


def _standard_regions(word: str, vowels: str) -> tuple[int, int]:
    """R1/R2 per the Snowball definition: R1 is the region after the first
    non-vowel following a vowel (or the null region at the end); R2 is the
    same definition applied inside R1."""
    n = len(word)

    # the classic scan: first vowel, then first following non-vowel
    def scan(start: int) -> int:
        i = start
        while i < n and word[i] not in vowels:
            i += 1
        while i < n and word[i] in vowels:
            i += 1
        if i >= n:
            return n
        return i + 1

    r1 = scan(0)
    r2 = scan(r1)
    return r1, r2


# ---------------------------------------------------------------------------
# German / German2 — ext/GermanStemmer.java, ext/German2Stemmer.java
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_ENDING = set("bdfghklmnrt")
_DE_ST_ENDING = set("bdfghklmnt")


def _de_prelude(word: str, german2: bool) -> str:
    word = word.replace("ß", "ss")
    out = []
    i, n = 0, len(word)
    while i < n:
        c = word[i]
        if german2 and c in "aou" and i + 1 < n and word[i + 1] == "e":
            # german2 prelude: ae/oe/ue → ä/ö/ü, except ue after q or
            # directly after a vowel (feuer, quelle keep literal ue)
            if c == "a":
                out.append("ä"); i += 2; continue
            if c == "o":
                out.append("ö"); i += 2; continue
            prev = word[i - 1] if i > 0 else ""
            if prev != "q" and prev not in _DE_VOWELS:
                out.append("ü"); i += 2; continue
        if c in ("u", "y") and 0 < i < n - 1 \
                and out and out[-1] in _DE_VOWELS \
                and word[i + 1] in _DE_VOWELS:
            out.append(c.upper())
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _de_postlude(word: str) -> str:
    return (word.replace("Y", "y").replace("U", "u")
                .replace("ä", "a").replace("ö", "o").replace("ü", "u"))


def _german_stem(word: str, german2: bool = False) -> str:
    w = _de_prelude(word, german2)
    # marked U/Y are consonants for region + suffix purposes (g_v grouping
    # holds only the lowercase vowels)
    r1, r2 = _standard_regions(w, _DE_VOWELS)
    # "R1 is adjusted so that the region before it contains at least 3
    # letters" (mark_regions: I_p1 < I_x → I_p1 = I_x with x = 3)
    if r1 < 3:
        r1 = 3

    def in_r1(pos): return pos >= r1
    def in_r2(pos): return pos >= r2

    # step 1 (longest of em ern er | e en es | s)
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[:-len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(len(w) - len(suf)):
                    w = w[:-len(suf)]
                    if w.endswith("niss"):
                        w = w[:-1]
                break
        else:
            if w.endswith("s") and in_r1(len(w) - 1) \
                    and len(w) >= 2 and w[-2] in _DE_S_ENDING:
                w = w[:-1]

    # step 2 (longest of en er est | st)
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[:-len(suf)]
            break
    else:
        if w.endswith("st") and in_r1(len(w) - 2) and len(w) >= 6 \
                and w[-3] in _DE_ST_ENDING:
            w = w[:-2]

    # step 3 (d-suffixes, longest of end ung | ig ik isch | lich heit | keit)
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if not in_r2(pos):
            break
        if suf in ("end", "ung"):
            w = w[:-len(suf)]
            if w.endswith("ig") and not w.endswith("eig") \
                    and in_r2(len(w) - 2):
                w = w[:-2]
        elif suf in ("ig", "ik", "isch"):
            if pos >= 1 and w[pos - 1] == "e":
                break
            w = w[:-len(suf)]
        elif suf in ("lich", "heit"):
            w = w[:-len(suf)]
            for s2 in ("er", "en"):
                if w.endswith(s2) and in_r1(len(w) - 2):
                    w = w[:-2]
                    break
        else:  # keit
            w = w[:-len(suf)]
            for s2 in ("lich", "ig"):
                if w.endswith(s2) and in_r2(len(w) - len(s2)):
                    w = w[:-len(s2)]
                    break
        break

    return _de_postlude(w)


def german_stem(word: str) -> str:
    """Snowball German (SnowballFilter(in, "German"))."""
    return _german_stem(word, german2=False)


def german2_stem(word: str) -> str:
    """Snowball German2: German plus ae/oe/ue recognized as umlaut forms
    in the prelude (ext/German2Stemmer.java)."""
    return _german_stem(word, german2=True)


# ---------------------------------------------------------------------------
# Spanish — ext/SpanishStemmer.java
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _rv_roman(w: str, vowels: str) -> int:
    """RV for the Romance languages: if the second letter is a consonant,
    the region after the next following vowel; if the first two letters are
    vowels, the region after the next consonant; otherwise (C-V case) the
    region after the third letter.  End of word if not found."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


def _longest_suffix(w: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _longest_in(w: str, sufs, lim: int) -> str | None:
    """Longest suffix lying entirely within the limit region (the Snowball
    ``setlimit tomark pV for ([substring] among ...)`` shape: candidates
    crossing the region boundary are invisible, NOT matched-then-failed)."""
    best = None
    for s in sufs:
        if (w.endswith(s) and len(w) - len(s) >= lim
                and (best is None or len(s) > len(best))):
            best = s
    return best


_ES_PRONOUNS = ("me", "se", "sela", "selo", "selas", "selos", "la", "le",
                "lo", "las", "les", "los", "nos")
_ES_PRON_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRON_PRE_B = ("ando", "iendo", "ar", "er", "ir")
_ES_STEP1 = {}
for _s in ("anza anzas ico ica icos icas ismo ismos able ables ible ibles "
           "ista istas oso osa osos osas amiento amientos imiento "
           "imientos").split():
    _ES_STEP1[_s] = "plain"
for _s in ("adora ador ación adoras adores aciones ante antes ancia "
           "ancias").split():
    _ES_STEP1[_s] = "ic"
_ES_STEP1["logía"] = _ES_STEP1["logías"] = "log"
_ES_STEP1["ución"] = _ES_STEP1["uciones"] = "u"
_ES_STEP1["encia"] = _ES_STEP1["encias"] = "ente"
_ES_STEP1["amente"] = "amente"
_ES_STEP1["mente"] = "mente"
_ES_STEP1["idad"] = _ES_STEP1["idades"] = "idad"
for _s in ("iva", "ivo", "ivas", "ivos"):
    _ES_STEP1[_s] = "at"
_ES_STEP2A = ("ya ye yan yen yeron yendo yo yó yas yes yais yamos").split()
_ES_STEP2B_GU = ("en", "es", "éis", "emos")
_ES_STEP2B = ("arían arías arán arás aríais aría aréis aríamos aremos ará "
              "aré erían erías erán erás eríais ería eréis eríamos eremos "
              "erá eré irían irías irán irás iríais iría iréis iríamos "
              "iremos irá iré aba ada ida ía ara iera ad ed id ase iese "
              "aste iste an aban ían aran ieran asen iesen aron ieron ado "
              "ido ando iendo ió ar er ir as abas adas idas ías aras ieras "
              "ases ieses ís áis abais íais arais ierais aseis ieseis "
              "asteis isteis ados idos amos ábamos íamos imos áramos "
              "iéramos iésemos ásemos").split()
_ES_ACCENT = str.maketrans("áéíóú", "aeiou")


def spanish_stem(word: str) -> str:
    w = word
    r1, r2 = _standard_regions(w, _ES_VOWELS)
    rv = _rv_roman(w, _ES_VOWELS)

    # step 0: attached pronoun
    pron = _longest_in(w, _ES_PRONOUNS, rv)
    if pron:
        base = w[:-len(pron)]
        pre = _longest_suffix(base, _ES_PRON_PRE_A + _ES_PRON_PRE_B
                              + ("yendo",))
        if pre and len(base) - len(pre) >= rv:
            if pre in _ES_PRON_PRE_A:
                # delete pronoun, remove the accent from the preceding form
                w = base[:-len(pre)] + pre.translate(_ES_ACCENT)
            elif pre == "yendo":
                if base.endswith("uyendo"):
                    w = base
            else:
                w = base

    n0 = len(w)
    # step 1: standard suffixes
    suf = _longest_suffix(w, _ES_STEP1)
    if suf:
        kind = _ES_STEP1[suf]
        pos = len(w) - len(suf)
        if kind == "plain":
            if pos >= r2:
                w = w[:-len(suf)]
        elif kind == "ic":
            if pos >= r2:
                w = w[:-len(suf)]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif kind in ("log", "u", "ente"):
            if pos >= r2:
                w = w[:-len(suf)] + kind
        elif kind == "amente":
            if pos >= r1:
                w = w[:-6]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for s2 in ("os", "ic", "ad"):
                        if w.endswith(s2) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif kind == "mente":
            if pos >= r2:
                w = w[:-5]
                for s2 in ("ante", "able", "ible"):
                    if w.endswith(s2) and len(w) - 4 >= r2:
                        w = w[:-4]
                        break
        elif kind == "idad":
            if pos >= r2:
                w = w[:-len(suf)]
                for s2 in ("abil", "ic", "iv"):
                    if w.endswith(s2) and len(w) - len(s2) >= r2:
                        w = w[:-len(s2)]
                        break
        elif kind == "at":
            if pos >= r2:
                w = w[:-len(suf)]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]

    if len(w) == n0:
        # step 2a: verb suffixes beginning y (only if step 1 removed nothing)
        suf = _longest_in(w, _ES_STEP2A, rv)
        did2a = False
        if suf and w[:-len(suf)].endswith("u"):
            w = w[:-len(suf)]
            did2a = True
        if not did2a:
            # step 2b
            suf = _longest_in(w, _ES_STEP2B + list(_ES_STEP2B_GU), rv)
            if suf:
                w = w[:-len(suf)]
                if suf in _ES_STEP2B_GU and w.endswith("gu"):
                    w = w[:-1]

    # step 3: residual suffix
    suf = _longest_in(w, ("os", "a", "o", "á", "í", "ó", "e", "é"), rv)
    if suf:
        if suf in ("e", "é"):
            w = w[:-1]
            if w.endswith("gu") and len(w) - 1 >= rv:
                w = w[:-1]
        else:
            w = w[:-len(suf)]

    return w.translate(_ES_ACCENT)


# ---------------------------------------------------------------------------
# Italian — ext/ItalianStemmer.java
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"
_IT_PRONOUNS = ("ci gli la le li lo mi ne si ti vi sene gliela gliele glieli "
                "glielo gliene mela mele meli melo mene tela tele teli telo "
                "tene cela cele celi celo cene vela vele veli velo "
                "vene").split()
_IT_STEP1 = {}
for _s in ("anza anze ico ici ica ice iche ichi ismo ismi abile abili ibile "
           "ibili ista iste isti istà istè istì oso osi osa ose mente "
           "atrice atrici ante anti").split():
    _IT_STEP1[_s] = "plain"
for _s in ("azione", "azioni", "atore", "atori"):
    _IT_STEP1[_s] = "ic"
_IT_STEP1["logia"] = _IT_STEP1["logie"] = "log"
for _s in ("uzione", "uzioni", "usione", "usioni"):
    _IT_STEP1[_s] = "u"
_IT_STEP1["enza"] = _IT_STEP1["enze"] = "ente"
for _s in ("amento", "amenti", "imento", "imenti"):
    _IT_STEP1[_s] = "rv"
_IT_STEP1["amente"] = "amente"
_IT_STEP1["ità"] = "ità"
for _s in ("ivo", "ivi", "iva", "ive"):
    _IT_STEP1[_s] = "at_ic"
_IT_STEP2 = ("ammo ando ano are arono asse assero assi assimo ata ate ati "
             "ato ava avamo avano avate avi avo emmo enda ende endi endo "
             "erà erai eranno ere erebbe erebbero erei eremmo eremo ereste "
             "eresti erete erò erono essero ete eva evamo evano evate evi "
             "evo Yamo iamo immo irà irai iranno ire irebbe irebbero irei "
             "iremmo iremo ireste iresti irete irò irono isca iscano isce "
             "isci isco iscono issero ita ite iti ito iva ivamo ivano ivate "
             "ivi ivo ono uta ute uti uto ar ir").split()
_IT_PRELUDE_ACCENT = str.maketrans("áéíóú", "àèìòù")


def _it_prelude(word: str) -> str:
    w = word.translate(_IT_PRELUDE_ACCENT).replace("qu", "qU")
    out = []
    n = len(w)
    for i, c in enumerate(w):
        if c in ("u", "i") and 0 < i < n - 1 \
                and out[-1] in _IT_VOWELS and w[i + 1] in _IT_VOWELS:
            out.append(c.upper())
        else:
            out.append(c)
    return "".join(out)


def italian_stem(word: str) -> str:
    w = _it_prelude(word)
    r1, r2 = _standard_regions(w, _IT_VOWELS)
    rv = _rv_roman(w, _IT_VOWELS)

    # attached pronoun: longest pronoun (not RV-limited), then the
    # imperative/gerund ending whose START must be in RV
    pron = _longest_suffix(w, _IT_PRONOUNS)
    if pron:
        base = w[:-len(pron)]
        pre = _longest_suffix(base, ("ando", "endo", "ar", "er", "ir"))
        if pre and len(base) - len(pre) >= rv:
            w = base if pre in ("ando", "endo") else base + "e"

    # standard suffixes; the verb step runs only when this step FAILS
    # (no suffix matched, or the region test on the matched one failed —
    # a slice_from that keeps the length, enza→ente, still counts as done)
    did_standard = False
    suf = _longest_suffix(w, _IT_STEP1)
    if suf:
        kind = _IT_STEP1[suf]
        pos = len(w) - len(suf)
        if kind == "plain" and pos >= r2:
            w = w[:-len(suf)]
            did_standard = True
        elif kind == "ic" and pos >= r2:
            w = w[:-len(suf)]
            did_standard = True
            if w.endswith("ic") and len(w) - 2 >= r2:
                w = w[:-2]
        elif kind in ("log", "u", "ente") and pos >= r2:
            w = w[:-len(suf)] + kind
            did_standard = True
        elif kind == "rv" and pos >= rv:
            w = w[:-len(suf)]
            did_standard = True
        elif kind == "amente" and pos >= r1:
            w = w[:-6]
            did_standard = True
            s2 = _longest_suffix(w, ("ic", "abil", "os", "iv"))
            if s2 and len(w) - len(s2) >= r2:
                w = w[:-len(s2)]
                if s2 == "iv" and w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif kind == "ità" and pos >= r2:
            w = w[:-len(suf)]
            did_standard = True
            for s2 in ("abil", "ic", "iv"):
                if w.endswith(s2) and len(w) - len(s2) >= r2:
                    w = w[:-len(s2)]
                    break
        elif kind == "at_ic" and pos >= r2:
            w = w[:-len(suf)]
            did_standard = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]

    if not did_standard:
        suf = _longest_in(w, _IT_STEP2, rv)
        if suf:
            w = w[:-len(suf)]

    # vowel suffix: final vowel in RV (then a preceding i in RV), then ch/gh
    if w and w[-1] in "aeioàèìò" + "i" and len(w) - 1 >= rv:
        w = w[:-1]
        if w.endswith("i") and len(w) - 1 >= rv:
            w = w[:-1]
    # the RV test sits at the c/g position (in_grouping_b consumed it)
    if (w.endswith("ch") or w.endswith("gh")) and len(w) - 2 >= rv:
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Portuguese — ext/PortugueseStemmer.java
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"
_PT_STEP1 = {}
for _s in ("ica icas ico icos ância adora adoras ador adores osa osas oso "
           "osos ista istas eza ezas ante antes ável ível ismo ismos "
           "amento amentos imento imentos aça~o aço~es").split():
    _PT_STEP1[_s] = "plain"
_PT_STEP1["logia"] = _PT_STEP1["logias"] = "log"
_PT_STEP1["uça~o"] = _PT_STEP1["uço~es"] = "u"
_PT_STEP1["ência"] = _PT_STEP1["ências"] = "ente"
_PT_STEP1["amente"] = "amente"
_PT_STEP1["mente"] = "mente"
_PT_STEP1["idade"] = _PT_STEP1["idades"] = "idade"
for _s in ("iva", "ivo", "ivas", "ivos"):
    _PT_STEP1[_s] = "at"
_PT_STEP1["ira"] = _PT_STEP1["iras"] = "ira"
_PT_STEP2 = ("ada ida ia aria eria iria ara era ira ava asse esse isse "
             "aste este iste ei arei erei irei am iam ariam eriam iriam "
             "aram eram iram avam em arem erem irem assem essem issem ado "
             "ido ando endo indo ara~o era~o ira~o ar er ir as adas idas "
             "ias arias erias irias aras eras iras avas es ardes erdes "
             "irdes ares eres ires asses esses isses astes estes istes is "
             "ais eis areis ereis ireis áreis éreis íreis ásseis ésseis "
             "ísseis áveis íeis aríeis eríeis iríeis ados idos amos áramos "
             "éramos íramos ávamos íamos aríamos eríamos iríamos emos "
             "aremos eremos iremos ássemos êssemos íssemos imos armos "
             "ermos irmos ámos arás erás irás eu iu ou ará erá irá").split()


def portuguese_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    r1, r2 = _standard_regions(w, _PT_VOWELS)
    rv = _rv_roman(w, _PT_VOWELS)

    did = False
    suf = _longest_suffix(w, _PT_STEP1)
    if suf:
        kind = _PT_STEP1[suf]
        pos = len(w) - len(suf)
        if kind == "plain" and pos >= r2:
            w = w[:-len(suf)]
            did = True
        elif kind in ("log", "u", "ente") and pos >= r2:
            w = w[:-len(suf)] + kind
            did = True
        elif kind == "amente" and pos >= r1:
            w = w[:-6]
            did = True
            s2 = _longest_suffix(w, ("ic", "ad", "os", "iv"))
            if s2 and len(w) - 2 >= r2:
                w = w[:-2]
                if s2 == "iv" and w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif kind == "mente" and pos >= r2:
            w = w[:-5]
            did = True
            s2 = _longest_suffix(w, ("ante", "avel", "ível"))
            if s2 and len(w) - len(s2) >= r2:
                w = w[:-len(s2)]
        elif kind == "idade" and pos >= r2:
            w = w[:-len(suf)]
            did = True
            s2 = _longest_suffix(w, ("abil", "ic", "iv"))
            if s2 and len(w) - len(s2) >= r2:
                w = w[:-len(s2)]
        elif kind == "at" and pos >= r2:
            w = w[:-len(suf)]
            did = True
            if w.endswith("at") and len(w) - 2 >= r2:
                w = w[:-2]
        elif kind == "ira" and pos >= rv and w.endswith("e" + suf):
            w = w[:-len(suf)] + "ir"
            did = True

    if not did:
        suf = _longest_in(w, _PT_STEP2, rv)
        if suf:
            w = w[:-len(suf)]
            did = True

    if did:
        # final i preceded by c, the i in RV
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        # residual suffix (test-based, no shorter-suffix fallback)
        suf = _longest_suffix(w, ("os", "a", "i", "o", "á", "í", "ó"))
        if suf and len(w) - len(suf) >= rv:
            w = w[:-len(suf)]

    # residual form
    if w and w[-1] in "eéê":
        if len(w) - 1 >= rv:
            w = w[:-1]
            if (w.endswith("gu") or w.endswith("ci")) and len(w) - 1 >= rv:
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Russian — ext/RussianStemmer.java
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"
_RU_PERF_GERUND_AY = ("в", "вши", "вшись")
_RU_PERF_GERUND = ("ив", "ивши", "ившись", "ыв", "ывши", "ывшись")
_RU_ADJECTIVE = ("ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему "
                 "ому их ых ую юю ая яя ою ею").split()
_RU_PARTICIPLE_AY = ("ем", "нн", "вш", "ющ", "щ")
_RU_PARTICIPLE = ("ивш", "ывш", "ующ")
_RU_REFLEXIVE = ("ся", "сь")
_RU_VERB_AY = ("ла на ете йте ли й л ем н ло но ет ют ны ть ешь "
               "нно").split()
_RU_VERB = ("ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило "
            "ыло ено ят ует уют ит ыт ены ить ыть ишь ую ю").split()
_RU_NOUN = ("а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям "
            "ием ем ам ом о у ах иях ях ы ь ию ью ю ия ья я").split()


def _ru_longest(w: str, groups, rv: int):
    """Longest suffix within RV across (suffix, needs_ay) pairs; if the
    winner needs а/я and lacks it, the whole step fails (no backtrack)."""
    best, need = None, False
    for s, n in groups:
        if w.endswith(s) and len(w) - len(s) >= rv \
                and (best is None or len(s) > len(best)):
            best, need = s, n
    if best is None:
        return None
    if need:
        pos = len(w) - len(best)
        if not (pos - 1 >= rv and w[pos - 1] in "ая"):
            return None
    return best


def russian_stem(word: str) -> str:
    w = word.replace("ё", "е")
    n = len(w)
    # RV: after the first vowel; R2: standard second region
    rv = n
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            rv = i + 1
            break
    _, r2 = _standard_regions(w, _RU_VOWELS)

    # main suffix removal (everything constrained within RV)
    pg = _ru_longest(w, [(s, True) for s in _RU_PERF_GERUND_AY]
                     + [(s, False) for s in _RU_PERF_GERUND], rv)
    if pg:
        w = w[:-len(pg)]
    else:
        refl = _ru_longest(w, [(s, False) for s in _RU_REFLEXIVE], rv)
        if refl:
            w = w[:-len(refl)]
        adj = _ru_longest(w, [(s, False) for s in _RU_ADJECTIVE], rv)
        if adj:
            w = w[:-len(adj)]
            part = _ru_longest(w, [(s, True) for s in _RU_PARTICIPLE_AY]
                               + [(s, False) for s in _RU_PARTICIPLE], rv)
            if part:
                w = w[:-len(part)]
        else:
            vb = _ru_longest(w, [(s, True) for s in _RU_VERB_AY]
                             + [(s, False) for s in _RU_VERB], rv)
            if vb:
                w = w[:-len(vb)]
            else:
                nn = _ru_longest(w, [(s, False) for s in _RU_NOUN], rv)
                if nn:
                    w = w[:-len(nn)]

    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # derivational: ость/ост in R2 (and within RV)
    der = _ru_longest(w, [("ость", False), ("ост", False)], rv)
    if der and len(w) - len(der) >= r2:
        w = w[:-len(der)]

    # tidy up: ейше/ейш (then undouble нн), нн → н, or final ь
    t = _ru_longest(w, [("ейше", False), ("ейш", False), ("н", False),
                        ("ь", False)], rv)
    if t in ("ейше", "ейш"):
        w = w[:-len(t)]
        if w.endswith("нн") and len(w) - 2 >= rv:
            w = w[:-1]
    elif t == "н":
        if w.endswith("нн") and len(w) - 2 >= rv:
            w = w[:-1]
    elif t == "ь":
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Swedish / Norwegian / Danish — ext/{Swedish,Norwegian,Danish}Stemmer.java
# ---------------------------------------------------------------------------

_SV_VOWELS = "aeiouyäåö"
_SV_MAIN = ("a arna erna heterna orna ad e ade ande arne are aste en anden "
            "aren heten ern ar er heter or as arnas ernas ornas es ades "
            "andes ens arens hetens erns at andet het ast").split()
_SV_S_ENDING = set("bcdfghjklmnoprtvy")
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")

_NO_VOWELS = "aeiouyæåø"
_NO_MAIN = ("a e ede ande ende ane ene hetene en heten ar er heter as es "
            "edes endes enes hetenes ens hetens ers ets et het ast").split()
_NO_S_ENDING = set("bcdfghjlmnoprtvyz")
_NO_OTHER = ("leg eleg ig eig lig elig els lov elov slov hetslov").split()

_DA_VOWELS = "aeiouyæåø"
_DA_MAIN = ("hed ethed ered e erede ende erende ene erne ere en heden eren "
            "er heder erer heds es endes erendes enes ernes eres ens hedens "
            "erens ers ets erets et eret").split()
_DA_S_ENDING = set("abcdfghjklmnoprtvyzå")
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_CONSONANTS = set("bcdfghjklmnpqrstvwxz")


def _scand_r1(w: str, vowels: str) -> int:
    r1, _ = _standard_regions(w, vowels)
    return max(r1, 3) if len(w) >= 3 else len(w)


def _pair_del(w: str, pairs, r1: int) -> str:
    """consonant_pair: the whole pair within R1 → delete the last letter."""
    for p in pairs:
        if w.endswith(p) and len(w) - 2 >= r1:
            return w[:-1]
    return w


def swedish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _SV_VOWELS)
    suf = _longest_in(w, _SV_MAIN + ["s"], r1)
    if suf == "s":
        # the s-ending letter itself may sit before R1
        if len(w) >= 2 and w[-2] in _SV_S_ENDING:
            w = w[:-1]
    elif suf:
        w = w[:-len(suf)]
    w = _pair_del(w, _SV_PAIRS, r1)
    suf = _longest_in(w, ("ig", "lig", "els", "fullt", "löst"), r1)
    if suf in ("fullt", "löst"):
        w = w[:-1]
    elif suf:
        w = w[:-len(suf)]
    return w


def norwegian_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _NO_VOWELS)
    suf = _longest_in(w, _NO_MAIN + ["s", "erte", "ert"], r1)
    if suf == "s":
        # valid s-ending, or k not preceded by a vowel (checks outside R1)
        prev = w[-2] if len(w) >= 2 else ""
        if prev in _NO_S_ENDING or (
                prev == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS)):
            w = w[:-1]
    elif suf in ("erte", "ert"):
        w = w[:-len(suf)] + "er"
    elif suf:
        w = w[:-len(suf)]
    w = _pair_del(w, ("dt", "vt"), r1)
    suf = _longest_in(w, _NO_OTHER, r1)
    if suf:
        w = w[:-len(suf)]
    return w


def danish_stem(word: str) -> str:
    w = word
    r1 = _scand_r1(w, _DA_VOWELS)
    suf = _longest_in(w, _DA_MAIN + ["s"], r1)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _DA_S_ENDING:
            w = w[:-1]
    elif suf:
        w = w[:-len(suf)]
    w = _pair_del(w, _DA_PAIRS, r1)
    # other_suffix: 'st' preceded by 'ig' deleted with no region test
    if w.endswith("igst"):
        w = w[:-2]
    suf = _longest_in(w, ("ig", "lig", "elig", "els", "løst"), r1)
    if suf == "løst":
        w = w[:-1]
    elif suf:
        w = w[:-len(suf)]
        w = _pair_del(w, _DA_PAIRS, r1)
    # undouble: final consonant in R1 doubled → drop one
    if (len(w) >= 2 and w[-1] in _DA_CONSONANTS and w[-1] == w[-2]
            and len(w) - 1 >= r1):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Dutch — ext/DutchStemmer.java
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"
_NL_ACCENTS = str.maketrans("áäéëíïóöúü", "aaeeiioouu")


def _nl_prelude(word: str) -> str:
    w = word.translate(_NL_ACCENTS)
    out = []
    n = len(w)
    for i, c in enumerate(w):
        if c == "y" and (i == 0 or out[-1] in _NL_VOWELS):
            out.append("Y")
        elif c == "i" and 0 < i < n - 1 and out[-1] in _NL_VOWELS \
                and w[i + 1] in _NL_VOWELS:
            out.append("I")
        else:
            out.append(c)
    return "".join(out)


def _nl_undouble(w: str) -> str:
    if w[-2:] in ("dd", "kk", "tt"):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    w = _nl_prelude(word)
    r1, r2 = _standard_regions(w, _NL_VOWELS)
    if r1 < 3:
        r1 = 3

    def en_ending(base: str, pos: int) -> str | None:
        # R1 at the suffix start, preceded by a non-vowel, not by 'gem'
        if pos >= r1 and pos >= 1 and base[pos - 1] not in _NL_VOWELS \
                and not base[:pos].endswith("gem"):
            return _nl_undouble(base[:pos])
        return None

    # step 1
    suf = _longest_suffix(w, ("heden", "ene", "en", "se", "s"))
    if suf == "heden":
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    elif suf in ("ene", "en"):
        res = en_ending(w, len(w) - len(suf))
        if res is not None:
            w = res
    elif suf in ("se", "s"):
        pos = len(w) - len(suf)
        if pos >= r1 and pos >= 1 and w[pos - 1] not in _NL_VOWELS + "j":
            w = w[:pos]

    # step 2: e-ending
    e_found = False
    if w.endswith("e") and len(w) - 1 >= r1 \
            and len(w) >= 2 and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_found = True

    # step 3a: heid (not preceded by c), then a mandatory en-ending
    if w.endswith("heid") and len(w) - 4 >= r2 \
            and not w[:-4].endswith("c"):
        w = w[:-4]
        if w.endswith("en"):
            res = en_ending(w, len(w) - 2)
            if res is not None:
                w = res

    # step 3b: d-suffixes
    suf = _longest_suffix(w, ("end", "ing", "ig", "lijk", "baar", "bar"))
    if suf:
        pos = len(w) - len(suf)
        if suf in ("end", "ing") and pos >= r2:
            w = w[:pos]
            if w.endswith("ig") and len(w) - 2 >= r2 \
                    and not w[:-2].endswith("e"):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
        elif suf == "ig" and pos >= r2 and not w[:pos].endswith("e"):
            w = w[:pos]
        elif suf == "lijk" and pos >= r2:
            w = w[:pos]
            if w.endswith("e") and len(w) - 1 >= r1 \
                    and len(w) >= 2 and w[-2] not in _NL_VOWELS:
                w = _nl_undouble(w[:-1])
        elif suf == "baar" and pos >= r2:
            w = w[:pos]
        elif suf == "bar" and pos >= r2 and e_found:
            w = w[:pos]

    # step 4: undouble vowel (C V V D → C V D; D ≠ vowel and ≠ I)
    if (len(w) >= 4 and w[-1] not in _NL_VOWELS + "I"
            and w[-3:-1] in ("aa", "ee", "oo", "uu")
            and w[-4] not in _NL_VOWELS):
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


# ---------------------------------------------------------------------------
# Romanian — ext/RomanianStemmer.java (cedilla forms ş/ţ, the shipped
# revision's character set)
# ---------------------------------------------------------------------------

_RO_VOWELS = "aăâeiîou"
_RO_STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "ile": "i!ab",  # not preceded by ab
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}
_RO_COMBO = {}
for _s in ("abilitate", "abilitati", "abilităi", "abilităţi"):
    _RO_COMBO[_s] = "abil"
_RO_COMBO["ibilitate"] = "ibil"
for _s in ("ivitate", "ivitati", "ivităi", "ivităţi"):
    _RO_COMBO[_s] = "iv"
for _s in ("icitate icitati icităi icităţi icator icatori iciv iciva "
           "icive icivi icivă ical icala icale icali icală").split():
    _RO_COMBO[_s] = "ic"
for _s in ("ativ ativa ative ativi ativă aţiune atoare ator atori "
           "ătoare ător ători").split():
    _RO_COMBO[_s] = "at"
for _s in ("itiv itiva itive itivi itivă iţiune itoare itor itori").split():
    _RO_COMBO[_s] = "it"
_RO_STEP2_DEL = ("ica abila ibila oasa ata ita anta uta iva ic ice abile "
                 "ibile oase ate itate ite ante ute ive ici abili ibili "
                 "atori osi ati itati iti anti uti ivi ităi oşi ităţi abil "
                 "ibil ator os at it ant ut iv ică abilă ibilă oasă ată "
                 "ită antă ută ivă").split()
_RO_STEP2_IST = ("ism isme ist ista iste isti istă işti").split()
_RO_VERB_C = ("ea ia esc ăsc ind ând are ere ire âre ase ise use âse eşte "
              "ăşte eze ai eai iai eşti ăşti ui ezi âi aşi aseşi iseşi "
              "useşi âseşi işi uşi âşi eaţi iaţi arăţi aserăţi iserăţi "
              "userăţi âserăţi irăţi urăţi ârăţi am eam iam asem isem usem "
              "âsem arăm aserăm iserăm userăm âserăm irăm urăm ârăm au eau "
              "iau indu ându ez ească ară aseră iseră useră âseră iră ură "
              "âră ează").split()
_RO_VERB_PLAIN = ("se sese sei aţi eţi iţi âţi serăţi seserăţi em sesem im "
                  "âm ăm serăm seserăm seră seseră seşi seseşi").split()


def romanian_stem(word: str) -> str:
    w0 = word
    out = []
    n = len(w0)
    # left context is the evolving string: a just-marked U/I is a consonant
    for i, c in enumerate(w0):
        if c in ("u", "i") and 0 < i < n - 1 \
                and out[-1] in _RO_VOWELS and w0[i + 1] in _RO_VOWELS:
            out.append(c.upper())
        else:
            out.append(c)
    w = "".join(out)
    r1, r2 = _standard_regions(w, _RO_VOWELS)
    rv = _rv_roman(w, _RO_VOWELS)

    # step 0: plural/article removal (R1 tests)
    suf = _longest_suffix(w, _RO_STEP0)
    if suf and len(w) - len(suf) >= r1:
        rep = _RO_STEP0[suf]
        if rep == "i!ab":
            if not w[:-len(suf)].endswith("ab"):
                w = w[:-len(suf)] + "i"
        else:
            w = w[:-len(suf)] + rep

    # step 1: combining suffixes, repeated to fixpoint (R1 tests)
    removed = False
    while True:
        suf = _longest_suffix(w, _RO_COMBO)
        if suf and len(w) - len(suf) >= r1:
            w = w[:-len(suf)] + _RO_COMBO[suf]
            removed = True
        else:
            break

    # step 2: standard suffixes (R2 tests)
    suf = _longest_suffix(w, _RO_STEP2_DEL + _RO_STEP2_IST
                          + ["iune", "iuni"])
    if suf and len(w) - len(suf) >= r2:
        if suf in ("iune", "iuni"):
            if w[:-len(suf)].endswith("ţ"):
                w = w[:-len(suf) - 1] + "t"
                removed = True
        elif suf in _RO_STEP2_IST:
            w = w[:-len(suf)] + "ist"
            removed = True
        else:
            w = w[:-len(suf)]
            removed = True

    # step 3: verb suffixes, only if steps 1-2 changed nothing; the whole
    # match (and the consonant/u look-behind) is limited to RV
    if not removed:
        suf = _longest_in(w, _RO_VERB_C + _RO_VERB_PLAIN, rv)
        if suf:
            pos = len(w) - len(suf)
            if suf in _RO_VERB_PLAIN:
                w = w[:pos]
            elif pos - 1 >= rv and (w[pos - 1] not in _RO_VOWELS
                                    or w[pos - 1] == "u"):
                w = w[:pos]

    # step 4: final vowel (longest match, RV test, no fallback)
    suf = _longest_suffix(w, ("a", "e", "ie", "i", "ă"))
    if suf and len(w) - len(suf) >= rv:
        w = w[:-len(suf)]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Finnish — ext/FinnishStemmer.java
# ---------------------------------------------------------------------------

_FI_V1 = "aeiouyäö"
_FI_V2 = "aeiouäö"
_FI_AEI = "aeiä"
_FI_CONS = set("bcdfghjklmnpqrstvwxz")
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_PARTICLE_END = set(_FI_V1) | {"n", "t"}
_FI_CASE = ("lla na ssa ta lta sta tta lle ine ksi n han den seen hen tten "
            "hin siin hon hän hön a ä llä nä ssä tä ltä stä ttä").split()


def finnish_stem(word: str) -> str:
    w = word
    r1, r2 = _standard_regions(w, _FI_V1)
    ending_removed = False

    # particle etc (suffix within R1; look-behind unrestricted)
    suf = _longest_in(w, ("kin", "kaan", "kään", "ko", "kö", "han", "hän",
                          "pa", "pä", "sti"), r1)
    if suf == "sti":
        if len(w) - 3 >= r2:
            w = w[:-3]
    elif suf:
        pos = len(w) - len(suf)
        if pos >= 1 and w[pos - 1] in _FI_PARTICLE_END:
            w = w[:pos]

    # possessive
    suf = _longest_in(w, ("si", "ni", "nsa", "nsä", "mme", "nne", "an",
                          "än", "en"), r1)
    if suf:
        pos = len(w) - len(suf)
        if suf == "si":
            if not (pos >= 1 and w[pos - 1] == "k"):
                w = w[:pos]
        elif suf == "ni":
            w = w[:pos]
            if w.endswith("kse"):
                w = w[:-3] + "ksi"
        elif suf in ("nsa", "nsä", "mme", "nne"):
            w = w[:pos]
        elif suf == "an":
            if _longest_suffix(w[:pos], ("lla", "na", "ssa", "ta", "lta",
                                         "sta")):
                w = w[:pos]
        elif suf == "än":
            if _longest_suffix(w[:pos], ("llä", "nä", "ssä", "tä", "ltä",
                                         "stä")):
                w = w[:pos]
        elif suf == "en":
            if _longest_suffix(w[:pos], ("lle", "ine")):
                w = w[:pos]

    # case ending.  den/seen/tten/siin carry inline Vi/LONG conditions
    # checked DURING matching (within the R1 limit); on failure the among
    # falls back to their trie parent 'n'.
    suf = _longest_in(w, _FI_CASE, r1)
    if suf in ("den", "tten", "siin"):
        pos = len(w) - len(suf)
        if not (pos - 2 >= r1 and w[pos - 1] == "i" and w[pos - 2] in _FI_V2):
            suf = "n" if len(w) - 1 >= r1 else None
    elif suf == "seen":
        pos = len(w) - len(suf)
        if not (pos - 2 >= r1 and w[pos - 2:pos] in _FI_LONG):
            suf = "n" if len(w) - 1 >= r1 else None
    if suf:
        pos = len(w) - len(suf)
        pre = {"han": "a", "hen": "e", "hin": "i", "hon": "o",
               "hän": "ä", "hön": "ö", "tta": "e", "ttä": "e"}.get(suf)
        if pre is not None:
            if pos >= 1 and w[pos - 1] == pre:
                w = w[:pos]
                ending_removed = True
        elif suf == "n":
            w = w[:pos]
            ending_removed = True
            if w[-2:] in _FI_LONG or w.endswith("ie"):
                w = w[:-1]
        elif suf in ("a", "ä"):
            if pos >= 2 and w[pos - 1] in _FI_V1 and w[pos - 2] in _FI_CONS:
                w = w[:pos]
                ending_removed = True
        else:
            w = w[:pos]
            ending_removed = True

    # other endings (within R2; 'po' look-behind unrestricted)
    suf = _longest_in(w, ("mpi", "mpa", "mpä", "mmi", "mma", "mmä", "impi",
                          "impa", "impä", "immi", "imma", "immä", "eja",
                          "ejä"), r2)
    if suf:
        if len(suf) == 3 and suf not in ("eja", "ejä"):
            if not w[:-3].endswith("po"):
                w = w[:-3]
        else:
            w = w[:-len(suf)]

    if ending_removed:
        # i-plural: final i or j within R1
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        # t-plural: final t within R1 preceded by a V1 vowel also in R1
        if w.endswith("t") and len(w) - 1 >= r1 \
                and len(w) - 2 >= r1 and w[-2] in _FI_V1:
            w = w[:-1]
            suf = _longest_in(w, ("mma", "imma"), r2)
            if suf == "imma":
                w = w[:-4]
            elif suf == "mma" and not w[:-3].endswith("po"):
                w = w[:-3]

    # tidy (each sub-step within R1 unless noted)
    if w[-2:] in _FI_LONG and len(w) - 2 >= r1:
        w = w[:-1]
    if (len(w) >= 2 and w[-1] in _FI_AEI and len(w) - 2 >= r1
            and w[-2] in _FI_CONS):
        w = w[:-1]
    if (w.endswith("oj") or w.endswith("uj")) and len(w) - 2 >= r1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 2 >= r1:
        w = w[:-1]
    # undouble: final consonant run's last consonant, looking through any
    # trailing vowels (unrestricted region)
    i = len(w) - 1
    while i >= 0 and w[i] not in _FI_CONS:
        i -= 1
    if i >= 1 and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w


# ---------------------------------------------------------------------------
# Hungarian — ext/HungarianStemmer.java
# ---------------------------------------------------------------------------

_HU_VOWELS = "aeiouáéíóöúüőű"
_HU_DIGRAPHS = ("dzs", "ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz",
                "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_INITIAL_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = ("bb cc ccs dd ff gg ggy jj kk ll lly mm nn nny pp rr ss ssz "
               "tt tty vv zz zzs").split()
_HU_CASE = ("ba ra be re ig nak nek val vel ul nál nél ból ról tól ül ből "
            "ről től n an ban en ben képpen on ön képp kor t at et ként "
            "anként enként onként ot ért öt hez hoz höz vá vé").split()
_HU_OWNED = {"éi": "", "áéi": "a", "ééi": "e", "é": "", "ké": "",
             "aké": "", "eké": "", "oké": "", "áké": "a", "éké": "e",
             "öké": "", "éé": "e"}
_HU_SING_OWNER = {}
for _s in ("a ja d ad ed od öd e je nk unk ünk uk juk ük jük m am em om "
           "o").split():
    _HU_SING_OWNER[_s] = ""
for _s in ("ád", "ánk", "ájuk", "ám", "á"):
    _HU_SING_OWNER[_s] = "a"
for _s in ("éd", "énk", "éjük", "ém", "é"):
    _HU_SING_OWNER[_s] = "e"
_HU_PLUR_OWNER = {}
for _s in ("id aid jaid eid jeid i ai jai ei jei itek eitek jeitek ik aik "
           "jaik eik jeik ink aink jaink eink jeink aitok jaitok im aim "
           "jaim eim jeim").split():
    _HU_PLUR_OWNER[_s] = ""
for _s in ("áid", "ái", "áik", "áink", "áitok", "áim"):
    _HU_PLUR_OWNER[_s] = "a"
for _s in ("éid", "éi", "éitek", "éik", "éink", "éim"):
    _HU_PLUR_OWNER[_s] = "e"


def _hu_r1(w: str) -> int:
    n = len(w)
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        i = 0
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_INITIAL_DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return min(i + 1, n)


def _hu_undouble(w: str) -> str:
    return w[:-2] + w[-1] if len(w) >= 2 else w


def _hu_double(w: str) -> bool:
    return any(w.endswith(d) for d in _HU_DOUBLES)


def hungarian_stem(word: str) -> str:
    w = word
    r1 = _hu_r1(w)

    def v_ending(w: str) -> str:
        if w and w[-1] in "áé" and len(w) - 1 >= r1:
            return w[:-1] + ("a" if w[-1] == "á" else "e")
        return w

    # instrumental: al/el in R1 preceded by a double consonant
    suf = _longest_suffix(w, ("al", "el"))
    if suf and len(w) - 2 >= r1 and _hu_double(w[:-2]):
        w = _hu_undouble(w[:-2])
    # case endings, then á/é normalization
    suf = _longest_suffix(w, _HU_CASE)
    if suf and len(w) - len(suf) >= r1:
        w = v_ending(w[:-len(suf)])
    # special cases: én → e, án/ánként → a
    suf = _longest_suffix(w, ("én", "án", "ánként"))
    if suf and len(w) - len(suf) >= r1:
        w = w[:-len(suf)] + ("e" if suf == "én" else "a")
    # -stul/-stül family
    suf = _longest_suffix(w, ("stul", "astul", "ástul", "stül", "estül",
                              "éstül"))
    if suf and len(w) - len(suf) >= r1:
        rep = {"ástul": "a", "éstül": "e"}.get(suf, "")
        w = w[:-len(suf)] + rep
    # factive á/é preceded by a double consonant
    if w and w[-1] in "áé" and len(w) - 1 >= r1 and _hu_double(w[:-1]):
        w = _hu_undouble(w[:-1])
    # owned
    suf = _longest_suffix(w, _HU_OWNED)
    if suf and len(w) - len(suf) >= r1:
        w = w[:-len(suf)] + _HU_OWNED[suf]
    # singular owner
    suf = _longest_suffix(w, _HU_SING_OWNER)
    if suf and len(w) - len(suf) >= r1:
        w = w[:-len(suf)] + _HU_SING_OWNER[suf]
    # plural owner
    suf = _longest_suffix(w, _HU_PLUR_OWNER)
    if suf and len(w) - len(suf) >= r1:
        w = w[:-len(suf)] + _HU_PLUR_OWNER[suf]
    # plural
    suf = _longest_suffix(w, ("k", "ak", "ek", "ok", "ák", "ék", "ök"))
    if suf and len(w) - len(suf) >= r1:
        rep = {"ák": "a", "ék": "e"}.get(suf, "")
        w = w[:-len(suf)] + rep
    return w


# ---------------------------------------------------------------------------
# Irish — ext/IrishStemmer.java
# ---------------------------------------------------------------------------

_GA_VOWELS = "aeiouáéíóú"
_GA_INITIAL = {"b'": "", "bhf": "f", "bh": "b", "bp": "p", "ch": "c",
               "d'fh": "f", "d'": "", "dh": "d", "dt": "t", "fh": "f",
               "gc": "c", "gh": "g", "h-": "", "m'": "", "mb": "b",
               "mh": "m", "n-": "", "nd": "d", "ng": "g", "ph": "p",
               "sh": "s", "t-": "", "th": "t", "ts": "s"}
_GA_NOUN_R1 = ("íochta aíochta abh eabh ibh aibh amh eamh imh aimh íocht "
               "aíocht").split()
_GA_NOUN_R2 = ("ire", "aire", "irí", "airí")
_GA_DERIV_R2 = ("achta", "eachta", "ach", "each", "achtúil", "eachtúil",
                "acht", "eacht")
_GA_DERIV_REP = {"arcachta": "arc", "arcacht": "arc", "arcachtaí": "arc",
                 "gineach": "gin", "gineas": "gin", "ginis": "gin",
                 "grafaíochta": "graf", "grafaíoch": "graf",
                 "grafaíocht": "graf", "grafaíochtaí": "graf",
                 "patacha": "paite", "paite": "paite", "patach": "paite",
                 "pataigh": "paite",
                 "óideacha": "óid", "óideach": "óid", "óidigh": "óid"}
_GA_VERB_RV = ("imid", "aimid", "ímid", "aímid", "faidh", "fidh")
_GA_VERB_R1 = ("adh", "eadh", "áil", "ain", "tear", "tar")


def irish_stem(word: str) -> str:
    w = word
    # initial mutation/morph strip runs BEFORE region marking
    pre = None
    for p in _GA_INITIAL:
        if w.startswith(p) and (pre is None or len(p) > len(pre)):
            pre = p
    if pre:
        w = _GA_INITIAL[pre] + w[len(pre):]
    rv = len(w)
    for i, c in enumerate(w):
        if c in _GA_VOWELS:
            rv = i + 1
            break
    r1, r2 = _standard_regions(w, _GA_VOWELS)

    suf = _longest_suffix(w, _GA_NOUN_R1 + list(_GA_NOUN_R2))
    if suf:
        pos = len(w) - len(suf)
        if suf in _GA_NOUN_R2:
            if pos >= r2:
                w = w[:pos]
        elif pos >= r1:
            w = w[:pos]

    suf = _longest_suffix(w, list(_GA_DERIV_R2) + list(_GA_DERIV_REP))
    if suf:
        if suf in _GA_DERIV_REP:
            w = w[:-len(suf)] + _GA_DERIV_REP[suf]
        elif len(w) - len(suf) >= r2:
            w = w[:-len(suf)]

    suf = _longest_suffix(w, _GA_VERB_RV + _GA_VERB_R1)
    if suf:
        pos = len(w) - len(suf)
        if suf in _GA_VERB_RV:
            if pos >= rv:
                w = w[:pos]
        elif pos >= r1:
            w = w[:pos]
    return w


# ---------------------------------------------------------------------------
# Nepali — ext/NepaliStemmer.java
# ---------------------------------------------------------------------------

_NE_CAT1_PLAIN = ("लाइ लाई सँग संग मार्फत रत मा द्वारा पछि ले सँगै "
                  "मै").split()
_NE_CAT1_COND = ("का", "कि", "की", "कै", "को")
_NE_CAT3 = ("थिए छ इछ एछ िछ ेछ नेछ हुनेछ इन्छ िन्छ हुन्छ एका इएका िएका ेका "
            "नेका दा इदा िदा देखि माथि एकी इएकी िएकी ेकी देखी थी दी छु एछु "
            "ेछु नेछु नु हरु हरू छे थे ने एकै ेकै नेकै दै इदै िदै एको इएको "
            "िएको ेको नेको दो इदो िदो यो इयो भयो ियो थियो दियो थ्यो छौ इछौ "
            "एछौ िछौ ेछौ नेछौ यौ थियौ छ्यौ थ्यौ छन् इछन् एछन् िछन् ेछन् "
            "नेछन् लान् छिन् थिन् पर् इस् थिइस् छस् इछस् एछस् िछस् ेछस् "
            "नेछस् िस् थिस् छेस् होस्").split()


def nepali_stem(word: str) -> str:
    w = word
    # category 1: postpositions; का-family deleted unless preceded by ए / े
    suf = _longest_suffix(w, _NE_CAT1_PLAIN + list(_NE_CAT1_COND))
    if suf:
        if suf in _NE_CAT1_COND:
            if not (w[:-len(suf)].endswith("ए")
                    or w[:-len(suf)].endswith("े")):
                w = w[:-len(suf)]
        else:
            w = w[:-len(suf)]
    # loop: optional category-2 halant/matra removal, then category 3
    while True:
        if w and w[-1] in "ँंै":
            base = w[:-1]
            if w[-1] in "ँं":
                if base.endswith(("यौ", "छौ", "नौ", "थे")):
                    w = base
            else:
                if base.endswith("त्र"):
                    w = base
        suf = _longest_suffix(w, _NE_CAT3)
        if suf:
            w = w[:-len(suf)]
        else:
            break
    return w


# ---------------------------------------------------------------------------
# Turkish — ext/TurkishStemmer.java (Cilden's affix-stripping algorithm)
# ---------------------------------------------------------------------------

_TR_V = "aeıioöuü"
_TR_U = "ıiuü"
# vowel-harmony classes: last vowel → the set an earlier vowel must hit
_TR_HARMONY = {"a": "aıou", "ı": "aı", "o": "ou", "u": "ou",
               "e": "eiöü", "i": "ei", "ö": "öü", "ü": "öü"}


class _Turkish:
    """Backward cursor machine over (w, c): marks move c, cut() truncates.
    Mirrors the reference's mark_*/stem_* routine contract."""

    __slots__ = ("w", "c", "cont")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.cont = True

    def cut(self):
        self.w = self.w[:self.c]

    # -- primitives ------------------------------------------------------
    def eq(self, s: str) -> bool:
        if self.w[:self.c].endswith(s):
            self.c -= len(s)
            return True
        return False

    def among(self, sufs) -> bool:
        s = _longest_suffix(self.w[:self.c], sufs)
        if s:
            self.c -= len(s)
            return True
        return False

    def harmony(self) -> bool:
        s = self.w[:self.c]
        for i in range(len(s) - 1, -1, -1):
            if s[i] in _TR_V:
                cls = _TR_HARMONY[s[i]]
                return any(ch in cls for ch in s[:i])
        return False

    def opt_cons(self, ch: str) -> bool:
        """suffix with optional n/s/y consonant: consume ch if present and
        vowel-preceded; else require no ch there and a vowel two back."""
        w, c = self.w, self.c
        if c >= 2 and w[c - 1] == ch and w[c - 2] in _TR_V:
            self.c -= 1
            return True
        if c >= 2 and w[c - 1] != ch and w[c - 2] in _TR_V:
            return True
        return False

    def opt_U(self) -> bool:
        w, c = self.w, self.c
        if c >= 2 and w[c - 1] in _TR_U and w[c - 2] not in _TR_V:
            self.c -= 1
            return True
        if c >= 2 and w[c - 1] not in _TR_U and w[c - 2] not in _TR_V:
            return True
        return False

    def _try(self, fn) -> bool:
        c0 = self.c
        if fn():
            return True
        self.c = c0
        return False

    # -- mark functions (TurkishStemmer.java:641-987) ----------------------
    def possessives(self):
        return self._try(lambda: self.among(
            ("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız",
             "nız")) and self.opt_U())

    def sU(self):
        def f():
            if not self.harmony():
                return False
            if self.c >= 1 and self.w[self.c - 1] in _TR_U:
                self.c -= 1
                return self.opt_cons("s")
            return False
        return self._try(f)

    def lArI(self):
        return self._try(lambda: self.among(("leri", "ları")))

    def yU(self):
        def f():
            if not self.harmony():
                return False
            if self.c >= 1 and self.w[self.c - 1] in _TR_U:
                self.c -= 1
                return self.opt_cons("y")
            return False
        return self._try(f)

    def nU(self):
        return self._try(lambda: self.harmony()
                         and self.among(("ni", "nu", "nü", "nı")))

    def nUn(self):
        return self._try(lambda: self.harmony()
                         and self.among(("in", "un", "ün", "ın"))
                         and self.opt_cons("n"))

    def yA(self):
        return self._try(lambda: self.harmony() and self.among(("a", "e"))
                         and self.opt_cons("y"))

    def nA(self):
        return self._try(lambda: self.harmony()
                         and self.among(("na", "ne")))

    def DA(self):
        return self._try(lambda: self.harmony()
                         and self.among(("da", "ta", "de", "te")))

    def ndA(self):
        return self._try(lambda: self.harmony()
                         and self.among(("nda", "nde")))

    def DAn(self):
        return self._try(lambda: self.harmony()
                         and self.among(("dan", "tan", "den", "ten")))

    def ndAn(self):
        return self._try(lambda: self.harmony()
                         and self.among(("ndan", "nden")))

    def ylA(self):
        return self._try(lambda: self.harmony() and self.among(("la", "le"))
                         and self.opt_cons("y"))

    def ki(self):
        return self._try(lambda: self.eq("ki"))

    def ncA(self):
        return self._try(lambda: self.harmony() and self.among(("ca", "ce"))
                         and self.opt_cons("n"))

    def yUm(self):
        return self._try(lambda: self.harmony()
                         and self.among(("im", "um", "üm", "ım"))
                         and self.opt_cons("y"))

    def sUn(self):
        return self._try(lambda: self.harmony()
                         and self.among(("sin", "sun", "sün", "sın")))

    def yUz(self):
        return self._try(lambda: self.harmony()
                         and self.among(("iz", "uz", "üz", "ız"))
                         and self.opt_cons("y"))

    def sUnUz(self):
        return self._try(lambda: self.among(
            ("siniz", "sunuz", "sünüz", "sınız")))

    def lAr(self):
        return self._try(lambda: self.harmony()
                         and self.among(("lar", "ler")))

    def nUz(self):
        return self._try(lambda: self.harmony()
                         and self.among(("niz", "nuz", "nüz", "nız")))

    def DUr(self):
        return self._try(lambda: self.harmony() and self.among(
            ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")))

    def cAsInA(self):
        return self._try(lambda: self.among(("casına", "cesine")))

    def yDU(self):
        return self._try(lambda: self.harmony() and self.among(
            ("di ti dik tik duk tuk dük tük dık tık dim tim dum tum düm "
             "tüm dım tım din tin dun tun dün tün dın tın du tu dü tü dı "
             "tı").split()) and self.opt_cons("y"))

    def ysA(self):
        return self._try(lambda: self.among(
            ("sa", "se", "sak", "sek", "sam", "sem", "san", "sen"))
            and self.opt_cons("y"))

    def ymUs(self):
        return self._try(lambda: self.harmony()
                         and self.among(("miş", "muş", "müş", "mış"))
                         and self.opt_cons("y"))

    def yken(self):
        return self._try(lambda: self.eq("ken") and self.opt_cons("y"))

    # -- stem routines (TurkishStemmer.java:989-1945) ----------------------
    def nominal_verb(self):
        c0 = self.c
        if self.ymUs() or self.yDU() or self.ysA() or self.yken():
            self.cut()
            return
        self.c = c0
        if self.cAsInA():
            cs = self.c
            if not (self.sUnUz() or self.lAr() or self.yUm() or self.sUn()
                    or self.yUz()):
                self.c = cs
            if self.ymUs():
                self.cut()
                return
        self.c = c0
        if self.lAr():
            self.cut()
            if self.DUr() or self.yDU() or self.ysA() or self.ymUs():
                self.cut()
            self.cont = False
            return
        self.c = c0
        if self.nUz():
            if self.yDU() or self.ysA():
                self.cut()
                return
        self.c = c0
        if self.sUnUz() or self.yUz() or self.sUn() or self.yUm():
            self.cut()
            if self.ymUs():
                self.cut()
            return
        self.c = c0
        if self.DUr():
            self.cut()
            cs = self.c
            if not (self.sUnUz() or self.lAr() or self.yUm() or self.sUn()
                    or self.yUz()):
                self.c = cs
            if self.ymUs():
                self.cut()
            else:
                self.c = cs

    def chain_ki(self) -> bool:
        """May be entered mid-word (ket = entry cursor): its cuts splice
        out [c, ket) and leave any already-matched tail in place."""
        c0 = self.c
        k = self.c

        def cutk():
            nonlocal k
            self.w = self.w[:self.c] + self.w[k:]
            k = self.c

        if not self.ki():
            self.c = c0
            return False
        if self.DA():
            cutk()
            if self.lAr():
                cutk()
                self.chain_ki()
            elif self.possessives():
                cutk()
                if self.lAr():
                    cutk()
                    self.chain_ki()
            return True
        if self.nUn():
            cutk()
            if self.lArI():
                cutk()
            elif self.possessives() or self.sU():
                cutk()
                if self.lAr():
                    cutk()
                    self.chain_ki()
            else:
                self.chain_ki()
            return True
        if self.ndA():
            if self.lArI():
                cutk()
                return True
            if self.sU():
                cutk()
                if self.lAr():
                    cutk()
                    self.chain_ki()
                return True
            if self.chain_ki():
                return True
            self.c = c0
            return False
        self.c = c0
        return False

    def noun_suffixes(self):
        c0 = self.c
        if self.lAr():
            self.cut()
            self.chain_ki()
            return
        self.c = c0
        if self.ncA():
            self.cut()
            if self.lArI():
                self.cut()
            elif self.possessives() or self.sU():
                self.cut()
                if self.lAr():
                    self.cut()
                    self.chain_ki()
            elif self.lAr():
                self.cut()
                self.chain_ki()
            return
        self.c = c0
        if self.ndA() or self.nA():
            if self.lArI():
                self.cut()
                return
            if self.sU():
                self.cut()
                if self.lAr():
                    self.cut()
                    self.chain_ki()
                return
            if self.chain_ki():
                return
        self.c = c0
        if self.ndAn() or self.nU():
            if self.sU():
                self.cut()
                if self.lAr():
                    self.cut()
                    self.chain_ki()
                return
            if self.lArI():
                self.cut()
                return
        self.c = c0
        if self.DAn():
            self.cut()
            if self.possessives():
                self.cut()
                if self.lAr():
                    self.cut()
                    self.chain_ki()
            elif self.lAr():
                self.cut()
                self.chain_ki()
            else:
                self.chain_ki()
            return
        self.c = c0
        if self.nUn() or self.ylA():
            self.cut()
            done = False
            if self.lAr():
                self.cut()
                done = self.chain_ki()
            if not done:
                # the lAr cut (if any) persists; later alternatives match
                # against the shortened word
                if self.possessives() or self.sU():
                    self.cut()
                    if self.lAr():
                        self.cut()
                        self.chain_ki()
                else:
                    self.chain_ki()
            return
        self.c = c0
        if self.lArI():
            self.cut()
            return
        self.c = c0
        if self.chain_ki():
            return
        self.c = c0
        if self.DA() or self.yU() or self.yA():
            self.cut()
            if self.possessives():
                self.cut()
                self.lAr()
                self.cut()
                self.chain_ki()
            elif self.lAr():
                self.cut()
                self.chain_ki()
            return
        self.c = c0
        if self.possessives() or self.sU():
            self.cut()
            if self.lAr():
                self.cut()
                self.chain_ki()


def turkish_stem(word: str) -> str:
    # more_than_one_syllable_word gate
    if sum(1 for ch in word if ch in _TR_V) < 2:
        return word
    m = _Turkish(word)
    m.c = len(m.w)
    m.nominal_verb()
    if not m.cont:
        # stemming stops entirely (postlude skipped) after a bare -lAr
        return m.w
    m.c = len(m.w)
    m.noun_suffixes()
    w = m.w
    # postlude: reserved words bypass the final transformations
    if w in ("ad", "soyad"):
        return w
    # append U to stems ending with d or g, harmonized with the last vowel
    if w.endswith(("d", "g")):
        for ch in reversed(w):
            if ch in _TR_V:
                w += {"a": "ı", "ı": "ı", "e": "i", "i": "i", "o": "u",
                      "u": "u", "ö": "ü", "ü": "ü"}[ch]
                break
    # final consonant devoicing
    rep = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(w[-1:])
    if rep:
        w = w[:-1] + rep
    return w


# ---------------------------------------------------------------------------
# Porter (Snowball dialect) — ext/PorterStemmer.java.  This is the Snowball
# project's rendering of the 1980 algorithm; it differs from Lucene's
# PorterStemFilter (en/PorterStemmer.java, = filters.porter_stem) in the
# length guard, y-marking, and step-1c details.
# ---------------------------------------------------------------------------

_PO_V = "aeiouy"
_PO_STEP2 = {"tional": "tion", "enci": "ence", "anci": "ance",
             "abli": "able", "entli": "ent", "eli": "e", "ousli": "ous",
             "ization": "ize", "izer": "ize", "ational": "ate",
             "ation": "ate", "ator": "ate", "alli": "al", "aliti": "al",
             "alism": "al", "fulness": "ful", "ousness": "ous",
             "iveness": "ive", "iviti": "ive", "biliti": "ble"}
_PO_STEP3 = {"alize": "al", "icate": "ic", "iciti": "ic", "ical": "ic",
             "ful": "", "ness": "", "ative": ""}
_PO_STEP4 = ("ic ance ence able ible ate ive ize iti al ism er ous ant ent "
             "ment ement ou").split()


def _po_shortv(w: str) -> bool:
    return (len(w) >= 3 and w[-1] not in _PO_V + "wxY"
            and w[-2] in _PO_V and w[-3] not in _PO_V)


def porter_snowball_stem(word: str) -> str:
    # prelude: initial y and y-after-vowel marked as consonant Y
    out = []
    y_found = False
    for i, c in enumerate(word):
        if c == "y" and (i == 0 or out[-1] in _PO_V):
            out.append("Y")
            y_found = True
        else:
            out.append(c)
    w = "".join(out)
    r1, r2 = _standard_regions(w, _PO_V)

    # step 1a
    suf = _longest_suffix(w, ("sses", "ies", "ss", "s"))
    if suf == "sses":
        w = w[:-4] + "ss"
    elif suf == "ies":
        w = w[:-3] + "i"
    elif suf == "s":
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-3] + "ee"
    else:
        suf = _longest_suffix(w, ("ed", "ing"))
        if suf and any(ch in _PO_V for ch in w[:-len(suf)]):
            w = w[:-len(suf)]
            if _longest_suffix(w, ("at", "bl", "iz")):
                w += "e"
            elif _longest_suffix(w, ("bb", "dd", "ff", "gg", "mm", "nn",
                                     "pp", "rr", "tt")):
                w = w[:-1]
            elif len(w) == r1 and _po_shortv(w):
                w += "e"

    # step 1c: final y/Y with a vowel anywhere before it → i
    if w and w[-1] in "yY" and any(ch in _PO_V for ch in w[:-1]):
        w = w[:-1] + "i"

    # step 2 (R1)
    suf = _longest_suffix(w, _PO_STEP2)
    if suf and len(w) - len(suf) >= r1:
        w = w[:-len(suf)] + _PO_STEP2[suf]

    # step 3 (R1)
    suf = _longest_suffix(w, _PO_STEP3)
    if suf and len(w) - len(suf) >= r1:
        w = w[:-len(suf)] + _PO_STEP3[suf]

    # step 4 (R2); ion only after s/t
    suf = _longest_suffix(w, _PO_STEP4 + ["ion"])
    if suf and len(w) - len(suf) >= r2:
        if suf != "ion" or w[:-3].endswith(("s", "t")):
            w = w[:-len(suf)]

    # step 5a: final e
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1 and not _po_shortv(w[:-1])):
            w = w[:-1]
    # step 5b: -ll with the second l in R2
    if w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    return w.replace("Y", "y") if y_found else w




# ---------------------------------------------------------------------------
# Lovins (1968) — ext/LovinsStemmer.java (the Snowball project's rendering of
# J.B. Lovins, "Development of a stemming algorithm", Mech. Trans. 11:1968).
# One longest-match pass over the 294-ending table (each ending gated by a
# context condition A..CC evaluated on the remaining stem), then undoubling,
# then the 33-rule respell table.
# ---------------------------------------------------------------------------

_LOV_TABLE = {
    "A": (
        "s' a ia ata ic aic aric istic aristic ivistic enced ished ied ioned "
        "arized oid aroid hood ehood ihood ward e ae icance ence icide otide "
        "able atable arizable ible encible ese wise ate entiate inate ive "
        "ative alize icalize ialize entialize ionalize arize encing ioning "
        "arizing yish i ical aical istical oidal ial ancial arial ential "
        "ional izational ental ful eful iful icism oidism icalism ionalism "
        "ativism ium ian ician ogen entiation ination isation arisation "
        "entation arization o ier ariser arizer ator 's ics istics ences "
        "oides acies ancies encies aries ities alities ivities nesses ates "
        "atives is ials entials ionals ians icians arisations entations "
        "izations arizations iers ators less eless ness ableness ibleness "
        "ateness iteness iveness ativeness ingness ishness iness alness "
        "icalness antialness entialness ionalness fulness lessness ousness "
        "eousness iousness itousness entness ists icists ous eous aceous "
        "antaneous ious itous icant ement izement ist icist alist icalist "
        "ialist ionist entist acy ency ably ibly iedly ately ively atively "
        "atingly ily lily arily ically aically istically oidally ially "
        "entially ionally entally fully efully ifully lessly ously eously "
        "iously ently icianry atory ity acity icity eity ality icality iality "
        "antiality entiality ionality elity ability izability arizability "
        "ibility ivity"),
    "B": (
        "atic alistic anced ance age ancing aging ying ational ism alism "
        "ation as ances ages isms ions ations ants acious ant y ancy ly ingly "
        "ally alistically ationally izationally arity"),
    "C": (
        "antic ented enting ish ent allically"),
    "D": (
        "ionate"),
    "E": (
        "ed ened elihood izable ene ature ening es eness eableness ariness "
        "edly ely enly ery"),
    "F": (
        "ized ize izing en ization izer izers ary"),
    "G": (
        "ication action"),
    "H": (
        "itic"),
    "I": (
        "ated idine ating"),
    "J": (
        "inism"),
    "K": (
        "arly"),
    "L": (
        "ide ides"),
    "M": (
        "ine ines"),
    "N": (
        "ing ings"),
    "O": (
        "ars"),
    "P": (
        "ies"),
    "Q": (
        "ion"),
    "R": (
        "one yl"),
    "S": (
        "on"),
    "T": (
        "or"),
    "U": (
        "um"),
    "V": (
        "us"),
    "W": (
        "s"),
    "X": (
        "ar"),
    "Y": (
        "eal ear ealy early"),
    "Z": (
        "eature"),
    "AA": (
        "ite"),
    "BB": (
        "allic al als"),
    "CC": (
        "inity"),
}

# condition predicates on the candidate stem s (the word minus the ending);
# hop-N in the reference = len(s) >= N
_LOV_COND = {
    "A": lambda s: len(s) >= 2,
    "B": lambda s: len(s) >= 3,
    "C": lambda s: len(s) >= 4,
    "D": lambda s: len(s) >= 5,
    "E": lambda s: len(s) >= 2 and s[-1] != "e",
    "F": lambda s: len(s) >= 3 and s[-1] != "e",
    "G": lambda s: len(s) >= 3 and s[-1] == "f",
    "H": lambda s: len(s) >= 2 and (s[-1] == "t" or s.endswith("ll")),
    "I": lambda s: len(s) >= 2 and s[-1] not in "oe",
    "J": lambda s: len(s) >= 2 and s[-1] not in "ae",
    "K": lambda s: len(s) >= 3 and (s[-1] in "li"
                                    or (s[-1] == "e" and s[-3] == "u")),
    "L": lambda s: (len(s) >= 2 and s[-1] not in "ux"
                    and (s[-1] != "s" or s.endswith("os"))),
    "M": lambda s: len(s) >= 2 and s[-1] not in "acem",
    "N": lambda s: len(s) >= 3 and (s[-3] != "s" or len(s) >= 4),
    "O": lambda s: len(s) >= 2 and s[-1] in "li",
    "P": lambda s: len(s) >= 2 and s[-1] != "c",
    "Q": lambda s: len(s) >= 3 and s[-1] not in "ln",
    "R": lambda s: len(s) >= 2 and s[-1] in "nr",
    "S": lambda s: len(s) >= 2 and (s.endswith("dr")
                                    or (s[-1] == "t" and not s.endswith("tt"))),
    "T": lambda s: len(s) >= 2 and (s[-1] == "s"
                                    or (s[-1] == "t" and not s.endswith("ot"))),
    "U": lambda s: len(s) >= 2 and s[-1] in "lmnr",
    "V": lambda s: len(s) >= 2 and s[-1] == "c",
    "W": lambda s: len(s) >= 2 and s[-1] not in "su",
    "X": lambda s: len(s) >= 2 and (s[-1] in "li"
                                    or (s[-1] == "e" and len(s) >= 3
                                        and s[-3] == "u")),
    "Y": lambda s: len(s) >= 2 and s.endswith("in"),
    "Z": lambda s: len(s) >= 2 and s[-1] != "f",
    "AA": lambda s: len(s) >= 2 and s.endswith(
        ("d", "f", "ph", "th", "l", "er", "or", "es", "t")),
    "BB": lambda s: (len(s) >= 3 and not s.endswith("met")
                     and not s.endswith("ryst")),
    "CC": lambda s: len(s) >= 2 and s[-1] == "l",
}

_LOV_ENDINGS = sorted(
    ((e, c) for c, es in _LOV_TABLE.items() for e in es.split()),
    key=lambda p: -len(p[0]))

_LOV_UNDOUBLE = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

# respell: (suffix, replacement, forbidden-preceding-letters); longest match
# wins, and a failed precondition ends the pass (no backtracking)
_LOV_RESPELL = sorted([
    ("iev", "ief", ""), ("uct", "uc", ""), ("umpt", "um", ""),
    ("rpt", "rb", ""), ("urs", "ur", ""), ("istr", "ister", ""),
    ("metr", "meter", ""), ("olv", "olut", ""), ("ul", "l", "aio"),
    ("bex", "bic", ""), ("dex", "dic", ""), ("pex", "pic", ""),
    ("tex", "tic", ""), ("ax", "ac", ""), ("ex", "ec", ""),
    ("ix", "ic", ""), ("lux", "luc", ""), ("uad", "uas", ""),
    ("vad", "vas", ""), ("cid", "cis", ""), ("lid", "lis", ""),
    ("erid", "eris", ""), ("pand", "pans", ""), ("end", "ens", "s"),
    ("ond", "ons", ""), ("lud", "lus", ""), ("rud", "rus", ""),
    ("her", "hes", "pt"), ("mit", "mis", ""), ("ent", "ens", "m"),
    ("ert", "ers", ""), ("et", "es", "n"), ("yt", "ys", ""),
    ("yz", "ys", ""),
], key=lambda r: -len(r[0]))


def lovins_stem(word: str) -> str:
    w = word
    # endings: longest suffix whose condition accepts the remaining stem
    for e, c in _LOV_ENDINGS:
        if w.endswith(e) and _LOV_COND[c](w[:-len(e)]):
            w = w[:-len(e)]
            break
    if w.endswith(_LOV_UNDOUBLE):
        w = w[:-1]
    for suf, rep, forbid in _LOV_RESPELL:
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if not (forbid and stem and stem[-1] in forbid):
                w = stem + rep
            break
    return w



# ---------------------------------------------------------------------------
# Kraaij-Pohlmann (Dutch) — ext/KpStemmer.java (the Snowball rendering of
# W. Kraaij & R. Pohlmann, "Porter's stemming algorithm for Dutch", 1994).
# Distinct from dutch_stem: measure counts 'ij' as one vowel unit, removed
# suffixes trigger open-syllable vowel lengthening (dag -> daag), and 'ge-'
# prefixes/infixes are stripped with a -d/-t cleanup pass.
# ---------------------------------------------------------------------------

_KP_V = "aeiouy"
_KP_V_WX = "aeiouywx"
_KP_AOU = "aou"
_KP_AIOU = "aiou"


def _kp_measure(s: str) -> tuple[int, int]:
    """R1/R2 starts; a vowel run is any mix of vowels and 'ij' units."""
    n = len(s)
    p1 = p2 = n
    i = 0
    for mark in range(2):
        while i < n and s[i] not in _KP_V:
            i += 1
        units = 0
        while i < n:
            if s[i:i + 2] == "ij":
                i += 2
            elif s[i] in _KP_V:
                i += 1
            else:
                break
            units += 1
        if units == 0 or i >= n or s[i] in _KP_V:
            return p1, p2
        i += 1
        if mark == 0:
            p1 = i
        else:
            p2 = i
    return p1, p2


def _kp_V(s: str, pos: int) -> bool:
    # char before pos is a vowel, or the two chars before pos are 'ij'
    return (pos >= 1 and s[pos - 1] in _KP_V) or s[pos - 2:pos] == "ij"


def _kp_VX(s: str, pos: int) -> bool:
    # same test one char further back (skip one)
    return pos >= 1 and _kp_V(s, pos - 1)


def _kp_C(s: str, pos: int) -> bool:
    # char before pos is a consonant and the pair before pos is not 'ij'
    return (pos >= 1 and s[pos - 1] not in _KP_V
            and s[pos - 2:pos] != "ij")


def _kp_lengthen(s: str, pos: int) -> str:
    """Double the vowel of a newly opened syllable ending at ``pos``
    (r_lengthen_V): a consonant outside v+wx, preceded by a/o/u after a
    consonant or at the start — or by such an 'e' that is not part of a
    diphthong or a second open e-syllable."""
    if pos < 1 or s[pos - 1] in _KP_V_WX:
        return s
    ket = pos - 1
    if ket >= 1 and s[ket - 1] in _KP_AOU:
        bra = ket - 1
        if bra == 0 or s[bra - 1] not in _KP_V:
            return s[:bra] + s[bra] + s[bra:]
        return s
    if ket >= 1 and s[ket - 1] == "e":
        bra = ket - 1
        if bra > 0 and s[bra - 1] in _KP_V:
            return s
        cur = bra - 1 if bra > 0 else bra
        if cur >= 1 and s[cur - 1] in _KP_AIOU:
            return s
        if cur >= 2 and s[cur - 2] in _KP_AIOU and cur >= 3 \
                and s[cur - 3] not in _KP_V:
            return s
        return s[:bra] + "e" + s[bra:]
    return s


def _kp_step1(s: str, p1: int, p2: int) -> str | None:
    n = len(s)
    R1 = lambda pos: pos >= p1
    for suf in ("nde", "ies", "aus", "'s", "es", "en", "s"):
        if s.endswith(suf):
            cur = n - len(suf)
            if suf == "'s":
                return s[:cur]
            if suf == "s":
                if (R1(cur) and not (s[cur - 1:cur] == "t" and R1(cur - 1))
                        and _kp_C(s, cur)):
                    return s[:cur]
                return None
            if suf == "ies":
                return s[:cur] + "ie" if R1(cur) else None
            if suf == "es":
                if s[cur - 2:cur] == "ar" and R1(cur - 2) and _kp_C(s, cur - 2):
                    return _kp_lengthen(s[:cur - 2], cur - 2)
                if s[cur - 2:cur] == "er" and R1(cur - 2) and _kp_C(s, cur - 2):
                    return s[:cur - 2]
                if R1(cur) and _kp_C(s, cur):
                    return s[:cur] + "e"
                return None
            if suf == "aus":
                return s[:cur] + "au" if R1(cur) and _kp_V(s, cur) else None
            if suf == "en":
                if s[cur - 3:cur] == "hed" and R1(cur - 3):
                    return s[:cur - 3] + "heid"
                if s[cur - 2:cur] == "nd":
                    return s[:cur]
                if s[cur - 1:cur] == "d" and R1(cur - 1) and _kp_C(s, cur - 1):
                    return s[:cur - 1]
                if s[cur - 1:cur] in ("i", "j") and _kp_V(s, cur - 1):
                    return s[:cur]
                if R1(cur) and _kp_C(s, cur):
                    return _kp_lengthen(s[:cur], cur)
                return None
            if suf == "nde":
                return s[:cur] + "nd"
    return None


def _kp_step2(s: str, p1: int, p2: int) -> str | None:
    n = len(s)
    R1 = lambda pos: pos >= p1
    for suf in ("ische", "lijke", "ieve", "ene", "de", "ge", "je", "le",
                "re", "se", "te"):
        if not s.endswith(suf):
            continue
        cur = n - len(suf)
        if suf == "je":
            if s[cur - 2:cur] == "'t":
                return s[:cur - 2]
            if s[cur - 2:cur] == "et" and R1(cur - 2) and _kp_C(s, cur - 2):
                return s[:cur - 2]
            if s[cur - 3:cur] == "rnt":
                return s[:cur - 3] + "rn"
            if s[cur - 1:cur] == "t" and R1(cur - 1) and _kp_VX(s, cur - 1):
                return s[:cur - 1]
            if s[cur - 3:cur] == "ink":
                return s[:cur - 3] + "ing"
            if s[cur - 2:cur] == "mp":
                return s[:cur - 2] + "m"
            if s[cur - 1:cur] == "'" and R1(cur - 1):
                return s[:cur - 1]
            if R1(cur) and _kp_C(s, cur):
                return s[:cur]
            return None
        if suf == "ge":
            return s[:cur] + "g" if R1(cur) else None
        if suf == "lijke":
            return s[:cur] + "lijk" if R1(cur) else None
        if suf == "ische":
            return s[:cur] + "isch" if R1(cur) else None
        if suf == "de":
            return s[:cur] if R1(cur) and _kp_C(s, cur) else None
        if suf == "te":
            return s[:cur] + "t" if R1(cur) else None
        if suf == "se":
            return s[:cur] + "s" if R1(cur) else None
        if suf == "re":
            return s[:cur] + "r" if R1(cur) else None
        if suf == "le":
            if R1(cur):
                return _kp_lengthen(s[:cur] + "l", cur + 1)
            return None
        if suf == "ene":
            if R1(cur) and _kp_C(s, cur):
                return _kp_lengthen(s[:cur] + "en", cur + 2)
            return None
        if suf == "ieve":
            return s[:cur] + "ief" if R1(cur) and _kp_C(s, cur) else None
    return None


def _kp_step3(s: str, p1: int, p2: int) -> str | None:
    n = len(s)
    R1 = lambda pos: pos >= p1
    for suf in ("iteit", "heid", "atie", "isme", "arij", "erij", "rder",
                "ster", "fie", "gie", "ing", "sel", "dst", "tst"):
        if not s.endswith(suf):
            continue
        cur = n - len(suf)
        if suf == "atie":
            return s[:cur] + "eer" if R1(cur) else None
        if suf in ("isme", "ing", "erij", "iteit"):
            return _kp_lengthen(s[:cur], cur) if R1(cur) else None
        if suf in ("heid", "sel", "ster"):
            return s[:cur] if R1(cur) else None
        if suf == "rder":
            return s[:cur] + "r"
        if suf == "arij":
            return s[:cur] + "aar" if R1(cur) and _kp_C(s, cur) else None
        if suf == "fie":
            if cur >= p2:
                return _kp_lengthen(s[:cur] + "f", cur + 1)
            return None
        if suf == "gie":
            if cur >= p2:
                return _kp_lengthen(s[:cur] + "g", cur + 1)
            return None
        if suf == "tst":
            return s[:cur] + "t" if R1(cur) and _kp_C(s, cur) else None
        if suf == "dst":
            return s[:cur] + "d" if R1(cur) and _kp_C(s, cur) else None
    return None


def _kp_step4(s: str, p1: int, p2: int) -> str | None:
    n = len(s)
    R1 = lambda pos: pos >= p1
    for suf in ("achtigst", "achtiger", "erigst", "achtig", "eriger",
                "ioneel", "lijker", "lijkst", "atief", "erig", "baar",
                "laar", "naar", "raar", "tant", "end"):
        if not s.endswith(suf):
            continue
        cur = n - len(suf)
        if suf == "ioneel":
            if R1(cur):
                return s[:cur] + "ie"
        elif suf == "atief":
            if R1(cur):
                return s[:cur] + "eer"
        elif suf in ("achtig", "baar", "achtiger", "achtigst"):
            if R1(cur):
                return s[:cur]
        elif suf == "naar":
            if R1(cur) and _kp_V(s, cur):
                return s[:cur] + "n"
        elif suf == "laar":
            if R1(cur) and _kp_V(s, cur):
                return s[:cur] + "l"
        elif suf == "raar":
            if R1(cur) and _kp_V(s, cur):
                return s[:cur] + "r"
        elif suf == "tant":
            if R1(cur):
                return s[:cur] + "teer"
        elif suf in ("lijker", "lijkst"):
            if R1(cur):
                return s[:cur] + "lijk"
        else:  # end / erig / eriger / erigst
            if R1(cur) and _kp_C(s, cur):
                return _kp_lengthen(s[:cur], cur)
        break
    # fallback: plain superlative/comparative -ig endings
    for suf in ("iger", "igst", "ig"):
        if s.endswith(suf):
            cur = n - len(suf)
            if R1(cur) and _kp_C(s, cur):
                return _kp_lengthen(s[:cur], cur)
            return None
    return None


def _kp_step1c(s: str, p1: int, p2: int) -> str | None:
    """After a removed ge- prefix/infix: drop a trailing -d/-t unless it
    opens an -nd/-ht inflection inside R1."""
    n = len(s)
    if not s or s[-1] not in "dt":
        return None
    cur = n - 1
    if not (cur >= p1 and _kp_C(s, cur)):
        return None
    if s[-1] == "d":
        if s[cur - 1:cur] == "n" and cur - 1 >= p1:
            return None
        return s[:cur]
    if s[cur - 1:cur] == "h" and cur - 1 >= p1:
        return None
    return s[:cur]


def _kp_has_open_syllable(s: str, start: int) -> bool:
    # a vowel at/after ``start`` eventually followed by a consonant
    n = len(s)
    i = start
    while i < n and s[i] not in _KP_V:
        i += 1
    if i >= n:
        return False
    while i < n and s[i] in _KP_V:
        i += 1
    return i < n


def _kp_lose_prefix(s: str) -> str | None:
    if s.startswith("ge") and len(s) >= 5 and _kp_has_open_syllable(s, 2):
        return s[2:]
    return None


def _kp_lose_infix(s: str) -> str | None:
    at = s.find("ge", 1)
    if at < 0:
        return None
    ket = at + 2
    if len(s) >= ket + 3 and _kp_has_open_syllable(s, ket):
        return s[:at] + s[ket:]
    return None


_KP_FINAL = {"ft": "f", "kt": "k", "pt": "p"}
_KP_UNDOUBLE = {c * 2: c for c in "bcdfghjklmnpqrstvwxz"}


def kp_stem(word: str) -> str:
    # mark an initial y, and every y after a vowel, as consonant Y
    out = []
    y_found = False
    for i, c in enumerate(word):
        if c == "y" and (i == 0 or (out[-1] in _KP_V)):
            out.append("Y")
            y_found = True
        else:
            out.append(c)
    s = "".join(out)
    p1, p2 = _kp_measure(s)

    stemmed = False
    for step in (_kp_step1, _kp_step2, _kp_step3, _kp_step4):
        r = step(s, p1, p2)
        if r is not None:
            s, stemmed = r, True

    ge_removed = False
    r = _kp_lose_prefix(s)
    if r is not None:
        s = r
        p1, p2 = _kp_measure(s)
        r = _kp_step1c(s, p1, p2)
        if r is not None:
            s = r
    ge_removed = False
    r = _kp_lose_infix(s)
    if r is not None:
        s = r
        ge_removed = True
        p1, p2 = _kp_measure(s)
        r = _kp_step1c(s, p1, p2)
        if r is not None:
            s = r

    if s[-2:] in _KP_FINAL:
        s = s[:-2] + _KP_FINAL[s[-2:]]
        stemmed = True
    if stemmed or ge_removed:
        if s[-2:] in _KP_UNDOUBLE:
            s = s[:-1]
        elif s.endswith("v"):
            s = s[:-1] + "f"
        elif s.endswith("z"):
            s = s[:-1] + "s"

    return s.replace("Y", "y") if y_found else s


# ---------------------------------------------------------------------------
# French — ext/FrenchStemmer.java (the Snowball French algorithm).  No
# reference test vocabulary ships for French, so parity evidence is the
# reference's own published spec-example pairs plus chain goldens in
# tests/test_snowball.py::test_french_spec_goldens.
# ---------------------------------------------------------------------------

_FR_V = "aeiouyàâèéêëîïôùû"
_FR_KEEP_S = "aiosuè"

_FR_STD = {  # a_4: suffix -> case id
    "iqUe": 1, "atrice": 2, "ance": 1, "ence": 5, "logie": 3, "able": 1,
    "isme": 1, "euse": 11, "iste": 1, "ive": 8, "if": 8, "usion": 4,
    "ation": 2, "ution": 4, "ateur": 2, "iqUes": 1, "atrices": 2,
    "ances": 1, "ences": 5, "logies": 3, "ables": 1, "ismes": 1,
    "euses": 11, "istes": 1, "ives": 8, "ifs": 8, "usions": 4,
    "ations": 2, "utions": 4, "ateurs": 2, "ments": 15, "ements": 6,
    "issements": 12, "ités": 7, "ment": 15, "ement": 6, "issement": 12,
    "amment": 13, "emment": 14, "aux": 10, "eaux": 9, "eux": 1, "ité": 7,
}

_FR_IVERB = (  # a_5, all delete in RV after a non-vowel
    "issaIent iraIent issantes issante issants issions issez irions "
    "issais issait issant issent issiez issons isses irais irait irent "
    "iront irons iriez isse irai iras irez îmes îtes ira ies ir is it "
    "ie ît i").split()

_FR_VERB = {  # a_6
    "a": 3, "era": 2, "asse": 3, "ante": 3, "ée": 2, "ai": 3, "erai": 2,
    "er": 2, "as": 3, "eras": 2, "âmes": 3, "asses": 3, "antes": 3,
    "âtes": 3, "ées": 2, "ais": 3, "erais": 2, "ions": 1, "erions": 2,
    "assions": 3, "erons": 2, "ants": 3, "és": 2, "ait": 3, "erait": 2,
    "ant": 3, "aIent": 3, "eraIent": 2, "èrent": 2, "assent": 3,
    "eront": 2, "ât": 3, "ez": 2, "iez": 2, "eriez": 2, "assiez": 3,
    "erez": 2, "é": 2,
}

_FR_RESIDUAL = {"Ière": 2, "ière": 2, "ion": 1, "Ier": 2, "ier": 2, "e": 3}


def _fr_prelude(w: str) -> str:
    """Mark u/i between vowels, y next to a vowel, u after q as U/I/Y;
    ë -> He, ï -> Hi (protected from the backward steps, unmarked by the
    postlude)."""
    out = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        if c in _FR_V and i + 1 < n:
            nxt = w[i + 1]
            if nxt in "ui" and i + 2 < n and w[i + 2] in _FR_V:
                out.append(c)
                out.append("U" if nxt == "u" else "I")
                i += 2
                continue
            if nxt == "y":
                out.append(c)
                out.append("Y")
                i += 2
                continue
        if c == "ë":
            out.append("He")
        elif c == "ï":
            out.append("Hi")
        elif c == "y" and i + 1 < n and w[i + 1] in _FR_V:
            out.append("Y")
        elif c == "q" and i + 1 < n and w[i + 1] == "u":
            out.append("qU")
            i += 2
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _fr_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pV = p1 = p2 = n
    if n >= 3 and w[0] in _FR_V and w[1] in _FR_V:
        pV = 3
    elif w.startswith(("col", "par", "tap")):
        pV = 3
    else:
        for i in range(1, n):
            if w[i] in _FR_V:
                pV = i + 1
                break
    i = 0
    for mark in range(2):
        while i < n and w[i] not in _FR_V:
            i += 1
        while i < n and w[i] in _FR_V:
            i += 1
        if i >= n:
            break
        i += 1
        if mark == 0:
            p1 = i
        else:
            p2 = i
    return pV, p1, p2


def _fr_postlude(w: str) -> str:
    return (w.replace("He", "ë").replace("Hi", "ï").replace("H", "")
             .replace("I", "i").replace("U", "u").replace("Y", "y"))


def _fr_standard(w: str, pV: int, p1: int, p2: int):
    """standard_suffix: returns (new_word, status) where status is True
    (succeeded), False (no change / condition miss), or 'fall' (cases
    13-15: sliced but fails the step so verb removal still runs)."""
    for suf in sorted(_FR_STD, key=len, reverse=True):
        if not w.endswith(suf):
            continue
        cur = len(w) - len(suf)
        case = _FR_STD[suf]
        R1, R2, RV = cur >= p1, cur >= p2, cur >= pV
        if case == 1:
            return (w[:cur], True) if R2 else (w, False)
        if case == 2:
            if not R2:
                return w, False
            w = w[:cur]
            if w.endswith("ic"):
                if len(w) - 2 >= p2:
                    w = w[:-2]
                else:
                    w = w[:-2] + "iqU"
            return w, True
        if case == 3:
            return (w[:cur] + "log", True) if R2 else (w, False)
        if case == 4:
            return (w[:cur] + "u", True) if R2 else (w, False)
        if case == 5:
            return (w[:cur] + "ent", True) if R2 else (w, False)
        if case == 6:  # ement(s), in RV
            if not RV:
                return w, False
            w = w[:cur]
            for s2 in ("iqU", "abl", "Ièr", "ièr", "eus", "iv"):
                if w.endswith(s2):
                    c2 = len(w) - len(s2)
                    if s2 == "iv":
                        if c2 >= p2:
                            w = w[:c2]
                            if w.endswith("at") and len(w) - 2 >= p2:
                                w = w[:-2]
                    elif s2 == "eus":
                        if c2 >= p2:
                            w = w[:c2]
                        elif c2 >= p1:
                            w = w[:c2] + "eux"
                    elif s2 in ("abl", "iqU"):
                        if c2 >= p2:
                            w = w[:c2]
                    else:  # Ièr / ièr
                        if c2 >= pV:
                            w = w[:c2] + "i"
                    break
            return w, True
        if case == 7:  # ité(s)
            if not R2:
                return w, False
            w = w[:cur]
            for s2 in ("abil", "ic", "iv"):
                if w.endswith(s2):
                    c2 = len(w) - len(s2)
                    if s2 == "abil":
                        w = w[:c2] if c2 >= p2 else w[:c2] + "abl"
                    elif s2 == "ic":
                        w = w[:c2] if c2 >= p2 else w[:c2] + "iqU"
                    else:
                        if c2 >= p2:
                            w = w[:c2]
                    break
            return w, True
        if case == 8:  # if / ive(s)
            if not R2:
                return w, False
            w = w[:cur]
            if w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
                if w.endswith("ic"):
                    if len(w) - 2 >= p2:
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
            return w, True
        if case == 9:
            return w[:cur] + "eau", True
        if case == 10:
            return (w[:cur] + "al", True) if R1 else (w, False)
        if case == 11:  # euse(s)
            if R2:
                return w[:cur], True
            if R1:
                return w[:cur] + "eux", True
            return w, False
        if case == 12:  # issement(s), preceded by a non-vowel
            if R1 and cur >= 1 and w[cur - 1] not in _FR_V:
                return w[:cur], True
            return w, False
        if case == 13:  # amment -> ant, then fall through to verbs
            return (w[:cur] + "ant", "fall") if RV else (w, False)
        if case == 14:  # emment -> ent
            return (w[:cur] + "ent", "fall") if RV else (w, False)
        if case == 15:  # ment(s) after a vowel in RV; delete, fall through
            if cur >= 1 and w[cur - 1] in _FR_V and cur - 1 >= pV:
                return w[:cur], "fall"
            return w, False
    return w, False


def _fr_i_verb(w: str, pV: int):
    for suf in sorted(_FR_IVERB, key=len, reverse=True):
        if w.endswith(suf):
            cur = len(w) - len(suf)
            if cur < pV:
                return w, False
            # not after H (protects Hi/He marks), and after a non-vowel,
            # both within RV
            if cur - 1 >= pV and w[cur - 1] == "H":
                return w, False
            if cur - 1 < pV or w[cur - 1] in _FR_V:
                return w, False
            return w[:cur], True
    return w, False


def _fr_verb(w: str, pV: int, p2: int):
    for suf in sorted(_FR_VERB, key=len, reverse=True):
        if w.endswith(suf):
            cur = len(w) - len(suf)
            if cur < pV:
                return w, False
            case = _FR_VERB[suf]
            if case == 1:
                if cur < p2:
                    return w, False
                return w[:cur], True
            if case == 2:
                return w[:cur], True
            w = w[:cur]
            if cur - 1 >= pV and w.endswith("e"):
                w = w[:-1]
            return w, True
    return w, False


def _fr_residual(w: str, pV: int, p2: int):
    # final s not kept by a/i/o/u/è/s (or protected by a Hi mark)
    if w.endswith("s"):
        cur = len(w) - 1
        if ((cur >= 2 and w[cur - 2:cur] == "Hi")
                or (cur >= 1 and w[cur - 1] not in _FR_KEEP_S)):
            w = w[:cur]
    n = len(w)
    if n < pV:
        return w, False
    for suf in sorted(_FR_RESIDUAL, key=len, reverse=True):
        if w.endswith(suf):
            cur = n - len(suf)
            if cur < pV:
                return w, False
            case = _FR_RESIDUAL[suf]
            if case == 1:  # ion, in R2, after s/t (s/t within RV)
                if cur >= p2 and cur - 1 >= pV and w[cur - 1] in "st":
                    return w[:cur], True
                return w, False
            if case == 2:
                return w[:cur] + "i", True
            return w[:cur], True
    return w, False


def french_stem(word: str) -> str:
    w = _fr_prelude(word)
    pV, p1, p2 = _fr_regions(w)

    w2, st = _fr_standard(w, pV, p1, p2)
    done = st is True
    w = w2
    if not done:
        w2, ok = _fr_i_verb(w, pV)
        if ok:
            done, w = True, w2
        else:
            w2, ok = _fr_verb(w, pV, p2)
            if ok:
                done, w = True, w2
    if done:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        w, _ = _fr_residual(w, pV, p2)

    if w.endswith(("ell", "eill", "enn", "onn", "ett")):
        w = w[:-1]
    # un_accent: é/è before one or more final non-vowels -> e
    i = len(w)
    while i >= 1 and w[i - 1] not in _FR_V:
        i -= 1
    if i < len(w) and i >= 1 and w[i - 1] in "éè":
        w = w[:i - 1] + "e" + w[i:]
    return _fr_postlude(w)


# ---------------------------------------------------------------------------
# Lithuanian — ext/LithuanianStemmer.java (LithuanianAnalyzer.java wires
# SnowballFilter(in, new LithuanianStemmer())).  Pipeline: fix_conflicts
# (suffix respellings), one R1-bounded case-ending delete, fix_chdz,
# repeated R1-bounded derivational deletes, fix_chdz, fix_gd.
# ---------------------------------------------------------------------------

_LT_VOWELS = set("aeiouyąėęįūų")

# case/verb endings, longest match wins, delete when the match starts in R1
_LT_STEP1 = sorted((
    "a", "ia", "eria", "osna", "iosna", "uosna", "iuosna", "ysna", "ėsna",
    "e", "ie", "enie", "erie", "oje", "ioje", "uje", "iuje", "yje", "enyje",
    "eryje", "ėje", "ame", "iame", "sime", "ome", "ėme", "tumėme", "ose",
    "iose", "uose", "iuose", "yse", "enyse", "eryse", "ėse", "ate", "iate",
    "ite", "kite", "site", "ote", "tute", "ėte", "tumėte", "i", "ai", "iai",
    "eriai", "ei", "tumei", "ki", "imi", "erimi", "umi", "iumi", "si", "asi",
    "iasi", "esi", "iesi", "siesi", "isi", "aisi", "eisi", "tumeisi", "uisi",
    "osi", "ėjosi", "uosi", "iuosi", "siuosi", "usi", "ausi", "čiausi",
    "ąsi", "ėsi", "ųsi", "tųsi", "ti", "enti", "inti", "oti", "ioti", "uoti",
    "iuoti", "auti", "iauti", "yti", "ėti", "telėti", "inėti", "terėti",
    "ui", "iui", "eniui", "oj", "ėj", "k", "am", "iam", "iem", "im", "sim",
    "om", "tum", "ėm", "tumėm", "an", "on", "ion", "un", "iun", "ėn", "o",
    "io", "enio", "ėjo", "uo", "s", "as", "ias", "es", "ies", "is", "ais",
    "iais", "tumeis", "imis", "enimis", "omis", "iomis", "umis", "ėmis",
    "enis", "asis", "ysis", "ams", "iams", "iems", "ims", "enims", "erims",
    "oms", "ioms", "ums", "ėms", "ens", "os", "ios", "uos", "iuos", "ers",
    "us", "aus", "iaus", "ius", "ys", "enys", "erys", "ąs", "iąs", "ės",
    "amės", "iamės", "imės", "kimės", "simės", "omės", "ėmės", "tumėmės",
    "atės", "iatės", "sitės", "otės", "ėtės", "tumėtės", "įs", "ūs", "tųs",
    "at", "iat", "it", "sit", "ot", "ėt", "tumėt", "u", "au", "iau", "čiau",
    "iu", "eniu", "siu", "y", "ą", "ią", "ė", "ę", "į", "enį", "erį", "ų",
    "ių", "erų",
), key=len, reverse=True)

# derivational suffixes, stripped repeatedly while still in R1
_LT_STEP2 = sorted((
    "ing", "aj", "iaj", "iej", "oj", "ioj", "uoj", "iuoj", "auj", "ąj",
    "iąj", "ėj", "ųj", "iųj", "ok", "iok", "iuk", "uliuk", "učiuk", "išk",
    "iul", "yl", "ėl", "am", "dam", "jam", "zgan", "ain", "esn", "op",
    "iop", "ias", "ies", "ais", "iais", "os", "ios", "uos", "iuos", "aus",
    "iaus", "ąs", "iąs", "ęs", "utėait", "ant", "iant", "siant", "int",
    "ot", "uot", "iuot", "yt", "ėt", "ykšt", "iau", "dav", "sv", "šv",
    "ykšč", "ę", "ėję",
), key=len, reverse=True)

# conflict respellings (run before step 1, unbounded), longest match wins
_LT_CONFLICTS = sorted((
    ("ojime", "ojimas"), ("ėjime", "ėjimas"), ("avime", "avimas"),
    ("okate", "okatė"), ("aite", "aitė"), ("uote", "uotė"),
    ("asius", "asys"), ("okatės", "okatė"), ("aitės", "aitė"),
    ("uotės", "uotė"), ("esiu", "esys"),
), key=lambda p: len(p[0]), reverse=True)


def lithuanian_stem(word: str) -> str:
    """Snowball Lithuanian (SnowballFilter(in, "Lithuanian"))."""
    w = word
    n = len(w)
    # R1, except a leading 'a' of a >6-letter word doesn't count as the
    # first vowel (the algorithm's genitive-prefix quirk)
    start = 1 if n > 6 and w[:1] == "a" else 0
    i = start
    while i < n and w[i] not in _LT_VOWELS:
        i += 1
    while i < n and w[i] in _LT_VOWELS:
        i += 1
    p1 = n if i >= n else i + 1

    for suf, repl in _LT_CONFLICTS:
        if w.endswith(suf):
            w = w[:-len(suf)] + repl
            break

    for suf in _LT_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            w = w[:-len(suf)]
            break

    def fix_chdz(w: str) -> str:
        if w.endswith("č"):
            return w[:-1] + "t"
        if w.endswith("dž"):
            return w[:-2] + "d"
        return w

    w = fix_chdz(w)

    while True:
        for suf in _LT_STEP2:
            if w.endswith(suf) and len(w) - len(suf) >= p1:
                w = w[:-len(suf)]
                break
        else:
            break

    w = fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Armenian — ext/ArmenianStemmer.java (ArmenianAnalyzer.java wires
# SnowballFilter(in, new ArmenianStemmer())).  pV = after the first vowel;
# R2 standard; four suffix passes (ending gated on R2, then verb,
# adjective, noun), every match bounded to start at or after pV.
# ---------------------------------------------------------------------------

_HY_VOWELS = set("աեէըիուօ")

_HY_ADJECTIVE = sorted((
    "երորդ", "րորդ", "որակ", "ական", "արան", "եկեն", "երեն", "որէն",
    "ովին", "լայն", "վուն", "ավետ", "ալի", "ակի", "գին", "պես", "կոտ",
    "բար", "եղ", "են", "ին", "իվ", "ատ",
), key=len, reverse=True)

_HY_VERB = sorted((
    "ացրինք", "վեցինք", "ացնալ", "եցնել", "ացվել", "եցվել", "կոտել",
    "ացրին", "վեցին", "ացրիր", "վեցիր", "ացրեց", "ալուց", "ելուց",
    "ացրիք", "վեցիք", "ացանք", "ացինք", "եցինք", "ացրի", "վեցի", "անալ",
    "ենալ", "ցնել", "ատել", "ոտել", "վում", "ացան", "ացին", "եցին",
    "ալիս", "ելիս", "ացավ", "եցավ", "ալով", "ելով", "ացար", "եցար",
    "ացիր", "եցիր", "ալու", "ելու", "ացաք", "ացիք", "եցիք", "ցանք",
    "ացա", "եցա", "ացի", "եցի", "ըալ", "ըել", "նել", "չել", "վել", "տել",
    "ված", "ում", "ցան", "ցաք", "անք", "վե", "ալ", "ել", "ան", "ավ",
    "ար", "աց", "եց", "աք", "ա",
), key=len, reverse=True)

_HY_NOUN = sorted((
    "ություն", "մունք", "ույթ", "ուհի", "անակ", "ստան", "արան", "եղէն",
    "յուն", "ուստ", "ավոր", "անօց", "ալիք", "անիք", "վածք", "ույք",
    "ունք", "որդ", "յակ", "ուկ", "պան", "ածո", "ուս", "գար", "վոր",
    "չեք", "ենք", "ոնք", "իչք", "արք", "ցի", "իլ", "ակ", "իկ", "ան",
    "իչ", "ոց", "ու", "իք", "ք",
), key=len, reverse=True)

_HY_ENDING = sorted((
    "ությանդ", "ությանը", "ությանն", "ությանս", "ներում", "ության",
    "անում", "երում", "ներին", "ներով", "վանից", "ներից", "վանդ", "ներդ",
    "վանը", "ները", "ների", "երին", "ներն", "վանս", "անով", "երով",
    "ոջից", "երից", "ամբ", "անդ", "ոջդ", "երդ", "ուդ", "անը", "ոջը",
    "երը", "երի", "վան", "երն", "ուն", "ոջս", "վով", "ներ", "վից", "ցից",
    "ուց", "սա", "վա", "վի", "ան", "ին", "ոջ", "ով", "եր", "ից", "ոց",
    "դ", "ը", "ի", "ն", "ց",
), key=len, reverse=True)


def _longest_bounded(w: str, suffixes, bound: int) -> str | None:
    """Longest suffix of ``w`` from ``suffixes`` whose start is at or
    after ``bound`` (find_among_b under ``limit_backward = bound``)."""
    for suf in suffixes:
        if w.endswith(suf) and len(w) - len(suf) >= bound:
            return suf
    return None


def armenian_stem(word: str) -> str:
    """Snowball Armenian (SnowballFilter(in, "Armenian"))."""
    w = word
    n = len(w)
    i = 0
    while i < n and w[i] not in _HY_VOWELS:
        i += 1
    pv = n if i >= n else i + 1
    _, p2 = _standard_regions(w, _HY_VOWELS)

    # ending: longest pV-bounded match deletes only when it sits in R2
    # (no shorter-suffix retry — the R2 test is outside the among scan)
    suf = _longest_bounded(w, _HY_ENDING, pv)
    if suf is not None and len(w) - len(suf) >= p2:
        w = w[:-len(suf)]

    for table in (_HY_VERB, _HY_ADJECTIVE, _HY_NOUN):
        suf = _longest_bounded(w, table, pv)
        if suf is not None:
            w = w[:-len(suf)]
    return w


# ---------------------------------------------------------------------------
# Basque — ext/BasqueStemmer.java (BasqueAnalyzer.java wires
# SnowballFilter(in, new BasqueStemmer())).  RV is the Romance RV; R1/R2
# standard.  Verb endings (aditzak) strip repeatedly, then noun endings
# (izenak) repeatedly, then one adjective pass; each table entry carries a
# rule code: 1 = RV-gated delete, 2 = R2-gated delete, 4 = R1-gated
# delete, others = respellings.
# ---------------------------------------------------------------------------

_EU_VOWELS = "aeiou"

_EU_ADITZAK = (
    ('tzailea', 1), ('arabera', 4), ('atseden', 3), ('kundea', 1),
    ('tailea', 1), ('taldia', 1), ('garria', 2), ('karria', 1),
    ('tezina', 1), ('kizuna', 1), ('gailua', 1), ('erreza', 1),
    ('gaitza', 1), ('kaitza', 1), ('kuntza', 1), ('tzaile', 1),
    ('tarazi', 1), ('aldatu', 1), ('baditu', 5), ('bidea', 1), ('kidea',
    1), ('pidea', 1), ('galea', 1), ('gunea', 1), ('kunea', 1),
    ('tzaga', 1), ('aldia', 1), ('karia', 1), ('tzaka', 1), ('ezina',
    1), ('korra', 1), ('kunde', 1), ('tzake', 1), ('tzeke', 1),
    ('taile', 1), ('taldi', 1), ('etari', 1), ('garri', 2), ('karri',
    1), ('arazi', 1), ('rekin', 1), ('tezin', 1), ('kizun', 1),
    ('gailu', 1), ('errez', 1), ('gaitz', 1), ('kaitz', 1), ('idea', 1),
    ('gaia', 1), ('mena', 1), ('pena', 1), ('kina', 1), ('kuna', 1),
    ('tuna', 1), ('bera', 1), ('kera', 1), ('pera', 1), ('orra', 1),
    ('dura', 1), ('gura', 1), ('kura', 1), ('tura', 1), ('keta', 1),
    ('bide', 1), ('kide', 1), ('pide', 1), ('gale', 1), ('gune', 1),
    ('kune', 1), ('atze', 1), ('aldi', 1), ('kari', 1), ('lari', 1),
    ('tari', 1), ('rean', 1), ('etan', 1), ('ezin', 1), ('dako', 1),
    ('tzat', 1), ('tatu', 1), ('tzez', 1), ('era', 1), ('eta', 1),
    ('eza', 1), ('tza', 2), ('ide', 1), ('tze', 1), ('gai', 1), ('ari',
    1), ('ean', 1), ('kan', 1), ('men', 1), ('pen', 1), ('kin', 1),
    ('tun', 1), ('ago', 1), ('tio', 1), ('kor', 1), ('atu', 1), ('ka',
    1), ('la', 1), ('le', 1), ('ki', 1), ('an', 1), ('go', 1), ('or',
    1), ('du', 1), ('tu', 1), ('ez', 1),
)

_EU_IZENAK = (
    ('minutuko', 6), ('garrena', 1), ('gerrena', 1), ('kaldea', 1),
    ('taldea', 1), ('tzalea', 1), ('zionea', 1), ('aurrea', 1),
    ('taldia', 1), ('handia', 1), ('mendia', 1), ('garria', 2),
    ('larria', 1), ('kirria', 1), ('ontzia', 1), ('gibela', 1),
    ('urrena', 1), ('tzaina', 1), ('tasuna', 1), ('kondoa', 1),
    ('tzarra', 1), ('mendua', 1), ('mentua', 1), ('koitza', 1),
    ('gintza', 1), ('kintza', 1), ('kuntza', 1), ('garren', 1),
    ('gerren', 1), ('tariko', 1), ('gintzo', 1), ('gintzu', 1),
    ('denda', 1), ('gabea', 1), ('kabea', 1), ('aldea', 1), ('ordea',
    1), ('zalea', 1), ('gilea', 1), ('kumea', 1), ('gunea', 1),
    ('kotea', 1), ('artea', 1), ('ostea', 1), ('etxea', 1), ('aldia',
    1), ('degia', 1), ('tegia', 1), ('nahia', 1), ('tokia', 1),
    ('karia', 1), ('laria', 1), ('taria', 1), ('keria', 1), ('teria',
    1), ('duria', 1), ('bizia', 1), ('aurka', 10), ('kaila', 1),
    ('skila', 1), ('zaina', 1), ('garna', 1), ('asuna', 1), ('ondoa',
    1), ('takoa', 1), ('zinoa', 1), ('taroa', 1), ('zaroa', 1),
    ('liara', 1), ('tiara', 1), ('etara', 1), ('tzara', 1), ('korra',
    1), ('ordua', 1), ('lekua', 1), ('burua', 1), ('durua', 1),
    ('estua', 1), ('eroza', 1), ('antza', 1), ('kalde', 1), ('talde',
    1), ('tzale', 1), ('zione', 1), ('aurre', 1), ('taldi', 1),
    ('geldi', 8), ('handi', 1), ('mendi', 1), ('garri', 2), ('larri',
    1), ('kirri', 1), ('ontzi', 1), ('tarik', 1), ('gibel', 1),
    ('urren', 1), ('tzain', 1), ('tasun', 1), ('aizun', 1), ('kondo',
    1), ('trako', 5), ('etako', 1), ('igaro', 9), ('behar', 1),
    ('zehar', 7), ('mendu', 1), ('mentu', 1), ('koitz', 1), ('kada', 1),
    ('anda', 1), ('emea', 1), ('enea', 1), ('unea', 1), ('anga', 1),
    ('gaia', 1), ('geia', 1), ('egia', 1), ('ohia', 1), ('koia', 1),
    ('aria', 1), ('eria', 1), ('asia', 1), ('ezia', 1), ('joka', 3),
    ('gela', 1), ('tila', 1), ('kana', 1), ('kina', 1), ('mina', 1),
    ('duna', 1), ('ngoa', 1), ('zioa', 1), ('zkoa', 1), ('aroa', 1),
    ('eroa', 1), ('oroa', 1), ('osoa', 1), ('ttoa', 1), ('ztoa', 1),
    ('txoa', 1), ('tzoa', 1), ('dara', 1), ('tara', 1), ('bera', 1),
    ('kera', 1), ('pera', 1), ('keta', 1), ('tsua', 1), ('txua', 1),
    ('tzua', 1), ('gabe', 1), ('kabe', 1), ('kide', 1), ('alde', 1),
    ('orde', 1), ('zale', 1), ('gile', 1), ('kume', 1), ('gune', 1),
    ('kote', 1), ('arte', 1), ('oste', 1), ('etxe', 1), ('aldi', 1),
    ('degi', 1), ('tegi', 1), ('nahi', 1), ('toki', 1), ('kari', 1),
    ('lari', 1), ('tari', 1), ('duri', 1), ('kail', 1), ('etan', 1),
    ('tzen', 4), ('zain', 1), ('asun', 1), ('ondo', 1), ('tako', 1),
    ('tuko', 1), ('zino', 1), ('taro', 1), ('zaro', 1), ('giro', 1),
    ('liar', 1), ('tiar', 1), ('tzar', 1), ('ordu', 1), ('leku', 1),
    ('buru', 2), ('duru', 1), ('tatu', 4), ('estu', 1), ('eroz', 1),
    ('ada', 1), ('nea', 1), ('pea', 1), ('tea', 1), ('kia', 1), ('oia',
    1), ('tia', 1), ('ska', 1), ('xka', 1), ('zka', 1), ('ola', 1),
    ('ena', 1), ('una', 1), ('koa', 1), ('noa', 1), ('toa', 1), ('ñoa',
    1), ('ara', 1), ('ora', 2), ('tra', 1), ('osa', 1), ('eta', 1),
    ('sta', 1), ('dua', 1), ('tua', 1), ('zua', 1), ('eza', 1), ('tza',
    2), ('eme', 1), ('une', 1), ('gai', 1), ('gei', 1), ('egi', 1),
    ('ohi', 1), ('goi', 1), ('koi', 1), ('ari', 1), ('asi', 1), ('ail',
    1), ('kan', 1), ('tan', 1), ('ren', 2), ('ten', 4), ('kin', 1),
    ('min', 1), ('dun', 1), ('ngo', 1), ('zio', 1), ('eko', 1), ('sko',
    1), ('zko', 1), ('aro', 1), ('ero', 1), ('oro', 1), ('oso', 1),
    ('tto', 1), ('zto', 1), ('txo', 1), ('tzo', 1), ('dar', 1), ('tar',
    1), ('kor', 1), ('ket', 1), ('tsu', 1), ('txu', 1), ('tzu', 1),
    ('ga', 1), ('ka', 1), ('na', 1), ('ra', 1), ('sa', 1), ('ta', 1),
    ('za', 1), ('ge', 1), ('ne', 1), ('pe', 1), ('te', 1), ('di', 1),
    ('ki', 1), ('oi', 1), ('ti', 1), ('ñi', 1), ('ak', 1), ('ek', 1),
    ('en', 4), ('go', 1), ('ko', 1), ('no', 1), ('ro', 1), ('to', 1),
    ('ño', 1), ('zp', 1), ('ar', 1), ('or', 2), ('os', 1), ('du', 1),
    ('tu', 1), ('zu', 1), ('ez', 1), ('tz', 1), ('z', 1),
)

_EU_ADJETIBOAK = (
    ('keria', 1), ('lanik', 1), ('larik', 1), ('zlea', 2), ('dade', 1),
    ('tade', 1), ('date', 1), ('tate', 1), ('ztik', 1), ('era', 1),
    ('rik', 1), ('ero', 1), ('la', 1), ('gi', 1), ('ki', 1), ('ik', 1),
    ('go', 1), ('ro', 1), ('to', 1),
)

_EU_ADITZAK_REPL = {3: "atseden", 4: "arabera", 5: "baditu"}
_EU_IZENAK_REPL = {3: "jok", 5: "tra", 6: "minutu", 7: "zehar",
                   8: "geldi", 9: "igaro", 10: "aurka"}


def _eu_rule(w, table, repl, pv, p1, p2):
    """One find_among_b pass: longest suffix decides the rule; a failed
    region gate aborts with no shorter-suffix retry."""
    for suf, code in table:
        if not w.endswith(suf):
            continue
        start = len(w) - len(suf)
        if code == 1:
            return (w[:start], True) if start >= pv else (w, False)
        if code == 2:
            return (w[:start], True) if start >= p2 else (w, False)
        if code == 4 and repl is not _EU_ADITZAK_REPL:
            return (w[:start], True) if start >= p1 else (w, False)
        return w[:start] + repl[code], True
    return w, False


def basque_stem(word: str) -> str:
    """Snowball Basque (SnowballFilter(in, "Basque"))."""
    w = word
    pv = _rv_roman(w, _EU_VOWELS)
    p1, p2 = _standard_regions(w, _EU_VOWELS)

    changed = True
    while changed:
        w, changed = _eu_rule(w, _EU_ADITZAK, _EU_ADITZAK_REPL, pv, p1, p2)
    changed = True
    while changed:
        w, changed = _eu_rule(w, _EU_IZENAK, _EU_IZENAK_REPL, pv, p1, p2)

    for suf, code in _EU_ADJETIBOAK:
        if w.endswith(suf):
            start = len(w) - len(suf)
            if code == 1:
                if start >= pv:
                    w = w[:start]
            else:
                w = w[:start] + "z"
            break
    return w


# ---------------------------------------------------------------------------
# Catalan — ext/CatalanStemmer.java (CatalanAnalyzer.java wires ElisionFilter
# + SnowballFilter(in, new CatalanStemmer())).  R1/R2 standard over the
# accented-vowel grouping.  attached_pronoun (R1 delete), then
# standard_suffix OR-ELSE verb_suffix, then residual_suffix, then a forward
# cleaning pass stripping accents (and middot -> '.').
# ---------------------------------------------------------------------------

_CA_VOWELS = "aeiou\u00e0\u00e1\u00e8\u00e9\u00ed\u00ef\u00f2\u00f3\u00fa\u00fc"

_CA_PRONOUN = (
    'selas', 'selos', 'sela', 'selo', '-les', '-nos', '-la', '-me',
    '-te', "'hi", '-li', "'ho", 'las', 'les', "'ls", '-ls', "'ns",
    '-ns', 'ens', 'los', 'nos', 'vos', '-us', 'la', 'le', 'me', 'se',
    'hi', 'li', "'l", "'m", '-m', "'n", '-n', 'ho', 'lo', "'s", 'us',
    "'t",
)

_CA_STANDARD = (
    ('quíssimes', 5), ('allengües', 1), ('ativitats', 1), ('quíssima',
    5), ('ialismes', 1), ('ialistes', 1), ('ionistes', 1), ('lógiques',
    3), ('quíssims', 5), ('bilitats', 1), ('ativitat', 1), ('ialista',
    1), ('ionista', 1), ('ialisme', 1), ('ionisme', 1), ('quíssim', 5),
    ('atòries', 1), ('íssimes', 1), ('ivitats', 1), ('bilitat', 1),
    ('isament', 1), ('lógica', 3), ('atòria', 1), ('íssima', 1),
    ('ivisme', 1), ('ificar', 1), ('lógics', 3), ('ancies', 1),
    ('encies', 1), ('ències', 1), ('logies', 3), ('formes', 1),
    ('idores', 1), ('atives', 1), ('logíes', 3), ('íssims', 1),
    ('acions', 2), ('aments', 1), ('ivitat', 1), ('ancia', 1), ('encia',
    1), ('ència', 1), ('logia', 3), ('íinia', 1), ('ívola', 1),
    ('sfera', 1), ('adora', 1), ('adura', 1), ('ativa', 1), ('logía',
    3), ('ístic', 1), ('issem', 1), ('ìssem', 1), ('íssem', 1),
    ('íssim', 1), ('ìssin', 1), ('itzar', 1), ('doras', 1), ('ícies',
    1), ('inies', 1), ('ínies', 1), ('eries', 1), ('àries', 1),
    ('ables', 1), ('ibles', 1), ('ismes', 1), ('dores', 1), ('dures',
    1), ('asses', 1), ('ictes', 1), ('istes', 1), ('iques', 4),
    ('logis', 3), ('toris', 1), ('cions', 1), ('assos', 1), ('issos',
    1), ('adors', 1), ('idors', 1), ('itats', 1), ('ïtats', 1),
    ('ments', 1), ('trius', 1), ('atius', 1), ('ament', 1), ('isseu',
    1), ('ìsseu', 1), ('ísseu', 1), ('íssiu', 1), ('enca', 1), ('ícia',
    1), ('inia', 1), ('eria', 1), ('ària', 1), ('alla', 1), ('ella', 1),
    ('dora', 1), ('assa', 1), ('essa', 1), ('issa', 1), ('ista', 1),
    ('atge', 1), ('able', 1), ('ible', 1), ('isme', 1), ('aire', 1),
    ('icte', 1), ('iste', 1), ('logi', 3), ('tori', 1), ('ívol', 1),
    ('isam', 1), ('amen', 1), ('egar', 1), ('ejar', 1), ('itar', 1),
    ('nces', 1), ('ades', 2), ('bles', 1), ('imes', 1), ('ines', 1),
    ('eres', 1), ('ores', 1), ('eses', 1), ('oses', 1), ('ites', 1),
    ('otes', 1), ('ives', 1), ('icis', 1), ('ícis', 1), ('aris', 1),
    ('ells', 1), ('ions', 1), ('esos', 1), ('osos', 1), ('dors', 1),
    ('ants', 1), ('ents', 1), ('itat', 1), ('ïtat', 1), ('ient', 1),
    ('ment', 1), ('triu', 1), ('atiu', 1), ('ació', 1), ('ica', 4),
    ('ada', 2), ('ima', 1), ('ana', 1), ('ina', 1), ('era', 1), ('ora',
    1), ('esa', 1), ('osa', 1), ('eta', 1), ('ita', 1), ('ota', 1),
    ('iva', 1), ('nça', 1), ('enc', 1), ('esc', 1), ('ble', 1), ('ici',
    1), ('íci', 1), ('ari', 1), ('all', 1), ('ell', 1), ('fer', 1),
    ('dor', 1), ('dur', 1), ('ics', 4), ('uds', 1), ('als', 1), ('ims',
    1), ('ers', 1), ('ors', 1), ('ats', 1), ('ets', 1), ('ots', 1),
    ('uts', 1), ('ius', 1), ('dís', 1), ('ant', 1), ('ent', 1), ('ció',
    1), ('ic', 4), ('ud', 1), ('al', 1), ('il', 1), ('ar', 1), ('or',
    1), ('ls', 1), ('ès', 1), ('és', 1), ('ís', 1), ('ós', 1), ('et',
    1), ('ot', 1), ('ió', 1), ('ó', 1),
)

_CA_VERB = (
    ('iéramos', 1), ('aríamos', 1), ('eríamos', 1), ('iríamos', 1),
    ('iésemos', 1), ('eresseu', 1), ('esquen', 1), ('isquen', 1),
    ('ïsquen', 1), ('esquin', 1), ('adores', 1), ('esques', 1),
    ('ïsques', 1), ('ierais', 1), ('aríais', 1), ('eríais', 1),
    ('iríais', 1), ('ieseis', 1), ('asteis', 1), ('isteis', 1),
    ('esquis', 1), ('ábamos', 1), ('áramos', 1), ('aremos', 1),
    ('eremos', 1), ('iremos', 1), ('ásemos', 1), ('adora', 1), ('esqui',
    1), ('àssem', 1), ('éssem', 1), ('iguem', 1), ('ïguem', 1),
    ('irìem', 1), ('aríem', 1), ('iríem', 1), ('assim', 1), ('essim',
    1), ('issim', 1), ('àssim', 1), ('èssim', 1), ('éssim', 1),
    ('íssim', 1), ('arian', 1), ('ieran', 1), ('arían', 1), ('erían',
    1), ('irían', 1), ('arien', 1), ('irien', 1), ('iesen', 1),
    ('assen', 1), ('essen', 1), ('issen', 1), ('éssen', 1), ('ïssen',
    1), ('eixen', 1), ('assin', 1), ('essin', 1), ('issin', 1),
    ('ïssin', 1), ('eixin', 1), ('ieron', 1), ('iendo', 1), ('eixer',
    1), ('ieras', 1), ('arías', 1), ('erías', 1), ('irías', 1),
    ('atges', 1), ('aries', 1), ('iries', 1), ('ieses', 1), ('asses',
    1), ('esses', 1), ('isses', 1), ('ïsses', 1), ('eixes', 1),
    ('abais', 1), ('arais', 1), ('aseis', 1), ('assis', 1), ('essis',
    1), ('issis', 1), ('ïssis', 1), ('eixis', 1), ('itzis', 1),
    ('aréis', 1), ('eréis', 1), ('iréis', 1), ('íamos', 1), ('adors',
    1), ('erass', 1), ('asseu', 1), ('esseu', 1), ('àsseu', 1),
    ('ésseu', 1), ('igueu', 1), ('ïgueu', 1), ('itzeu', 1), ('irìeu',
    1), ('aríeu', 1), ('iríeu', 1), ('assiu', 1), ('issiu', 1),
    ('àssiu', 1), ('èssiu', 1), ('éssiu', 1), ('íssiu', 1), ('esca', 1),
    ('isca', 1), ('ïsca', 1), ('aria', 1), ('iria', 1), ('iera', 1),
    ('itza', 1), ('aría', 1), ('ería', 1), ('iría', 1), ('iese', 1),
    ('aste', 1), ('iste', 1), ('eixi', 1), ('itzi', 1), ('arem', 1),
    ('irem', 1), ('àrem', 1), ('írem', 1), ('avem', 1), ('àvem', 1),
    ('ávem', 1), ('aban', 1), ('aran', 1), ('iran', 1), ('aren', 1),
    ('eren', 1), ('iren', 1), ('àren', 1), ('ïren', 1), ('asen', 1),
    ('aven', 1), ('ixen', 1), ('ïxen', 1), ('inin', 1), ('isin', 1),
    ('aron', 1), ('arán', 1), ('erán', 1), ('irán', 1), ('ando', 2),
    ('eixo', 1), ('itzo', 1), ('tzar', 1), ('ador', 1), ('abas', 1),
    ('adas', 1), ('idas', 1), ('aras', 1), ('ades', 1), ('ides', 1),
    ('udes', 1), ('ïdes', 1), ('ares', 1), ('ires', 1), ('ïres', 1),
    ('ases', 1), ('ques', 1), ('aves', 1), ('ixes', 1), ('ïxes', 1),
    ('íais', 1), ('inis', 1), ('isis', 1), ('ados', 1), ('idos', 1),
    ('amos', 1), ('imos', 1), ('ents', 1), ('aràs', 1), ('iràs', 1),
    ('arás', 1), ('erás', 1), ('irás', 1), ('arés', 1), ('erau', 1),
    ('ineu', 1), ('areu', 1), ('ireu', 1), ('àreu', 1), ('íreu', 1),
    ('àveu', 1), ('áveu', 1), ('itzà', 1), ('aba', 1), ('ada', 1),
    ('ida', 1), ('uda', 1), ('ïda', 1), ('ara', 1), ('ira', 1), ('ïra',
    1), ('ava', 1), ('ixa', 1), ('isc', 1), ('ïsc', 1), ('dre', 1),
    ('ase', 1), ('ini', 1), ('íem', 1), ('ían', 1), ('ien', 1), ('ïen',
    1), ('sin', 1), ('iïn', 1), ('ado', 1), ('ido', 1), ('ixo', 1),
    ('ïxo', 1), ('ías', 1), ('ids', 1), ('ies', 1), ('ïes', 1), ('sis',
    1), ('áis', 1), ('ams', 1), ('ass', 1), ('ess', 1), ('ats', 1),
    ('its', 1), ('iïs', 1), ('ant', 1), ('ent', 1), ('int', 1), ('ieu',
    1), ('ìeu', 1), ('íeu', 1), ('eix', 1), ('itz', 1), ('arà', 1),
    ('irà', 1), ('ará', 1), ('erá', 1), ('irá', 1), ('irè', 1), ('aré',
    1), ('eré', 1), ('iré', 1), ('ia', 1), ('ía', 1), ('ïa', 1), ('ad',
    1), ('ed', 1), ('id', 1), ('ie', 1), ('re', 1), ('ii', 1), ('am',
    1), ('em', 1), ('ïm', 1), ('an', 1), ('en', 1), ('in', 1), ('io',
    1), ('ar', 1), ('er', 1), ('ir', 1), ('as', 1), ('es', 1), ('às',
    1), ('és', 1), ('ís', 1), ('at', 1), ('it', 1), ('ut', 1), ('ït',
    1), ('au', 1), ('ïu', 1), ('ix', 1), ('ïx', 1), ('ià', 1), ('iï',
    1), ('ió', 1), ('í', 1),
)

_CA_RESIDUAL = (
    ('iqu', 2), ('itz', 1), ('ïn', 1), ('ir', 1), ('is', 1), ('os', 1),
    ('ïs', 1), ('it', 1), ('eu', 1), ('iu', 1), ('a', 1), ('e', 1),
    ('i', 1), ('o', 1), ('s', 1), ('à', 1), ('á', 1), ('é', 1), ('ì',
    1), ('í', 1), ('ï', 1), ('ó', 1),
)

_CA_CLEAN = str.maketrans("\u00e0\u00e1\u00e8\u00e9\u00ec\u00ed\u00ef\u00f2\u00f3\u00fa\u00fc\u00b7",
                          "aaeeiiioouu.")


def _ca_coded(w, table, p1, p2, repl=None):
    """find_among_b + gate: longest suffix decides; failed gate = no-op
    (returns success=False so OR-else chains can try the next rule)."""
    for suf, code in table:
        if not w.endswith(suf):
            continue
        start = len(w) - len(suf)
        bound = p2 if code in (2, 3, 4) else p1
        if start < bound:
            return w, False
        if repl and code in repl:
            return w[:start] + repl[code], True
        return w[:start], True
    return w, False


def catalan_stem(word: str) -> str:
    """Snowball Catalan (SnowballFilter(in, "Catalan"))."""
    w = word
    p1, p2 = _standard_regions(w, _CA_VOWELS)

    for suf in _CA_PRONOUN:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                w = w[:-len(suf)]
            break

    w2, ok = _ca_coded(w, _CA_STANDARD, p1, p2, repl={3: "log", 4: "ic", 5: "c"})
    if ok:
        w = w2
    else:
        w, _ = _ca_coded(w, _CA_VERB, p1, p2)

    w, _ = _ca_coded(w, _CA_RESIDUAL, p1, p2, repl={2: "ic"})
    return w.translate(_CA_CLEAN)


# ---------------------------------------------------------------------------
# Estonian — ext/EstonianStemmer.java (EstonianAnalyzer.java wires
# SnowballFilter(in, new EstonianStemmer())).  Whole-word irregular-verb
# lookup first; else emphasis (gi/ki), verb endings (which suppress the
# noun pipeline), the six-step substantive pipeline, and a final
# doubled-kpt undouble.  All suffix matches are R1-bounded.
# ---------------------------------------------------------------------------

_ET_V1 = set("aeiouäõöü")
_ET_RV = set("aeiou")
_ET_KI = set("bdfghkpstzšž")
_ET_GI = set("aceijlmnoqruvwxäõöü")
_ET_LONGVS = {"aa", "ee", "ii", "oo", "uu", "ää", "õõ", "öö", "üü"}

_ET_VERB = sorted((
    ("da", 3), ("mata", 1), ("b", 3), ("ksid", 1), ("nuksid", 1),
    ("me", 3), ("sime", 1), ("ksime", 1), ("nuksime", 1), ("akse", 2),
    ("dakse", 1), ("takse", 1), ("site", 1), ("ksite", 1), ("nuksite", 1),
    ("n", 3), ("sin", 1), ("ksin", 1), ("nuksin", 1), ("daks", 1),
    ("taks", 1),
), key=lambda p: len(p[0]), reverse=True)
_ET_VERB_CODE = dict(_ET_VERB)

_ET_SPECIAL_NOUN = sorted((
    ("lane", "lase"), ("line", "lise"), ("mine", "mise"),
    ("lasse", "lase"), ("lisse", "lise"), ("misse", "mise"),
    ("lasi", "lase"), ("lisi", "lise"), ("misi", "mise"),
    ("last", "lase"), ("list", "lise"), ("mist", "mise"),
), key=lambda p: len(p[0]), reverse=True)
_ET_SPECIAL_REPL = dict(_ET_SPECIAL_NOUN)

_ET_CASE = sorted(("ga", "ta", "le", "sse", "l", "s", "ks", "t", "lt",
                   "st"), key=len, reverse=True)

_ET_PLURAL3 = sorted((
    ("d", 4), ("sid", 2), ("de", 4), ("ikkude", 1), ("ike", 1),
    ("ikke", 1), ("te", 3),
), key=lambda p: len(p[0]), reverse=True)
_ET_PLURAL3_CODE = dict(_ET_PLURAL3)

_ET_DEGREES = (("mai", 1), ("ma", 2), ("m", 1))
_ET_DEGREES_CODE = dict(_ET_DEGREES)

_ET_NU = ("va", "du", "nu", "tu")

_ET_VERB_EXCEPTIONS = {
    'joob': 'joo', 'jood': 'joo', 'joodakse': 'joo', 'jooma': 'joo',
    'joomata': 'joo', 'joome': 'joo', 'joon': 'joo', 'joote': 'joo',
    'joovad': 'joo', 'juua': 'joo', 'juuakse': 'joo', 'jäi': 'jääma',
    'jäid': 'jääma', 'jäime': 'jääma', 'jäin': 'jääma', 'jäite':
    'jääma', 'jääb': 'jääma', 'jääd': 'jääma', 'jääda': 'jääma',
    'jäädakse': 'jääma', 'jäädi': 'jääma', 'jääks': 'jääma', 'jääksid':
    'jääma', 'jääksime': 'jääma', 'jääksin': 'jääma', 'jääksite':
    'jääma', 'jääma': 'jääma', 'jäämata': 'jääma', 'jääme': 'jääma',
    'jään': 'jääma', 'jääte': 'jääma', 'jäävad': 'jääma', 'jõi': 'joo',
    'jõid': 'joo', 'jõime': 'joo', 'jõin': 'joo', 'jõite': 'joo',
    'keeb': 'keesi', 'keed': 'keesi', 'keedakse': 'keesi', 'keeks':
    'keesi', 'keeksid': 'keesi', 'keeksime': 'keesi', 'keeksin':
    'keesi', 'keeksite': 'keesi', 'keema': 'keesi', 'keemata': 'keesi',
    'keeme': 'keesi', 'keen': 'keesi', 'kees': 'keesi', 'keeta':
    'keesi', 'keete': 'keesi', 'keevad': 'keesi', 'käia': 'käisi',
    'käiakse': 'käisi', 'käib': 'käisi', 'käid': 'käisi', 'käidi':
    'käisi', 'käiks': 'käisi', 'käiksid': 'käisi', 'käiksime': 'käisi',
    'käiksin': 'käisi', 'käiksite': 'käisi', 'käima': 'käisi',
    'käimata': 'käisi', 'käime': 'käisi', 'käin': 'käisi', 'käis':
    'käisi', 'käite': 'käisi', 'käivad': 'käisi', 'laob': 'ladu',
    'laod': 'ladu', 'laoks': 'ladu', 'laoksid': 'ladu', 'laoksime':
    'ladu', 'laoksin': 'ladu', 'laoksite': 'ladu', 'laome': 'ladu',
    'laon': 'ladu', 'laote': 'ladu', 'laovad': 'ladu', 'loeb': 'luge',
    'loed': 'luge', 'loeks': 'luge', 'loeksid': 'luge', 'loeksime':
    'luge', 'loeksin': 'luge', 'loeksite': 'luge', 'loeme': 'luge',
    'loen': 'luge', 'loete': 'luge', 'loevad': 'luge', 'loob': 'loo',
    'lood': 'loo', 'loodi': 'loo', 'looks': 'loo', 'looksid': 'loo',
    'looksime': 'loo', 'looksin': 'loo', 'looksite': 'loo', 'looma':
    'loo', 'loomata': 'loo', 'loome': 'loo', 'loon': 'loo', 'loote':
    'loo', 'loovad': 'loo', 'luua': 'loo', 'luuakse': 'loo', 'lõi':
    'lõi', 'lõid': 'lõi', 'lõime': 'lõi', 'lõin': 'lõi', 'lõite': 'lõi',
    'lööb': 'löö', 'lööd': 'löö', 'löödakse': 'löö', 'löödi': 'löö',
    'lööks': 'löö', 'lööksid': 'löö', 'lööksime': 'löö', 'lööksin':
    'löö', 'lööksite': 'löö', 'lööma': 'löö', 'löömata': 'löö', 'lööme':
    'löö', 'löön': 'löö', 'lööte': 'löö', 'löövad': 'löö', 'lüüa':
    'löö', 'lüüakse': 'löö', 'müüa': 'müüsi', 'müüakse': 'müüsi',
    'müüb': 'müüsi', 'müüd': 'müüsi', 'müüdi': 'müüsi', 'müüks':
    'müüsi', 'müüksid': 'müüsi', 'müüksime': 'müüsi', 'müüksin':
    'müüsi', 'müüksite': 'müüsi', 'müüma': 'müüsi', 'müümata': 'müüsi',
    'müüme': 'müüsi', 'müün': 'müüsi', 'müüs': 'müüsi', 'müüte':
    'müüsi', 'müüvad': 'müüsi', 'näeb': 'nägi', 'näed': 'nägi', 'näeks':
    'nägi', 'näeksid': 'nägi', 'näeksime': 'nägi', 'näeksin': 'nägi',
    'näeksite': 'nägi', 'näeme': 'nägi', 'näen': 'nägi', 'näete':
    'nägi', 'näevad': 'nägi', 'nägema': 'nägi', 'nägemata': 'nägi',
    'näha': 'nägi', 'nähakse': 'nägi', 'nähti': 'nägi', 'põeb': 'põde',
    'põed': 'põde', 'põeks': 'põde', 'põeksid': 'põde', 'põeksime':
    'põde', 'põeksin': 'põde', 'põeksite': 'põde', 'põeme': 'põde',
    'põen': 'põde', 'põete': 'põde', 'põevad': 'põde', 'saab': 'saa',
    'saad': 'saa', 'saada': 'saa', 'saadakse': 'saa', 'saadi': 'saa',
    'saaks': 'saa', 'saaksid': 'saa', 'saaksime': 'saa', 'saaksin':
    'saa', 'saaksite': 'saa', 'saama': 'saa', 'saamata': 'saa', 'saame':
    'saa', 'saan': 'saa', 'saate': 'saa', 'saavad': 'saa', 'sai': 'saa',
    'said': 'saa', 'saime': 'saa', 'sain': 'saa', 'saite': 'saa', 'sõi':
    'söö', 'sõid': 'söö', 'sõime': 'söö', 'sõin': 'söö', 'sõite': 'söö',
    'sööb': 'söö', 'sööd': 'söö', 'söödakse': 'söö', 'söödi': 'söö',
    'sööks': 'söö', 'sööksid': 'söö', 'sööksime': 'söö', 'sööksin':
    'söö', 'sööksite': 'söö', 'sööma': 'söö', 'söömata': 'söö', 'sööme':
    'söö', 'söön': 'söö', 'sööte': 'söö', 'söövad': 'söö', 'süüa':
    'söö', 'süüakse': 'söö', 'teeb': 'tegi', 'teed': 'tegi', 'teeks':
    'tegi', 'teeksid': 'tegi', 'teeksime': 'tegi', 'teeksin': 'tegi',
    'teeksite': 'tegi', 'teeme': 'tegi', 'teen': 'tegi', 'teete':
    'tegi', 'teevad': 'tegi', 'tegema': 'tegi', 'tegemata': 'tegi',
    'teha': 'tegi', 'tehakse': 'tegi', 'tehti': 'tegi', 'toob': 'too',
    'tood': 'too', 'toodi': 'too', 'tooks': 'too', 'tooksid': 'too',
    'tooksime': 'too', 'tooksin': 'too', 'tooksite': 'too', 'tooma':
    'too', 'toomata': 'too', 'toome': 'too', 'toon': 'too', 'toote':
    'too', 'toovad': 'too', 'tuua': 'too', 'tuuakse': 'too', 'tõi':
    'too', 'tõid': 'too', 'tõime': 'too', 'tõin': 'too', 'tõite': 'too',
    'viia': 'viima', 'viiakse': 'viima', 'viib': 'viima', 'viid':
    'viima', 'viidi': 'viima', 'viiks': 'viima', 'viiksid': 'viima',
    'viiksime': 'viima', 'viiksin': 'viima', 'viiksite': 'viima',
    'viima': 'viima', 'viimata': 'viima', 'viime': 'viima', 'viin':
    'viima', 'viisime': 'viima', 'viisin': 'viima', 'viisite': 'viima',
    'viite': 'viima', 'viivad': 'viima', 'võib': 'võisi', 'võid':
    'võisi', 'võida': 'võisi', 'võidakse': 'võisi', 'võidi': 'võisi',
    'võiks': 'võisi', 'võiksid': 'võisi', 'võiksime': 'võisi',
    'võiksin': 'võisi', 'võiksite': 'võisi', 'võima': 'võisi',
    'võimata': 'võisi', 'võime': 'võisi', 'võin': 'võisi', 'võis':
    'võisi', 'võite': 'võisi', 'võivad': 'võisi',
}


def _et_longv(prev: str) -> bool:
    return prev[-2:] in _ET_LONGVS


def estonian_stem(word: str) -> str:
    """Snowball Estonian (SnowballFilter(in, "Estonian"))."""
    exc = _ET_VERB_EXCEPTIONS.get(word)
    if exc is not None:
        return exc

    w = word
    n = len(w)
    i = 0
    while i < n and w[i] not in _ET_V1:
        i += 1
    while i < n and w[i] in _ET_V1:
        i += 1
    p1 = n if i >= n else i + 1

    # emphasis: gi/ki with at least four stem chars before the suffix
    suf = _longest_bounded(w, ("gi", "ki"), p1)
    if suf is not None:
        start = len(w) - 2
        if start >= 4:
            prev = w[:start]
            if suf == "gi":
                if prev[-1] in _ET_GI and not _et_longv(prev):
                    w = prev
            elif prev[-1] in _ET_KI:
                w = prev

    is_verb = False
    suf = _longest_bounded(w, [s for s, _ in _ET_VERB], p1)
    if suf is not None:
        code = _ET_VERB_CODE[suf]
        start = len(w) - len(suf)
        if code == 1:
            w, is_verb = w[:start], True
        elif code == 2:
            w, is_verb = w[:start] + "a", True
        elif w[start - 1:start] in _ET_V1:
            w, is_verb = w[:start], True

    if not is_verb:
        suf = _longest_bounded(w, [s for s, _ in _ET_SPECIAL_NOUN], p1)
        if suf is not None:
            w = w[:-len(suf)] + _ET_SPECIAL_REPL[suf]

        suf = _longest_bounded(w, _ET_CASE, p1)
        if suf is not None:
            prev = w[:-len(suf)]
            if prev[-1:] in _ET_RV or _et_longv(prev):
                w = prev

        suf = _longest_bounded(w, [s for s, _ in _ET_PLURAL3], p1)
        if suf is not None:
            code = _ET_PLURAL3_CODE[suf]
            start = len(w) - len(suf)
            prev = w[:start]
            if code == 1:
                w = prev + "iku"
            elif code == 2:
                if not _et_longv(prev):
                    w = prev
            elif code == 3:
                # 'te': respell to 'e' after mis/las/lis, drop after a
                # long-enough stem, 't' after a short one; no-op after 't'
                if start >= 4 and prev.endswith(("mis", "las", "lis")):
                    w = prev + "e"
                elif prev.endswith("t"):
                    pass
                elif start >= 4:
                    w = prev
                else:
                    w = prev + "t"
            elif prev[-1:] in _ET_RV or _et_longv(prev):
                w = prev

        suf = _longest_bounded(w, [s for s, _ in _ET_DEGREES], p1)
        if suf is not None:
            prev = w[:-len(suf)]
            if _ET_DEGREES_CODE[suf] == 2:
                w = prev
            elif prev[-1:] in _ET_RV:
                w = prev

        if _longest_bounded(w, ("i",), p1) is not None \
                and w[-2:-1] in _ET_RV:
            w = w[:-1]

        suf = _longest_bounded(w, _ET_NU, p1)
        if suf is not None:
            w = w[:-2]

    if len(w) >= 3 and w[-1] in _ET_V1 and w[-3:-1] in ("kk", "pp", "tt"):
        w = w[:-3] + w[-2:]
    return w


# ---------------------------------------------------------------------------
# registry + analyzer factory
# ---------------------------------------------------------------------------

SNOWBALL_STEMMERS = {
    "german": german_stem,
    "german2": german2_stem,
    "spanish": spanish_stem,
    "italian": italian_stem,
    "portuguese": portuguese_stem,
    "russian": russian_stem,
    "swedish": swedish_stem,
    "norwegian": norwegian_stem,
    "danish": danish_stem,
    "dutch": dutch_stem,
    "romanian": romanian_stem,
    "finnish": finnish_stem,
    "hungarian": hungarian_stem,
    "irish": irish_stem,
    "nepali": nepali_stem,
    "turkish": turkish_stem,
    "porter": porter_snowball_stem,
    "lovins": lovins_stem,
    "kp": kp_stem,
    "french": french_stem,
    "lithuanian": lithuanian_stem,
    "armenian": armenian_stem,
    "basque": basque_stem,
    "catalan": catalan_stem,
    "estonian": estonian_stem,
}


def snowball_stem(lang: str):
    """SnowballFilter(in, name) analog: the stemmer callable for ``lang``."""
    try:
        return SNOWBALL_STEMMERS[lang.lower()]
    except KeyError:
        raise ValueError(
            f"unsupported Snowball language {lang!r}; "
            f"available: {sorted(SNOWBALL_STEMMERS)}") from None


def snowball_analyzer(lang: str, stopwords=frozenset()):
    """Analyzer with the Snowball stemmer as the post-stop stage, the
    SnowballFilter position in e.g. GermanAnalyzer's chain."""
    from .analysis import Analyzer
    return Analyzer(stopwords=frozenset(stopwords),
                    post_filters=(snowball_stem(lang),))
