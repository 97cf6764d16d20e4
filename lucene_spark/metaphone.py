"""Double Metaphone phonetic encoder (Lawrence Philips, C/C++ Users
Journal, June 2000) — the encoder DoubleMetaphoneFilter wraps (reference
analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
DoubleMetaphoneFilter.java:36, delegating to commons-codec's
DoubleMetaphone).  Original-idiom Python implementation of the published
algorithm; golden vectors from the reference's own
TestDoubleMetaphoneFilter pass in tests/test_metaphone.py.

The encoder returns (primary, alternate) codes truncated to
``max_code_len`` (the filter's default 4).  ``double_metaphone_inject``
mirrors DoubleMetaphoneFilter's token-stream behavior: with inject=True
the original token is kept and codes are added at the same position;
with inject=False codes replace the token (a token with no encodable
letters passes through unchanged — TestDoubleMetaphoneFilter
.testNonConvertableStringsWithoutInject).
"""

from __future__ import annotations

_VOWELS = "AEIOUY"

_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = ("ES", "EP", "EB", "EL", "EY", "IB",
                                     "IL", "IN", "IE", "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _State:
    __slots__ = ("w", "n", "primary", "alternate", "i")

    def __init__(self, word: str):
        self.w = word.upper() + "     "
        self.n = len(word)
        self.primary = []
        self.alternate = []
        self.i = 0

    def ch(self, k: int) -> str:
        return self.w[k] if 0 <= k < self.n else ""

    def s(self, start: int, length: int) -> str:
        if start < 0:
            return ""
        return self.w[start:start + length] if start < self.n else ""

    def contains(self, start: int, length: int, *opts: str) -> bool:
        return self.s(start, length) in opts

    def add(self, p: str, a: str | None = None):
        self.primary.append(p)
        self.alternate.append(p if a is None else a)

    def is_vowel(self, k: int) -> bool:
        c = self.ch(k)
        return bool(c) and c in _VOWELS


def _slavo_germanic(w: str) -> bool:
    return any(x in w for x in ("W", "K", "CZ", "WITZ"))


def double_metaphone(value: str, max_code_len: int = 4) -> tuple[str, str]:
    """Return (primary, alternate) Double Metaphone codes, '' if the input
    has no encodable letters."""
    value = "".join(c for c in value.strip().upper() if c.isalpha())
    if not value:
        return "", ""
    st = _State(value)
    w = st.w

    if value.startswith(_SILENT_START):
        st.i = 1
    if st.ch(0) == "X":                       # initial X -> S (Xavier)
        st.add("S")
        st.i = 1

    while st.i < st.n and (len("".join(st.primary)) < max_code_len
                           or len("".join(st.alternate)) < max_code_len):
        c = st.ch(st.i)
        if c in "AEIOUY":
            if st.i == 0:
                st.add("A")
            st.i += 1
        elif c == "B":
            st.add("P")
            st.i += 2 if st.ch(st.i + 1) == "B" else 1
        elif c == "\xc7":
            st.add("S")
            st.i += 1
        elif c == "C":
            _handle_c(st)
        elif c == "D":
            if st.s(st.i, 2) == "DG":
                if st.ch(st.i + 2) in "IEY":      # edge -> J
                    st.add("J")
                    st.i += 3
                else:                             # Edgar -> TK
                    st.add("TK")
                    st.i += 2
            elif st.s(st.i, 2) in ("DT", "DD"):
                st.add("T")
                st.i += 2
            else:
                st.add("T")
                st.i += 1
        elif c == "F":
            st.add("F")
            st.i += 2 if st.ch(st.i + 1) == "F" else 1
        elif c == "G":
            _handle_g(st)
        elif c == "H":
            # keep H between vowels / after silent start
            if (st.i == 0 or st.is_vowel(st.i - 1)) and st.is_vowel(st.i + 1):
                st.add("H")
                st.i += 2
            else:
                st.i += 1
        elif c == "J":
            _handle_j(st)
        elif c == "K":
            st.add("K")
            st.i += 2 if st.ch(st.i + 1) == "K" else 1
        elif c == "L":
            if st.ch(st.i + 1) == "L":
                # spanish e.g. cabrillo, gallegos
                if ((st.i == st.n - 3
                     and st.contains(st.i - 1, 4, "ILLO", "ILLA", "ALLE"))
                    or ((st.contains(st.n - 2, 2, "AS", "OS")
                         or st.ch(st.n - 1) in "AO")
                        and st.contains(st.i - 1, 4, "ALLE"))):
                    st.primary.append("L")        # alternate drops the L
                    st.i += 2
                else:
                    st.add("L")
                    st.i += 2
            else:
                st.add("L")
                st.i += 1
        elif c == "M":
            st.add("M")
            if (st.s(st.i - 1, 3) == "UMB"
                and (st.i + 1 == st.n - 1 or st.s(st.i + 2, 2) == "ER")) \
                    or st.ch(st.i + 1) == "M":
                st.i += 2
            else:
                st.i += 1
        elif c == "N":
            st.add("N")
            st.i += 2 if st.ch(st.i + 1) == "N" else 1
        elif c == "\xd1":
            st.add("N")
            st.i += 1
        elif c == "P":
            if st.ch(st.i + 1) == "H":
                st.add("F")
                st.i += 2
            else:
                st.add("P")
                st.i += 2 if st.ch(st.i + 1) in "PB" else 1
        elif c == "Q":
            st.add("K")
            st.i += 2 if st.ch(st.i + 1) == "Q" else 1
        elif c == "R":
            # french e.g. rogier
            if (st.i == st.n - 1 and not _slavo_germanic(w)
                    and st.s(st.i - 2, 2) == "IE"
                    and not st.contains(st.i - 4, 2, "ME", "MA")):
                st.primary.append("")
                st.alternate.append("R")
            else:
                st.add("R")
            st.i += 2 if st.ch(st.i + 1) == "R" else 1
        elif c == "S":
            _handle_s(st)
        elif c == "T":
            _handle_t(st)
        elif c == "V":
            st.add("F")
            st.i += 2 if st.ch(st.i + 1) == "V" else 1
        elif c == "W":
            _handle_w(st)
        elif c == "X":
            if not (st.i == st.n - 1
                    and (st.contains(st.i - 3, 3, "IAU", "EAU")
                         or st.contains(st.i - 2, 2, "AU", "OU"))):
                st.add("KS")                       # french e.g. breaux
            st.i += 2 if st.ch(st.i + 1) in "CX" else 1
        elif c == "Z":
            if st.ch(st.i + 1) == "H":             # chinese pinyin e.g. zhao
                st.add("J")
                st.i += 2
            else:
                if (st.contains(st.i + 1, 2, "ZO", "ZI", "ZA")
                        or (_slavo_germanic(w)
                            and st.i > 0 and st.ch(st.i - 1) != "T")):
                    st.primary.append("S")
                    st.alternate.append("TS")
                else:
                    st.add("S")
                st.i += 2 if st.ch(st.i + 1) == "Z" else 1
        else:
            st.i += 1

    p = "".join(st.primary)[:max_code_len]
    a = "".join(st.alternate)[:max_code_len]
    return p, a


def _handle_c(st: _State):
    w = st.w
    # various germanic
    if (st.i > 1 and not st.is_vowel(st.i - 2)
            and st.s(st.i - 1, 3) == "ACH"
            and st.ch(st.i + 2) != "I"
            and (st.ch(st.i + 2) != "E"
                 or st.contains(st.i - 2, 6, "BACHER", "MACHER"))):
        st.add("K")
        st.i += 2
        return
    # special case 'caesar'
    if st.i == 0 and st.s(st.i, 6) == "CAESAR":
        st.add("S")
        st.i += 2
        return
    if st.s(st.i, 4) == "CHIA":                   # italian 'chianti'
        st.add("K")
        st.i += 2
        return
    if st.s(st.i, 2) == "CH":
        if st.i > 0 and st.s(st.i, 4) == "CHAE":  # 'michael'
            st.add("K", "X")
            st.i += 2
            return
        # greek roots e.g. 'chemistry', 'chorus'
        if (st.i == 0
                and (st.contains(st.i + 1, 5, "HARAC", "HARIS")
                     or st.contains(st.i + 1, 3, "HOR", "HYM", "HIA", "HEM"))
                and st.s(0, 5) != "CHORE"):
            st.add("K")
            st.i += 2
            return
        # germanic / greek / otherwise 'ch' as 'K'
        if ((st.s(0, 4) in ("VAN ", "VON ") or st.s(0, 3) == "SCH")
                or st.contains(st.i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                or st.ch(st.i + 2) in ("T", "S")
                or ((st.i == 0 or st.ch(st.i - 1) in "AOUE")
                    and (st.ch(st.i + 2) in _L_R_N_M_B_H_F_V_W_SPACE
                         or st.i + 2 >= st.n))):
            st.add("K")
        elif st.i > 0:
            if st.s(0, 2) == "MC":                # 'mchugh'
                st.add("K")
            else:
                st.add("X", "K")
        else:
            st.add("X")
        st.i += 2
        return
    if st.s(st.i, 2) == "CZ" and st.s(st.i - 2, 4) != "WICZ":
        st.add("S", "X")                          # 'czerny'
        st.i += 2
        return
    if st.s(st.i + 1, 3) == "CIA":                # 'focaccia'
        st.add("X")
        st.i += 3
        return
    # double 'C' but not 'McClellan'
    if st.s(st.i, 2) == "CC" and not (st.i == 1 and st.ch(0) == "M"):
        if st.ch(st.i + 2) in "IEH" and st.s(st.i + 2, 2) != "HU":
            # 'bellocchio' but not 'bacchus'
            if ((st.i == 1 and st.ch(st.i - 1) == "A")
                    or st.contains(st.i - 1, 5, "UCCEE", "UCCES")):
                st.add("KS")                      # 'accident', 'succeed'
            else:
                st.add("X")                       # 'bacci', 'bertucci'
            st.i += 3
        else:                                     # 'pierce's rule'
            st.add("K")
            st.i += 2
        return
    if st.s(st.i, 2) in ("CK", "CG", "CQ"):
        st.add("K")
        st.i += 2
        return
    if st.s(st.i, 2) in ("CI", "CE", "CY"):
        if st.s(st.i, 3) in ("CIO", "CIE", "CIA"):  # italian vs. english
            st.add("S", "X")
        else:
            st.add("S")
        st.i += 2
        return
    st.add("K")
    if st.s(st.i + 1, 2) in (" C", " Q", " G"):   # 'mac caffrey', 'mac gregor'
        st.i += 3
    elif st.ch(st.i + 1) in "CKQ" and st.s(st.i + 1, 2) not in ("CE", "CI"):
        st.i += 2
    else:
        st.i += 1


def _handle_g(st: _State):
    w = st.w
    if st.ch(st.i + 1) == "H":
        if st.i > 0 and not st.is_vowel(st.i - 1):
            st.add("K")
            st.i += 2
            return
        if st.i == 0:
            if st.ch(st.i + 2) == "I":            # 'ghislane'
                st.add("J")
            else:                                 # 'ghost'
                st.add("K")
            st.i += 2
            return
        # Parker's rule (with some further refinements) - e.g. 'hugh'
        if ((st.i > 1 and st.ch(st.i - 2) in "BHD")
                or (st.i > 2 and st.ch(st.i - 3) in "BHD")
                or (st.i > 3 and st.ch(st.i - 4) in "BH")):
            st.i += 2
            return
        # e.g. 'laugh', 'McLaughlin', 'cough', 'gough', 'rough', 'tough'
        if st.i > 2 and st.ch(st.i - 1) == "U" and st.ch(st.i - 3) in "CGLRT":
            st.add("F")
        elif st.i > 0 and st.ch(st.i - 1) != "I":
            st.add("K")
        st.i += 2
        return
    if st.ch(st.i + 1) == "N":
        if st.i == 1 and st.is_vowel(0) and not _slavo_germanic(w):
            st.primary.append("KN")
            st.alternate.append("N")
        elif st.s(st.i + 2, 2) != "EY" and st.ch(st.i + 1) != "Y" \
                and not _slavo_germanic(w):
            st.primary.append("N")                # 'tagliaro'
            st.alternate.append("KN")
        else:
            st.add("KN")
        st.i += 2
        return
    if st.s(st.i + 1, 2) == "LI" and not _slavo_germanic(w):
        st.primary.append("KL")
        st.alternate.append("L")
        st.i += 2
        return
    # -ges-, -gep-, -gel-, -gie- at beginning
    if st.i == 0 and (st.ch(st.i + 1) == "Y"
                      or st.s(st.i + 1, 2) in _ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER):
        st.add("K", "J")
        st.i += 2
        return
    # -ger-, -gy-
    if ((st.s(st.i + 1, 2) == "ER" or st.ch(st.i + 1) == "Y")
            and st.s(0, 6) not in ("DANGER", "RANGER", "MANGER")
            and st.ch(st.i - 1) not in "EI"
            and st.s(st.i - 1, 3) not in ("RGY", "OGY")):
        st.add("K", "J")
        st.i += 2
        return
    # italian e.g. 'biaggi'
    if st.ch(st.i + 1) in "EIY" or st.s(st.i - 1, 4) in ("AGGI", "OGGI"):
        # obvious germanic
        if (st.s(0, 4) in ("VAN ", "VON ") or st.s(0, 3) == "SCH"
                or st.s(st.i + 1, 2) == "ET"):
            st.add("K")
        elif st.s(st.i + 1, 4) == "IER " or st.i + 5 == st.n \
                and st.s(st.i + 1, 3) == "IER":
            st.add("J")
        else:
            st.add("J", "K")
        st.i += 2
        return
    st.add("K")
    st.i += 2 if st.ch(st.i + 1) == "G" else 1


def _handle_j(st: _State):
    w = st.w
    # obvious spanish, 'jose', 'san jacinto'
    if st.s(st.i, 4) == "JOSE" or st.s(0, 4) == "SAN ":
        if (st.i == 0 and st.ch(st.i + 4) == " ") or st.n == 4 \
                or st.s(0, 4) == "SAN ":
            st.add("H")
        else:
            st.add("J", "H")
        st.i += 1
        return
    if st.i == 0:
        st.add("J", "A")                          # 'yankelovich' / 'jankelowicz'
    elif (st.is_vowel(st.i - 1) and not _slavo_germanic(w)
          and st.ch(st.i + 1) in "AO"):
        # spanish pron. of e.g. 'bajador'
        st.add("J", "H")
    elif st.i == st.n - 1:
        st.primary.append("J")
        st.alternate.append("")
    elif st.ch(st.i + 1) not in _L_T_K_S_N_M_B_Z \
            and st.ch(st.i - 1) not in "SKL":
        st.add("J")
    st.i += 2 if st.ch(st.i + 1) == "J" else 1


def _handle_s(st: _State):
    w = st.w
    # special cases 'island', 'isle', 'carlisle', 'carlysle'
    if st.s(st.i - 1, 3) in ("ISL", "YSL"):
        st.i += 1
        return
    # special case 'sugar-'
    if st.i == 0 and st.s(st.i, 5) == "SUGAR":
        st.add("X", "S")
        st.i += 1
        return
    if st.s(st.i, 2) == "SH":
        if st.s(st.i + 1, 4) in ("HEIM", "HOEK", "HOLM", "HOLZ"):
            st.add("S")                           # germanic
        else:
            st.add("X")
        st.i += 2
        return
    # italian & armenian
    if st.s(st.i, 3) in ("SIO", "SIA") or st.s(st.i, 4) == "SIAN":
        if _slavo_germanic(w):
            st.add("S")
        else:
            st.add("S", "X")
        st.i += 3
        return
    # german & anglicisations e.g. 'smith' match 'schmidt', 'snider'/'schneider'
    if (st.i == 0 and st.ch(st.i + 1) in "MNLW") or st.ch(st.i + 1) == "Z":
        st.add("S", "X")
        st.i += 2 if st.ch(st.i + 1) == "Z" else 1
        return
    if st.s(st.i, 2) == "SC":
        if st.ch(st.i + 2) == "H":
            # Schlesinger's rule
            if st.s(st.i + 3, 2) in ("OO", "ER", "EN", "UY", "ED", "EM"):
                if st.s(st.i + 3, 2) in ("ER", "EN"):
                    st.primary.append("X")        # 'schermerhorn', 'schenker'
                    st.alternate.append("SK")
                else:
                    st.add("SK")
            elif st.i == 0 and not st.is_vowel(3) and st.ch(3) != "W":
                st.add("X", "S")
            else:
                st.add("X")
        elif st.ch(st.i + 2) in "IEY":
            st.add("S")
        else:
            st.add("SK")
        st.i += 3
        return
    # french e.g. 'resnais', 'artois'
    if st.i == st.n - 1 and st.s(st.i - 2, 2) in ("AI", "OI"):
        st.primary.append("")
        st.alternate.append("S")
    else:
        st.add("S")
    st.i += 2 if st.ch(st.i + 1) in "SZ" else 1


def _handle_t(st: _State):
    if st.s(st.i, 4) == "TION" or st.s(st.i, 3) in ("TIA", "TCH"):
        st.add("X")
        st.i += 3
        return
    if st.s(st.i, 2) == "TH" or st.s(st.i, 3) == "TTH":
        # special case 'thomas', 'thames' or germanic
        if (st.s(st.i + 2, 2) in ("OM", "AM")
                or st.s(0, 4) in ("VAN ", "VON ") or st.s(0, 3) == "SCH"):
            st.add("T")
        else:
            st.add("0", "T")
        st.i += 2
        return
    st.add("T")
    st.i += 2 if st.ch(st.i + 1) in "TD" else 1


def _handle_w(st: _State):
    w = st.w
    if st.s(st.i, 2) == "WR":                     # can also be in middle of word
        st.add("R")
        st.i += 2
        return
    if st.i == 0 and (st.is_vowel(st.i + 1) or st.s(st.i, 2) == "WH"):
        if st.is_vowel(st.i + 1):                 # Wasserman should match Vasserman
            st.add("A", "F")
        else:
            st.add("A")                           # need Uomo to match Womo
        st.i += 1
        return
    # Arnow should match Arnoff
    if ((st.i == st.n - 1 and st.is_vowel(st.i - 1))
            or st.contains(st.i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or st.s(0, 3) == "SCH"):
        st.primary.append("")
        st.alternate.append("F")
        st.i += 1
        return
    # polish e.g. 'filipowicz'
    if st.s(st.i, 4) in ("WICZ", "WITZ"):
        st.add("TS", "FX")
        st.i += 4
        return
    st.i += 1                                     # else skip it


def double_metaphone_inject(tokens: list[str], max_code_len: int = 4,
                            inject: bool = True) -> list[str]:
    """DoubleMetaphoneFilter token semantics (DoubleMetaphoneFilter.java:
    36-90): per token, emit [token?] + primary + (alternate if different);
    a token producing no code passes through unchanged even with
    inject=False."""
    out: list[str] = []
    for t in tokens:
        p, a = double_metaphone(t, max_code_len)
        if not p and not a:
            out.append(t)
            continue
        if inject:
            out.append(t)
        if p:
            out.append(p)
        if a and a != p:
            out.append(a)
    return out
