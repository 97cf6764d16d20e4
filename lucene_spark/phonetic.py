"""Phonetic encoders beyond Soundex/RefinedSoundex (filters.py) and
Double Metaphone (metaphone.py): the remaining PhoneticFilterFactory
encoder set and the Daitch-Mokotoff soundex.

Reference: ``analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java`` + ``PhoneticFilterFactory.java`` (which
dispatch to the commons-codec encoders) and
``DaitchMokotoffSoundexFilter.java:60`` (multi-code branching).  Each
encoder here is written from its published algorithm description
(Philips 1990 Metaphone; Hood 2004 Caverphone 2.0; Taft 1970 NYSIIS;
Postel 1969 Kölner Phonetik; the Daitch-Mokotoff coding chart) and
verified against the reference's own TestPhoneticFilter /
TestDaitchMokotoffSoundexFilter goldens in tests/test_phonetic.py.
"""

from __future__ import annotations

import re

__all__ = ["metaphone", "caverphone2", "nysiis", "cologne_phonetic",
           "daitch_mokotoff", "phonetic_inject"]

_VOWELS = "AEIOU"


# ---------------------------------------------------------------------------
# Metaphone (Philips 1990, the commons-codec variant: default max code 4,
# duplicate letters collapsed except C)
# ---------------------------------------------------------------------------

def metaphone(token: str, max_code_len: int = 4) -> str:
    w = "".join(c for c in token.upper() if c.isalpha())
    if not w:
        return ""
    if len(w) == 1:
        return w
    # initial-pair exceptions
    first2 = w[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = "S" + w[1:]
    elif first2 == "WH":
        w = "W" + w[2:]

    out = []
    n = len(w)
    i = 0
    while i < n and len(out) < max_code_len:
        c = w[i]
        # duplicate letters are skipped except C
        if c != "C" and i > 0 and w[i - 1] == c:
            i += 1
            continue
        nxt = w[i + 1] if i + 1 < n else ""
        nxt2 = w[i + 2] if i + 2 < n else ""
        prev = w[i - 1] if i > 0 else ""
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                # -SCH- hardens to K; initial CH also K unless a vowel
                # follows (commons-codec: CH at 0 with non-vowel after = K)
                if prev == "S":
                    out.append("K")
                elif i == 0 and n > 2 and nxt2 not in _VOWELS:
                    out.append("K")
                else:
                    out.append("X")
            elif nxt and nxt in "IEY":
                if prev == "S":
                    pass  # -SCI/SCE/SCY-: the C is dropped
                else:
                    out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "IEY":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            silent = (nxt == "H" and not (i + 2 >= n or nxt2 in _VOWELS))
            if nxt == "N" and (i + 1 == n - 1
                               or (nxt2 == "E" and w[i + 2:i + 4] == "ED"
                                   and i + 3 == n - 1)):
                silent = True
            if prev == "G":  # -GG-: the first G already handled
                silent = False
            if not silent:
                if nxt and nxt in "IEY" and prev != "G":
                    out.append("J")
                else:
                    out.append("K")
        elif c == "H":
            if prev and prev in _VOWELS and not (nxt and nxt in _VOWELS):
                pass  # silent after vowel with no vowel after
            elif prev and prev in "CSPTG":
                pass  # part of a digraph already coded
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if prev != "C":
                out.append("K")
        elif c == "P":
            out.append("F" if nxt == "H" else "P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
            elif nxt == "I" and nxt2 and nxt2 in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "H":
                out.append("0")
            elif nxt == "I" and nxt2 and nxt2 in "OA":
                out.append("X")
            elif nxt == "C" and nxt2 == "H":
                pass  # -TCH-: the CH codes it
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c in "WY":
            if nxt and nxt in _VOWELS:
                out.append(c)
        elif c == "X":
            out.append("K")
            out.append("S")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out)[:max_code_len]


# ---------------------------------------------------------------------------
# Caverphone 2.0 (Hood 2004) — fixed-length 10, padded with 1
# ---------------------------------------------------------------------------

_CV2_STEPS = (
    ("e$", ""),
    ("^cough", "cou2f"), ("^rough", "rou2f"), ("^tough", "tou2f"),
    ("^enough", "enou2f"), ("^trough", "trou2f"), ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
    ("^[aeiou]", "A"), ("[aeiou]", "3"),
    ("j", "y"), ("^y3", "Y3"), ("^y", "A"), ("y", "3"),
    ("3gh3", "3kh3"), ("gh", "22"), ("g", "k"),
    ("s+", "S"), ("t+", "T"), ("p+", "P"), ("k+", "K"), ("f+", "F"),
    ("m+", "M"), ("n+", "N"),
    ("w3", "W3"), ("wh3", "Wh3"), ("w$", "3"), ("w", "2"),
    ("^h", "A"), ("h", "2"),
    ("r3", "R3"), ("r$", "3"), ("r", "2"),
    ("l3", "L3"), ("l$", "3"), ("l", "2"),
    ("2", ""), ("3$", "A"), ("3", ""),
)


def caverphone2(token: str) -> str:
    w = re.sub("[^a-z]", "", token.lower())
    for pat, repl in _CV2_STEPS:
        w = re.sub(pat, repl, w)
    return (w + "1" * 10)[:10]


# ---------------------------------------------------------------------------
# NYSIIS (Taft 1970, commons-codec strict variant: key truncated to 6)
# ---------------------------------------------------------------------------

def nysiis(token: str, strict: bool = True) -> str:
    w = "".join(c for c in token.upper() if c.isalpha())
    if not w:
        return ""
    # first-characters transcode
    for pat, repl in (("^MAC", "MCC"), ("^KN", "NN"), ("^K", "C"),
                      ("^PH", "FF"), ("^PF", "FF"), ("^SCH", "SSS")):
        w2 = re.sub(pat, repl, w)
        if w2 != w:
            w = w2
            break
    # last-characters transcode
    for pat, repl in (("(EE|IE)$", "Y"), ("(DT|RT|RD|NT|ND)$", "D")):
        w2 = re.sub(pat, repl, w)
        if w2 != w:
            w = w2
            break
    key = [w[0]]
    s = list(w)
    i = 1
    n = len(s)
    while i < n:
        nxt = s[i + 1] if i + 1 < n else ""
        if s[i] == "E" and nxt == "V":
            s[i:i + 2] = ["A", "F"]
        elif s[i] in _VOWELS:
            s[i] = "A"
        elif s[i] == "Q":
            s[i] = "G"
        elif s[i] == "Z":
            s[i] = "S"
        elif s[i] == "M":
            s[i] = "N"
        elif s[i] == "K":
            if nxt == "N":
                s[i] = "N"
            else:
                s[i] = "C"
        elif "".join(s[i:i + 3]) == "SCH":
            s[i:i + 3] = ["S", "S", "S"]
        elif "".join(s[i:i + 2]) == "PH":
            s[i:i + 2] = ["F", "F"]
        elif s[i] == "H" and (s[i - 1] not in _VOWELS
                              or (nxt and nxt not in _VOWELS)):
            s[i] = s[i - 1]
        elif s[i] == "W" and s[i - 1] in _VOWELS:
            s[i] = s[i - 1]
        if s[i] != key[-1]:
            key.append(s[i])
        i += 1
    out = "".join(key)
    if out.endswith("S") and len(out) > 1:
        out = out[:-1]
    if out.endswith("AY"):
        out = out[:-2] + "Y"
    if out.endswith("A") and len(out) > 1:
        out = out[:-1]
    return out[:6] if strict else out


# ---------------------------------------------------------------------------
# Kölner Phonetik (Postel 1969)
# ---------------------------------------------------------------------------

def cologne_phonetic(token: str) -> str:
    w = (token.upper().replace("Ä", "A").replace("Ö", "O")
         .replace("Ü", "U").replace("ß", "SS"))
    w = "".join(c for c in w if c.isalpha())
    n = len(w)
    codes = []
    for i, c in enumerate(w):
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i + 1 < n else ""
        if c in "AEIOUJY":
            code = "0"
        elif c == "B":
            code = "1"
        elif c == "P":
            code = "3" if nxt == "H" else "1"
        elif c in "DT":
            code = "8" if (nxt and nxt in "CSZ") else "2"
        elif c in "FVW":
            code = "3"
        elif c in "GKQ":
            code = "4"
        elif c == "C":
            if i == 0:
                code = "4" if (nxt and nxt in "AHKLOQRUX") else "8"
            elif prev in "SZ":
                code = "8"
            else:
                code = "4" if (nxt and nxt in "AHKOQUX") else "8"
        elif c == "X":
            code = "8" if (prev and prev in "CKQ") else "48"
        elif c == "L":
            code = "5"
        elif c in "MN":
            code = "6"
        elif c == "R":
            code = "7"
        elif c in "SZ":
            code = "8"
        elif c == "H":
            code = "-"
        else:
            code = "-"
        codes.append(code)
    # collapse duplicates, drop H, drop non-initial 0
    out = []
    for i, code in enumerate("".join(codes)):
        if code == "-":
            continue
        if out and out[-1] == code:
            continue
        out.append(code)
    return "".join(c for i, c in enumerate(out)
                   if c != "0" or i == 0)


# ---------------------------------------------------------------------------
# Daitch-Mokotoff soundex — the published coding chart with branching
# alternatives; 6-digit codes, the DaitchMokotoffSoundexFilter emits
# every branch (DaitchMokotoffSoundexFilter.java:60)
# ---------------------------------------------------------------------------

# pattern -> (initial, before-vowel, other); each slot is a tuple of
# branch alternatives; "" = not coded
_DM_RULES = [
    ("SCHTSCH", ("2",), ("4",), ("4",)), ("SCHTSH", ("2",), ("4",), ("4",)),
    ("SCHTCH", ("2",), ("4",), ("4",)),
    ("SHTCH", ("2",), ("4",), ("4",)), ("SHTSH", ("2",), ("4",), ("4",)),
    ("SHCH", ("2",), ("4",), ("4",)),
    ("SCHT", ("2",), ("43",), ("43",)), ("SCHD", ("2",), ("43",), ("43",)),
    ("SCH", ("4",), ("4",), ("4",)),
    ("SHT", ("2",), ("43",), ("43",)), ("SZCZ", ("2",), ("4",), ("4",)),
    ("SZCS", ("2",), ("4",), ("4",)),
    ("SZT", ("2",), ("43",), ("43",)), ("SHD", ("2",), ("43",), ("43",)),
    ("SZD", ("2",), ("43",), ("43",)),
    ("SH", ("4",), ("4",), ("4",)), ("STCH", ("2",), ("4",), ("4",)),
    ("STSCH", ("2",), ("4",), ("4",)), ("STRZ", ("2",), ("4",), ("4",)),
    ("STRS", ("2",), ("4",), ("4",)), ("STSH", ("2",), ("4",), ("4",)),
    ("SC", ("2",), ("4",), ("4",)),
    ("ST", ("2",), ("43",), ("43",)), ("SD", ("2",), ("43",), ("43",)),
    ("SZ", ("4",), ("4",), ("4",)),
    ("TCH", ("4",), ("4",), ("4",)), ("TTCH", ("4",), ("4",), ("4",)),
    ("TTSCH", ("4",), ("4",), ("4",)), ("TH", ("3",), ("3",), ("3",)),
    ("TRZ", ("4",), ("4",), ("4",)), ("TRS", ("4",), ("4",), ("4",)),
    ("TSCH", ("4",), ("4",), ("4",)), ("TSH", ("4",), ("4",), ("4",)),
    ("TTS", ("4",), ("4",), ("4",)), ("TTSZ", ("4",), ("4",), ("4",)),
    ("TC", ("4",), ("4",), ("4",)), ("TZS", ("4",), ("4",), ("4",)),
    ("TSZ", ("4",), ("4",), ("4",)), ("TTZ", ("4",), ("4",), ("4",)),
    ("TZ", ("4",), ("4",), ("4",)), ("TS", ("4",), ("4",), ("4",)),
    ("CZS", ("4",), ("4",), ("4",)), ("CSZ", ("4",), ("4",), ("4",)),
    ("CZ", ("4",), ("4",), ("4",)), ("CS", ("4",), ("4",), ("4",)),
    ("CHS", ("5",), ("54",), ("54",)),
    ("CH", ("5", "4"), ("5", "4"), ("5", "4")),
    ("CK", ("5", "45"), ("5", "45"), ("5", "45")),
    ("C", ("5", "4"), ("5", "4"), ("5", "4")),
    ("DRZ", ("4",), ("4",), ("4",)), ("DRS", ("4",), ("4",), ("4",)),
    ("DSH", ("4",), ("4",), ("4",)), ("DSZ", ("4",), ("4",), ("4",)),
    ("DZH", ("4",), ("4",), ("4",)), ("DZS", ("4",), ("4",), ("4",)),
    ("DS", ("4",), ("4",), ("4",)), ("DZ", ("4",), ("4",), ("4",)),
    ("DT", ("3",), ("3",), ("3",)), ("D", ("3",), ("3",), ("3",)),
    ("AI", ("0",), ("1",), ("",)), ("AJ", ("0",), ("1",), ("",)),
    ("AY", ("0",), ("1",), ("",)), ("AU", ("0",), ("7",), ("",)),
    ("A", ("0",), ("",), ("",)),
    ("EI", ("0",), ("1",), ("",)), ("EJ", ("0",), ("1",), ("",)),
    ("EY", ("0",), ("1",), ("",)), ("EU", ("1",), ("1",), ("",)),
    ("E", ("0",), ("",), ("",)),
    ("FB", ("7",), ("7",), ("7",)), ("F", ("7",), ("7",), ("7",)),
    ("B", ("7",), ("7",), ("7",)),
    ("G", ("5",), ("5",), ("5",)), ("H", ("5",), ("5",), ("",)),
    ("IA", ("1",), ("",), ("",)), ("IE", ("1",), ("",), ("",)),
    ("IO", ("1",), ("",), ("",)), ("IU", ("1",), ("",), ("",)),
    ("I", ("0",), ("",), ("",)),
    ("J", ("1", "4"), ("", "4"), ("", "4")),
    ("KS", ("5",), ("54",), ("54",)), ("KH", ("5",), ("5",), ("5",)),
    ("K", ("5",), ("5",), ("5",)),
    ("L", ("8",), ("8",), ("8",)),
    ("MN", ("66",), ("66",), ("66",)), ("M", ("6",), ("6",), ("6",)),
    ("NM", ("66",), ("66",), ("66",)), ("N", ("6",), ("6",), ("6",)),
    ("OI", ("0",), ("1",), ("",)), ("OJ", ("0",), ("1",), ("",)),
    ("OY", ("0",), ("1",), ("",)), ("O", ("0",), ("",), ("",)),
    ("PF", ("7",), ("7",), ("7",)), ("PH", ("7",), ("7",), ("7",)),
    ("P", ("7",), ("7",), ("7",)),
    ("Q", ("5",), ("5",), ("5",)),
    ("RZ", ("94", "4"), ("94", "4"), ("94", "4")),
    ("RS", ("94", "4"), ("94", "4"), ("94", "4")),
    ("R", ("9",), ("9",), ("9",)),
    ("S", ("4",), ("4",), ("4",)),
    ("T", ("3",), ("3",), ("3",)),
    ("UI", ("0",), ("1",), ("",)), ("UJ", ("0",), ("1",), ("",)),
    ("UY", ("0",), ("1",), ("",)), ("UE", ("0",), ("",), ("",)),
    ("U", ("0",), ("",), ("",)),
    ("V", ("7",), ("7",), ("7",)), ("W", ("7",), ("7",), ("7",)),
    ("X", ("5",), ("54",), ("54",)), ("Y", ("1",), ("",), ("",)),
    ("ZDZ", ("2",), ("4",), ("4",)), ("ZDZH", ("2",), ("4",), ("4",)),
    ("ZHDZH", ("2",), ("4",), ("4",)),
    ("ZD", ("2",), ("43",), ("43",)), ("ZHD", ("2",), ("43",), ("43",)),
    ("ZH", ("4",), ("4",), ("4",)), ("ZSCH", ("4",), ("4",), ("4",)),
    ("ZSH", ("4",), ("4",), ("4",)), ("ZS", ("4",), ("4",), ("4",)),
    ("Z", ("4",), ("4",), ("4",)),
]
_DM_RULES.sort(key=lambda r: len(r[0]), reverse=True)
_DM_VOWELS = set("AEIOUJY")


def daitch_mokotoff(token: str) -> list[str]:
    """All Daitch-Mokotoff codes for ``token`` (the branching chart),
    each exactly 6 digits, sorted and deduplicated."""
    w = "".join(c for c in token.upper() if c.isalpha())
    if not w:
        return []
    # states: (coded-digit string, last emitted code-group or None)
    states = {("", None)}
    i, n = 0, len(w)
    while i < n:
        for pat, ini, bv, oth in _DM_RULES:
            if w.startswith(pat, i):
                j = i + len(pat)
                if i == 0:
                    alts = ini
                elif j < n and w[j] in _DM_VOWELS:
                    alts = bv
                else:
                    alts = oth
                new_states = set()
                for digits, last in states:
                    for alt in alts:
                        if alt == "":
                            # uncoded (vowel): breaks duplicate adjacency
                            new_states.add((digits, None))
                        elif alt == last:
                            new_states.add((digits, last))
                        else:
                            new_states.add((digits + alt, alt))
                states = new_states
                i = j
                break
        else:
            i += 1  # unmapped char: skipped, breaks adjacency
            states = {(d, None) for d, _ in states}
    return sorted({(d + "000000")[:6] for d, _ in states})


def phonetic_inject(tokens: list[str], encoder, inject: bool = True
                    ) -> list[str]:
    """PhoneticFilter.java stream semantics: inject=True keeps the code(s)
    ahead of the original token; inject=False replaces it (unencodable
    tokens pass through).  ``encoder`` returns a str or list of codes."""
    out: list[str] = []
    for t in tokens:
        codes = encoder(t)
        if isinstance(codes, str):
            codes = [codes] if codes else []
        codes = [c for c in codes if c and c != t]
        out.extend(codes)
        if inject or not codes:
            out.append(t)
    return out
