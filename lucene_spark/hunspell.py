"""Hunspell dictionary stemming + spell-checking — Dictionary, Stemmer,
Hunspell, and HunspellStemFilter analogs.

Reference: ``analysis/common/src/java/org/apache/lucene/analysis/hunspell/
Dictionary.java`` (affix/dic parsing: FLAG long/num/UTF-8, AF flag aliases
resolved lazily, AM morphological aliases, SET charset decoding with the
ISO8859-1 default, LANG tr/az alternate casing, CHECKSHARPS, COMPLEXPREFIXES,
SFX/PFX rules with conditions and continuation classes, NEEDAFFIX, CIRCUMFIX,
FULLSTRIP, IGNORE, ICONV/OCONV, BREAK, REP, FORBIDDENWORD, FORCEUCASE, the
COMPOUND* directive family, space-containing entries via the
``morphBoundary`` scan, hidden title-case twins dropped when a visible
homonym exists — WordStorage.java:290-302), ``Stemmer.java`` (two-stage affix
stripping with cross-product prefix+suffix chaining, COMPLEXPREFIXES
double-prefix chains, continuation-flag gating, compound-context affix
permits, UPPER/TITLE case-variation lookups with the apostrophe and sharp-S
enumerations, the dotted-İ guard), ``Hunspell.java`` (the ``spell`` walk:
simple word → compound rules → COMPOUNDFLAG/BEGIN/MIDDLE/END dictionary
compounding with CHECKCOMPOUNDCASE/DUP/TRIPLE/REP/PATTERN and
SIMPLIFIEDTRIPLE, case-variant checks with KEEPCASE enforcement, BREAK
decomposition, trailing dots, bare numbers), ``CompoundRule.java``,
``CheckCompoundPattern.java``, ``RepEntry.java``, and
``HunspellStemFilter.java`` (all unique stems at one position; tokens with
no stems pass through).

``st:`` stem exceptions (inline and via AM aliases) are applied.  The
suggestion machinery IS implemented (see the ``suggest``/``Suggester``
section below, `hunspell.py:1264+`): ModifyingSuggester (TRY/KEY/MAP edits,
case variants) and GeneratingSuggester (affix-generated dictionary-entry
candidates ranked by the reference's ngram scoring), verified byte-identical
against all 21 reference .sug suites; ``ph:`` phonetic REP entries ride the
REP table.  Everything the in-tree fixture dictionaries exercise for
stemming, spell-checking AND suggestions is implemented and verified against
the reference's own test goldens (tests/test_hunspell.py,
tests/test_hunspell_spell.py — the .sug suites live in the latter).
"""

from __future__ import annotations

import re

__all__ = ["HunspellDictionary", "hunspell_stem_filter"]

_HIDDEN = "￧"  # the HIDDEN_FLAG / 'ONLYUPCASEFLAG' analog (Dictionary.java:78)

SIMPLE_WORD = "SIMPLE_WORD"
COMPOUND_BEGIN = "COMPOUND_BEGIN"
COMPOUND_MIDDLE = "COMPOUND_MIDDLE"
COMPOUND_END = "COMPOUND_END"
COMPOUND_RULE_END = "COMPOUND_RULE_END"


def _context_allows_affix(context: str, is_prefix: bool) -> bool:
    """WordContext.isAffixAllowedWithoutSpecialPermit."""
    if is_prefix:
        return context == COMPOUND_BEGIN
    return context in (COMPOUND_END, COMPOUND_RULE_END)


class _Affix:
    __slots__ = ("flag", "cross", "strip", "append", "cont", "cond",
                 "is_prefix")

    def __init__(self, flag, cross, strip, append, cont, cond, is_prefix):
        self.flag = flag
        self.cross = cross
        self.strip = strip
        self.append = append
        self.cont = cont
        self.cond = cond
        self.is_prefix = is_prefix


def _compile_condition(cond: str, is_prefix: bool):
    """Hunspell condition → anchored regex over the ROOT (stem with the
    strip characters restored), at its start (prefix) or end (suffix).
    AffixCondition.java compiles the same predicate split across the strip
    and the de-affixed stem; testing the restored root is equivalent."""
    if cond in (".", ""):
        return None
    # unclosed [ is tolerated by Hunspell (AffixCondition.java:76-79)
    last = cond.rfind("[")
    if last >= 0 and "]" not in cond[last + 1:]:
        cond = cond + "]"
    out = []
    i = 0
    while i < len(cond):
        c = cond[i]
        if c == "[":
            j = cond.index("]", i)
            body = cond[i + 1:j]
            neg = body.startswith("^")
            if neg:
                body = body[1:]
            out.append("[" + ("^" if neg else "")
                       + body.replace("\\", "\\\\") + "]")
            i = j + 1
        elif c == ".":
            out.append(".")
            i += 1
        else:
            out.append(re.escape(c))
            i += 1
    pat = "".join(out)
    try:
        return re.compile(pat + "$") if not is_prefix \
            else re.compile("^" + pat)
    except re.error:
        return re.compile(r"(?!)")  # ALWAYS_FALSE on a bad pattern


def _java_lower(c: str) -> str:
    """Character.toLowerCase — char-level: İ (U+0130) maps to plain 'i',
    never Python's two-codepoint 'i̇'."""
    if c == "İ":
        return "i"
    low = c.lower()
    return low if len(low) == 1 else c


def _java_upper(c: str) -> str:
    up = c.upper()
    return up if len(up) == 1 else c


def _char_case(c: str) -> str:
    # WordCase.charCase: LOWER only when toUpperCase actually changes it
    # (so ß, whose char-level uppercase is itself, is NEUTRAL)
    if c.isupper():
        return "U"
    if c.islower() and _java_upper(c) != c:
        return "L"
    return "N"


def _word_case(w: str) -> str:
    """WordCase.caseOf."""
    start = _char_case(w[0])
    seen_u = seen_l = False
    for c in w[1:]:
        cc = _char_case(c)
        seen_u = seen_u or cc == "U"
        seen_l = seen_l or cc == "L"
        if seen_u and seen_l:
            break
    if seen_l and seen_u:
        return "MIXED"
    if start == "L":
        return "MIXED" if seen_u else "LOWER"
    if start == "U":
        return "UPPER" if not seen_l else "TITLE"
    return "LOWER" if seen_l else ("UPPER" if seen_u else "NEUTRAL")


def _index_of_space_or_tab(text: str, start: int) -> int:
    p1, p2 = text.find("\t", start), text.find(" ", start)
    if p1 >= 0 and p2 >= 0:
        return min(p1, p2)
    return max(p1, p2)


def _morph_boundary(line: str) -> int:
    """Dictionary.morphBoundary: the first space/tab that is a tab or is
    followed by a ``xx:`` morphological field — entries may contain
    spaces."""
    end = _index_of_space_or_tab(line, 0)
    if end == -1:
        return len(line)
    while 0 <= end < len(line):
        if line[end] == "\t" or (
                end > 0 and end + 3 < len(line)
                and line[end + 1].isalpha() and line[end + 2].isalpha()
                and line[end + 3] == ":"):
            break
        end = _index_of_space_or_tab(line, end + 1)
    if end == -1:
        return len(line)
    return end


def _decode(data, aff_bytes) -> str:
    """SET-directive decoding (Dictionary.java DEFAULT_CHARSET is
    ISO-8859-1; the .aff's SET applies to both files)."""
    if isinstance(data, str):
        return data
    enc = "latin-1"
    m = re.search(rb"^SET\s+(\S+)", aff_bytes if aff_bytes else data,
                  re.MULTILINE)
    if m:
        name = m.group(1).decode("ascii", "ignore").upper()
        enc = {"UTF-8": "utf-8", "UTF8": "utf-8",
               "ISO8859-1": "latin-1", "ISO-8859-1": "latin-1",
               "ISO8859-15": "iso8859-15", "ISO8859-2": "iso8859-2",
               "KOI8-R": "koi8-r", "CP1251": "cp1251",
               "MICROSOFT-CP1251": "cp1251"}.get(name, "latin-1")
    return data.decode(enc, "replace")


def _parse_map_entry(unparsed: str) -> list[str]:
    """Dictionary.parseMapEntry: chars, with (multi-char) groups."""
    entry = []
    j = 0
    while j < len(unparsed):
        if unparsed[j] == "(":
            closing = unparsed.index(")", j)
            entry.append(unparsed[j + 1:closing])
            j = closing + 1
        else:
            entry.append(unparsed[j])
            j += 1
    return entry


class _RepEntry:
    """RepEntry.java: a REP table row with ^/$ anchors; '_' in the
    replacement is a space."""

    def __init__(self, raw_pattern: str, raw_replacement: str):
        self.must_start = raw_pattern.startswith("^")
        self.must_end = raw_pattern.endswith("$")
        self.pattern = raw_pattern[
            1 if self.must_start else 0:
            len(raw_pattern) - (1 if self.must_end else 0)]
        self.replacement = raw_replacement.replace("_", " ")

    def is_middle(self) -> bool:
        return not self.must_start and not self.must_end

    def substitute(self, word: str) -> list[str]:
        p = self.pattern
        if self.must_start:
            ok = word == p if self.must_end else word.startswith(p)
            return [self.replacement + word[len(p):]] if ok else []
        if self.must_end:
            return [word[:len(word) - len(p)] + self.replacement] \
                if word.endswith(p) else []
        out, pos = [], word.find(p)
        while pos >= 0:
            out.append(word[:pos] + self.replacement + word[pos + len(p):])
            pos = word.find(p, pos + 1)
        return out


class _CheckCompoundPattern:
    """CheckCompoundPattern.java: a CHECKCOMPOUNDPATTERN row prohibiting
    (or, with a replacement, enabling) compounding at a boundary."""

    def __init__(self, parts: list[str], dic: "HunspellDictionary"):
        self.dic = dic

        def split(p):
            i = p.find("/")
            if i < 0:
                return p, frozenset()
            return p[:i], dic._flags(p[i + 1:])

        self.end_chars, self.end_flags = split(parts[0])
        self.begin_chars, self.begin_flags = split(parts[1])
        self.replacement = parts[2] if len(parts) > 2 else None

    def prohibits(self, tail: str, break_pos: int, root_before,
                  root_after) -> bool:
        word_b, flags_b = root_before
        word_a, flags_a = root_after
        if self.end_chars == "0":
            if not tail.startswith(word_b, break_pos - len(word_b)) \
                    or break_pos - len(word_b) < 0:
                return False
        elif break_pos - len(self.end_chars) < 0 or not tail.startswith(
                self.end_chars, break_pos - len(self.end_chars)):
            return False
        if self.begin_chars == "0":
            if not tail.startswith(word_a, break_pos):
                return False
        elif not tail.startswith(self.begin_chars, break_pos):
            return False
        if self.end_flags and not self.end_flags <= flags_b:
            return False
        if self.begin_flags and not self.begin_flags <= flags_a:
            return False
        return True

    def expand_replacement(self, word: str, pos: int):
        if self.replacement is not None and word.startswith(
                self.replacement, pos):
            return (word[:pos] + self.end_chars + self.begin_chars
                    + word[pos + len(self.replacement):])
        return None


class _CompoundRule:
    """CompoundRule.java: flag sequence with * and ? quantifiers matched
    against the homonym flag-sets of candidate compound parts."""

    def __init__(self, rule: str, dic: "HunspellDictionary"):
        data: list[str] = []
        pos = 0
        while pos < len(rule):
            lp = rule.find("(", pos)
            if lp < 0:
                data.extend(dic._flag_seq(rule[pos:]))
                break
            data.extend(dic._flag_seq(rule[pos:lp]))
            rp = rule.index(")", lp + 1)
            data.extend(dic._flag_seq(rule[lp + 1:rp]))
            pos = rp + 1
            if pos < len(rule) and rule[pos] in "?*":
                data.append(rule[pos])
                pos += 1
        self.data = data

    @staticmethod
    def _has(word_forms, flag) -> bool:
        return any(flag in f for f in word_forms)

    def may_match(self, words) -> bool:
        return self._match(words, 0, 0, False)

    def fully_matches(self, words) -> bool:
        return self._match(words, 0, 0, True)

    def _match(self, words, pi, wi, fully) -> bool:
        data = self.data
        if pi >= len(data):
            return wi >= len(words)
        if wi >= len(words) and not fully:
            return True
        flag = data[pi]
        if pi < len(data) - 1 and data[pi + 1] == "*":
            start = wi
            while wi < len(words) and self._has(words[wi], flag):
                wi += 1
            while wi >= start:
                if self._match(words, pi + 2, wi, fully):
                    return True
                wi -= 1
            return False
        cur = wi < len(words) and self._has(words[wi], flag)
        if pi < len(data) - 1 and data[pi + 1] == "?":
            if cur and self._match(words, pi + 2, wi + 1, fully):
                return True
            return self._match(words, pi + 2, wi, fully)
        return cur and self._match(words, pi + 1, wi + 1, fully)


class HunspellDictionary:
    """Parsed .aff + .dic pair(s); ``stem``/``unique_stems`` mirror
    Stemmer.java's outputs (stem text = the looked-up form or its ``st:``
    exception, with OCONV applied) and ``spell`` mirrors Hunspell.spell.
    Inputs may be str or bytes (bytes are decoded per the .aff SET
    directive, default ISO-8859-1)."""

    def __init__(self, aff_text, *dic_texts, ignore_case: bool = False):
        aff_raw = aff_text if isinstance(aff_text, bytes) else None
        aff_text = _decode(aff_text, aff_raw)
        dic_texts = tuple(_decode(t, aff_raw) for t in dic_texts)
        self.ignore_case = ignore_case
        self.flag_mode = "char"
        self.ignore_chars = ""
        self.fullstrip = False
        self.complex_prefixes = False
        self.check_sharp_s = False
        self.alternate_casing = False
        self.needaffix = None
        self.circumfix = None
        self.onlyincompound = None
        self.keepcase = None
        self.forbiddenword = None
        self.force_ucase = None
        self.compound_flag = None
        self.compound_begin = None
        self.compound_middle = None
        self.compound_end = None
        self.compound_permit = None
        self.compound_forbid = None
        self.compound_min = 3
        self.compound_max = 1 << 30
        self.check_compound_case = False
        self.check_compound_dup = False
        self.check_compound_triple = False
        self.simplified_triple = False
        self.check_compound_rep = False
        self.compound_rules: list[_CompoundRule] = []
        self.check_compound_patterns: list[_CheckCompoundPattern] = []
        self.rep_table: list[_RepEntry] = []
        self.try_chars = ""
        self.neighbor_key_groups = ("qwertyuiop", "asdfghjkl", "zxcvbnm")
        self.enable_split_suggestions = True
        self.map_table: list[list[str]] = []
        self.max_diff = 5
        self.max_ngram_suggestions = 4
        self.only_max_diff = False
        self.no_suggest = None
        self.sub_standard = None
        self.language = None
        self._reject_nosuggest = False
        # BREAK: (starting, ending, middle); Breaks.DEFAULT is "-" in
        # all three slots (Dictionary.java:1543)
        self.breaks = (("-",), ("-",), ("-",))
        self.iconv: list[tuple[str, str]] = []
        self.oconv: list[tuple[str, str]] = []
        self.aliases: list[str] = []         # AF values, resolved lazily
        self.morph_aliases: list[str] = []   # AM values
        self.prefixes: list[_Affix] = []
        self.suffixes: list[_Affix] = []
        self._parse_aff(aff_text)
        # continuation flags that allow a second-stage strip, per affix side
        # (Dictionary.java secondStagePrefixFlags/secondStageSuffixFlags)
        self.second_stage_prefix = frozenset(
            f for a in self.prefixes for f in a.cont)
        self.second_stage_suffix = frozenset(
            f for a in self.suffixes for f in a.cont)
        # word -> [(flags, st-exception-or-None), ...]
        self.entries: dict[str, list[tuple[frozenset, str | None]]] = {}
        for t in dic_texts:
            self._parse_dic(t)
        self._drop_shadowed_hidden()

    # -- parsing ----------------------------------------------------------

    def _flag_seq(self, s: str) -> list[str]:
        """parseFlags preserving order (needed by COMPOUNDRULE)."""
        s = s.strip()
        if not s:
            return []
        if self.flag_mode == "num":
            return [p.strip() for p in s.split(",") if p.strip()]
        if self.flag_mode == "long":
            return [s[i:i + 2] for i in range(0, len(s) - 1, 2)]
        return list(s)

    def _flags(self, s: str) -> frozenset:
        if self.aliases and s.isdigit():
            idx = int(s)
            s = self.aliases[idx - 1] if 0 < idx <= len(self.aliases) else ""
        return frozenset(self._flag_seq(s))

    def _one_flag(self, s: str):
        fl = self._flag_seq(s)
        return fl[0] if fl else None

    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        af_left = am_left = 0
        i = 0
        while i < len(lines):
            raw = lines[i]
            parts = raw.split("#", 1)[0].split()
            i += 1
            if not parts:
                continue
            key = parts[0]
            if key == "AF":
                if af_left == 0 and len(parts) == 2 and parts[1].isdigit() \
                        and not self.aliases:
                    af_left = int(parts[1])
                else:
                    self.aliases.append(parts[1] if len(parts) > 1 else "")
                    af_left = max(0, af_left - 1)
            elif key == "AM":
                if am_left == 0 and len(parts) == 2 and parts[1].isdigit() \
                        and not self.morph_aliases:
                    am_left = int(parts[1])
                else:
                    self.morph_aliases.append(" ".join(parts[1:]))
                    am_left = max(0, am_left - 1)
            elif key == "FLAG" and len(parts) > 1:
                self.flag_mode = {"long": "long", "num": "num"}.get(
                    parts[1], "char")
            elif key == "IGNORE" and len(parts) > 1:
                self.ignore_chars = parts[1]
            elif key == "FULLSTRIP":
                self.fullstrip = True
            elif key == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif key == "CHECKSHARPS":
                self.check_sharp_s = True
            elif key == "LANG" and len(parts) > 1:
                self.language = parts[1]
                lang = parts[1].lower()
                self.alternate_casing = lang.startswith(("tr", "az"))
            elif key in ("NEEDAFFIX", "PSEUDOROOT") and len(parts) > 1:
                self.needaffix = self._one_flag(parts[1])
            elif key == "CIRCUMFIX" and len(parts) > 1:
                self.circumfix = self._one_flag(parts[1])
            elif key == "ONLYINCOMPOUND" and len(parts) > 1:
                self.onlyincompound = self._one_flag(parts[1])
            elif key == "KEEPCASE" and len(parts) > 1:
                self.keepcase = self._one_flag(parts[1])
            elif key == "FORBIDDENWORD" and len(parts) > 1:
                self.forbiddenword = self._one_flag(parts[1])
            elif key == "FORCEUCASE" and len(parts) > 1:
                self.force_ucase = self._one_flag(parts[1])
            elif key == "COMPOUNDFLAG" and len(parts) > 1:
                self.compound_flag = self._one_flag(parts[1])
            elif key == "COMPOUNDBEGIN" and len(parts) > 1:
                self.compound_begin = self._one_flag(parts[1])
            elif key == "COMPOUNDMIDDLE" and len(parts) > 1:
                self.compound_middle = self._one_flag(parts[1])
            elif key == "COMPOUNDEND" and len(parts) > 1:
                self.compound_end = self._one_flag(parts[1])
            elif key == "COMPOUNDPERMITFLAG" and len(parts) > 1:
                self.compound_permit = self._one_flag(parts[1])
            elif key == "COMPOUNDFORBIDFLAG" and len(parts) > 1:
                self.compound_forbid = self._one_flag(parts[1])
            elif key == "COMPOUNDMIN" and len(parts) > 1:
                self.compound_min = max(1, int(parts[1]))
            elif key == "COMPOUNDWORDMAX" and len(parts) > 1:
                self.compound_max = max(1, int(parts[1]))
            elif key == "COMPOUNDRULE" and len(parts) > 1:
                if not parts[1].isdigit():
                    self.compound_rules.append(
                        _CompoundRule(parts[1], self))
            elif key == "CHECKCOMPOUNDCASE":
                self.check_compound_case = True
            elif key == "CHECKCOMPOUNDDUP":
                self.check_compound_dup = True
            elif key == "CHECKCOMPOUNDTRIPLE":
                self.check_compound_triple = True
            elif key == "SIMPLIFIEDTRIPLE":
                self.simplified_triple = True
            elif key == "CHECKCOMPOUNDREP":
                self.check_compound_rep = True
            elif key == "CHECKCOMPOUNDPATTERN" and len(parts) > 2:
                self.check_compound_patterns.append(
                    _CheckCompoundPattern(parts[1:], self))
            elif key == "REP" and len(parts) > 2:
                self.rep_table.append(_RepEntry(parts[1], parts[2]))
            elif key == "TRY" and len(parts) > 1:
                self.try_chars = parts[1]
            elif key == "KEY" and len(parts) > 1:
                self.neighbor_key_groups = tuple(parts[1].split("|"))
            elif key == "NOSPLITSUGS":
                self.enable_split_suggestions = False
            elif key == "MAXNGRAMSUGS" and len(parts) > 1:
                self.max_ngram_suggestions = int(parts[1])
            elif key == "MAXDIFF" and len(parts) > 1:
                self.max_diff = int(parts[1])
            elif key == "ONLYMAXDIFF":
                self.only_max_diff = True
            elif key == "NOSUGGEST" and len(parts) > 1:
                self.no_suggest = self._one_flag(parts[1])
            elif key == "SUBSTANDARD" and len(parts) > 1:
                self.sub_standard = self._one_flag(parts[1])
            elif key == "MAP" and len(parts) > 1:
                if not (parts[1].isdigit() and len(parts) == 2
                        and not self.map_table):
                    self.map_table.append(_parse_map_entry(parts[1]))
            elif key == "BREAK" and len(parts) > 1:
                if parts[1].isdigit():
                    n = int(parts[1])
                    starting, ending, middle = [], [], []
                    for _ in range(n):
                        bp = lines[i].split("#", 1)[0].split()
                        i += 1
                        if len(bp) < 2:
                            continue
                        b = bp[1]
                        if b.startswith("^"):
                            starting.append(b[1:])
                        elif b.endswith("$"):
                            ending.append(b[:-1])
                        else:
                            middle.append(b)
                    self.breaks = (tuple(starting), tuple(ending),
                                   tuple(middle))
            elif key in ("ICONV", "OCONV") and len(parts) > 2:
                (self.iconv if key == "ICONV" else self.oconv).append(
                    (parts[1], parts[2]))
            elif key in ("PFX", "SFX") and len(parts) >= 4:
                flag_txt, cross = parts[1], parts[2] == "Y"
                if parts[3].isdigit() and len(parts) == 4:
                    # header line: the next <count> lines are rules
                    for _ in range(int(parts[3])):
                        rp = lines[i].split("#", 1)[0].split()
                        i += 1
                        strip = "" if rp[2] == "0" else rp[2]
                        app = rp[3]
                        cont: frozenset = frozenset()
                        # split append/continuation at the last unescaped /
                        m = re.match(r"^(.*?[^\\])/(.*)$", app)
                        if m and app != "/":
                            app, cont = m.group(1), self._flags(m.group(2))
                        app = app.replace("\\/", "/")
                        if app == "0":
                            app = ""
                        cond = rp[4] if len(rp) > 4 else "."
                        flag = self._one_flag(flag_txt)
                        is_pfx = key == "PFX"
                        self._add(_Affix(flag, cross, strip, app, cont,
                                         _compile_condition(cond, is_pfx),
                                         is_pfx))

    def _add(self, a: _Affix) -> None:
        (self.prefixes if a.is_prefix else self.suffixes).append(a)

    def _split_morph(self, morph: str) -> list[str]:
        """Dictionary.splitMorphData: resolve a whole-field AM alias, keep
        only ``xx:`` fields."""
        if self.morph_aliases:
            t = morph.strip()
            if t.isdigit():
                idx = int(t)
                if 0 < idx <= len(self.morph_aliases):
                    morph = self.morph_aliases[idx - 1]
        return [f for f in morph.split()
                if len(f) > 3 and f[0].isalpha() and f[1].isalpha()
                and f[2] == ":"]

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for line in lines[start:]:
            if not line or line[0] == "#" or line[0] == "\t":
                continue
            line = line.rstrip("\r\n")
            if not line.strip():
                continue
            end = _morph_boundary(line)
            head, morph = line[:end], line[end:].strip()
            # unescapeEntry: process escapes; the first unescaped '/' after
            # position 0 is the flag separator
            word_chars: list[str] = []
            flag_part = None
            j = 0
            while j < len(head):
                ch = head[j]
                if ch == "\\" and j + 1 < len(head):
                    word_chars.append(head[j + 1])
                    j += 2
                elif ch == "/" and j > 0 and flag_part is None:
                    flag_part = ""
                    j += 1
                elif flag_part is not None:
                    flag_part += ch
                    j += 1
                else:
                    word_chars.append(ch)
                    j += 1
            word = "".join(word_chars)
            flags = self._flags(flag_part) if flag_part else frozenset()
            # the st: morphological field replaces the reported stem
            # (Stemmer.stemException; fields are sorted before the search)
            st = None
            fields = self._split_morph(morph)
            for field in fields:
                if field.startswith("ph:"):
                    self._add_phonetic_rep(
                        "".join(word_chars), field[3:])
            for field in sorted(fields):
                if field.startswith("st:"):
                    st = field[3:]
                    break
            word = self._clean(word)
            if not word:
                continue
            self.entries.setdefault(word, []).append((flags, st))
            wc = _word_case(word)
            if wc == "MIXED" or (wc == "UPPER" and flag_part):
                # hidden title-cased twin (Dictionary.addHiddenCapitalizedWord)
                hidden = _java_upper(word[0]) + "".join(
                    self._case_fold(c) for c in word[1:])
                if hidden != word:
                    self.entries.setdefault(hidden, []).append(
                        (flags | {_HIDDEN}, st))

    def _drop_shadowed_hidden(self) -> None:
        """WordStorage.Builder.flushGroup: hidden title-case twins are
        dropped when the same word also has a real (non-hidden) entry."""
        for word, forms in self.entries.items():
            if any(_HIDDEN not in f for f, _ in forms) \
                    and any(_HIDDEN in f for f, _ in forms):
                self.entries[word] = [e for e in forms if _HIDDEN not in e[0]]

    # -- input cleaning / case variants -----------------------------------

    def _case_fold(self, c: str) -> str:
        """Dictionary.caseFold: LANG tr/az remaps the dotted/dotless i."""
        if self.alternate_casing:
            if c == "I":
                return "ı"
            if c == "İ":
                return "i"
        return _java_lower(c)

    def _strip_ignored(self, w: str) -> str:
        for ch in self.ignore_chars:
            w = w.replace(ch, "")
        return w

    def _clean(self, w: str) -> str:
        w = self._strip_ignored(w)
        for src, dst in self.iconv:
            w = w.replace(src, dst)
        if self.ignore_case:
            w = "".join(self._case_fold(c) for c in w)
        return w

    def _oconv(self, w: str) -> str:
        for src, dst in self.oconv:
            w = w.replace(src, dst)
        return w

    # -- stemming ----------------------------------------------------------

    def stem(self, word: str) -> list[str]:
        w = self._clean(word)
        if not w:
            return []
        out: list[str] = []

        def collect(root, flags, st, last_affix):
            out.append(st if st is not None else root)
            return True

        self._walk(w, SIMPLE_WORD, collect)
        # Stemmer.caseOf: ignoreCase or lowercase start → no variants
        if not self.ignore_case and not w[0].islower():
            wc = _word_case(w)
            if wc in ("UPPER", "TITLE"):
                for variant, _oc in self._case_variants(w, wc):
                    self._walk(variant, SIMPLE_WORD, collect)
        return [self._oconv(s) for s in out]

    def _case_variants(self, w: str, wc: str):
        """Stemmer.varyCase as a generator of (variant, originalCase-or-
        None-for-sharpS) in the reference's order."""
        title = w
        if wc == "UPPER":
            title = w[0] + "".join(self._case_fold(c) for c in w[1:])
            apos = self._capitalize_after_apostrophe(title)
            if apos is not None:
                yield apos, wc
            yield title, wc
            if self.check_sharp_s:
                yield from ((v, None)
                            for v in self._sharp_s_variants(title))
        if w[0] == "İ" and not self.alternate_casing:
            return  # isDotICaseChangeDisallowed
        lower = self._case_fold(title[0]) + title[1:]
        yield lower, wc
        if wc == "UPPER" and self.check_sharp_s:
            yield from ((v, None) for v in self._sharp_s_variants(lower))

    @staticmethod
    def _capitalize_after_apostrophe(w: str):
        """Stemmer.capitalizeAfterApostrophe: SANT'ELIA → Sant'Elia; only
        the first apostrophe-capitalizable position."""
        for i in range(1, len(w) - 1):
            if w[i] == "'":
                nxt = w[i + 1]
                upper = _java_upper(nxt)
                if upper != nxt:
                    return w[:i + 1] + upper + w[i + 2:]
        return None

    @staticmethod
    def _sharp_s_variants(w: str) -> list[str]:
        """Stemmer.varySharpS: every ss→ß replacement combination (bounded
        at 5 sites), the unchanged word excluded."""
        def replace_ss(start: int, depth: int):
            if depth > 5:
                return [w[start:]]
            ss = w.find("ss", start)
            if ss < 0 or ss + 1 >= len(w):
                return None
            prefix = w[start:ss]
            tails = replace_ss(ss + 2, depth + 1)
            if tails is None:
                tails = [w[ss + 2:]]
            res = []
            for t in tails:
                res.append(prefix + "ss" + t)
                res.append(prefix + "ß" + t)
            return res

        variants = replace_ss(0, 0)
        return [v for v in variants if v != w] if variants else []

    def unique_stems(self, word: str) -> list[str]:
        seen, out = set(), []
        for s in self.stem(word):
            key = s.lower() if self.ignore_case else s
            if key not in seen:
                seen.add(key)
                out.append(s)
        return out

    def _has(self, flags: frozenset, flag) -> bool:
        return flag is not None and flag in flags

    # -- the root walk (Stemmer.doStem/stem/applyAffix) --------------------

    def _root_compatible(self, context: str, last_affix, flags) -> bool:
        """Stemmer.isRootCompatibleWithContext."""
        if context == SIMPLE_WORD and self._has(flags, self.onlyincompound):
            return False
        if context in (COMPOUND_BEGIN, COMPOUND_MIDDLE, COMPOUND_END):
            required = {COMPOUND_BEGIN: self.compound_begin,
                        COMPOUND_MIDDLE: self.compound_middle,
                        COMPOUND_END: self.compound_end}[context]
            return self._has(flags, required) \
                or (last_affix is not None
                    and self._has(last_affix.cont, required)) \
                or self._has(flags, self.compound_flag) \
                or (last_affix is not None
                    and self._has(last_affix.cont, self.compound_flag))
        return True

    def _walk(self, w: str, context: str, processor) -> bool:
        """Stemmer.doStem: direct entries, then the affix walk.  The
        processor(root, flags, st, last_affix) returns False to stop;
        returns whether the walk ran to completion."""
        for flags, st in self.entries.get(w, ()):
            if self._has(flags, self.needaffix):
                continue
            if context in (COMPOUND_BEGIN, COMPOUND_MIDDLE) \
                    and self._has(flags, self.compound_forbid):
                return False
            if not self._root_compatible(context, None, flags):
                continue
            if not processor(w, flags, st, None):
                return False
        return self._stem(w, context, previous=None, prev_flag=None,
                          prefix_affix=None, depth=0, do_prefix=True,
                          prev_was_prefix=False, processor=processor)

    def _stem(self, w, context, previous, prev_flag, prefix_affix, depth,
              do_prefix, prev_was_prefix, processor) -> bool:
        if do_prefix:
            for a in self.prefixes:
                if a is previous or not w.startswith(a.append):
                    continue
                if a.append == w and not self.fullstrip:
                    continue
                # prefixes pass previousWasPrefix=false (Stemmer.java:399)
                if not self._compatible(a, prev_flag, depth, False, context):
                    continue
                root = a.strip + w[len(a.append):]
                if not root:
                    continue
                if a.cond is not None and not a.cond.search(root):
                    continue
                if not self._apply(root, a, previous, prefix_affix, depth,
                                   context, processor):
                    return False
        for a in self.suffixes:
            if a is previous or not w.endswith(a.append):
                continue
            if a.append == w and not self.fullstrip:
                continue
            if not self._compatible(a, prev_flag, depth, prev_was_prefix,
                                    context):
                continue
            root = w[:len(w) - len(a.append)] + a.strip
            if not root:
                continue
            if a.cond is not None and not a.cond.search(root):
                continue
            if not self._apply(root, a, previous, prefix_affix, depth,
                               context, processor):
                return False
        return True

    def _compatible(self, a: _Affix, prev_flag, depth, prev_was_prefix,
                    context) -> bool:
        """Stemmer.isAffixCompatible."""
        if context in (COMPOUND_BEGIN, COMPOUND_MIDDLE, COMPOUND_END,
                       COMPOUND_RULE_END):
            if not a.is_prefix and self._has(a.cont, self.compound_forbid):
                return False
            if not _context_allows_affix(context, a.is_prefix) \
                    and not self._has(a.cont, self.compound_permit):
                return False
            if context == COMPOUND_END and not a.is_prefix \
                    and not prev_was_prefix \
                    and self._has(a.cont, self.onlyincompound):
                return False
        elif self._has(a.cont, self.onlyincompound):
            return False
        if depth == 0:
            return True
        if a.cross:
            return prev_was_prefix or (prev_flag is not None
                                       and prev_flag in a.cont)
        return False

    def _needs_another(self, a: _Affix, previous, prefix_affix) -> bool:
        """Stemmer.needsAnotherAffix."""
        circ = self.circumfix
        if not a.is_prefix and circ is not None:
            in_prefix = prefix_affix is not None and circ in prefix_affix.cont
            if in_prefix != (circ in a.cont):
                return True
        if self._has(a.cont, self.needaffix):
            return a.is_prefix or previous is None \
                or self._has(previous.cont, self.needaffix)
        return False

    def _apply(self, root, a, previous, prefix_affix, depth, context,
               processor) -> bool:
        """Stemmer.applyAffix."""
        if not self._needs_another(a, previous, prefix_affix):
            for flags, st in self.entries.get(root, ()):
                ok = a.flag in flags or (
                    prefix_affix is not None and a.flag in prefix_affix.cont)
                if not ok:
                    continue
                # with COMPLEXPREFIXES the first prefix was already chained
                # against the second, not the word (Stemmer.java:590)
                chained = (self.complex_prefixes and depth == 1
                           and a.is_prefix)
                if not chained and prefix_affix is not None \
                        and prefix_affix.flag not in flags \
                        and prefix_affix.flag not in a.cont:
                    continue
                if not self._root_compatible(context, a, flags):
                    continue
                if not processor(root, flags, st, a):
                    return False
        if a.cross and depth <= 1:
            if depth == 0:
                if a.is_prefix:
                    prefix_affix = a
                    do_prefix = self.complex_prefixes and \
                        a.flag in self.second_stage_prefix
                elif not self.complex_prefixes \
                        and a.flag in self.second_stage_suffix:
                    do_prefix = False
                else:
                    return True
            else:
                do_prefix = False
                if a.is_prefix and self.complex_prefixes:
                    prefix_affix = a
                elif a.is_prefix or self.complex_prefixes \
                        or a.flag not in self.second_stage_suffix:
                    return True
            return self._stem(root, context, a, a.flag, prefix_affix,
                              depth + 1, do_prefix, a.is_prefix, processor)
        return True

    # -- spell-checking (Hunspell.java) ------------------------------------

    def spell(self, word: str) -> bool:
        """Hunspell.spell."""
        if not word:
            return True
        word = self._clean(word)
        if not word:
            return True
        if word.endswith("."):
            return self._spell_with_trailing_dots(word)
        return self._spell_clean(word)

    def _spell_with_trailing_dots(self, word: str) -> bool:
        length = len(word) - 1
        while length > 0 and word[length - 1] == ".":
            length -= 1
        return self._spell_clean(word[:length]) \
            or self._spell_clean(word[:length + 1])

    def _spell_clean(self, word: str) -> bool:
        if _is_number(word):
            return True
        simple = self._check_simple_word(word, None)
        if simple is not None:
            return simple
        if self._check_compounds_entry(word, None):
            return True
        wc = "MIXED" if (self.ignore_case or not word
                         or word[0].islower()) else _word_case(word)
        if wc in ("UPPER", "TITLE"):
            for variant, oc in self._case_variants(word, wc):
                if self._check_word(variant, oc):
                    return True
        starting, ending, middle = self.breaks
        if (starting or ending or middle) \
                and not self._too_many_break_occurrences(word):
            return self._try_breaks(word)
        return False

    def _check_word(self, word: str, original_case) -> bool:
        simple = self._check_simple_word(word, original_case)
        if simple is not None:
            return simple
        return self._check_compounds_entry(word, original_case)

    def _check_simple_word(self, word: str, original_case):
        """Hunspell.checkSimpleWord: True/False for a found root (False =
        forbidden), None when no root exists."""
        root = self._find_stem(word, original_case, SIMPLE_WORD)
        if root is not None:
            return not self._has(root[1], self.forbiddenword)
        return None

    def _find_stem(self, word: str, original_case, context: str):
        """Hunspell.findStem: the first acceptable root (text, flags), or
        None.  A KEEPCASE violation on a non-hidden entry aborts."""
        check_case = context not in (COMPOUND_MIDDLE, COMPOUND_END)
        result = []

        def proc(root, flags, st, last_affix):
            if check_case and not self._accept_case(original_case, flags,
                                                    root):
                return _HIDDEN in flags
            # the suggestion speller rejects NOSUGGEST/SUBSTANDARD roots
            # (Hunspell.doSuggest acceptsStem override) but still stops
            if not (self._reject_nosuggest
                    and (self._has(flags, self.no_suggest)
                         or self._has(flags, self.sub_standard))):
                result.append((root, flags))
            return False

        self._walk(word, context, proc)
        return result[0] if result else None

    def _accept_case(self, original_case, flags, root: str) -> bool:
        """Hunspell.acceptCase."""
        keep = self._has(flags, self.keepcase)
        if original_case is not None:
            if keep and self.check_sharp_s and original_case == "TITLE" \
                    and "ß" in root:
                return True
            return not keep
        return _HIDDEN not in flags

    # compound checking (Hunspell.checkCompounds and friends)

    def _check_compounds_entry(self, word: str, original_case) -> bool:
        if self.compound_rules and self._check_compound_rules(
                word, 0, len(word), []):
            return True
        if self.compound_begin is not None or self.compound_flag is not None:
            return self._check_compounds(word, 0, len(word), original_case,
                                         None)
        return False

    def _check_compounds(self, s: str, off: int, ln: int, original_case,
                         prev) -> bool:
        if prev is not None and prev["index"] > self.compound_max - 2:
            return False
        limit = ln - self.compound_min + 1
        for break_pos in range(self.compound_min, limit):
            context = COMPOUND_BEGIN if prev is None else COMPOUND_MIDDLE
            break_off = off + break_pos
            if self._may_break_into(s, off, ln, break_off):
                stem = self._find_stem(s[off:off + break_pos],
                                       original_case, context)
                if stem is None and self.simplified_triple \
                        and s[break_off - 1] == s[break_off]:
                    stem = self._find_stem(s[off:off + break_pos + 1],
                                           original_case, context)
                if stem is not None \
                        and not self._has(stem[1], self.forbiddenword) \
                        and (prev is None or self._may_compound(
                            prev, stem, break_pos, original_case)):
                    part = {"prev": prev, "s": s, "off": off, "ln": ln,
                            "length": break_pos, "root": stem,
                            "pattern": None,
                            "index": 1 if prev is None
                            else prev["index"] + 1}
                    if self._check_compounds_after(original_case, part):
                        return True
            if self._check_compound_pattern_replacements(
                    s, off, ln, break_pos, original_case, prev):
                return True
        return False

    def _check_compound_pattern_replacements(self, s, off, ln, pos,
                                             original_case, prev) -> bool:
        word = s[off:off + ln]
        for pattern in self.check_compound_patterns:
            expanded = pattern.expand_replacement(word, pos)
            if expanded is not None:
                context = COMPOUND_BEGIN if prev is None else COMPOUND_MIDDLE
                break_pos = pos + len(pattern.end_chars)
                stem = self._find_stem(expanded[:break_pos], original_case,
                                       context)
                if stem is not None:
                    part = {"prev": prev, "s": expanded, "off": 0,
                            "ln": len(expanded), "length": break_pos,
                            "root": stem, "pattern": pattern,
                            "index": 1 if prev is None
                            else prev["index"] + 1}
                    if self._check_compounds_after(original_case, part):
                        return True
        return False

    def _check_compounds_after(self, original_case, part) -> bool:
        s, off, ln = part["s"], part["off"], part["ln"]
        break_pos = part["length"]
        remaining = ln - break_pos
        break_off = off + break_pos
        last = self._find_stem(s[break_off:break_off + remaining],
                               original_case, COMPOUND_END)
        if last is not None \
                and not self._has(last[1], self.forbiddenword) \
                and not (self.check_compound_dup
                         and part["root"] == last) \
                and not self._force_ucase_problem(last, original_case, s) \
                and self._may_compound(part, last, remaining, original_case):
            return True
        return self._check_compounds(s, break_off, remaining, original_case,
                                     part)

    def _force_ucase_problem(self, root, original_case, s: str) -> bool:
        if original_case in ("TITLE", "UPPER"):
            return False
        if original_case is None and s[:1].isupper():
            return False
        return self._has(root[1], self.force_ucase)

    def _may_compound(self, part, next_root, next_len,
                      original_case) -> bool:
        """CompoundPart.mayCompound."""
        tail = part["s"][part["off"]:part["off"] + part["ln"]]
        length = part["length"]
        enabler = part["pattern"]
        if enabler is not None:
            if not enabler.prohibits(tail, length, part["root"], next_root):
                return False
        elif any(p.prohibits(tail, length, part["root"], next_root)
                 for p in self.check_compound_patterns):
            return False
        if self.check_compound_rep and self._misspelled_simple_word(
                tail[:length + next_len], original_case):
            return False
        space_separated = tail[:length] + " " + tail[length:length + next_len]
        return self._check_simple_word(space_separated, None) is not True

    def _misspelled_simple_word(self, word: str, original_case) -> bool:
        for entry in self.rep_table:
            if entry.is_middle():
                for sug in entry.substitute(word):
                    if self._find_stem(sug, original_case,
                                       SIMPLE_WORD) is not None:
                        return True
        return False

    def _may_break_into(self, s: str, off: int, ln: int,
                        break_pos: int) -> bool:
        """Hunspell.mayBreakIntoCompounds."""
        if self.check_compound_case:
            a, b = s[break_pos - 1], s[break_pos]
            if (a.isupper() or b.isupper()) and a != "-" and b != "-":
                return False
        if self.check_compound_triple and s[break_pos - 1] == s[break_pos]:
            if (break_pos > off + 1
                    and s[break_pos - 2] == s[break_pos - 1]) \
                    or (break_pos < ln - 1
                        and s[break_pos] == s[break_pos + 1]):
                return False
        return True

    def _check_compound_rules(self, s: str, off: int, ln: int,
                              words: list) -> bool:
        """Hunspell.checkCompoundRules: each element of ``words`` is the
        homonym flag-set list of a chosen prefix part."""
        if len(words) >= 100:
            return False
        limit = ln - self.compound_min + 1
        for break_pos in range(self.compound_min, limit):
            forms = self.entries.get(s[off:off + break_pos])
            if forms:
                words.append([f for f, _ in forms])
                if any(r.may_match(words) for r in self.compound_rules):
                    if self._check_last_compound_part(
                            s, off + break_pos, ln - break_pos, words):
                        words.pop()
                        return True
                    if self._check_compound_rules(
                            s, off + break_pos, ln - break_pos, words):
                        words.pop()
                        return True
                words.pop()
        return False

    def _check_last_compound_part(self, s: str, start: int, ln: int,
                                  words: list) -> bool:
        found = []

        def proc(root, flags, st, last_affix):
            probe = words + [[flags]]
            if any(r.fully_matches(probe) for r in self.compound_rules):
                found.append(True)
                return False
            return True

        self._walk(s[start:start + ln], COMPOUND_RULE_END, proc)
        return bool(found)

    # BREAK decomposition

    def _try_breaks(self, word: str) -> bool:
        starting, ending, middle = self.breaks
        for br in starting:
            if len(word) > len(br) and word.startswith(br):
                if self.spell(word[len(br):]):
                    return True
        for br in ending:
            if len(word) > len(br) and word.endswith(br):
                if self.spell(word[:len(word) - len(br)]):
                    return True
        for br in middle:
            pos = word.find(br)
            if self._can_be_broken_at(word, br, pos):
                return True
            # the second occurrence recognizes dictionary words containing
            # the break string (Hunspell.tryBreaks)
            if pos > 0 and self._can_be_broken_at(
                    word, br, word.find(br, pos + 1)):
                return True
        return False

    def _too_many_break_occurrences(self, word: str) -> bool:
        occurrences = 0
        for br in self.breaks[2]:
            pos = 0
            while (pos := word.find(br, pos)) >= 0:
                occurrences += 1
                if occurrences >= 10:
                    return True
                pos += len(br)
        return False

    def _can_be_broken_at(self, word: str, br: str, pos: int) -> bool:
        return (pos > 0 and pos < len(word) - len(br)
                and self.spell(word[:pos])
                and self.spell(word[pos + len(br):]))



    # -- language / case helpers for suggestions ----------------------------

    def _has_language(self, *codes) -> bool:
        if not self.language:
            return False
        code = re.split("[_-]", self.language)[0].lower()
        return code in codes

    def _to_lower(self, w: str) -> str:
        return "".join(self._case_fold(c) for c in w)

    def _to_title(self, w: str) -> str:
        return _java_upper(w[0]) + self._to_lower(w[1:]) if w else w

    def _add_phonetic_rep(self, word: str, ph: str) -> None:
        """Dictionary.addPhoneticRepEntries: ``ph:`` morphological fields
        become REP rows used by the suggesters."""
        arrow = ph.find("->")
        if arrow > 0:
            pattern, replacement = ph[:arrow], ph[arrow + 2:]
        else:
            pattern, replacement = ph, word
        if pattern.endswith("*") and len(pattern) > 2 \
                and len(replacement) > 1:
            pattern = pattern[:-2]
            replacement = replacement[:-1]
        if word and _word_case(word) == "TITLE" \
                and _word_case(pattern) == "LOWER":
            if self._has_language("de", "hu"):
                self.rep_table.append(
                    _RepEntry(pattern, self._to_lower(replacement)))
            self.rep_table.append(
                _RepEntry(self._to_title(pattern), replacement))
        self.rep_table.append(_RepEntry(pattern, replacement))

    # -- suggestions (Hunspell.suggest + ModifyingSuggester +
    #    GeneratingSuggester) ------------------------------------------------

    def suggest(self, word: str) -> list[str]:
        """Hunspell.suggest (NO_TIMEOUT policy)."""
        if len(word) >= 100:
            return []
        word = self._clean(word)
        word_case = _word_case(word) if word else "NEUTRAL"
        if self.force_ucase is not None and word_case == "LOWER":
            title = self._to_title(word)
            if self.spell(title):
                return [title]
        suggestions: dict[str, None] = {}
        self._reject_nosuggest = True
        try:
            has_good = self._modifying_suggest(word, word_case, suggestions)
            if not has_good and self.max_ngram_suggestions > 0:
                for s in self._generating_suggest(self._to_lower(word),
                                                  word_case, suggestions):
                    suggestions[s] = None
            if "-" in word and not any("-" in s for s in suggestions):
                for s in self._modify_chunks_between_dashes(word):
                    suggestions[s] = None
        finally:
            self._reject_nosuggest = False
        return self._postprocess(word, word_case, suggestions)

    def _postprocess(self, word, word_case, suggestions) -> list[str]:
        result: dict[str, None] = {}
        for candidate in suggestions:
            result[self._adjust_suggestion_case(candidate, word_case,
                                                word)] = None
            if word_case == "UPPER" and self.check_sharp_s \
                    and "ß" in candidate:
                result[candidate] = None
        return [self._oconv(s) for s in result]

    def _adjust_suggestion_case(self, candidate, original_case,
                                original) -> str:
        if original_case == "UPPER":
            upper = candidate.upper()
            if " " in upper or self.spell(upper):
                return upper
        if original[:1].isupper():
            title = _java_upper(candidate[0]) + candidate[1:] \
                if candidate else candidate
            if " " in title or self.spell(title):
                return title
        return candidate

    def _modify_chunks_between_dashes(self, word: str) -> list[str]:
        result = []
        chunk_start = 0
        while chunk_start < len(word):
            chunk_end = word.find("-", chunk_start)
            if chunk_end < 0:
                chunk_end = len(word)
            if chunk_end > chunk_start:
                chunk = word[chunk_start:chunk_end]
                if not self.spell(chunk):
                    for chunk_sug in self.suggest(chunk):
                        replaced = word[:chunk_start] + chunk_sug \
                            + word[chunk_end:]
                        if self.spell(replaced):
                            result.append(replaced)
            chunk_start = chunk_end + 1
        return result

    # ModifyingSuggester.java

    _MAX_CHAR_DISTANCE = 4

    def _modifying_suggest(self, word, word_case, result) -> bool:
        low = self._to_lower(word) if word_case != "LOWER" else word
        if word_case in ("UPPER", "MIXED"):
            self._try_suggestion(low, result)
        has_good = self._try_variations_of(word, result)
        if word_case == "TITLE":
            has_good |= self._try_variations_of(low, result)
        elif word_case == "UPPER":
            has_good |= self._try_variations_of(low, result)
            has_good |= self._try_variations_of(self._to_title(word), result)
        elif word_case == "MIXED":
            dot = word.find(".")
            if 0 < dot < len(word) - 1 \
                    and _word_case(word[dot + 1:]) == "TITLE":
                result[word[:dot + 1] + " " + word[dot + 1:]] = None
            capitalized = word[:1].isupper()
            if capitalized:
                has_good |= self._try_variations_of(
                    self._case_fold(word[0]) + word[1:], result)
            has_good |= self._try_variations_of(low, result)
            if capitalized:
                has_good |= self._try_variations_of(self._to_title(low),
                                                    result)
            adjusted: list[str] = []
            for candidate in result:
                s = self._capitalize_after_space(word, candidate)
                if s == candidate:
                    adjusted.append(s)
                else:
                    adjusted.insert(0, s)
            result.clear()
            for s in adjusted:
                result[s] = None
        return has_good

    @staticmethod
    def _capitalize_after_space(misspelled, candidate) -> str:
        space = candidate.find(" ")
        tail = len(candidate) - space - 1
        if space > 0 and misspelled[len(misspelled) - tail:] \
                != candidate[space + 1:]:
            return candidate[:space + 1] \
                + _java_upper(candidate[space + 1]) + candidate[space + 2:]
        return candidate

    def _try_variations_of(self, word, result) -> bool:
        has_good = self._try_suggestion(word.upper(), result)
        has_good |= self._try_rep(word, result)
        if self.map_table:
            self._enumerate_map_replacements(word, "", 0, result)
        self._try_swapping_chars(word, result)
        self._try_long_swap(word, result)
        self._try_neighbor_keys(word, result)
        self._try_removing_char(word, result)
        self._try_adding_char(word, result)
        self._try_moving_char(word, result)
        self._try_replacing_char(word, result)
        self._try_two_duplicate_chars(word, result)
        good_split = self._check_dictionary_for_split_suggestions(word)
        if good_split:
            copy = list(result)
            result.clear()
            for s in good_split:
                result[s] = None
            if has_good:
                for s in copy:
                    result[s] = None
            has_good = True
        if not has_good and self.enable_split_suggestions:
            self._try_splitting(word, result)
        return has_good

    def _try_suggestion(self, candidate, result) -> bool:
        if self._check_word(candidate, None) and candidate not in result:
            result[candidate] = None
            return True
        return False

    def _try_rep(self, word, result) -> bool:
        before = len(result)
        for entry in self.rep_table:
            for candidate in entry.substitute(word):
                if self._try_suggestion(candidate, result):
                    continue
                if " " in candidate and all(
                        self._check_simple_word(p, None) is True
                        for p in candidate.split(" ")):
                    result[candidate] = None
        return len(result) > before

    def _enumerate_map_replacements(self, word, accumulated, offset,
                                    result) -> None:
        if offset == len(word):
            self._try_suggestion(accumulated, result)
            return
        for entries in self.map_table:
            for entry in entries:
                if word.startswith(entry, offset):
                    for replacement in entries:
                        if replacement != entry:
                            self._enumerate_map_replacements(
                                word, accumulated + replacement,
                                offset + len(entry), result)
        self._enumerate_map_replacements(word, accumulated + word[offset],
                                         offset + 1, result)

    def _try_swapping_chars(self, word, result) -> None:
        n = len(word)
        for i in range(n - 1):
            self._try_suggestion(
                word[:i] + word[i + 1] + word[i] + word[i + 2:], result)
        if n in (4, 5):
            # ahev -> have, owudl -> would
            cand = list(word)
            cand[0], cand[1] = word[1], word[0]
            cand[n - 1], cand[n - 2] = word[n - 2], word[n - 1]
            self._try_suggestion("".join(cand), result)
            if n == 5:
                cand[0] = word[0]
                cand[1] = word[2]
                cand[2] = word[1]
                self._try_suggestion("".join(cand), result)

    def _try_neighbor_keys(self, word, result) -> None:
        for i, c in enumerate(word):
            up = _java_upper(c)
            if up != c:
                self._try_suggestion(word[:i] + up + word[i + 1:], result)
            for group in self.neighbor_key_groups:
                if c in group:
                    for g in group:
                        if g != c:
                            self._try_suggestion(
                                word[:i] + g + word[i + 1:], result)

    def _try_long_swap(self, word, result) -> None:
        for i in range(len(word)):
            for j in range(i + 2,
                           min(len(word), i + self._MAX_CHAR_DISTANCE + 1)):
                self._try_suggestion(
                    word[:i] + word[j] + word[i + 1:j] + word[i]
                    + word[j + 1:], result)

    def _try_removing_char(self, word, result) -> None:
        if len(word) == 1:
            return
        for i in range(len(word)):
            self._try_suggestion(word[:i] + word[i + 1:], result)

    def _try_adding_char(self, word, result) -> None:
        for i in range(len(word) + 1):
            for c in self.try_chars:
                self._try_suggestion(word[:i] + c + word[i:], result)

    def _try_moving_char(self, word, result) -> None:
        for i in range(len(word)):
            prefix = word[:i]
            for j in range(i + 2,
                           min(len(word), i + self._MAX_CHAR_DISTANCE + 1)):
                self._try_suggestion(
                    prefix + word[i + 1:j] + word[i] + word[j:], result)
                self._try_suggestion(
                    prefix + word[j] + word[i:j] + word[j + 1:], result)
            if i < len(word) - 1:
                self._try_suggestion(prefix + word[i + 1:] + word[i], result)

    def _try_replacing_char(self, word, result) -> None:
        for i in range(len(word)):
            for c in self.try_chars:
                if c != word[i]:
                    self._try_suggestion(word[:i] + c + word[i + 1:], result)

    def _try_two_duplicate_chars(self, word, result) -> None:
        # vacation -> vacacation
        dup_len = 0
        for i in range(2, len(word)):
            if word[i] == word[i - 2]:
                dup_len += 1
                if dup_len == 3 or (dup_len == 2 and i >= 4):
                    self._try_suggestion(word[:i - 1] + word[i + 1:], result)
                    dup_len = 0
            else:
                dup_len = 0

    def _check_dictionary_for_split_suggestions(self, word) -> list[str]:
        out = []
        for i in range(1, len(word) - 1):
            w1, w2 = word[:i], word[i:]
            spaced = w1 + " " + w2
            if self._check_word(spaced, None):
                out.append(spaced)
            if self._should_split_by_dash():
                dashed = w1 + "-" + w2
                if self._check_word(dashed, None):
                    out.append(dashed)
        return out

    def _try_splitting(self, word, result) -> None:
        for i in range(1, len(word)):
            w1, w2 = word[:i], word[i:]
            if self._check_simple_word(w1, None) is True \
                    and self._check_simple_word(w2, None) is True:
                result[w1 + " " + w2] = None
                if len(w1) > 1 and len(w2) > 1 \
                        and self._should_split_by_dash():
                    result[w1 + "-" + w2] = None

    def _should_split_by_dash(self) -> bool:
        return "-" in self.try_chars or "a" in self.try_chars

    # GeneratingSuggester.java

    def _generating_suggest(self, word, original_case,
                            prev_suggestions) -> list[str]:
        roots = self._find_similar_roots(word, original_case)
        expanded = self._expand_roots(word, roots)
        ranked = self._rank_by_similarity(word, expanded)
        return self._most_relevant(ranked, prev_suggestions)

    def _find_similar_roots(self, word, original_case):
        ignore_title = original_case == "LOWER" \
            and not self._has_language("de")
        scored = []
        for root in sorted(self.entries):
            if abs(len(root) - len(word)) > 4:
                continue
            suitable = [
                (root, flags, st)
                for flags, st in self.entries[root]
                if not (self._has(flags, self.forbiddenword)
                        or self._has(flags, self.no_suggest)
                        or _HIDDEN in flags
                        or self._has(flags, self.onlyincompound))]
            if not suitable:
                continue
            if ignore_title and _word_case(root) == "TITLE":
                continue
            lower = self._to_lower(root)
            sc = _ngram_score(3, word, lower, False) \
                - max(len(lower) - len(word) - 2, 0) \
                + _common_prefix(word, root)
            for entry in suitable:
                scored.append((sc, entry))
        scored.sort(key=lambda t: (-t[0], t[1][0]))
        return scored[:100]

    def _expand_roots(self, misspelled, roots):
        # minimum acceptable score from three mangled self-comparisons
        thresh = 0
        for sp in range(1, 4):
            mw = list(misspelled)
            for k in range(sp, len(misspelled), 4):
                mw[k] = "*"
            thresh += _any_mismatch_ngram(len(misspelled), misspelled,
                                          "".join(mw), False)
        thresh = thresh // 3 - 1
        expanded: dict[tuple, None] = {}
        for sc_root, (root, flags, _st) in roots:
            for guess in self._expand_root(root, flags, misspelled):
                lower = self._to_lower(guess)
                sc = _any_mismatch_ngram(len(misspelled), misspelled,
                                         lower, False) \
                    + _common_prefix(misspelled, guess)
                if sc > thresh:
                    expanded[(guess, sc)] = None
        ranked = sorted(expanded, key=lambda t: (-t[1], t[0]))
        return ranked[:200]

    def _expand_root(self, root, flags, misspelled) -> list[str]:
        cross_products = []
        result: dict[str, None] = {}
        if not self._has(flags, self.needaffix):
            result[root] = None

        def affix_ok(a):
            return a.flag in flags \
                and not self._has(a.cont, self.needaffix) \
                and not self._has(a.cont, self.circumfix) \
                and not self._has(a.cont, self.onlyincompound)

        for a in self.suffixes:
            if not misspelled.endswith(a.append):
                continue
            if not affix_ok(a):
                continue
            stem = root[:len(root) - len(a.strip)] if a.strip else root
            if a.cond is not None and not a.cond.search(root):
                continue
            if a.strip and not root.endswith(a.strip):
                continue
            with_suffix = stem + (a.append or
                                  misspelled[len(misspelled):])
            result[with_suffix] = None
            if a.cross:
                cross_products.append(with_suffix)
        for a in self.prefixes:
            if not misspelled.startswith(a.append) or not a.cross:
                continue
            if a.flag not in flags:
                continue
            for suffixed in cross_products:
                if a.strip and not suffixed.startswith(a.strip):
                    continue
                if a.cond is not None and not a.cond.search(suffixed):
                    continue
                result[a.append + suffixed[len(a.strip):]] = None
        for a in self.prefixes:
            if not misspelled.startswith(a.append):
                continue
            if not affix_ok(a):
                continue
            if a.strip and not root.startswith(a.strip):
                continue
            if a.cond is not None and not a.cond.search(root):
                continue
            result[a.append + root[len(a.strip):]] = None
        return list(result)[:100]

    def _rank_by_similarity(self, word, expanded):
        fact = (10.0 - self.max_diff) / 5.0
        ranked = []
        for guess, base in expanded:
            lower = self._to_lower(guess)
            if lower == word:
                ranked.append((base + 2000, guess))
                break
            re_score = _any_mismatch_ngram(2, word, lower, True) \
                + _any_mismatch_ngram(2, lower, word, True)
            score = (2 * _lcs_len(word, lower)
                     - abs(len(word) - len(lower))
                     + _common_char_position_score(word, lower)
                     + _common_prefix(word, lower)
                     + _any_mismatch_ngram(4, word, lower, False)
                     + re_score
                     + (-1000 if re_score < (len(word) + len(lower)) * fact
                        else 0))
            ranked.append((score, guess))
        ranked.sort(key=lambda t: (-t[0], t[1]))
        return ranked

    def _most_relevant(self, ranked, prev_suggestions) -> list[str]:
        result: list[str] = []
        has_excellent = False
        for score, guess in ranked:
            if score > 1000:
                has_excellent = True
            elif has_excellent:
                break  # leave only excellent suggestions, if any
            bad = score < -100
            if bad and (result or self.only_max_diff):
                break
            if not any(p in guess for p in prev_suggestions) \
                    and not any(r in guess for r in result) \
                    and self._check_word(guess, None):
                result.append(guess)
                if len(result) >= self.max_ngram_suggestions:
                    break
            if bad:
                break
        return result

def _common_prefix(s1: str, s2: str) -> int:
    i = 0
    limit = min(len(s1), len(s2))
    while i < limit and s1[i] == s2[i]:
        i += 1
    return i


def _ngram_score(n: int, s1: str, s2: str, weighted: bool) -> int:
    """GeneratingSuggester.ngramScore."""
    l1 = len(s1)
    score = 0
    last_starts = [0] * l1
    for j in range(1, n + 1):
        ns = 0
        for i in range(l1 - j + 1):
            if last_starts[i] >= 0:
                pos = s2.find(s1[i:i + j], last_starts[i])
                last_starts[i] = pos
                if pos >= 0:
                    ns += 1
                    continue
            if weighted:
                ns -= 1
                if i == 0 or i == l1 - j:
                    ns -= 1  # side weight
        score += ns
        if ns < 2 and not weighted:
            break
    return score


def _any_mismatch_ngram(n: int, s1: str, s2: str, weighted: bool) -> int:
    return _ngram_score(n, s1, s2, weighted) \
        - max(abs(len(s2) - len(s1)) - 2, 0)


def _lcs_len(s1: str, s2: str) -> int:
    lengths = [0] * (len(s2) + 1)
    for i in range(1, len(s1) + 1):
        prev = 0
        for j in range(1, len(s2) + 1):
            cur = lengths[j]
            lengths[j] = prev + 1 if s1[i - 1] == s2[j - 1] \
                else max(cur, lengths[j - 1])
            prev = cur
    return lengths[len(s2)]


def _common_char_position_score(s1: str, s2: str) -> int:
    num = 0
    diff = 0
    diff_pos = [-1, -1]
    i = 0
    for i in range(min(len(s1), len(s2))):
        if s1[i] == s2[i]:
            num += 1
        else:
            if diff < 2:
                diff_pos[diff] = i
            diff += 1
    common = 1 if num > 0 else 0
    end = min(len(s1), len(s2))
    if diff == 2 and end == len(s1) and end == len(s2) \
            and s1[diff_pos[0]] == s2[diff_pos[1]] \
            and s1[diff_pos[1]] == s2[diff_pos[0]]:
        return common + 10
    return common


def _is_number(s: str) -> bool:
    """Hunspell.isNumber: digits with single . , - separators inside."""
    i = 0
    while i < len(s):
        c = s[i]
        if c.isdigit() and c.isascii():
            i += 1
        elif c in ".,-":
            if i == 0 or i >= len(s) - 1 or not (
                    s[i + 1].isdigit() and s[i + 1].isascii()):
                return False
            i += 2
        else:
            return False
    return bool(s)


def hunspell_stem_filter(dictionary: HunspellDictionary,
                         tokens: list[str], longest_only: bool = False
                         ) -> tuple[list[str], list[int]]:
    """HunspellStemFilter.java stream semantics: all unique stems of a
    token share its position; a token with no stems passes through; with
    ``longest_only`` only the longest stem(s) survive."""
    out: list[str] = []
    poss: list[int] = []
    for pos, t in enumerate(tokens):
        stems = dictionary.unique_stems(t)
        if not stems:
            stems = [t]
        elif longest_only:
            top = max(len(s) for s in stems)
            stems = [s for s in stems if len(s) == top]
        for s in stems:
            out.append(s)
            poss.append(pos)
    return out, poss
