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

``st:`` stem exceptions (inline and via AM aliases) are applied.  Documented
subset: the suggestion machinery (ModifyingSuggester/GeneratingSuggester,
``ph:`` phonetic REP entries, MAP/KEY/TRY) is out of scope; everything the
in-tree fixture dictionaries exercise for *stemming and spell-checking* is
implemented and verified against the reference's own test goldens
(tests/test_hunspell.py, tests/test_hunspell_spell.py).
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
            for field in sorted(self._split_morph(morph)):
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
