"""Hunspell dictionary stemming — Dictionary + Stemmer + HunspellStemFilter
analogs.

Reference: ``analysis/common/src/java/org/apache/lucene/analysis/hunspell/
Dictionary.java`` (affix/dic parsing: FLAG long/num/UTF-8, AF flag aliases
resolved lazily, AM morphological aliases, SET charset decoding with the
ISO8859-1 default, LANG tr/az alternate casing, CHECKSHARPS, COMPLEXPREFIXES,
SFX/PFX rules with conditions and continuation classes, NEEDAFFIX, CIRCUMFIX,
FULLSTRIP, IGNORE, ICONV/OCONV, space-containing entries via the
``morphBoundary`` scan, hidden title-case twins dropped when a visible
homonym exists — WordStorage.java:290-302), ``Stemmer.java`` (two-stage affix
stripping with cross-product prefix+suffix chaining, COMPLEXPREFIXES
double-prefix chains, continuation-flag gating, UPPER/TITLE case-variation
lookups with the apostrophe and sharp-S enumerations, the dotted-İ guard)
and ``HunspellStemFilter.java`` (all unique stems at one position; tokens
with no stems pass through).

``st:`` stem exceptions (inline and via AM aliases) are applied; KEEPCASE is
parsed but — like the reference Stemmer — not enforced (it gates
spellchecking, not stemming).  Documented subset: compounding
(COMPOUNDFLAG/COMPOUNDRULE) and the suggestion machinery are out of scope;
everything the in-tree fixture dictionaries exercise for *stemming* is
implemented and verified against the reference's own test goldens
(tests/test_hunspell.py).
"""

from __future__ import annotations

import re

__all__ = ["HunspellDictionary", "hunspell_stem_filter"]

_HIDDEN = "￧"  # the HIDDEN_FLAG / 'ONLYUPCASEFLAG' analog (Dictionary.java:78)


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


class HunspellDictionary:
    """Parsed .aff + .dic pair(s); ``stem``/``unique_stems`` mirror
    Stemmer.java's outputs (stem text = the looked-up form or its ``st:``
    exception, with OCONV applied).  Inputs may be str or bytes (bytes are
    decoded per the .aff SET directive, default ISO-8859-1)."""

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

    def _flags(self, s: str) -> frozenset:
        if self.aliases and s.isdigit():
            idx = int(s)
            s = self.aliases[idx - 1] if 0 < idx <= len(self.aliases) else ""
        if self.flag_mode == "num":
            return frozenset(p.strip() for p in s.split(",") if p.strip())
        if self.flag_mode == "long":
            return frozenset(s[i:i + 2] for i in range(0, len(s) - 1, 2))
        return frozenset(s)

    def _one_flag(self, s: str):
        fl = self._flags(s)
        return next(iter(fl)) if fl else None

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
        self._do_stem(w, out)
        # Stemmer.caseOf: ignoreCase or lowercase start → no variants
        if not self.ignore_case and not w[0].islower():
            wc = _word_case(w)
            if wc in ("UPPER", "TITLE"):
                self._vary_case(w, wc, out)
        return [self._oconv(s) for s in out]

    def _vary_case(self, w: str, wc: str, out: list[str]) -> None:
        """Stemmer.varyCase."""
        title = w
        if wc == "UPPER":
            title = w[0] + "".join(self._case_fold(c) for c in w[1:])
            apos = self._capitalize_after_apostrophe(title)
            if apos is not None:
                self._do_stem(apos, out)
            self._do_stem(title, out)
            if self.check_sharp_s:
                self._vary_sharp_s(title, out)
        if w[0] == "İ" and not self.alternate_casing:
            return  # isDotICaseChangeDisallowed
        lower = self._case_fold(title[0]) + title[1:]
        self._do_stem(lower, out)
        if wc == "UPPER" and self.check_sharp_s:
            self._vary_sharp_s(lower, out)

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

    def _vary_sharp_s(self, w: str, out: list[str]) -> None:
        """Stemmer.varySharpS: enumerate every ss→ß replacement combination
        (bounded at 5 sites)."""
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
        if variants is None:
            return
        for v in variants:
            if v != w:
                self._do_stem(v, out)

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

    def _do_stem(self, w: str, out: list[str]) -> None:
        for flags, st in self.entries.get(w, ()):
            if self._has(flags, self.needaffix) \
                    or self._has(flags, self.onlyincompound):
                continue
            out.append(st if st is not None else w)
        self._stem(w, previous=None, prev_flag=None, prefix_affix=None,
                   depth=0, do_prefix=True, prev_was_prefix=False, out=out)

    def _stem(self, w, previous, prev_flag, prefix_affix, depth,
              do_prefix, prev_was_prefix, out) -> None:
        if do_prefix:
            for a in self.prefixes:
                if a is previous or not w.startswith(a.append):
                    continue
                if a.append == w and not self.fullstrip:
                    continue
                # prefixes pass previousWasPrefix=false (Stemmer.java:399)
                if not self._compatible(a, prev_flag, depth, False):
                    continue
                root = a.strip + w[len(a.append):]
                if not root:
                    continue
                if a.cond is not None and not a.cond.search(root):
                    continue
                self._apply(root, a, previous, prefix_affix, depth, out)
        for a in self.suffixes:
            if a is previous or not w.endswith(a.append):
                continue
            if a.append == w and not self.fullstrip:
                continue
            if not self._compatible(a, prev_flag, depth, prev_was_prefix):
                continue
            root = w[:len(w) - len(a.append)] + a.strip
            if not root:
                continue
            if a.cond is not None and not a.cond.search(root):
                continue
            self._apply(root, a, previous, prefix_affix, depth, out)

    def _compatible(self, a: _Affix, prev_flag, depth,
                    prev_was_prefix) -> bool:
        """Stemmer.isAffixCompatible (non-compound context)."""
        if self._has(a.cont, self.onlyincompound):
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

    def _apply(self, root, a, previous, prefix_affix, depth, out) -> None:
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
                if self._has(flags, self.onlyincompound):
                    continue
                out.append(st if st is not None else root)
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
                    return
            else:
                do_prefix = False
                if a.is_prefix and self.complex_prefixes:
                    prefix_affix = a
                elif a.is_prefix or self.complex_prefixes \
                        or a.flag not in self.second_stage_suffix:
                    return
            self._stem(root, a, a.flag, prefix_affix, depth + 1,
                       do_prefix, a.is_prefix, out)


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
