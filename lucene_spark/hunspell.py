"""Hunspell dictionary stemming — Dictionary + Stemmer + HunspellStemFilter
analogs.

Reference: ``analysis/common/src/java/org/apache/lucene/analysis/hunspell/
Dictionary.java`` (affix/dic parsing: FLAG long/num/UTF-8, AF aliases,
SFX/PFX rules with conditions and continuation classes, NEEDAFFIX,
CIRCUMFIX, FULLSTRIP, IGNORE, ICONV/OCONV, hidden title-case variants of
cased entries), ``Stemmer.java`` (two-stage affix stripping with
cross-product prefix+suffix chaining, continuation-flag gating,
case-variation lookups) and ``HunspellStemFilter.java`` (all unique stems
at one position; tokens with no stems pass through).

``st:`` stem exceptions and the capitalize-after-apostrophe UPPER
variant (L'AFRIQUE) are included; KEEPCASE is parsed but — like the
reference Stemmer — not enforced (it gates spellchecking, not stemming).
Documented subset: compounding (COMPOUNDFLAG/COMPOUNDRULE), suggestion
machinery, and COMPLEXPREFIXES are out of scope; everything the in-tree
fixture dictionaries below exercise is implemented and verified against
the reference's own test goldens (tests/test_hunspell.py): simple,
condition, needaffix, circumfix, fullstrip, ignore, escaped, flaglong,
flagnum, conv, homonyms, mixedcase/ignoreCase, zeroaffix,
optional-condition, double-escaped, morphdata, keepcase, allcaps.
"""

from __future__ import annotations

import re

__all__ = ["HunspellDictionary", "hunspell_stem_filter"]

_HIDDEN = "￧"  # the ONLYUPCASEFLAG analog (Dictionary.java:78)


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
    strip characters restored), at its start (prefix) or end (suffix)."""
    if cond in (".", ""):
        return None
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
    return re.compile(pat + "$") if not is_prefix else re.compile("^" + pat)


def _word_case(w: str) -> str:
    cased = [c for c in w if c.isupper() or c.islower()]
    if not cased or not cased[0].isupper():
        return "MIXED" if any(c.isupper() for c in cased) else "LOWER"
    if all(c.isupper() for c in cased):
        return "UPPER"
    if not any(c.isupper() for c in cased[1:]):
        return "TITLE"
    return "MIXED"


class HunspellDictionary:
    """Parsed .aff + .dic pair(s); ``stem``/``unique_stems`` mirror
    Stemmer.java's outputs (stem text = the looked-up form, with OCONV
    applied)."""

    def __init__(self, aff_text: str, *dic_texts: str,
                 ignore_case: bool = False):
        self.ignore_case = ignore_case
        self.flag_mode = "char"
        self.ignore_chars = ""
        self.fullstrip = False
        self.needaffix = None
        self.circumfix = None
        self.onlyincompound = None
        self.keepcase = None
        self.iconv: list[tuple[str, str]] = []
        self.oconv: list[tuple[str, str]] = []
        self.aliases: list[frozenset] = []
        self.prefixes: list[_Affix] = []
        self.suffixes: list[_Affix] = []
        self._parse_aff(aff_text)
        # flags that may chain as the second stripped suffix
        self.second_stage = frozenset(
            f for a in self.suffixes for f in a.cont)
        # word -> [(flags, st-exception-or-None), ...]
        self.entries: dict[str, list[tuple[frozenset, str | None]]] = {}
        for t in dic_texts:
            self._parse_dic(t)

    # -- parsing ----------------------------------------------------------

    def _flags(self, s: str) -> frozenset:
        if self.aliases and s.isdigit():
            idx = int(s)
            return self.aliases[idx - 1] if 0 < idx <= len(self.aliases) \
                else frozenset()
        if self.flag_mode == "num":
            return frozenset(p for p in s.split(",") if p)
        if self.flag_mode == "long":
            return frozenset(s[i:i + 2] for i in range(0, len(s) - 1, 2))
        return frozenset(s)

    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split("#", 1)[0].split()
            i += 1
            if not parts:
                continue
            key = parts[0]
            if key == "FLAG" and len(parts) > 1:
                self.flag_mode = {"long": "long", "num": "num"}.get(
                    parts[1], "char")
            elif key == "IGNORE" and len(parts) > 1:
                self.ignore_chars = parts[1]
            elif key == "FULLSTRIP":
                self.fullstrip = True
            elif key in ("NEEDAFFIX", "PSEUDOROOT") and len(parts) > 1:
                self.needaffix = next(iter(self._flags(parts[1])))
            elif key == "CIRCUMFIX" and len(parts) > 1:
                self.circumfix = next(iter(self._flags(parts[1])))
            elif key == "ONLYINCOMPOUND" and len(parts) > 1:
                self.onlyincompound = next(iter(self._flags(parts[1])))
            elif key == "KEEPCASE" and len(parts) > 1:
                self.keepcase = next(iter(self._flags(parts[1])))
            elif key in ("ICONV", "OCONV") and len(parts) > 2:
                (self.iconv if key == "ICONV" else self.oconv).append(
                    (parts[1], parts[2]))
            elif key == "AF" and len(parts) > 1 and not parts[1].isdigit() \
                    or key == "AF" and len(parts) > 2:
                self.aliases.append(self._flags(parts[1]))
            elif key == "AF" and len(parts) == 2 and parts[1].isdigit():
                pass  # the count line
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
                        flag = next(iter(self._flags(flag_txt)))
                        is_pfx = key == "PFX"
                        self._add(_Affix(flag, cross, strip, app, cont,
                                         _compile_condition(cond, is_pfx),
                                         is_pfx))

    def _add(self, a: _Affix) -> None:
        (self.prefixes if a.is_prefix else self.suffixes).append(a)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for line in lines[start:]:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            head, _, morph = line.partition("\t")
            if not morph:
                head, _, morph = line.partition(" ")
            # the st: morphological field replaces the reported stem
            # (Stemmer.java stemException)
            st = None
            for field in morph.split():
                if field.startswith("st:"):
                    st = field[3:]
                    break
            m = re.match(r"^(.*[^\\])/([^/]*)$", head)
            if m:
                word, flags = m.group(1), self._flags(m.group(2))
            else:
                word, flags = head, frozenset()
            word = word.replace("\\/", "/")
            word = self._strip_ignored(word)
            if not word:
                continue
            if self.ignore_case:
                self.entries.setdefault(word.lower(), []).append((flags, st))
                continue
            self.entries.setdefault(word, []).append((flags, st))
            wc = _word_case(word)
            if wc == "MIXED" or (wc == "UPPER" and flags):
                # hidden title-cased twin (Dictionary.java:1036)
                hidden = word[0].upper() + word[1:].lower()
                if hidden != word:
                    self.entries.setdefault(hidden, []).append(
                        (flags | {_HIDDEN}, st))

    # -- input cleaning / case variants -----------------------------------

    def _strip_ignored(self, w: str) -> str:
        for ch in self.ignore_chars:
            w = w.replace(ch, "")
        return w

    def _clean(self, w: str) -> str:
        w = self._strip_ignored(w)
        for src, dst in self.iconv:
            w = w.replace(src, dst)
        return w.lower() if self.ignore_case else w

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
        if not self.ignore_case and w[0:1].isupper():
            wc = _word_case(w)
            if wc == "UPPER":
                title = w[0] + w[1:].lower()
                apos = re.sub(r"(?<=')[a-z]",
                              lambda m: m.group().upper(), title)
                if apos != title:
                    self._do_stem(apos, out)
                self._do_stem(title, out)
                self._do_stem(title.lower(), out)
            elif wc == "TITLE":
                self._do_stem(w.lower(), out)
        return [self._oconv(s) for s in out]

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
                if not self._compatible(a, prev_flag, depth,
                                        prev_was_prefix):
                    continue
                root = a.strip + w[len(a.append):]
                if not root:
                    continue
                if a.cond is not None and not a.cond.search(root):
                    continue
                self._apply(root, a, previous, prefix_affix, depth,
                            out)
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
        if self._has(a.cont, self.onlyincompound):
            return False
        if depth == 0:
            return True
        if a.cross:
            return prev_was_prefix or (prev_flag is not None
                                       and prev_flag in a.cont)
        return False

    def _needs_another(self, a: _Affix, previous, prefix_affix) -> bool:
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
        if not self._needs_another(a, previous, prefix_affix):
            for flags, st in self.entries.get(root, ()):
                ok = a.flag in flags or (
                    prefix_affix is not None and a.flag in prefix_affix.cont)
                if not ok:
                    continue
                if prefix_affix is not None \
                        and prefix_affix.flag not in flags \
                        and prefix_affix.flag not in a.cont:
                    continue
                if self._has(flags, self.onlyincompound):
                    continue
                out.append(st if st is not None else root)
        if a.cross and depth <= 1:
            if depth == 0:
                if a.is_prefix:
                    self._stem(root, a, a.flag, a, 1, False, True, out)
                elif a.flag in self.second_stage:
                    self._stem(root, a, a.flag, prefix_affix, 1, False,
                               False, out)
            elif not a.is_prefix and a.flag in self.second_stage:
                self._stem(root, a, a.flag, prefix_affix, 2, False, False,
                           out)


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
