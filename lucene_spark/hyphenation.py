"""Liang hyphenation (TeX82) + HyphenationCompoundWordTokenFilter analog.

Reference: ``analysis/common/src/java/org/apache/lucene/analysis/compound/
hyphenation/HyphenationTree.java`` (pattern search with per-slot max
interletter values, character-class normalization, exception stoplist, the
remain/push boundary guards, non-letter prefix skipping) and
``HyphenationCompoundWordTokenFilter.java`` (subwords between hyphenation
points within [minSubword, maxSubword], optional dictionary gating with the
genitive one-shorter retry, onlyLongestMatch per start point).  Pattern
files are the public FOP/OFFO XML format (e.g. the Danish ``da_UTF8.xml``
the reference tests ship).
"""

from __future__ import annotations

import re

__all__ = ["HyphenationTree", "parse_fop_xml", "hyphenation_compound"]


def parse_fop_xml(text: str):
    """Parse a FOP hyphenation XML into (classes, patterns, exceptions).
    The format is line-oriented inside <classes>/<patterns>/<exceptions>
    blocks (hyphenation/PatternParser.java)."""
    def block(tag):
        m = re.search(rf"<{tag}>(.*?)</{tag}>", text, re.DOTALL)
        return m.group(1) if m else ""

    strip_comments = re.compile(r"<!--.*?-->", re.DOTALL)
    classes = [ln.strip() for ln in
               strip_comments.sub("", block("classes")).split()
               if ln.strip()]
    patterns = [ln.strip() for ln in
                strip_comments.sub("", block("patterns")).split()
                if ln.strip()]
    exceptions = [ln.strip() for ln in
                  strip_comments.sub("", block("exceptions")).splitlines()
                  if ln.strip() and not ln.strip().startswith("<!--")]
    return classes, patterns, exceptions


class HyphenationTree:
    """Liang pattern matcher.  ``hyphenate`` returns the hyphenation-point
    index list [0, p1, .., len] over the LETTER positions of the word (the
    reference's Hyphenation.getHyphenationPoints), or None."""

    def __init__(self):
        self.classmap: dict[str, str] = {}
        # pattern letters -> interletter values (len(letters)+1 ints)
        self.patterns: dict[str, tuple[int, ...]] = {}
        self.stoplist: dict[str, list[int]] = {}

    @classmethod
    def from_fop_xml(cls, text: str) -> "HyphenationTree":
        t = cls()
        classes, patterns, exceptions = parse_fop_xml(text)
        for c in classes:
            t.add_class(c)
        for p in patterns:
            t.add_pattern(p)
        for e in exceptions:
            t.add_exception(e)
        return t

    def add_class(self, chars: str) -> None:
        """First char is the class representative; every char in the line
        normalizes to it (HyphenationTree.addClass)."""
        if chars:
            for c in chars:
                self.classmap[c] = chars[0]

    def add_pattern(self, pattern: str) -> None:
        letters = []
        values = [0]
        for ch in pattern:
            if ch.isdigit():
                values[len(letters)] = int(ch)
            else:
                letters.append(ch)
                values.append(0)
        self.patterns["".join(letters)] = tuple(values)

    def add_exception(self, hyphenated: str) -> None:
        """'as-so-ciate' style: breaks after the letter counts preceding
        each hyphen."""
        parts = hyphenated.split("-")
        word = "".join(parts)
        breaks, j = [], 0
        for p in parts[:-1]:
            j += len(p)
            breaks.append(j)
        self.stoplist[word] = breaks

    def _normalize(self, word: str):
        """Classmap normalization with the reference's non-letter rules:
        leading non-letters are skipped, a non-letter after letters ends
        the word (a later letter aborts hyphenation entirely)."""
        out = []
        ignore_at_beginning = 0
        end_of_letters = False
        for i, ch in enumerate(word):
            nc = self.classmap.get(ch)
            if nc is None:
                if i == ignore_at_beginning:
                    ignore_at_beginning += 1
                else:
                    end_of_letters = True
            else:
                if end_of_letters:
                    return None, 0
                out.append(nc)
        return "".join(out), ignore_at_beginning

    def hyphenate(self, word: str, remain: int = 1, push: int = 1):
        norm, ignored = self._normalize(word)
        if norm is None:
            return None
        n = len(norm)
        if n < remain + push:
            return None
        breaks = []
        stop = self.stoplist.get(norm)
        if stop is not None:
            breaks = [j + ignored for j in stop
                      if remain <= j < n - push]
        else:
            dotted = "." + norm + "."
            il = [0] * (len(dotted) + 1)
            for i in range(len(dotted)):
                seg = dotted[i:]
                for plen in range(1, len(seg) + 1):
                    vals = self.patterns.get(seg[:plen])
                    if vals is not None:
                        for k, v in enumerate(vals):
                            if v > il[i + k]:
                                il[i + k] = v
            # letter i break allowed when il[i+1] is odd
            breaks = [i + ignored for i in range(remain, n - push + 1)
                      if il[i + 1] & 1]
        if not breaks:
            return None
        return [0] + breaks + [n]


def hyphenation_compound(tree: HyphenationTree, dictionary=None,
                         min_word_size: int = 5, min_subword_size: int = 2,
                         max_subword_size: int = 15,
                         only_longest_match: bool = False):
    """HyphenationCompoundWordTokenFilter.decompose: the original token
    passes through, then each subword spanning 1+ hyphenation intervals
    within [minSubword, maxSubword] is stacked at the same position —
    gated by the dictionary when given (with the genitive one-char-shorter
    retry), all of them without one.  Stream-filter slot over
    (tokens, positions); the pattern table is broadcast-sized, no shuffle."""
    words = frozenset(w.lower() for w in dictionary) if dictionary is not \
        None else None

    def stream_filter(tokens, positions):
        out_t: list = []
        out_p: list = []
        for t, p in zip(tokens, positions):
            out_t.append(t)
            out_p.append(p)
            if len(t) < min_word_size:
                continue
            hyp = tree.hyphenate(t, 1, 1)
            if hyp is None:
                continue
            low = t.lower()
            for i in range(len(hyp)):
                start = hyp[i]
                longest = None
                for j in range(1, len(hyp) - i):
                    plen = hyp[i + j] - start
                    if plen > max_subword_size:
                        break
                    if plen < min_subword_size:
                        continue
                    hit = None
                    if words is None or low[start:start + plen] in words:
                        hit = plen
                    elif low[start:start + plen - 1] in words:
                        hit = plen - 1
                    if hit is not None:
                        if only_longest_match:
                            if longest is None or longest < hit:
                                longest = hit
                        else:
                            out_t.append(t[start:start + hit])
                            out_p.append(p)
                if only_longest_match and longest is not None:
                    out_t.append(t[start:start + longest])
                    out_p.append(p)
        return out_t, out_p

    return stream_filter
