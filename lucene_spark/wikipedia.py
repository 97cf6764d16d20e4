"""WikipediaTokenizer analog — mediawiki-markup-aware typed tokens.

Reference: ``analysis/common/src/java/org/apache/lucene/analysis/
wikipedia/WikipediaTokenizer.java`` (+ the generated jflex scanner
``WikipediaTokenizerImpl.jflex``): three output modes — TOKENS_ONLY,
UNTOKENIZED_ONLY (configured markup types collapse to one raw-span token
each), BOTH (the span token carries UNTOKENIZED_TOKEN_FLAG and shares
its position with the first word token) — and the markup type taxonomy
(category, internal/external link, italics/bold/bold-italics, heading,
sub-heading, citation).  Verified against every golden in the
reference's TestWikipediaTokenizer (tests/test_wikipedia.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["WikiToken", "wikipedia_tokenize", "TOKENS_ONLY",
           "UNTOKENIZED_ONLY", "BOTH", "INTERNAL_LINK", "EXTERNAL_LINK",
           "EXTERNAL_LINK_URL", "CITATION", "CATEGORY", "BOLD", "ITALICS",
           "BOLD_ITALICS", "HEADING", "SUB_HEADING",
           "UNTOKENIZED_TOKEN_FLAG"]

# WikipediaTokenizer.java:38-48
INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"
ALPHANUM = "<ALPHANUM>"
NUM = "<NUM>"
APOSTROPHE = "<APOSTROPHE>"

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1


@dataclass
class WikiToken:
    text: str
    type: str
    pos: int
    start: int
    end: int
    flags: int = 0


_WORD = re.compile(r"[A-Za-z0-9][A-Za-z0-9.,_]*(?:'(?!')[A-Za-z0-9.,_]+)*")
_URL = re.compile(r"(?:https?|ftp|file)://[^\s\]]+")


def _classify(w: str) -> tuple[str, str]:
    """Trim trailing punctuation and type a plain word like the scanner:
    digits with an embedded separator -> NUM, x's -> APOSTROPHE."""
    w = w.rstrip(".,")
    if re.fullmatch(r"[0-9]+(?:[.,][0-9]+)+", w):
        return w, NUM
    if re.fullmatch(r"[A-Za-z]+'s", w):
        return w, APOSTROPHE
    return w, ALPHANUM


def _words(segment: str, base: int):
    """(word, start, end) for each plain word in segment; underscores
    split words (the Category:ital_cat golden)."""
    out = []
    for m in _WORD.finditer(segment):
        for part in re.finditer(r"[^_]+", m.group()):
            w, _ = _classify(part.group())
            if w:
                out.append((w, base + m.start() + part.start(),
                            base + m.start() + part.start() + len(w)))
    return out


class _Emitter:
    def __init__(self, mode: int, untoks: frozenset):
        self.mode = mode
        self.untoks = untoks
        self.tokens: list[WikiToken] = []
        self.pos = -1

    def words(self, segment: str, base: int, ttype: str,
              first_inc: int = 1) -> None:
        """Emit the word tokens of a markup span; honors the
        untokenized-type collapse in UNTOKENIZED_ONLY/BOTH modes."""
        ws = _words(segment, base)
        if not ws:
            return
        untok = ttype in self.untoks and self.mode != TOKENS_ONLY
        if untok:
            span_start, span_end = ws[0][1], ws[-1][2]
            self.pos += first_inc
            self.tokens.append(WikiToken(
                segment[span_start - base:span_end - base], ttype,
                self.pos, span_start, span_end, UNTOKENIZED_TOKEN_FLAG))
            if self.mode == UNTOKENIZED_ONLY:
                return
            first_inc = 0  # first word shares the span's position
        for i, (w, s, e) in enumerate(ws):
            inc = first_inc if i == 0 else 1
            self.pos += inc
            ty = ttype
            if ttype == ALPHANUM:
                _, ty = _classify(w)
            self.tokens.append(WikiToken(w, ty, self.pos, s, e))


def wikipedia_tokenize(text: str, mode: int = TOKENS_ONLY,
                       untokenized_types=frozenset()) -> list[WikiToken]:
    em = _Emitter(mode, frozenset(untokenized_types))
    i, n = 0, len(text)
    pending_close = False
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        # [[...]] internal link / category
        if text.startswith("[[", i):
            close = text.find("]]", i + 2)
            if close < 0:
                close = n
            inner_start = i + 2
            inner = text[inner_start:close]
            body = inner[1:] if inner.startswith(":") else inner
            body_base = inner_start + (1 if inner.startswith(":") else 0)
            if body.startswith("Category:"):
                content = body[len("Category:"):]
                cbase = body_base + len("Category:")
                bar = content.find("|")
                if bar >= 0:
                    content = content[:bar]
                em.words(content, cbase, CATEGORY)
            else:
                em.words(body.replace("|", " "), body_base, INTERNAL_LINK)
            i = min(close + 2, n)
            continue
        # [url anchor] external link
        if c == "[":
            close = text.find("]", i + 1)
            if close < 0:
                close = n
            inner = text[i + 1:close]
            m = _URL.match(inner)
            if m:
                em.pos += 1
                em.tokens.append(WikiToken(m.group(), EXTERNAL_LINK_URL,
                                           em.pos, i + 1,
                                           i + 1 + m.end()))
                em.words(inner[m.end():], i + 1 + m.end(), EXTERNAL_LINK,
                         first_inc=0)
                i = min(close + 1, n)
                continue
            i += 1
            continue
        # '' italics / ''' bold / ''''' bold-italics.  The scanner's
        # numBalanced protocol: a quote-run seen while a style is still
        # "open" (it was interrupted by a link before any styled word)
        # is its closer and emits nothing.
        if text.startswith("''", i):
            q = 2
            while i + q < n and text[i + q] == "'":
                q += 1
            j = i + q
            if pending_close:
                pending_close = False
                i = j
                continue
            ttype = {2: ITALICS, 3: BOLD}.get(q, BOLD_ITALICS)
            # the styled run ends at the closing quote run, a [[, or EOF
            end = n
            closer = re.search(r"''+|\[\[", text[j:])
            if closer:
                end = j + closer.start()
            seg = text[j:end]
            em.words(seg, j, ttype)
            if closer and closer.group().startswith("'"):
                i = j + closer.end()
            else:
                # interrupted by a link: only a word-less style keeps its
                # closer pending (WikipediaTokenizerImpl.jflex:211,302)
                pending_close = closer is not None and not _words(seg, 0)
                i = end
            continue
        # == heading == / === sub-heading ===
        if text.startswith("==", i):
            q = 2
            while i + q < n and text[i + q] == "=":
                q += 1
            j = i + q
            m = re.search("=" * q, text[j:])
            end = j + m.start() if m else n
            em.words(text[j:end], j, SUB_HEADING if q >= 3 else HEADING)
            i = (j + m.end()) if m else n
            continue
        # <ref>...</ref> citation; other tags stripped
        if c == "<":
            m = re.match(r"<(/?)(\w+)[^>]*>", text[i:])
            if m:
                if m.group(2) == "ref" and not m.group(1):
                    close = text.find("</ref>", i + m.end())
                    seg_end = close if close >= 0 else n
                    em.words(text[i + m.end():seg_end], i + m.end(),
                             CITATION)
                    i = (seg_end + len("</ref>")) if close >= 0 else n
                else:
                    i += m.end()
                continue
            i += 1
            continue
        # plain word / number / apostrophe
        m = _WORD.match(text, i)
        if m:
            em.words(m.group(), i, ALPHANUM)
            i = m.end()
            continue
        i += 1
    return em.tokens
