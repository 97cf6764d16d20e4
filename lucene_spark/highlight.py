"""Snippet highlighting for query hits.

Reference: lucene/highlighter UnifiedHighlighter
(highlighter/src/java/org/apache/lucene/search/uhighlight/
UnifiedHighlighter.java:93): re-analyze the stored text of each hit, find the
passage containing the most query-term matches, mark the matches.  Here the
passage chooser is a fixed-width token window scored by (hit count, earliest
start) — deterministic; marking uses **term** markers.  Runs as one Arrow
pass over the hit docs only (hits are joined to stored text first — Lucene
reads stored fields the same way).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS, analyze, tokenize

# sentence boundary: terminator run followed by whitespace (the documented
# BreakIterator.getSentenceInstance subset — no abbreviation handling)
_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def highlight(
    docs_with_text: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    stopwords=ENGLISH_STOP_WORDS,
) -> DataFrame:
    """→ (id_col, snippet) — best window of ``window`` raw tokens per doc.

    The window score = number of query-term hits inside it; ties go to the
    earlier window (UnifiedHighlighter's passage scorer simplified).
    """
    qset = frozenset(query_terms)

    def run(batches):
        for pdf in batches:
            ids, snippets = [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                raw = tokenize(text if isinstance(text, str) else "")
                hits = [i for i, t in enumerate(raw) if t.lower() in qset]
                if not hits:
                    continue
                best_s, best_n = 0, -1
                for s in range(max(1, len(raw) - window + 1)):
                    n = sum(1 for h in hits if s <= h < s + window)
                    if n > best_n:
                        best_n, best_s = n, s
                out = [
                    f"**{t}**" if (t.lower() in qset) else t
                    for t in raw[best_s : best_s + window]
                ]
                ids.append(rid)
                snippets.append(" ".join(out))
            yield pd.DataFrame({id_col: ids, "snippet": snippets})

    id_type = docs_with_text.schema[id_col].dataType.simpleString()
    return docs_with_text.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, snippet string"
    )


def unified_passages(
    docs_with_text: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    pivot: float = 87.0,
    max_passages: int = 1,
    stopwords=ENGLISH_STOP_WORDS,
) -> DataFrame:
    """UnifiedHighlighter passage RANKING — the faithful PassageScorer
    (uhighlight/PassageScorer.java:77-136): each sentence is scored as a
    miniature document,

        score = norm(start) * Σ_unique-matched-terms
                    tf(freq_in_passage, passage_chars)
                  * weight(content_chars, ttf_in_doc)

    with tf = f / (f + k1*((1-b) + b*len/pivot)), weight = (k1+1) *
    ln(1 + (numDocs + 0.5)/(ttf + 0.5)) where numDocs ~ 1 + content/pivot
    (:83-89), and norm = 1 + 1/ln(pivot + start) (:108-110); defaults
    k1=1.2 b=0.75 pivot=87 (:52-55).  Arithmetic is float64 (the reference
    runs float32; the float64 twin is ANSI-SQL-replicable for the gate).

    Sentences split on terminator+whitespace; lengths/offsets are in CHARS
    like the reference (Passage.getLength is an offset span).  Returns the
    top ``max_passages`` per doc as (id, start, score, snippet), docs with
    no matching passage omitted (reference returns no highlight).  One
    Arrow pass over the hit docs — join the hit set to stored text first.
    """
    qterms = [t for t in query_terms]

    def run(batches):
        for pdf in batches:
            ids, starts, scores, snips = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str) or not text:
                    continue
                segs, pos = [], 0
                for m in _SENT_RE.finditer(text):
                    segs.append((pos, text[pos:m.start()]))
                    pos = m.end()
                if pos < len(text):
                    segs.append((pos, text[pos:]))
                doc_toks = analyze(text, stopwords)
                ttf = {t: doc_toks.count(t) for t in qterms}
                clen = len(text)
                cand = []
                for start, ptext in segs:
                    ptoks = analyze(ptext, stopwords)
                    plen = len(ptext)
                    s = 0.0
                    hit = False
                    for t in qterms:
                        f = ptoks.count(t)
                        if f == 0:
                            continue
                        hit = True
                        tf = f / (f + k1 * ((1 - b) + b * (plen / pivot)))
                        w = (k1 + 1) * math.log(
                            1 + ((1 + clen / pivot) + 0.5) / (ttf[t] + 0.5))
                        s += tf * w
                    if hit:
                        s *= 1 + 1 / math.log(pivot + start)
                        cand.append((s, start, ptext))
                cand.sort(key=lambda c: (-c[0], c[1]))
                for s, start, ptext in cand[:max_passages]:
                    ids.append(rid)
                    starts.append(start)
                    scores.append(s)
                    snips.append(ptext)
            yield pd.DataFrame({
                id_col: ids, "start": pd.Series(starts, dtype="int64"),
                "score": pd.Series(scores, dtype="float64"),
                "snippet": pd.Series(snips, dtype="object"),
            })

    id_type = docs_with_text.schema[id_col].dataType.simpleString()
    return docs_with_text.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, start long, score double, snippet string"
    )


# --------- UnifiedHighlighter break iterators (passage boundary sources)


def whole_boundaries(text: str) -> list[int]:
    """WholeBreakIterator: the entire text is one passage."""
    return [0, len(text)]


def custom_separator_boundaries(text: str, sep: str) -> list[int]:
    """CustomSeparatorBreakIterator (postingshighlight/
    CustomSeparatorBreakIterator.java): a boundary AFTER every separator
    char, plus the text edges."""
    bounds = [0]
    for i, c in enumerate(text):
        if c == sep:
            bounds.append(i + 1)
    if bounds[-1] != len(text):
        bounds.append(len(text))
    return bounds


def sentence_boundaries(text: str) -> list[int]:
    """The engine's documented getSentenceInstance subset (terminator run +
    whitespace) as a boundary list."""
    bounds = [0]
    for m in _SENT_RE.finditer(text):
        bounds.append(m.end())
    if bounds[-1] != len(text):
        bounds.append(len(text))
    return bounds


def length_goal_passage(boundaries: list[int], content_length: int,
                        start: int, end: int, length_goal: int,
                        alignment: float = 0.0, minimum: bool = False,
                        last_passage_end: int = 0,
                        custom_separator: bool = True) -> tuple[int, int]:
    """LengthGoalBreakIterator (uhighlight/LengthGoalBreakIterator.java:
    100-170) driven exactly like FieldHighlighter.java:165-185: the
    passage around a match [start, end) targets ``length_goal`` chars,
    positioned by ``alignment`` (0 = match at the start); ``minimum``
    never undershoots the goal (createMinLength) while the default picks
    the closest base boundary (createClosestToLength).

    ``custom_separator=True`` reproduces CustomSeparatorBreakIterator's
    CharacterIterator off-by-ones (its following(pos) starts scanning at
    pos+1 so a separator AT pos is skipped, and its preceding(pos) may
    return pos itself) — the reference tests' observable behavior hinges
    on them.  False gives the standard strict <' / '> boundary contract
    for regex-derived boundary lists."""
    if not 0.0 <= alignment <= 1.0:
        raise ValueError("fragmentAlignment must be in [0, 1]")
    internal = [b for b in boundaries if 0 < b < content_length]

    if custom_separator:
        def following(pos):
            c = [b for b in internal if b >= pos + 2]
            return min(c) if c else content_length

        def preceding(pos):
            c = [b for b in internal if b <= pos]
            return max(c) if c else 0
    else:
        def following(pos):
            c = [b for b in internal if b > pos]
            return min(c) if c else content_length

        def preceding(pos):
            c = [b for b in internal if b < pos]
            return max(c) if c else 0

    def bi_following(match_end_index):
        target = (match_end_index + 1) + int(length_goal * (1.0 - alignment))
        if target >= content_length:
            return content_length
        after = following(target - 1)
        if after == target or minimum:
            return after
        before = preceding(target)
        if target - before < after - target and before > match_end_index:
            return before
        return after

    def bi_preceding(match_start_index):
        target = (match_start_index - 1) - int(length_goal * alignment)
        if target <= 0:
            return 0
        before = preceding(target + 1)
        if before == target or minimum:
            return before
        after = following(target - 1)
        if after - target < target - before and after < match_start_index:
            return after
        return before

    # FieldHighlighter: fragment from the middle of the match
    center = start + (end - start) // 2
    p_start = min(start, max(bi_preceding(max(start + 1, center)),
                             last_passage_end))
    p_end = max(end, min(bi_following(min(end - 1, center)),
                         content_length))
    return p_start, p_end


DEFAULT_BOUNDARY_CHARS = frozenset({".", ",", "!", "?", " ", "\t", "\n"})


def simple_boundary_start(text: str, start: int, max_scan: int = 20,
                          boundary_chars=DEFAULT_BOUNDARY_CHARS) -> int:
    """SimpleBoundaryScanner.findStartOffset (vectorhighlight/
    SimpleBoundaryScanner.java:55-70): scan backward up to maxScan chars
    for a boundary char (returning the offset AFTER it); reaching the
    very start of the text counts as a boundary; otherwise the original
    start comes back.  Out-of-range starts return unchanged."""
    if start > len(text) or start < 1:
        return start
    offset, count = start, max_scan
    while offset > 0 and count > 0:
        if text[offset - 1] in boundary_chars:
            return offset
        offset -= 1
        count -= 1
    if offset == 0:
        return 0
    return start


def simple_boundary_end(text: str, start: int, max_scan: int = 20,
                        boundary_chars=DEFAULT_BOUNDARY_CHARS) -> int:
    """SimpleBoundaryScanner.findEndOffset (:73-86): scan forward up to
    maxScan chars for a boundary char (the boundary itself is the end);
    not found → the original offset.  Unlike the start scan, running into
    the END of the text is NOT a boundary (the commented-out <= in the
    reference)."""
    if start > len(text) or start < 0:
        return start
    offset, count = start, max_scan
    while offset < len(text) and count > 0:
        if text[offset] in boundary_chars:
            return offset
        offset += 1
        count -= 1
    return start


def break_iterator_boundary_start(boundaries: list[int], start: int,
                                  text_len: int) -> int:
    """BreakIteratorBoundaryScanner.findStartOffset (:38-44): the LAST
    boundary strictly before ``start`` over a precomputed boundary list
    (the sentence/word break positions the UnifiedHighlighter iterators
    already produce)."""
    if start > text_len or start < 1:
        return start
    prev = [b for b in boundaries if b < start]
    return prev[-1] if prev else 0


def break_iterator_boundary_end(boundaries: list[int], start: int,
                                text_len: int) -> int:
    """BreakIteratorBoundaryScanner.findEndOffset (:46-52): the first
    boundary after ``start``."""
    if start > text_len or start < 0:
        return start
    nxt = [b for b in boundaries if b > start]
    return nxt[0] if nxt else text_len
