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
