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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS, analyze, tokenize


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
