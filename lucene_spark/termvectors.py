"""Term vectors with positions + character offsets — the offsets channel.

Reference: Lucene's per-document term-vector store
(codecs/lucene90/compressing/Lucene90CompressingTermVectorsWriter.java;
IndexOptions ..._AND_OFFSETS, index/IndexOptions.java:47) — a docID-keyed
sidecar mapping (doc, term) → positions and character offsets, consumed by
the FastVectorHighlighter / UnifiedHighlighter offsets fast path
(highlighter modules) so highlighting never re-analyzes stored text.

Spark shape: one DataFrame row per (docid, term) with int array columns,
range-partitioned by the SAME docID segments as the inverted index.  A
highlight fetch filters ``docid IN hits AND term IN query_terms`` — both
predicates push down to the parquet scan (min/max pruning on docid ranges),
so a k-doc highlight touches k row-groups, not the corpus, at any scale.
The build is one Arrow analysis pass, partition-local, no shuffle at all
(term vectors are doc-major, unlike postings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS

TV_SCHEMA = (
    "docid long, term string, positions array<int>, "
    "starts array<int>, ends array<int>"
)


def build_term_vectors(
    pages: DataFrame,
    text_col: str = "text",
    docid_col: str = "docid",
    stopwords=ENGLISH_STOP_WORDS,
) -> DataFrame:
    """pages(docid, text) → term vectors (docid, term, positions, starts,
    ends), offsets spanning the ORIGINAL raw-token text (OffsetAttribute
    contract — filters may rewrite the term, offsets don't move).

    ``stopwords`` also accepts an :class:`lucene_spark.analysis.Analyzer`.
    """
    from .analysis import analyze_with_offsets

    def run(batches):
        for pdf in batches:
            ids = pdf[docid_col].to_numpy(dtype=np.int64)
            out = {"docid": [], "term": [], "positions": [], "starts": [], "ends": []}
            for docid, text in zip(ids.tolist(), pdf[text_col]):
                toks, poss, starts, ends = analyze_with_offsets(
                    text if isinstance(text, str) else "", stopwords
                )
                if not toks:
                    continue
                # group by term: one vector row per (doc, term)
                order = np.argsort(np.asarray(toks, dtype=object), kind="stable")
                ts = [toks[i] for i in order]
                newt = [0] + [i for i in range(1, len(ts)) if ts[i] != ts[i - 1]]
                bounds = newt + [len(ts)]
                for gi, gs in enumerate(newt):
                    ge = bounds[gi + 1]
                    idxs = order[gs:ge]
                    out["docid"].append(docid)
                    out["term"].append(ts[gs])
                    out["positions"].append([poss[i] for i in idxs])
                    out["starts"].append([starts[i] for i in idxs])
                    out["ends"].append([ends[i] for i in idxs])
            yield pd.DataFrame(out)

    return pages.select(docid_col, text_col).mapInPandas(run, schema=TV_SCHEMA)


def fetch_term_vectors(
    tv: DataFrame, docids: list[int], terms: list[str]
) -> DataFrame:
    """The highlighter's fetch: both predicates are Catalyst ``isin`` filters
    that reach the scan (PushedFilters) — k docs × q terms, never a corpus
    pass."""
    return tv.filter(F.col("docid").isin(list(docids)) & F.col("term").isin(list(terms)))


def first_occurrence_offsets(
    tv: DataFrame, docids: list[int], terms: list[str]
) -> DataFrame:
    """(docid, start, end) of each doc's EARLIEST occurrence of any query
    term, straight from stored offsets (no re-analysis) — the primitive the
    offsets-based passage scorer builds on."""
    hits = fetch_term_vectors(tv, docids, terms)
    ex = hits.select(
        "docid",
        F.explode(F.arrays_zip("starts", "ends")).alias("z"),
    ).select("docid", F.col("z.starts").alias("start"), F.col("z.ends").alias("end"))
    w = ex.groupBy("docid").agg(F.min(F.struct("start", "end")).alias("m"))
    return w.select("docid", F.col("m.start").alias("start"), F.col("m.end").alias("end"))


def highlight_offsets(
    tv: DataFrame,
    docs_with_text: DataFrame,
    terms: list[str],
    pre: str = "<b>",
    post: str = "</b>",
    window: int = 80,
) -> DataFrame:
    """Offsets-based highlighter (FastVectorHighlighter analog): marks every
    stored-offset hit inside a ±``window``-char passage centred on the first
    occurrence.  ``docs_with_text``: (docid, text) for the hit docs only.
    Returns (docid, snippet).  No re-analysis — offsets come from the term
    vectors."""
    docids = [r["docid"] for r in docs_with_text.select("docid").collect()]
    hits = fetch_term_vectors(tv, docids, terms)
    spans = (
        hits.select(
            "docid", F.explode(F.arrays_zip("starts", "ends")).alias("z")
        )
        .select("docid", F.col("z.starts").alias("s"), F.col("z.ends").alias("e"))
        .groupBy("docid")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"))
    )
    joined = docs_with_text.join(spans, "docid")

    def mark(batches):
        for pdf in batches:
            out_doc, out_snip = [], []
            for docid, text, sp in zip(pdf["docid"], pdf["text"], pdf["spans"]):
                sp = [(int(x["s"]), int(x["e"])) for x in sp]
                lo = max(0, sp[0][0] - window)
                hi = min(len(text), sp[0][1] + window)
                parts, cur = [], lo
                for s, e in sp:
                    if s >= hi:
                        break
                    parts.append(text[cur:s])
                    parts.append(pre + text[s:e] + post)
                    cur = e
                parts.append(text[cur:hi])
                out_doc.append(int(docid))
                out_snip.append("".join(parts))
            yield pd.DataFrame({"docid": out_doc, "snippet": out_snip})

    return joined.mapInPandas(mark, schema="docid long, snippet string")
