"""Query parsing + distributed top-k search over the index tables.

Lifecycle mirrors IndexSearcher.search (lucene/core/.../search/
IndexSearcher.java:470-511,728-753 — traced in SURVEY §3.1):

  1. parse + analyze the query with the same analyzer
     (queryparser/.../classic/QueryParserBase.java:437 getFieldQuery);
  2. rewrite (drop unknown/stopword-only clauses → MatchNoDocs analog);
  3. "createWeight": look up query terms in the term dictionary — a pushed-down
     isin() filter against the sorted termdict parquet (the FST analog) — and
     build one BM25Scorer per term from global stats (TermStates.build walks
     all segments: index/TermStates.java:95; here stats are global by
     construction);
  4. per-segment execution: postings rows for the query terms are grouped by
     segment and scored by the windowed block-max kernel inside applyInPandas
     — segment == Lucene leaf, executor == searcher thread;
  5. reduce: per-segment top-k merged on the driver with the
     (score desc, docID asc) contract (TopDocs.java:93-120; segments are
     docID ranges so docBase order == docID order).

The driver only ever collects k rows per segment — never postings.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import ENGLISH_STOP_WORDS, analyze
from .index import Index
from .kernel import segment_topk
from .similarity import BM25Scorer, CollectionStats

# --- query AST + parser ---------------------------------------------------------


def parse_query(q: str) -> tuple:
    """Parse the reference query-set syntax (benchmark/conf/query-terms.txt):
    `a AND b`, `a b c` (bare terms = OR), `(a AND b) OR c` — one nesting level.

    Returns ("or", [...]) / ("and", [...]) / ("term", t) nodes with RAW terms;
    call :func:`rewrite` to analyze them.
    """
    q = q.strip()
    # MUST_NOT: `<positive> NOT t1 NOT t2` (BooleanClause.Occur.MUST_NOT)
    if re.search(r"\s+NOT\s+", q):
        parts = re.split(r"\s+NOT\s+", q)
        return ("not", parse_query(parts[0]), [t.strip() for t in parts[1:]])
    # split top-level OR (respecting parens)
    parts = re.split(r"\s+OR\s+", q) if "(" not in q else _split_parens(q)
    clauses = []
    for part in parts:
        part = part.strip()
        if part.startswith("(") and part.endswith(")"):
            part = part[1:-1].strip()
        if re.search(r"\s+AND\s+", part):
            terms = [t.strip() for t in re.split(r"\s+AND\s+", part) if t.strip()]
            clauses.append(("and", terms) if len(terms) > 1 else ("term", terms[0]))
        else:
            for t in part.split():
                clauses.append(("term", t))
    if len(clauses) == 1:
        return clauses[0]
    if all(c[0] == "term" for c in clauses) and " OR " not in q and " AND " in q:
        # e.g. "a AND b AND c" handled above; bare multi-term = OR
        pass
    return ("or", clauses)


def _split_parens(q: str) -> list[str]:
    parts, depth, cur = [], 0, []
    i = 0
    while i < len(q):
        if q[i] == "(":
            depth += 1
        elif q[i] == ")":
            depth -= 1
        if depth == 0 and q[i : i + 4] == " OR ":
            parts.append("".join(cur))
            cur = []
            i += 4
            continue
        cur.append(q[i])
        i += 1
    parts.append("".join(cur))
    return parts


def rewrite(node: tuple, stopwords=ENGLISH_STOP_WORDS) -> tuple | None:
    """Analyze every term with the index analyzer; drop empty clauses.

    BooleanQuery.rewrite analog (search/BooleanQuery.java:236+): a query whose
    clauses all vanish (stopword-only) rewrites to MatchNoDocs → None.
    """
    kind = node[0]
    if kind == "not":
        pos = rewrite(node[1], stopwords)
        if pos is None:
            return None
        neg: list[str] = []
        for t in node[2]:
            neg.extend(analyze(t, stopwords))
        return ("not", pos, neg) if neg else pos
    if kind == "term":
        toks = analyze(node[1], stopwords)
        if not toks:
            return None
        if len(toks) == 1:
            return ("term", toks[0])
        # a "term" that analyzes to several tokens becomes an OR of them
        return ("or", [("term", t) for t in toks])
    if kind == "and":
        terms: list[str] = []
        for t in node[1]:
            toks = analyze(t, stopwords)
            if not toks:
                return None  # Lucene: a MUST clause matching nothing kills the query
            terms.extend(toks)
        return ("and", terms) if len(terms) > 1 else ("term", terms[0])
    subs = [rewrite(c, stopwords) for c in node[1]]
    subs = [s for s in subs if s is not None]
    if not subs:
        return None
    if len(subs) == 1:
        return subs[0]
    flat: list[tuple] = []
    for s in subs:
        flat.extend(s[1] if s[0] == "or" else [s])
    return ("or", flat)


def query_terms(node: tuple) -> list[str]:
    kind = node[0]
    if kind == "term":
        return [node[1]]
    if kind == "and":
        return list(node[1])
    if kind == "not":
        return query_terms(node[1]) + list(node[2])
    out: list[str] = []
    for c in node[1]:
        out.extend(query_terms(c))
    return out


# --- search ---------------------------------------------------------------------


@dataclass
class TopDocs:
    docids: np.ndarray
    scores: np.ndarray
    urls: list[str] | None = None

    def to_pandas(self) -> pd.DataFrame:
        d = {"rank": np.arange(len(self.docids)), "docid": self.docids, "score": self.scores}
        if self.urls is not None:
            d["url"] = self.urls
        return pd.DataFrame(d)


def make_scorers(
    terms: list[str],
    termdict: DataFrame,
    stats: CollectionStats,
    k1: float = 1.2,
    b: float = 0.75,
    precision: str = "lucene",
) -> dict[str, BM25Scorer]:
    """Term stats lookup (pushed-down isin on the sorted termdict) → scorers."""
    rows = termdict.filter(F.col("term").isin(terms)).select("term", "df").collect()
    dfs = {r["term"]: r["df"] for r in rows}
    return {
        t: BM25Scorer(dfs[t], stats, k1=k1, b=b, precision=precision)
        for t in set(terms)
        if t in dfs
    }


def search(
    index: Index,
    query: str | tuple,
    k: int = 10,
    precision: str = "lucene",
    prune: bool = True,
    k1: float = 1.2,
    b: float = 0.75,
    with_urls: bool = False,
) -> TopDocs:
    """Distributed top-k BM25 search. ``query``: string or pre-parsed AST."""
    node = parse_query(query) if isinstance(query, str) else query
    node = rewrite(node)
    empty = TopDocs(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64), [] if with_urls else None)
    if node is None:
        return empty
    terms = sorted(set(query_terms(node)))
    stats = CollectionStats(index.doc_count, index.sum_total_term_freq)
    scorers = make_scorers(terms, index.termdict, stats, k1=k1, b=b, precision=precision)
    if node[0] == "and" and any(t not in scorers for t in terms):
        return empty
    if not scorers:
        return empty

    rows = index.postings.filter(F.col("term").isin([t for t in terms if t in scorers]))

    # per-segment execution: posting rows are self-contained (inline dls), so
    # the only shuffle is the query's own rows grouped by seg — segment ==
    # Lucene leaf, executor == searcher slice; the driver collects k rows/seg.
    seg_size = index.seg_size
    node_b, kparam, prec, pr = node, k, precision, prune

    def run_segment(post_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(post_pdf) == 0:
            return pd.DataFrame({"seg": pd.Series(dtype="int64"),
                                 "docid": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        seg = int(post_pdf["seg"].iloc[0])
        term_rows = {r["term"]: r for _, r in post_pdf.iterrows()}
        d, s = segment_topk(
            node_b, term_rows, scorers, seg_size, kparam,
            precision=prec, prune=pr,
        )
        return pd.DataFrame({"seg": seg, "docid": d + seg * seg_size, "score": s})

    out = (
        rows.groupBy("seg")
        .applyInPandas(run_segment, schema="seg long, docid long, score double")
        .collect()
    )
    if not out:
        return empty
    docids = np.array([r["docid"] for r in out], dtype=np.int64)
    scores = np.array([r["score"] for r in out], dtype=np.float64)
    order = np.lexsort((docids, -scores))[:k]
    docids, scores = docids[order], scores[order]
    urls = None
    if with_urls:
        url_rows = index.docs.filter(F.col("docid").isin(docids.tolist())).select(
            "docid", "url"
        ).collect()
        umap = {r["docid"]: r["url"] for r in url_rows}
        urls = [umap.get(int(d)) for d in docids]
    return TopDocs(docids, scores, urls)
