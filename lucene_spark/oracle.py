"""Exhaustive pure-pandas oracle reproducing Lucene IndexSearcher semantics.

The duel twin of the distributed engine (pattern: lucene/test-framework/.../
search/CheckHits.java:602 checkTopScores — run with and without pruning,
assert identical top-k).  No Spark: tokenize with the same analyzer, score
every matching doc with the same float32 BM25 (similarity.py), sort
(score desc, docid asc), take k.  Used by pytest as golden truth and usable
standalone for tiny corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analysis import analyze
from .kernel import score_query_node
from .search import parse_query, query_terms, rewrite
from .similarity import BM25Scorer, CollectionStats


class OracleIndex:
    """In-memory single-partition index over a pandas corpus."""

    def __init__(self, urls: list[str], texts: list[str]):
        # docID contract: rank over url order (engine contract, SURVEY §7)
        order = np.argsort(np.array(urls, dtype=object), kind="stable")
        self.urls = [urls[i] for i in order]
        token_lists = [analyze(texts[i]) for i in order]
        self.dl = np.array([len(t) for t in token_lists], dtype=np.int64)
        self.doc_count = len(self.urls)
        self.sum_ttf = int(self.dl.sum())
        # postings: term -> (docids sorted, freqs)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        accum: dict[str, dict[int, int]] = {}
        for docid, toks in enumerate(token_lists):
            for t in toks:
                accum.setdefault(t, {})
                accum[t][docid] = accum[t].get(docid, 0) + 1
        for t, dmap in accum.items():
            d = np.array(sorted(dmap), dtype=np.int64)
            f = np.array([dmap[i] for i in d], dtype=np.int64)
            self.postings[t] = (d, f, self.dl[d])

    def stats(self) -> CollectionStats:
        return CollectionStats(self.doc_count, self.sum_ttf)

    def search(self, query: str, k: int = 10, precision: str = "lucene",
               k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
        node = rewrite(parse_query(query))
        if node is None:
            return pd.DataFrame({"rank": [], "docid": [], "url": [], "score": []})
        terms = sorted(set(query_terms(node)))
        known = [t for t in terms if t in self.postings]
        if node[0] == "and" and len(known) < len(terms):
            return pd.DataFrame({"rank": [], "docid": [], "url": [], "score": []})
        scorers = {
            t: BM25Scorer(len(self.postings[t][0]), self.stats(), k1=k1, b=b,
                          precision=precision)
            for t in known
        }
        sub = {t: self.postings[t] for t in known}
        d, s = score_query_node(node, sub, scorers, precision)
        if len(d) == 0:
            return pd.DataFrame({"rank": [], "docid": [], "url": [], "score": []})
        order = np.lexsort((d, -s))[:k]
        d, s = d[order], s[order]
        return pd.DataFrame(
            {
                "rank": np.arange(len(d)),
                "docid": d,
                "url": [self.urls[i] for i in d],
                "score": s,
            }
        )
