"""Exhaustive pure-pandas oracle reproducing Lucene IndexSearcher semantics.

The duel twin of the distributed engine (pattern: lucene/test-framework/.../
search/CheckHits.java:602 checkTopScores — run with and without pruning,
assert identical top-k).  No Spark: tokenize with the same analyzer, score
every matching doc with the same float32 BM25 (similarity.py), sort
(score desc, docid asc), take k.  Used by pytest as golden truth and usable
standalone for tiny corpora.  Indexes positions, so phrase/sloppy queries
duel too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .analysis import analyze_with_positions
from .kernel import score_query_node
from .search import attach_scorers, parse_query, query_terms, rewrite
from .similarity import BM25Scorer, CollectionStats


class OracleIndex:
    """In-memory single-partition index over a pandas corpus."""

    def __init__(self, urls: list[str], texts: list[str]):
        # docID contract: rank over url order (engine contract, SURVEY §7)
        order = np.argsort(np.array(urls, dtype=object), kind="stable")
        self.urls = [urls[i] for i in order]
        pairs = [analyze_with_positions(texts[i]) for i in order]
        token_lists = [p[0] for p in pairs]
        self.dl = np.array([len(t) for t in token_lists], dtype=np.int64)
        self.doc_count = len(self.urls)
        self.sum_ttf = int(self.dl.sum())
        # postings: term -> (docids sorted, freqs, dls); positions: term ->
        # flat positions aligned with np.repeat(docids, freqs)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self.positions: dict[str, np.ndarray] = {}
        accum: dict[str, dict[int, list[int]]] = {}
        for docid, (toks, poss) in enumerate(pairs):
            for t, p in zip(toks, poss):
                accum.setdefault(t, {}).setdefault(docid, []).append(p)
        for t, dmap in accum.items():
            d = np.array(sorted(dmap), dtype=np.int64)
            f = np.array([len(dmap[i]) for i in d], dtype=np.int64)
            self.postings[t] = (d, f, self.dl[d])
            self.positions[t] = np.array(
                [p for i in d for p in dmap[int(i)]], dtype=np.int64
            )

    def stats(self) -> CollectionStats:
        return CollectionStats(self.doc_count, self.sum_ttf)

    def search(self, query: str | tuple, k: int = 10, precision: str = "lucene",
               k1: float = 1.2, b: float = 0.75,
               boosts: dict[str, float] | None = None) -> pd.DataFrame:
        empty = pd.DataFrame({"rank": [], "docid": [], "url": [], "score": []})
        node = rewrite(parse_query(query) if isinstance(query, str) else query)
        if node is None:
            return empty
        terms = sorted(set(query_terms(node)))
        dfs = {t: len(self.postings[t][0]) for t in terms if t in self.postings}
        node = attach_scorers(node, dfs, self.stats(), k1, b, precision)
        if node is None:
            return empty
        if node[0] == "and" and any(t not in dfs for t in terms):
            return empty
        boosts = boosts or {}
        scorers = {
            t: BM25Scorer(dfs[t], self.stats(), k1=k1, b=b,
                          boost=boosts.get(t, 1.0), precision=precision)
            for t in dfs
        }
        sub = {t: self.postings[t] for t in dfs}
        pos_map = getattr(self, "positions", {})  # tests may build via __new__
        pos = {t: pos_map[t] for t in dfs if t in pos_map}
        d, s = score_query_node(node, sub, scorers, precision, pos)
        if len(d) == 0:
            return empty
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
