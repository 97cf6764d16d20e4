"""MemoryIndex analog — single-document in-RAM index for prospective search.

Reference: memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java:
60-161 — "High-performance single-document main memory ... fulltext search
index ... targets fulltext search of huge numbers of queries over
comparatively small transient realtime data (prospective search)": one
document, zero or more named fields added via ``addField(name, text,
analyzer)`` (:79-81), arbitrary queries run against it, and
``float score = index.search(query)`` returns the document's score or 0.0
when it does not match (example at :104-119).

This analog reuses the engine's own analysis chain, BM25 similarity, and
exhaustive query kernel over numpy single-doc postings — the same code
paths the distributed engine runs per segment, shrunk to one doc.  Like the
reference, statistics are single-document: docCount = 1, sumTotalTermFreq =
the field's emitted-token count, so avgdl == dl and every present term has
df = 1 (MemoryIndexReader serves exactly this one-doc view, :1217+).

Multi-term queries (fuzzy / wildcard / range) expand against the in-memory
term set (the MemoryIndex terms dict is a SortedMap, :166), mirroring
search.expand_terms without a Spark termdict.

The heavy-fanout percolation use case (many stored queries vs a doc STREAM)
stays with monitor.match_documents — this class is the per-document,
driver-local tool the reference module provides.
"""

from __future__ import annotations

import re

import numpy as np

from .analysis import ENGLISH_STOP_WORDS, analyze_with_positions
from .kernel import _phrase_member_terms, score_query_node
from .search import (
    apply_boosts,
    attach_scorers,
    damerau_levenshtein,
    parse_query,
    query_terms,
    rewrite,
)
from .similarity import SIMILARITIES, CollectionStats


def _like_to_re(pat: str) -> re.Pattern:
    out = []
    for ch in pat:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$")


class MemoryIndex:
    """One document, one or more analyzed fields; ``search`` returns the
    BM25 score of the document against a query (0.0 = no match)."""

    def __init__(self, analyzer=ENGLISH_STOP_WORDS, default_field: str = "text"):
        self.analyzer = analyzer
        self.default_field = default_field
        # term -> (tf, positions); terms of non-default fields are
        # namespaced "field:term" like the distributed multi-field index
        self._tf: dict[str, int] = {}
        self._pos: dict[str, list[int]] = {}
        self._field_len: dict[str, int] = {}

    # --- build (MemoryIndex.addField, MemoryIndex.java:79-81) -------------

    def add_field(self, name: str, text: str) -> "MemoryIndex":
        if name in self._field_len:
            raise ValueError(f"field {name!r} already added")
        toks, poss = analyze_with_positions(text, self.analyzer)
        self._field_len[name] = len(toks)
        pfx = "" if name == self.default_field else f"{name}:"
        for t, p in zip(toks, poss):
            key = pfx + t
            self._tf[key] = self._tf.get(key, 0) + 1
            self._pos.setdefault(key, []).append(p)
        return self

    # --- query (MemoryIndex.search, MemoryIndex.java:104-119) -------------

    def search(
        self,
        query: str | tuple,
        precision: str = "lucene",
        k1: float = 1.2,
        b: float = 0.75,
        similarity: str = "bm25",
    ) -> float:
        fields = sorted(f for f in self._field_len if f != self.default_field)
        node = (
            parse_query(query, default_field=self.default_field, fields=fields)
            if isinstance(query, str) else query
        )
        node = rewrite(node, self.analyzer)
        if node is None:
            return 0.0
        node = self._expand_multiterm(node)
        if node is None:
            return 0.0
        node, term_boosts = apply_boosts(node)
        terms = sorted(set(query_terms(node)))
        # single-doc stats: docCount=1, sttf=default-field length (per-field
        # stats for namespaced terms) — df=1 for every present term
        dflt_len = self._field_len.get(self.default_field, 0)
        stats = CollectionStats(1, max(dflt_len, 1))

        def stats_for(t: str) -> CollectionStats:
            i = t.find(":")
            if i > 0 and t[:i] in self._field_len:
                return CollectionStats(1, max(self._field_len[t[:i]], 1))
            return stats

        dfs = {t: 1 for t in terms if t in self._tf}
        if not dfs:
            return 0.0
        sim_cls = SIMILARITIES[similarity]
        needs_cf = getattr(sim_cls, "NEEDS_CF", False)
        scorers = {
            t: sim_cls(1, stats_for(t), k1=k1, b=b,
                       boost=term_boosts.get(t, 1.0), precision=precision,
                       # single-doc collection: cf == the doc's tf
                       **({"cf": self._tf[t]} if needs_cf else {}))
            for t in dfs
        }
        node = attach_scorers(node, dfs, stats, k1, b, precision, sim_cls,
                              stats_for)
        if node is None:
            return 0.0

        def field_len_of(t: str) -> int:
            i = t.find(":")
            if i > 0 and t[:i] in self._field_len:
                return self._field_len[t[:i]]
            return dflt_len

        pbt = {
            t: (
                np.zeros(1, dtype=np.int64),
                np.array([self._tf[t]], dtype=np.int64),
                np.array([field_len_of(t)], dtype=np.int64),
            )
            for t in dfs
        }
        phrase_terms = _phrase_member_terms(node)
        pos_by_term = {
            t: np.array(self._pos[t], dtype=np.int64)
            for t in phrase_terms if t in self._pos
        } if phrase_terms else None
        d, s = score_query_node(node, pbt, scorers, precision, pos_by_term)
        return float(s[0]) if len(d) else 0.0

    # --- local multiterm expansion (MultiTermQuery.rewrite against the
    # in-memory SortedMap term set; mirrors search.expand_multiterm) -------

    def _expand_terms(self, *, like=None, fuzzy=None, lower=None, upper=None,
                      li=True, ui=True, field=None) -> list[str]:
        pfx = "" if field is None or field == self.default_field else f"{field}:"
        plen = len(pfx)
        cands = sorted(
            t[plen:] for t in self._tf
            if t.startswith(pfx) and (plen > 0 or ":" not in t)
        )
        if like is not None:
            rx = _like_to_re(like)
            keep = [t for t in cands if rx.match(t)]
        elif fuzzy is not None:
            base, max_edits, prefix_len = fuzzy
            keep = [
                t for t in cands
                if t[:prefix_len] == base[:prefix_len]
                and damerau_levenshtein(base, t, max_edits) <= max_edits
            ]
        else:
            keep = [
                t for t in cands
                if (lower is None or (t >= lower if li else t > lower))
                and (upper is None or (t <= upper if ui else t < upper))
            ]
        return [pfx + t for t in keep]

    def _expand_multiterm(self, node: tuple) -> tuple | None:
        def walk(n):
            kind = n[0]
            if kind == "fuzzy_raw":
                terms = self._expand_terms(
                    fuzzy=(n[1], n[2], n[3]), field=n[4] if len(n) > 4 else None
                )
                if not terms:
                    return None
                return ("syn", terms) if len(terms) > 1 else ("term", terms[0])
            if kind == "wildcard_raw":
                terms = self._expand_terms(
                    like=n[1], field=n[2] if len(n) > 2 else None
                )
                return ("const", terms, 1.0) if terms else None
            if kind == "range_raw":
                terms = self._expand_terms(
                    lower=n[1], upper=n[2], li=n[3], ui=n[4],
                    field=n[5] if len(n) > 5 else None,
                )
                return ("const", terms, 1.0) if terms else None
            if kind == "boost":
                sub = walk(n[1])
                return ("boost", sub, n[2]) if sub is not None else None
            if kind in ("or", "andn"):
                subs = [walk(c) for c in n[1]]
                if kind == "andn" and any(s is None for s in subs):
                    return None
                subs = [s for s in subs if s is not None]
                if not subs:
                    return None
                return (kind, subs) if len(subs) > 1 else subs[0]
            if kind == "dismax":
                subs = [s for s in (walk(c) for c in n[1]) if s is not None]
                if not subs:
                    return None
                return ("dismax", subs, n[2]) if len(subs) > 1 else subs[0]
            if kind in ("reqoptn", "notn"):
                head = walk(n[1])
                if head is None:
                    return None
                tails = [s for s in (walk(c) for c in n[2]) if s is not None]
                return (kind, head, tails) if tails else head
            if kind in ("not", "reqopt"):
                head = walk(n[1])
                if head is None:
                    return None
                return (kind, head, n[2])
            return n

        return walk(node)


def memory_search(text: str, query: str | tuple,
                  analyzer=ENGLISH_STOP_WORDS, **kw) -> float:
    """One-shot convenience: ``float score = search(String text, Query
    query)`` (MemoryIndex.java:75-77)."""
    return MemoryIndex(analyzer).add_field("text", text).search(query, **kw)
