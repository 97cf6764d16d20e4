"""TermAutomatonQuery: a proximity query whose transitions are terms.

Reference: sandbox/src/java/org/apache/lucene/sandbox/search/
TermAutomatonQuery.java + TermAutomatonScorer.java — the generalization of
PhraseQuery / MultiPhraseQuery / SpanNearQuery: build an automaton over
states where each transition consumes one token position, labeled with a
term or ANY (any token), then count how many times the automaton matches a
run of consecutive positions in each document.

Faithful pieces:
  - finish() (:127-206): ANY arcs are rewritten to match every symbol, a
    leading or trailing (into-accept) ANY is illegal, the automaton is
    determinized with dead states removed, and accepting the empty string
    is illegal.
  - countMatches() (TermAutomatonScorer.java:231-356): positions of all
    query terms in the doc are walked in order; at each term position every
    live automaton state steps by that term's symbol (appending to the
    next position's state LIST — the reference does not deduplicate, so
    convergent paths each count), a fresh match is attempted from state 0,
    every step landing on an accept state increments freq, and when ANY
    arcs exist the gap positions between consecutive term positions advance
    live states by the ANY symbol (with the reference's petered-out early
    stop).
  - Weight (:365-405): ONE SimScorer over the stats of all query terms
    present in the dictionary (summed idf, like PhraseWeight/SpanWeight);
    score = sim.score(freq, dl).

Terms are exact index terms (the reference takes BytesRef, no analysis).
Execution rides the span machinery's shape: the node acts as a disjunction
of its terms (the reference docs say exactly this), candidates are decoded
per segment, and the per-candidate walk runs inside the segment kernel.
"""

from __future__ import annotations

import numpy as np

ANY = -1  # public marker for add_any_transition


class TermAutomatonQuery:
    """Builder: ``create_state`` / ``set_accept`` / ``add_transition`` /
    ``add_any_transition`` / ``finish()`` → a query node for search()."""

    def __init__(self):
        self._n_states = 1  # state 0 is always the initial state
        self._accept: set[int] = set()
        self._arcs: list[tuple[int, int, int]] = []  # (src, dst, sym)
        self._terms: list[str] = []
        self._term_id: dict[str, int] = {}
        self._any_used = False
        self._spec: dict | None = None

    def create_state(self) -> int:
        self._n_states += 1
        return self._n_states - 1

    def set_accept(self, state: int, accept: bool = True) -> None:
        if accept:
            self._accept.add(state)
        else:
            self._accept.discard(state)

    def _tid(self, term: str) -> int:
        if term not in self._term_id:
            self._term_id[term] = len(self._terms)
            self._terms.append(term)
        return self._term_id[term]

    def add_transition(self, source: int, dest: int, term: str) -> None:
        self._arcs.append((source, dest, self._tid(term)))

    def add_any_transition(self, source: int, dest: int) -> None:
        self._any_used = True
        self._arcs.append((source, dest, ANY))

    def finish(self) -> tuple:
        """Validate + determinize; returns the engine AST node."""
        n_terms = len(self._terms)
        any_sym = n_terms  # ANY gets the last symbol id
        for src, dst, sym in self._arcs:
            if sym == ANY and src == 0:
                raise ValueError("automaton cannot lead with an ANY transition")
            if sym == ANY and dst in self._accept:
                raise ValueError("automaton cannot end with an ANY transition")
        # NFA step table: symbol s follows arcs labeled s OR labeled ANY
        # (finish() rewrites any arcs to match every term, :175-195); the
        # ANY symbol itself follows only ANY arcs.
        by_src: dict[int, list[tuple[int, int]]] = {}
        for src, dst, sym in self._arcs:
            by_src.setdefault(src, []).append((dst, sym))
        # subset construction over symbols 0..n_terms (terms + ANY)
        start = frozenset([0])
        dfa_id = {start: 0}
        order = [start]
        trans: dict[tuple[int, int], int] = {}
        i = 0
        while i < len(order):
            cur = order[i]
            for sym in range(n_terms + 1):
                nxt = set()
                for st in cur:
                    for dst, asym in by_src.get(st, ()):
                        if asym == sym or asym == ANY:
                            nxt.add(dst)
                if not nxt:
                    continue
                key = frozenset(nxt)
                if key not in dfa_id:
                    if len(dfa_id) >= 10000:
                        raise ValueError("too many determinized states")
                    dfa_id[key] = len(order)
                    order.append(key)
                trans[(i, sym)] = dfa_id[key]
            i += 1
        accept = {dfa_id[s] for s in order if s & self._accept}
        if 0 in accept:
            raise ValueError("cannot accept the empty string")
        # remove dead states (cannot reach accept) — removeDeadStates
        rev: dict[int, set[int]] = {}
        for (src, _sym), dst in trans.items():
            rev.setdefault(dst, set()).add(src)
        live = set(accept)
        stack = list(accept)
        while stack:
            s = stack.pop()
            for p in rev.get(s, ()):
                if p not in live:
                    live.add(p)
                    stack.append(p)
        trans = {k: v for k, v in trans.items()
                 if v in live and (k[0] in live or k[0] == 0)}
        spec = {
            "terms": tuple(self._terms),
            "any_sym": any_sym if self._any_used else -1,
            "trans": trans,
            "accept": frozenset(accept),
        }
        return ("termauto", spec)


def count_matches(events: list[tuple[int, int]], trans: dict, accept,
                  any_sym: int) -> int:
    """The TermAutomatonScorer.countMatches walk (:231-356) for one doc.
    ``events``: (position, term symbol) sorted by position."""
    freq = 0
    positions: dict[int, list[int]] = {}
    last_pos = -1
    for pos, tid in events:
        if any_sym != -1 and last_pos != -1:
            start_last = last_pos
            while last_pos < pos:
                cur = positions.get(last_pos)
                if not cur and last_pos > start_last:
                    break  # petered out (:282-285)
                nxt = positions.setdefault(last_pos + 1, [])
                for st in cur or ():
                    ns = trans.get((st, any_sym))
                    if ns is not None:
                        nxt.append(ns)
                last_pos += 1
        cur = positions.get(pos, ())
        nxt = positions.setdefault(pos + 1, [])
        for st in cur:
            ns = trans.get((st, tid))
            if ns is not None:
                nxt.append(ns)
                if ns in accept:
                    freq += 1
        ns = trans.get((0, tid))  # start a new match at this position
        if ns is not None:
            nxt.append(ns)
            if ns in accept:
                freq += 1
        last_pos = pos
    return freq


def termauto_eval(node, postings_by_term, pos_by_term, precision):
    """Evaluate a ("termauto", spec, scorer) node against one segment's
    decoded postings → (docids, float64 scores).  Shape mirrors span_eval:
    the term-position streams merge per candidate doc and the faithful
    per-doc walk runs over query-term positions only (candidates are the
    DISJUNCTION of the automaton's terms, as the reference documents)."""
    from .spans import _term_stream

    spec, scorer = node[1], node[-1]
    terms = spec["terms"]
    parts = []
    for tid, t in enumerate(terms):
        d, s, _e, _w = _term_stream(t, postings_by_term, pos_by_term)
        if len(d):
            parts.append((d, s, np.full(len(d), tid, dtype=np.int64)))
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    d = np.concatenate([p[0] for p in parts])
    pos = np.concatenate([p[1] for p in parts])
    tid = np.concatenate([p[2] for p in parts])
    order = np.lexsort((pos, d))
    d, pos, tid = d[order], pos[order], tid[order]
    bounds = np.flatnonzero(np.r_[True, d[1:] != d[:-1], True])
    trans, accept, any_sym = spec["trans"], spec["accept"], spec["any_sym"]
    udocs: list[int] = []
    freqs: list[int] = []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        f = count_matches(
            list(zip(pos[lo:hi].tolist(), tid[lo:hi].tolist())),
            trans, accept, any_sym)
        if f > 0:
            udocs.append(int(d[lo]))
            freqs.append(f)
    if not udocs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    ud = np.asarray(udocs, dtype=np.int64)
    fr = np.asarray(freqs, dtype=np.float64)
    dl = np.zeros(len(ud), dtype=np.int64)
    for t in terms:
        if t not in postings_by_term:
            continue
        td, _tf, tdl = postings_by_term[t]
        p = np.searchsorted(td, ud)
        pc = np.minimum(p, max(len(td) - 1, 0))
        hit = (p < len(td)) & (td[pc] == ud) if len(td) else np.zeros(len(ud), bool)
        dl[hit] = tdl[pc[hit]]
    scores = scorer.score_from_dl(fr, dl).astype(np.float64)
    return ud, scores
