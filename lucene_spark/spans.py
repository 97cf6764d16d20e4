"""Span queries — positional proximity algebra over the positions channel.

Reference: the spans package (lucene/core/src/java/org/apache/lucene/search/
spans/): SpanTermQuery (every term occurrence is a [p, p+1) span),
SpanOrQuery (merged sub-spans), SpanNearQuery with ordered
(NearSpansOrdered.java) and unordered (NearSpansUnordered.java) matching,
SpanFirstQuery (SpanFirstQuery.java:38-43 accepts spans with end <= limit),
SpanNotQuery (SpanNotQuery.java:196-215 accepts include spans that no exclude
span overlaps within [start-pre, end+post)), scored by SpanScorer.java:99-117:
freq accumulates 1/(1 + span.width()) per enumerated match, under a
SpanWeight built from ALL member terms' statistics (SpanWeight.buildSimWeight
— the same Σ-idf multi-term weight as PhraseQuery; SpanNotQuery.java:117
builds it from the INCLUDE side only).

Faithfulness notes (asserted by tests/test_spans.py):
  - NearSpansOrdered's enumeration advances sub-span cursors monotonically
    (advancePosition, NearSpansOrdered.java:122-129).  For length-1 sub-spans
    (terms / OR-of-terms) the cursor targets are non-decreasing in the lead
    position, so the greedy chain per lead occurrence — q_i = first sub_i
    span with start >= prev end — reproduces the cursor walk exactly; this
    makes the whole ordered evaluation one vectorized searchsorted chain.
    matchWidth = Σ gaps between consecutive spans (stretchToOrder,
    NearSpansOrdered.java:100-119), and only width <= slop chains emit spans.
  - NearSpansUnordered keeps a start-ordered heap over sub-span cursors;
    every cursor state is tested once: match iff
    maxEnd - minStart - Σ spanLength <= slop (atMatch, :81-84), emitting a
    span with scoring width = maxEnd - minStart (width(), :161-163, NOT
    reduced by span lengths), then the minimum cursor advances.
  - SpanScorer.setFreqCurrentDoc accumulates ``freq`` in float32
    (``float freq``; freq += 1.0/(1.0+width) rounds each step) — replicated
    in 'lucene' precision; float64 mode accumulates in double for the
    DuckDB-replicable gate path.

Spans here are flat numpy streams (docids, starts, ends, widths) sorted by
(doc, start) — the per-segment analog of the Spans iterator, produced
inside the same applyInPandas segment kernel as every other query node, so
span queries ride the identical distributed execution (posting rows grouped
by segment; no extra shuffle).
"""

from __future__ import annotations

import heapq

import numpy as np

_SHIFT = np.int64(32)


def _sub(x):
    return ("sterm", x) if isinstance(x, str) else x


def span_term(text: str) -> tuple:
    """SpanTermQuery builder (raw AST; analyze happens in search.rewrite)."""
    return ("sterm", text)


def span_or(terms) -> tuple:
    """SpanOrQuery over terms."""
    return ("span_or", list(terms))


def span_near(subs, slop: int = 0, ordered: bool = True) -> tuple:
    """SpanNearQuery: sub-spans (strings, span_term or span_or) within
    ``slop``, ordered or not."""
    return ("span_near", [_sub(s) for s in subs], slop, ordered)


def span_first(sub, end: int) -> tuple:
    """SpanFirstQuery: spans of ``sub`` ending at position <= ``end``."""
    return ("span_first", _sub(sub), end)


def span_position_range(sub, start: int, end: int) -> tuple:
    """SpanPositionRangeQuery (spans/SpanPositionRangeQuery.java:30-60):
    spans of ``sub`` with start >= ``start`` and end <= ``end`` —
    SpanFirst is the (0, n) special case."""
    return ("span_position_range", _sub(sub), start, end)


def span_not(include, exclude, pre: int = 0, post: int = 0) -> tuple:
    """SpanNotQuery: ``include`` spans with no ``exclude`` span within
    ``pre`` tokens before / ``post`` tokens after."""
    return ("span_not", _sub(include), _sub(exclude), pre, post)


def span_field_masked(sub, field: str) -> tuple:
    """FieldMaskingSpanQuery (spans/FieldMaskingSpanQuery.java:55-78): run
    ``sub`` against ``field``'s postings while composing with the enclosing
    span query as if it lived on that query's field — the parallel-fields
    trick (matching teacher:james near(masked) first-name:smith).  Our
    per-field position sequences share the doc's coordinate space exactly
    when the fields are parallel, as the reference requires."""
    return ("span_mask", _sub(sub), field)


def span_containing(big, little) -> tuple:
    """SpanContainingQuery: ``big`` spans that contain a ``little`` span
    (big.start <= little.start and little.end <= big.end, same doc) —
    SpanContainingQuery.java:33-41 / ContainSpans.java."""
    return ("span_containing", _sub(big), _sub(little))


def span_within(big, little) -> tuple:
    """SpanWithinQuery: ``little`` spans that lie within a ``big`` span —
    SpanWithinQuery.java:33-41 (the mirror direction of containing)."""
    return ("span_within", _sub(big), _sub(little))

_EMPTY = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
)


def _term_stream(t, postings_by_term, pos_by_term):
    """SpanTermQuery: one [p, p+1) span per occurrence, width 0."""
    if t not in postings_by_term or t not in pos_by_term:
        return _EMPTY
    d, f, _ = postings_by_term[t]
    docs = np.repeat(d, f)
    starts = pos_by_term[t].astype(np.int64, copy=False)
    return docs, starts, starts + 1, np.zeros(len(starts), dtype=np.int64)


def _or_stream(streams):
    """SpanOrQuery: merged sub-streams ordered by (doc, start, end) —
    the DisiPriorityQueue/SpanPositionQueue merge (SpanOrQuery.java:204-245)
    materialized as one lexsort."""
    streams = [s for s in streams if len(s[0])]
    if not streams:
        return _EMPTY
    docs = np.concatenate([s[0] for s in streams])
    starts = np.concatenate([s[1] for s in streams])
    ends = np.concatenate([s[2] for s in streams])
    widths = np.concatenate([s[3] for s in streams])
    order = np.lexsort((ends, starts, docs))
    return docs[order], starts[order], ends[order], widths[order]


def _near_ordered(streams, slop):
    """NearSpansOrdered over length-1 sub-spans, vectorized across all docs:
    for every occurrence of the lead sub-span, chain each following sub-span
    to its first span with start >= previous end (searchsorted on
    doc<<32|start keys); width = Σ gaps; keep chains with width <= slop.
    Emitted span: [lead start, last end), scoring width = matchWidth."""
    d0, s0, e0, w0 = streams[0]
    if len(d0) == 0:
        return _EMPTY
    n = len(d0)
    valid = np.ones(n, dtype=bool)
    width = np.zeros(n, dtype=np.int64)
    prev_end_key = (d0 << _SHIFT) + e0
    last_end = e0
    for di, si, ei, wi in streams[1:]:
        if len(di) == 0:
            return _EMPTY
        keys_i = (di << _SHIFT) + si
        idx = np.searchsorted(keys_i, prev_end_key, side="left")
        ok = idx < len(keys_i)
        idx_c = np.minimum(idx, len(keys_i) - 1)
        same_doc = di[idx_c] == d0
        valid &= ok & same_doc
        gap = si[idx_c] - (prev_end_key - (d0 << _SHIFT))
        width += np.where(valid, gap, 0)
        prev_end_key = (d0 << _SHIFT) + ei[idx_c]
        last_end = ei[idx_c]
    keep = valid & (width <= slop)
    return d0[keep], s0[keep], last_end[keep], width[keep]


def _near_unordered(streams, slop):
    """NearSpansUnordered: per candidate doc, walk the start-ordered heap of
    sub-span cursors; each state tests
    maxEnd - minStart - totalSpanLength <= slop and emits
    (minStart, maxEnd, width = maxEnd - minStart); the minimum cursor then
    advances (SpanTotalLengthEndPositionWindow, NearSpansUnordered.java:31-85)."""
    if any(len(s[0]) == 0 for s in streams):
        return _EMPTY
    # candidate docs = intersection of sub-stream doc sets
    cand = np.unique(streams[0][0])
    for s in streams[1:]:
        cand = cand[np.isin(cand, s[0], assume_unique=False)]
        if len(cand) == 0:
            return _EMPTY
    # per-stream doc slice bounds
    bounds = []
    for d, st, en, _ in streams:
        lo = np.searchsorted(d, cand, side="left")
        hi = np.searchsorted(d, cand, side="right")
        bounds.append((st, en, lo, hi))
    out_d, out_s, out_e, out_w = [], [], [], []
    for ci, doc in enumerate(cand):
        cursors = []  # (start, end, stream_ix, slice_pos)
        total_len = 0
        max_end = -1
        heap = []
        slices = []
        for st, en, lo, hi in bounds:
            a, b = int(lo[ci]), int(hi[ci])
            slices.append((st, en, a, b))
        for ix, (st, en, a, b) in enumerate(slices):
            s_, e_ = int(st[a]), int(en[a])
            heap.append((s_, e_, ix, a))
            total_len += e_ - s_
            max_end = max(max_end, e_)
        heapq.heapify(heap)
        while True:
            s_, e_, ix, pos = heap[0]
            if max_end - s_ - total_len <= slop:
                out_d.append(doc)
                out_s.append(s_)
                out_e.append(max_end)
                out_w.append(max_end - s_)
            st, en, a, b = slices[ix]
            if pos + 1 >= b:
                break
            ns, ne = int(st[pos + 1]), int(en[pos + 1])
            total_len += (ne - ns) - (e_ - s_)
            max_end = max(max_end, ne)
            heapq.heapreplace(heap, (ns, ne, ix, pos + 1))
    if not out_d:
        return _EMPTY
    return (np.asarray(out_d, dtype=np.int64), np.asarray(out_s, dtype=np.int64),
            np.asarray(out_e, dtype=np.int64), np.asarray(out_w, dtype=np.int64))


def _not_stream(inc, exc, pre, post):
    """SpanNotQuery accept filter: drop include spans overlapped by any
    exclude span within [start-pre, end+post) (SpanNotQuery.java:196-215:
    reject iff excl.end > cand.start - pre AND excl.start - post < cand.end).
    Exclude sub-spans here are length-1 (term/or-of-terms), so rejection is
    'exclude position in [start-pre, end+post-1]' — two searchsorteds."""
    d, s, e, w = inc
    if len(d) == 0:
        return _EMPTY
    ed, es, _, _ = exc
    if len(ed) == 0:
        return inc
    ex_keys = (ed << _SHIFT) + es
    lo = (d << _SHIFT) + np.maximum(s - pre, 0)
    hi = (d << _SHIFT) + (e + post)
    n_overlap = np.searchsorted(ex_keys, hi, side="left") - np.searchsorted(
        ex_keys, lo, side="left"
    )
    keep = n_overlap == 0
    return d[keep], s[keep], e[keep], w[keep]


def _containing_stream(big, little):
    """SpanContainingQuery filter: keep big spans with some little span
    inside.  Vectorized existence test: with little (doc, start)-sorted,
    the minimal little END-key among little spans with start-key >=
    big-start-key is a per-position suffix minimum; doc occupies the key
    high bits, so spans of later docs carry strictly larger keys and can
    never satisfy ``min end-key <= big end-key`` for an earlier doc —
    one searchsorted + one reverse-accumulate, no per-span walk
    (ContainSpans.java does this span-at-a-time)."""
    d, s, e, w = big
    ld, ls, le, _ = little
    if len(d) == 0 or len(ld) == 0:
        return _EMPTY
    skeys = (ld << _SHIFT) + ls
    suffmin = np.minimum.accumulate(((ld << _SHIFT) + le)[::-1])[::-1]
    lo = np.searchsorted(skeys, (d << _SHIFT) + s, side="left")
    ok = lo < len(skeys)
    loc = np.minimum(lo, len(skeys) - 1)
    keep = ok & (suffmin[loc] <= (d << _SHIFT) + e)
    return d[keep], s[keep], e[keep], w[keep]


def _within_stream(little, big):
    """SpanWithinQuery filter: keep little spans lying inside some big
    span.  Mirror of ``_containing_stream``: the maximal big END-key among
    big spans with start-key <= little-start-key is a prefix maximum;
    earlier docs' keys are strictly smaller than (doc << SHIFT) so they
    can never satisfy ``max end-key >= little end-key``."""
    ld, ls, le, lw = little
    d, s, e, _ = big
    if len(ld) == 0 or len(d) == 0:
        return _EMPTY
    bkeys = (d << _SHIFT) + s
    prefmax = np.maximum.accumulate((d << _SHIFT) + e)
    hi = np.searchsorted(bkeys, (ld << _SHIFT) + ls, side="right") - 1
    ok = hi >= 0
    hic = np.maximum(hi, 0)
    keep = ok & (prefmax[hic] >= (ld << _SHIFT) + le)
    return ld[keep], ls[keep], le[keep], lw[keep]


def span_stream(node, postings_by_term, pos_by_term):
    """Evaluate a span node → (docids, starts, ends, widths), (doc, start)
    sorted.  Node kinds: ("sterm", t) | ("sor", [t...]) |
    ("spannear", [sub...], slop, ordered[, scorer]) |
    ("spanfirst", sub, limit[, scorer]) |
    ("spannot", inc, exc, pre, post[, scorer]) | ("spanor", [t...][, scorer])."""
    kind = node[0]
    if kind == "sterm":
        return _term_stream(node[1], postings_by_term, pos_by_term)
    if kind in ("sor", "spanor"):
        return _or_stream(
            [_term_stream(t, postings_by_term, pos_by_term) for t in node[1]]
        )
    if kind == "spannear":
        subs = [span_stream(c, postings_by_term, pos_by_term) for c in node[1]]
        if any(len(s[0]) == 0 for s in subs):
            return _EMPTY
        if node[3]:  # ordered
            return _near_ordered(subs, node[2])
        return _near_unordered(subs, node[2])
    if kind == "spanfirst":
        d, s, e, w = span_stream(node[1], postings_by_term, pos_by_term)
        keep = e <= node[2]
        return d[keep], s[keep], e[keep], w[keep]
    if kind == "spanprange":
        d, s, e, w = span_stream(node[1], postings_by_term, pos_by_term)
        keep = (s >= node[2]) & (e <= node[3])
        return d[keep], s[keep], e[keep], w[keep]
    if kind == "spannot":
        inc = span_stream(node[1], postings_by_term, pos_by_term)
        exc = span_stream(node[2], postings_by_term, pos_by_term)
        return _not_stream(inc, exc, node[3], node[4])
    if kind == "spancontaining":
        big = span_stream(node[1], postings_by_term, pos_by_term)
        little = span_stream(node[2], postings_by_term, pos_by_term)
        return _containing_stream(big, little)
    if kind == "spanwithin":
        big = span_stream(node[1], postings_by_term, pos_by_term)
        little = span_stream(node[2], postings_by_term, pos_by_term)
        return _within_stream(little, big)
    raise ValueError(f"bad span node {node!r}")


def span_terms(node) -> list[str]:
    """All terms a span node touches (include + exclude: exclusion needs the
    excluded term's positions at evaluation time)."""
    kind = node[0]
    if kind == "sterm":
        return [node[1]]
    if kind in ("sor", "spanor"):
        return list(node[1])
    if kind == "spannear":
        out: list[str] = []
        for c in node[1]:
            out.extend(span_terms(c))
        return out
    if kind in ("spanfirst", "spanprange"):
        return span_terms(node[1])
    if kind == "spannot":
        return span_terms(node[1]) + span_terms(node[2])
    if kind in ("spancontaining", "spanwithin"):
        return span_terms(node[1]) + span_terms(node[2])
    raise ValueError(f"bad span node {node!r}")


def span_weight_terms(node) -> list[str]:
    """Terms contributing to the SpanWeight similarity stats: all sub-terms,
    except SpanNot uses the include side only (SpanNotQuery.java:117)."""
    if node[0] == "spannot":
        return span_weight_terms(node[1]) if node[1][0] == "spannot" else span_terms(node[1])
    return span_terms(node)


def span_required_groups(node) -> list[list[str]]:
    """Conjunctive term-group structure for upper-bound pruning: the node can
    only match inside a docID window where EVERY returned group has at least
    one member term present.  SpanNot contributes its include side only
    (exclusion can't create matches); SpanOr is one any-of group."""
    kind = node[0]
    if kind == "sterm":
        return [[node[1]]]
    if kind in ("sor", "spanor"):
        return [list(node[1])]
    if kind == "spannear":
        out: list[list[str]] = []
        for c in node[1]:
            out.extend(span_required_groups(c))
        return out
    if kind in ("spanfirst", "spanprange"):
        return span_required_groups(node[1])
    if kind == "spannot":
        return span_required_groups(node[1])
    if kind in ("spancontaining", "spanwithin"):
        # both sides must match somewhere in the doc (ContainSpans advances
        # big and little conjunctively)
        return span_required_groups(node[1]) + span_required_groups(node[2])
    raise ValueError(f"bad span node {node!r}")


def span_eval(node, postings_by_term, pos_by_term, precision):
    """SpanScorer analog: enumerate the node's spans, accumulate
    freq += 1/(1 + width) per match (float32 steps in 'lucene' precision —
    SpanScorer.java:110 ``float freq``), score BM25(freq) under the node's
    attached multi-term weight.  → (docids, float64 scores)."""
    scorer = node[-1]
    d, s, e, w = span_stream(node, postings_by_term, pos_by_term)
    if len(d) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    udocs, inverse = np.unique(d, return_inverse=True)
    contrib = 1.0 / (1.0 + w.astype(np.float64))
    if precision == "lucene":
        freqs = np.zeros(len(udocs), dtype=np.float32)
        np.add.at(freqs, inverse, contrib.astype(np.float32))
        freqs = freqs.astype(np.float64)
    else:
        freqs = np.zeros(len(udocs), dtype=np.float64)
        np.add.at(freqs, inverse, contrib)
    # doc length lookup from any member term present in the doc
    dl = np.zeros(len(udocs), dtype=np.int64)
    for t in span_terms(node):
        if t not in postings_by_term:
            continue
        td, _, tdl = postings_by_term[t]
        pos = np.searchsorted(td, udocs)
        pos_c = np.minimum(pos, max(len(td) - 1, 0))
        hit = (pos < len(td)) & (td[pos_c] == udocs) if len(td) else np.zeros(len(udocs), bool)
        dl[hit] = tdl[pos_c[hit]]
    scores = scorer.score_from_dl(freqs, dl).astype(np.float64)
    return udocs, scores
