"""Interval queries — minimal-interval semantics over the positions channel.

Reference: the intervals package (lucene/queries/src/java/org/apache/lucene/
queries/intervals/), which implements the minimal-interval algebra of
Clarke & Cormack / Vigna lazily over postings positions:

  - Intervals.term: one [p, p] interval per occurrence
    (TermIntervalsSource.java:229 minExtent = 1).
  - Intervals.ordered: minimal intervals containing all sub-intervals in
    order, sub-intervals non-overlapping (OrderedIntervalsSource.java:133-171
    — the cursor walk chains each sub to its first interval starting after
    the previous sub's end, then minimizes by re-advancing the lead).
  - Intervals.unordered: minimal intervals containing all subs in any order,
    overlaps allowed (UnorderedIntervalsSource.java:152-182 — start-ordered
    queue; each state emits [top.start, maxEnd] once minimal, then the
    earliest cursor advances).
  - Intervals.phrase: consecutive sub-intervals (BlockIntervalsSource.java:
    each sub starts exactly at the previous end + 1).
  - Intervals.or: disjunction ordered by (end asc, start desc), suppressing
    any interval that contains the previously emitted one
    (DisjunctionIntervalsSource.java:223-245 ``contains`` pop loop).
  - Filters: maxgaps / maxwidth (FilteredIntervalsSource.java:38-65),
    containing / containedBy / notContaining / notContainedBy
    (ContainingIntervalsSource.java etc.), extend
    (ExtendedIntervalsSource.java — start-before / end+after, floor 0).
  - gaps: ordered/unordered report width − Σ sub-widths
    (OrderedIntervalsSource.java:160-163); term/phrase report 0.

Scoring (IntervalQuery + IntervalScorer.java:66-75): per doc,
``freq = Σ 1 / max(length − minExtent + 1, 1)`` over the emitted intervals
(length = end − start + 1; minExtent = the source's minimum possible width:
term 1, ordered/unordered/phrase Σ subs, or = min over subs —
OrderedIntervalsSource/BlockIntervalsSource minExtent), then
score = saturation ``w · (1 − pivot/(pivot + freq))`` (default pivot 1,
IntervalQuery.java:71-84, IntervalScoreFunction.java:70-76) or sigmoid
``w · (1 − pivot^a/(freq^a + pivot^a))`` (IntervalScoreFunction.java:129).
Norms and collection statistics play no part — ``simScorer.score(freq, 1)``
— so interval scores are fully deterministic given positions, and the score
is bounded by the weight (IntervalScorer.getMaxScore = boost), which is what
the windowed kernel uses as the pruning upper bound.

Execution model: interval sources evaluate inside the same applyInPandas
segment kernel as every other query node — flat numpy streams
(docids, starts, ends, gaps) per segment, (doc, emission-order) sorted.
Hot shapes (term, or-of-terms, phrase blocks, unordered pairs) are
vectorized across all candidate docs; ordered and n-ary unordered replicate
the lazy iterator walks per candidate doc, run only on docs already pruned
to the conjunctive candidate set (every required term present).  The lazy
enumeration is deliberately preserved over a "fully minimal" closed form:
the reference iterators skip minimal intervals whose sub-choices the
monotone cursors passed over (e.g. ordered over positions [3,4]/[4,6,8]/
[3,5,7] emits only [3,5], not [4,7]), and freq-faithfulness — hence
rank-identity — requires reproducing exactly that (fuzz-pinned in
tests/test_intervals.py; for two single-position sources the walk provably
equals the minimal set, which is what the DuckDB gate oracles encode).
"""

from __future__ import annotations

import numpy as np

_SHIFT = np.int64(32)

_EMPTY = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
)


# ---------------------------------------------------------------- builders
# (Intervals.java factory surface; raw AST — terms are analyzed in
# search.rewrite, multiterm sources expand against the term dictionary)


def _sub(x):
    return ("iterm", x) if isinstance(x, str) else x


def iv_term(t: str) -> tuple:
    return ("iterm", t)


def iv_ordered(*subs) -> tuple:
    return ("i_ord", [_sub(s) for s in subs])


def iv_unordered(*subs) -> tuple:
    return ("i_unord", [_sub(s) for s in subs])


def iv_phrase(*subs) -> tuple:
    return ("i_block", [_sub(s) for s in subs])


def iv_or(*subs) -> tuple:
    return ("i_or", [_sub(s) for s in subs])


def iv_maxgaps(gaps: int, sub) -> tuple:
    return ("i_maxgaps", int(gaps), _sub(sub))


def iv_maxwidth(width: int, sub) -> tuple:
    return ("i_maxwidth", int(width), _sub(sub))


def iv_extend(sub, before: int, after: int) -> tuple:
    return ("i_extend", _sub(sub), int(before), int(after))


def iv_containing(big, small) -> tuple:
    return ("i_containing", _sub(big), _sub(small))


def iv_contained_by(small, big) -> tuple:
    return ("i_contained_by", _sub(small), _sub(big))


def iv_not_containing(minuend, subtrahend) -> tuple:
    return ("i_not_containing", _sub(minuend), _sub(subtrahend))


def iv_not_contained_by(small, big) -> tuple:
    return ("i_not_contained_by", _sub(small), _sub(big))


def iv_unordered_no_overlaps(a, b) -> tuple:
    # Intervals.unorderedNoOverlaps == or(ordered(a,b), ordered(b,a))
    # (Intervals.java:285-287) — expressed structurally, not special-cased
    return iv_or(iv_ordered(_sub(a), _sub(b)), iv_ordered(_sub(b), _sub(a)))


def iv_offset(sub, before: bool) -> tuple:
    """OffsetIntervalsSource: one single-position interval per sub interval —
    [max(0, start−1)] when ``before`` else [end+1] (OffsetIntervalsSource.java:
    52-84; gaps() = 0).  Internal building block of before/after."""
    return ("i_offset", _sub(sub), bool(before))


def iv_before(source, reference) -> tuple:
    """Intervals.before(source, reference): source intervals that appear
    before reference intervals — containedBy(source, extend(offset(ref,
    before), MAX_INT, 0)) exactly as Intervals.java:421-424 composes it."""
    return iv_contained_by(
        _sub(source), iv_extend(iv_offset(reference, True), _MAX_POS, 0)
    )


def iv_after(source, reference) -> tuple:
    """Intervals.before's mirror (Intervals.java:427-430): containedBy(
    source, extend(offset(ref, after), 0, MAX_INT))."""
    return iv_contained_by(
        _sub(source), iv_extend(iv_offset(reference, False), 0, _MAX_POS)
    )


def iv_overlapping(source, reference) -> tuple:
    """Intervals.overlapping (OverlappingIntervalsSource.java:42-62): source
    intervals overlapping some reference interval; conjunction — both sides
    must match the doc; minExtent/gaps come from the source side."""
    return ("i_overlapping", _sub(source), _sub(reference))


def iv_non_overlapping(minuend, subtrahend) -> tuple:
    """Intervals.nonOverlapping (NonOverlappingIntervalsSource.java:58-86):
    minuend intervals that do not overlap any subtrahend interval; the
    minuend stands alone in docs without the subtrahend (difference)."""
    return ("i_non_overlapping", _sub(minuend), _sub(subtrahend))


def iv_not_within(minuend, positions: int, subtrahend) -> tuple:
    """Intervals.notWithin = nonOverlapping(minuend, extend(subtrahend,
    positions, positions)) (Intervals.java:333-337) — structural, like
    unorderedNoOverlaps."""
    return iv_non_overlapping(
        _sub(minuend), iv_extend(subtrahend, int(positions), int(positions))
    )


def iv_within(source, positions: int, reference) -> tuple:
    """Intervals.within = containedBy(source, extend(reference, positions,
    positions)) (Intervals.java:348-351)."""
    return iv_contained_by(
        _sub(source), iv_extend(reference, int(positions), int(positions))
    )


def iv_at_least(min_should_match: int, *subs) -> tuple:
    """Intervals.atLeast (Intervals.java:406-418): intervals spanning
    combinations of intervals from ``min_should_match`` of the sources.
    Factory rewrites mirror the reference: m == n → unordered; m > n → a
    no-match source."""
    m = int(min_should_match)
    if m <= 0:
        raise ValueError("atLeast requires min_should_match >= 1")
    if m == len(subs):
        return iv_unordered(*subs)
    if m > len(subs):
        return ("i_none",)
    return ("i_atleast", m, [_sub(s) for s in subs])


# OffsetIntervalsSource clips end+1 overflow at Integer.MAX_VALUE−1 and
# extend() saturates rather than overflowing — positions here are small
# int64s, so Java's Integer.MAX_VALUE stands in as the unbounded extent.
_MAX_POS = 2**31 - 1


def iv_prefix(prefix: str) -> tuple:
    """Intervals.prefix — expands against the term dictionary at rewrite
    (MultiTermIntervalsSource) into an or-of-terms."""
    return ("i_prefix", prefix)


def iv_wildcard(pattern: str) -> tuple:
    return ("i_wildcard", pattern)


def interval_query(source, pivot: float = 1.0, exp: float | None = None,
                   boost: float = 1.0) -> tuple:
    """IntervalQuery(field, source[, pivot[, exp]]): saturation scoring by
    default; passing ``exp`` selects the sigmoid function
    (IntervalQuery.java:71-98)."""
    return ("interval_query", _sub(source), float(pivot),
            None if exp is None else float(exp), float(boost))


# ---------------------------------------------------------------- introspection


def interval_terms(src) -> list[str]:
    """Every index term the source touches (evaluation needs all of them,
    including subtracted sides of notContaining/notContainedBy)."""
    kind = src[0]
    if kind == "iterm":
        return [src[1]]
    if kind in ("i_ord", "i_unord", "i_block", "i_or"):
        out: list[str] = []
        for c in src[1]:
            out.extend(interval_terms(c))
        return out
    if kind in ("i_maxgaps", "i_maxwidth"):
        return interval_terms(src[2])
    if kind == "i_extend":
        return interval_terms(src[1])
    if kind in ("i_containing", "i_contained_by", "i_not_containing",
                "i_not_contained_by", "i_overlapping", "i_non_overlapping"):
        return interval_terms(src[1]) + interval_terms(src[2])
    if kind == "i_offset":
        return interval_terms(src[1])
    if kind == "i_atleast":
        out = []
        for c in src[2]:
            out.extend(interval_terms(c))
        return out
    if kind == "i_none":
        return []
    raise ValueError(f"bad interval node {src!r}")


def interval_required_groups(src) -> list[list[str]]:
    """Conjunctive any-of term groups: the source can only emit inside a doc
    where every returned group has a member present.  Mirrors
    span_required_groups — used for candidate pruning and window bounds.
    Subtracted sides (notContaining/notContainedBy) contribute nothing;
    containing/containedBy require both sides."""
    kind = src[0]
    if kind == "iterm":
        return [[src[1]]]
    if kind == "i_or":
        group: list[str] = []
        for c in src[1]:
            group.extend(interval_terms(c))
        return [group]
    if kind in ("i_ord", "i_unord", "i_block"):
        out: list[list[str]] = []
        for c in src[1]:
            out.extend(interval_required_groups(c))
        return out
    if kind in ("i_maxgaps", "i_maxwidth"):
        return interval_required_groups(src[2])
    if kind == "i_extend":
        return interval_required_groups(src[1])
    if kind in ("i_containing", "i_contained_by", "i_overlapping"):
        return interval_required_groups(src[1]) + interval_required_groups(src[2])
    if kind in ("i_not_containing", "i_not_contained_by",
                "i_non_overlapping"):
        return interval_required_groups(src[1])
    if kind == "i_offset":
        return interval_required_groups(src[1])
    if kind == "i_atleast":
        # only m of n sources must match — the strongest per-term requirement
        # is "some term of some source present" (one any-of group)
        group: list[str] = []
        for c in src[2]:
            group.extend(interval_terms(c))
        return [group]
    if kind == "i_none":
        return [[]]
    raise ValueError(f"bad interval node {src!r}")


def interval_min_extent(src) -> int:
    """IntervalsSource.minExtent: term 1 (TermIntervalsSource.java:229);
    ordered/unordered/block Σ subs; or = min over subs
    (DisjunctionIntervalsSource.java:136-141); filters pass through;
    extend adds before+after (ExtendedIntervalsSource.java:67-72);
    containing emits the big side, containedBy the small side."""
    kind = src[0]
    if kind == "iterm":
        return 1
    if kind in ("i_ord", "i_unord", "i_block"):
        return sum(interval_min_extent(c) for c in src[1])
    if kind == "i_or":
        return min(interval_min_extent(c) for c in src[1])
    if kind in ("i_maxgaps", "i_maxwidth"):
        return interval_min_extent(src[2])
    if kind == "i_extend":
        return src[2] + interval_min_extent(src[1]) + src[3]
    if kind in ("i_containing", "i_not_containing", "i_contained_by",
                "i_not_contained_by", "i_overlapping", "i_non_overlapping"):
        return interval_min_extent(src[1])
    if kind == "i_offset":
        # start() == end() → width always 1 (OffsetIntervalIterator)
        return 1
    if kind == "i_atleast":
        # MinimumShouldMatchIntervalsSource.minExtent: sum of the m smallest
        # sub extents (MinimumShouldMatchIntervalsSource.java:102-112)
        exts = sorted(interval_min_extent(c) for c in src[2])
        return sum(exts[: src[1]])
    if kind == "i_none":
        return 0
    raise ValueError(f"bad interval node {src!r}")


def _is_single_pos(src) -> bool:
    """True when every interval the source emits is a single position
    ([p, p]) — term or or-of-terms — enabling the vectorized paths."""
    if src[0] == "iterm":
        return True
    if src[0] == "i_or":
        return all(_is_single_pos(c) for c in src[1])
    return False


# ---------------------------------------------------------------- streams
# A stream is (docs, starts, ends, gaps): int64 arrays sorted by doc, and
# within doc in the source iterator's emission order.


def _term_stream(t, postings_by_term, pos_by_term):
    if t not in postings_by_term or t not in pos_by_term:
        return _EMPTY
    d, f, _ = postings_by_term[t]
    docs = np.repeat(d, f)
    starts = pos_by_term[t].astype(np.int64, copy=False)
    return docs, starts, starts.copy(), np.zeros(len(starts), dtype=np.int64)


def _or_single_pos_stream(streams):
    """Or over single-position subs: duplicates of the same position are
    identical intervals — the disjunction's contains-check suppresses the
    duplicate — so the merged stream is the per-doc unique position set."""
    streams = [s for s in streams if len(s[0])]
    if not streams:
        return _EMPTY
    keys = np.concatenate([(s[0] << _SHIFT) + s[1] for s in streams])
    keys = np.unique(keys)
    docs = keys >> _SHIFT
    starts = keys - (docs << _SHIFT)
    return docs, starts, starts.copy(), np.zeros(len(starts), dtype=np.int64)


def _or_stream(subs, postings_by_term, pos_by_term):
    if all(_is_single_pos(c) for c in subs):
        return _or_single_pos_stream(
            [interval_stream(c, postings_by_term, pos_by_term) for c in subs]
        )
    streams = [interval_stream(c, postings_by_term, pos_by_term) for c in subs]
    streams = [s for s in streams if len(s[0])]
    if not streams:
        return _EMPTY
    d = np.concatenate([s[0] for s in streams])
    st = np.concatenate([s[1] for s in streams])
    en = np.concatenate([s[2] for s in streams])
    gp = np.concatenate([s[3] for s in streams])
    # queue order: (doc, end asc, start desc) — DisjunctionIntervalsSource's
    # lessThan (end < end || end == end && start >= start)
    order = np.lexsort((-st, en, d))
    d, st, en, gp = d[order], st[order], en[order], gp[order]
    # walk: emit unless the candidate contains the most recently emitted
    # interval in the same doc (the pop-while-contains loop)
    keep = np.ones(len(d), dtype=bool)
    last_doc = -1
    last_s = last_e = 0
    for i in range(len(d)):
        if d[i] != last_doc:
            last_doc, last_s, last_e = d[i], st[i], en[i]
            continue
        if st[i] <= last_s and en[i] >= last_e:
            keep[i] = False
        else:
            last_s, last_e = st[i], en[i]
    return d[keep], st[keep], en[keep], gp[keep]


def _block_single_pos(streams):
    """Phrase/block over single-position subs: consecutive positions.  Every
    occurrence chain p, p+1, …, p+k−1 is already minimal."""
    d0, s0, _, _ = streams[0]
    if len(d0) == 0:
        return _EMPTY
    keys = (d0 << _SHIFT) + s0
    valid = np.ones(len(d0), dtype=bool)
    for j, (di, si, _, _) in enumerate(streams[1:], 1):
        if len(di) == 0:
            return _EMPTY
        keys_i = (di << _SHIFT) + si
        idx = np.searchsorted(keys_i, keys + j)
        ok = idx < len(keys_i)
        idx_c = np.minimum(idx, len(keys_i) - 1)
        valid &= ok & (keys_i[idx_c] == keys + j)
    d, s = d0[valid], s0[valid]
    k = len(streams)
    return d, s, s + k - 1, np.zeros(len(d), dtype=np.int64)


def _unordered_pair_single_pos(sa, sb):
    """Unordered over two single-position subs, vectorized: the queue walk
    emits exactly the consecutive pairs of the merged per-doc position list
    whose endpoints come from different subs (plus [p, p] when both subs
    share a position) — verified against the iterator transliteration."""
    da, pa = sa[0], sa[1]
    db, pb = sb[0], sb[1]
    if len(da) == 0 or len(db) == 0:
        return _EMPTY
    keys = np.concatenate([(da << _SHIFT) + pa, (db << _SHIFT) + pb])
    labels = np.concatenate([np.zeros(len(da), np.int8), np.ones(len(db), np.int8)])
    order = np.argsort(keys, kind="stable")
    keys, labels = keys[order], labels[order]
    docs = keys >> _SHIFT
    pos = keys - (docs << _SHIFT)
    if len(keys) < 2:
        return _EMPTY
    same_doc = docs[:-1] == docs[1:]
    hetero = labels[:-1] != labels[1:]
    dup = same_doc & (pos[:-1] == pos[1:])  # both subs at one position
    pair = same_doc & hetero & ~dup
    # shared-position single-point intervals [p, p]
    d_dup, s_dup = docs[:-1][dup & hetero], pos[:-1][dup & hetero]
    d_p, s_p, e_p = docs[:-1][pair], pos[:-1][pair], pos[1:][pair]
    # a [p,p] duplicate also suppresses the adjacent wider pairs through the
    # minimality walk; drop pairs whose endpoint doc has a dup at either end
    if len(d_dup):
        dup_keys = (d_dup << _SHIFT) + s_dup
        lo = np.searchsorted(dup_keys, (d_p << _SHIFT) + s_p)
        hi = np.searchsorted(dup_keys, (d_p << _SHIFT) + e_p, side="right")
        d_p, s_p, e_p = d_p[lo == hi], s_p[lo == hi], e_p[lo == hi]
    d = np.concatenate([d_dup, d_p])
    s = np.concatenate([s_dup, s_p])
    e = np.concatenate([s_dup, e_p])
    order = np.lexsort((s, d))
    d, s, e = d[order], s[order], e[order]
    return d, s, e, (e - s + 1) - 2


def _unordered_nary_single_pos(subs, cand):
    """N-ary unordered over single-position subs, vectorized — the lockstep
    form of :func:`_walk_unordered` for the common all-term case.

    The queue walk linearizes to a one-advance-per-step automaton (state per
    doc: cursor positions, queue end ``q_end``, last emitted start, and a
    skip/minimize phase flag), so ALL candidate docs advance together: one
    numpy iteration performs one automaton step per still-active doc.  Ties
    in the queue break by sub index asc — PhraseQueue order (start asc,
    end desc, index), which for width-1 intervals is (pos, -pos, ix) — and
    ``np.argmin`` picks the first minimum, matching.  Faithfulness to the
    iterator transliteration (incl. the repeated-start skip and the
    emit-on-q_end-growth minimization) is fuzz-asserted in
    tests/test_intervals.py."""
    n = len(subs)
    nd = len(cand)
    bounds = [_doc_slices(s, cand) for s in subs]
    # flattened per-sub positions restricted to candidate docs
    flats, starts, counts = [], [], []
    for (lo, hi), (d, st, en, gp) in zip(bounds, subs):
        cnt = (hi - lo).astype(np.int64)
        total = int(cnt.sum())
        news = np.cumsum(cnt) - cnt
        idx = (np.arange(total, dtype=np.int64) - np.repeat(news, cnt)
               + np.repeat(lo.astype(np.int64), cnt))
        flats.append(st[idx])
        starts.append(news)
        counts.append(cnt)
    ptr = np.stack(starts, axis=1)          # (nd, n) index into flats[j]
    cnt = np.stack(counts, axis=1)
    end_ptr = np.stack(starts, axis=1) + cnt
    pos = np.empty((nd, n), dtype=np.int64)
    for j in range(n):
        pos[:, j] = flats[j][ptr[:, j]]
    q_end = pos.max(axis=1)
    last_start = np.full(nd, -1, dtype=np.int64)
    phase = np.zeros(nd, dtype=np.int8)     # 0 = outer entry (skip), 1 = minimizing
    active = np.ones(nd, dtype=bool)
    rows = np.arange(nd, dtype=np.int64)
    out_d, out_s, out_e = [], [], []
    while active.any():
        ai = rows[active]
        apos = pos[ai]
        top = np.argmin(apos, axis=1)
        tpos = apos[np.arange(len(ai)), top]
        skipm = (phase[ai] == 0) & (tpos == last_start[ai])
        start = tpos
        end = q_end[ai]
        emit_now = ~skipm & (start == end)
        advm = ~emit_now                     # skip docs and minimize docs advance
        # --- advance the top cursor of advancing docs ---
        adv_rows = ai[advm]
        adv_sub = top[advm]
        new_ptr = ptr[adv_rows, adv_sub] + 1
        died = new_ptr >= end_ptr[adv_rows, adv_sub]
        ok = ~died
        ptr[adv_rows, adv_sub] = np.minimum(new_ptr, end_ptr[adv_rows, adv_sub] - 1)
        for j in range(n):
            m = ok & (adv_sub == j)
            if m.any():
                r = adv_rows[m]
                newp = flats[j][ptr[r, j]]
                pos[r, j] = newp
                q_end[r] = np.maximum(q_end[r], newp)
        # --- emissions ---
        died_full = np.zeros(len(ai), dtype=bool)
        died_full[advm] = died
        grew = np.zeros(len(ai), dtype=bool)
        grew[advm] = q_end[adv_rows] > end[advm]
        emit_after = ~skipm & ~emit_now & (died_full | grew)
        emit = emit_now | emit_after
        if emit.any():
            out_d.append(cand[ai[emit]])
            out_s.append(start[emit])
            out_e.append(end[emit])
            last_start[ai[emit]] = start[emit]
            phase[ai[emit]] = 0
        mini = ~skipm & ~emit_now & ~emit_after
        phase[ai[mini]] = 1
        dead = ai[died_full]
        if len(dead):
            active[dead] = False
    if not out_d:
        return _EMPTY
    d = np.concatenate(out_d)
    s = np.concatenate(out_s)
    e = np.concatenate(out_e)
    # per-doc emission order is already start-ascending; global (doc, start)
    # order for downstream combinators
    order = np.lexsort((s, d))
    d, s, e = d[order], s[order], e[order]
    return d, s, e, (e - s + 1) - n


# ------------------------------------------------------------ per-doc walks
# General compositions: replicate the lazy iterators per candidate doc.
# Sub-streams arrive as per-doc python slices of the numpy stream arrays.

_NO_MORE = 1 << 60  # NO_MORE_INTERVALS / Integer.MAX_VALUE stand-in


def _doc_slices(stream, docs):
    d = stream[0]
    lo = np.searchsorted(d, docs, side="left")
    hi = np.searchsorted(d, docs, side="right")
    return lo, hi


class _Cursor:
    """Per-doc IntervalIterator: a cursor over (starts, ends) arrays in
    emission order.  Unpositioned state reports -1 (as the Java iterators
    do before the first nextInterval); exhausted reports NO_MORE."""

    __slots__ = ("s", "e", "i")

    def __init__(self, s, e):
        self.s, self.e, self.i = s, e, -1

    def next(self):
        self.i += 1
        return self.start

    @property
    def start(self):
        if self.i < 0:
            return -1
        return int(self.s[self.i]) if self.i < len(self.s) else _NO_MORE

    @property
    def end(self):
        if self.i < 0:
            return -1
        return int(self.e[self.i]) if self.i < len(self.s) else _NO_MORE

    def width(self):
        return self.end - self.start + 1


def _walk_ordered(subs):
    """OrderedIntervalIterator state machine
    (OrderedIntervalsSource.java:133-171) over one doc's sub-interval
    lists: chain each sub to its first interval starting past the previous
    sub's end; once a full chain exists, re-advance the lead to minimize;
    an emission happens when the chain end is pinned.  Returns emission-order
    (starts, ends, gaps) lists."""
    cur = [_Cursor(s, e) for s, e, _ in subs]
    n = len(cur)
    cur[0].next()  # reset(): only the lead is positioned
    out_s, out_e, out_g = [], [], []
    while True:
        # --- one nextInterval() call ---
        start = _NO_MORE
        end = slop = _NO_MORE
        last_start = _NO_MORE
        minimizing = False
        i = 1
        ret = False
        while not ret:
            while True:
                if cur[i - 1].end >= last_start:
                    ret = True
                    break
                if i == n or (minimizing and cur[i].start > cur[i - 1].end):
                    break
                while True:
                    if cur[i].end >= last_start or cur[i].next() == _NO_MORE:
                        ret = True
                        break
                    if cur[i].start > cur[i - 1].end:
                        break
                if ret:
                    break
                i += 1
            if ret:
                break
            start = cur[0].start
            if start == _NO_MORE:
                break
            end = cur[n - 1].end
            slop = end - start + 1
            for c in cur:
                slop -= c.width()
            last_start = cur[n - 1].start
            i = 1
            if cur[0].next() == _NO_MORE:
                break  # emits the interval just computed, then exhausts
            minimizing = True
        if start == _NO_MORE:
            break
        out_s.append(start)
        out_e.append(end)
        out_g.append(slop)
    return out_s, out_e, out_g


def _walk_unordered(subs):
    """UnorderedIntervalIterator state machine
    (UnorderedIntervalsSource.java:152-182) over one doc: queue ordered by
    (start asc, end desc); skip states repeating the last emitted start,
    then shrink from the left while the right extreme holds; emit
    [top.start, queueEnd] with gaps = width − Σ current sub widths."""
    import heapq

    n = len(subs)
    cur = [_Cursor(s, e) for s, e, _ in subs]
    heap = []
    q_end = -1
    for ix, c in enumerate(cur):
        c.next()
        heap.append((c.start, -c.end, ix))
        q_end = max(q_end, c.end)
    heapq.heapify(heap)
    alive = n
    start = -1
    out_s, out_e, out_g = [], [], []

    def advance_top():
        nonlocal alive, q_end
        _, _, ix = heapq.heappop(heap)
        if cur[ix].next() != _NO_MORE:
            heapq.heappush(heap, (cur[ix].start, -cur[ix].end, ix))
            q_end = max(q_end, cur[ix].end)
        else:
            alive -= 1

    while True:
        # --- one nextInterval() call ---
        while alive == n and cur[heap[0][2]].start == start:
            advance_top()
        if alive < n:
            break
        while True:  # do-while: minimize
            top = cur[heap[0][2]]
            start = top.start
            end = q_end
            slop = end - start + 1
            for c in cur:
                slop -= c.width()
            if top.end == end:
                break
            advance_top()
            if not (alive == n and end == q_end):
                break
        out_s.append(start)
        out_e.append(end)
        out_g.append(slop)
        if alive < n:
            break
    return out_s, out_e, out_g


def _per_doc_combine(kind, sub_streams, cand):
    """Run the per-doc walk for ordered/unordered over candidate docs."""
    bounds = [_doc_slices(s, cand) for s in sub_streams]
    out_d, out_s, out_e, out_g = [], [], [], []
    walk = _walk_ordered if kind == "i_ord" else _walk_unordered
    for ci in range(len(cand)):
        subs = []
        empty = False
        for (lo, hi), (d, st, en, gp) in zip(bounds, sub_streams):
            a, b = int(lo[ci]), int(hi[ci])
            if a == b:
                empty = True
                break
            subs.append((st[a:b], en[a:b], gp[a:b]))
        if empty:
            continue
        ss, ee, gg = walk(subs)
        out_d.extend([int(cand[ci])] * len(ss))
        out_s.extend(ss)
        out_e.extend(ee)
        out_g.extend(gg)
    if not out_d:
        return _EMPTY
    return (np.asarray(out_d, np.int64), np.asarray(out_s, np.int64),
            np.asarray(out_e, np.int64), np.asarray(out_g, np.int64))


def _candidates(streams):
    cand = np.unique(streams[0][0])
    for s in streams[1:]:
        cand = cand[np.isin(cand, s[0])]
        if len(cand) == 0:
            break
    return cand


def _walk_atleast(subs, m):
    """MinimumShouldMatchIntervalIterator per-doc walk
    (MinimumShouldMatchIntervalsSource.java:215-280), faithful to the
    reference's two-queue algorithm and its quirks:

      - proximity queue (size m) ordered (start asc, end desc); background
        queue ordered (end asc, start desc); ties broken by sub index
        (Java's PriorityQueue tie order is insertion-dependent — sub index
        IS the insertion order of reset(), making this deterministic).
      - ``queueEnd`` is the max end ever to ENTER the proximity queue —
        monotone, never recomputed downward (updateRightExtreme).
      - emitted end = queueEnd; gaps = (end−start+1) − Σ current sub widths.
      - quirk kept: when the leading iterator exhausts inside the
        start-advancing loop, the background queue is NOT consulted and
        iteration ends for the doc (java:219-227 — the refill happens only
        on the nextInterval-success path there, unlike the minimizing loop).

    ``subs``: per-sub (starts, ends, gaps) arrays for one doc, each
    non-empty.  Returns (starts, ends, gaps) lists.
    """
    import heapq

    n = len(subs)
    ptr = [0] * n
    cs = [int(s[0][0]) for s in subs]
    ce = [int(s[1][0]) for s in subs]

    def adv(i):
        ptr[i] += 1
        if ptr[i] >= len(subs[i][0]):
            return False
        cs[i] = int(subs[i][0][ptr[i]])
        ce[i] = int(subs[i][1][ptr[i]])
        return True

    bg = [(ce[i], -cs[i], i) for i in range(n)]
    heapq.heapify(bg)
    prox: list = []
    queue_end = -1
    for _ in range(m):
        _, _, i = heapq.heappop(bg)
        heapq.heappush(prox, (cs[i], -ce[i], i))
        queue_end = max(queue_end, ce[i])
    start = end = -1
    out_s: list[int] = []
    out_e: list[int] = []
    out_g: list[int] = []
    while True:
        # advance past the previously returned start
        while len(prox) == m and prox[0][0] == start:
            _, _, i = heapq.heappop(prox)
            if adv(i):
                heapq.heappush(bg, (ce[i], -cs[i], i))
                _, _, j = heapq.heappop(bg)
                heapq.heappush(prox, (cs[j], -ce[j], j))
                queue_end = max(queue_end, ce[j])
        if len(prox) < m:
            break
        while True:  # the minimizing do-while
            start = prox[0][0]
            end = queue_end
            slop = end - start + 1
            for _, _, i in prox:
                slop -= ce[i] - cs[i] + 1
            if -prox[0][1] == end:
                break
            _, _, i = heapq.heappop(prox)
            if adv(i):
                heapq.heappush(bg, (ce[i], -cs[i], i))
            if bg:
                _, _, j = heapq.heappop(bg)
                heapq.heappush(prox, (cs[j], -ce[j], j))
                queue_end = max(queue_end, ce[j])
            if not (len(prox) == m and end == queue_end):
                break
        out_s.append(start)
        out_e.append(end)
        out_g.append(slop)
    return out_s, out_e, out_g


def _atleast_stream(sub_nodes, m, postings_by_term, pos_by_term):
    """i_atleast evaluation: sources with no intervals at all drop out
    (intervals() == null), docs need ≥ m live sources
    (MinimumShouldMatchIntervalsSource.java:51-63 + the disjunction
    approximation), then the per-doc queue walk runs on the matching subs."""
    streams = [interval_stream(c, postings_by_term, pos_by_term)
               for c in sub_nodes]
    streams = [s for s in streams if len(s[0])]
    if len(streams) < m:
        return _EMPTY
    alldocs = np.concatenate([np.unique(s[0]) for s in streams])
    vals, counts = np.unique(alldocs, return_counts=True)
    cand = vals[counts >= m]
    if len(cand) == 0:
        return _EMPTY
    bounds = [_doc_slices(s, cand) for s in streams]
    out_d, out_s, out_e, out_g = [], [], [], []
    for ci in range(len(cand)):
        subs = []
        for (lo, hi), (d, st, en, gp) in zip(bounds, streams):
            a, b = int(lo[ci]), int(hi[ci])
            if a < b:
                subs.append((st[a:b], en[a:b], gp[a:b]))
        if len(subs) < m:
            continue
        ss, ee, gg = _walk_atleast(subs, m)
        out_d.extend([int(cand[ci])] * len(ss))
        out_s.extend(ss)
        out_e.extend(ee)
        out_g.extend(gg)
    if not out_d:
        return _EMPTY
    return (np.asarray(out_d, np.int64), np.asarray(out_s, np.int64),
            np.asarray(out_e, np.int64), np.asarray(out_g, np.int64))


def _contain_mask(inner, outer, mode):
    """For each interval in ``inner``'s stream, does an interval of
    ``outer`` (dis)satisfy the containment relation?

    mode 'has_within': ∃ outer interval o ⊆ inner interval i  (containing)
    mode 'within':     ∃ outer interval o ⊇ inner interval i  (containedBy)
    mode 'overlaps':   ∃ outer interval o with o.start ≤ i.end and
                       o.end ≥ i.start  (Overlapping/NonOverlapping — the
                       lazy RelativeIterator walks are existence-equivalent:
                       the b-cursor only discards intervals whose end is
                       below every later a.start, and the first surviving
                       b's start bounds all later ones)
    """
    d, s, e, _ = inner
    od, os_, oe, _ = outer
    if len(d) == 0:
        return np.zeros(0, dtype=bool)
    if len(od) == 0:
        return np.zeros(len(d), dtype=bool)
    # sort outer by (doc, start)
    order = np.lexsort((os_, od))
    od, os_, oe = od[order], os_[order], oe[order]
    okey = (od << _SHIFT) + os_
    mask = np.zeros(len(d), dtype=bool)
    if mode == "has_within":
        # outer with start >= i.start, end <= i.end, same doc:
        # suffix-min of ends within each doc run
        suff_min = oe.copy()
        for i in range(len(oe) - 2, -1, -1):
            if od[i] == od[i + 1]:
                suff_min[i] = min(suff_min[i], suff_min[i + 1])
        lo = np.searchsorted(okey, (d << _SHIFT) + s, side="left")
        hi = np.searchsorted(okey, (d << _SHIFT) + e, side="right")
        valid = lo < hi
        lo_c = np.minimum(lo, len(okey) - 1)
        mask[valid] = suff_min[lo_c[valid]] <= e[valid]
    else:  # within / overlaps: prefix-max of ends over start-bounded outers
        pref_max = oe.copy()
        for i in range(1, len(oe)):
            if od[i] == od[i - 1]:
                pref_max[i] = max(pref_max[i], pref_max[i - 1])
        bound = s if mode == "within" else e
        need = e if mode == "within" else s
        hi = np.searchsorted(okey, (d << _SHIFT) + bound, side="right")
        doc_lo = np.searchsorted(okey, d << _SHIFT, side="left")
        valid = hi > doc_lo
        hi_c = np.maximum(hi - 1, 0)
        mask[valid] = pref_max[hi_c[valid]] >= need[valid]
    return mask


def interval_stream(src, postings_by_term, pos_by_term):
    """Evaluate a source → (docs, starts, ends, gaps) stream."""
    kind = src[0]
    if kind == "iterm":
        return _term_stream(src[1], postings_by_term, pos_by_term)
    if kind == "i_or":
        return _or_stream(src[1], postings_by_term, pos_by_term)
    if kind in ("i_ord", "i_unord", "i_block"):
        subs = [interval_stream(c, postings_by_term, pos_by_term)
                for c in src[1]]
        if any(len(s[0]) == 0 for s in subs):
            return _EMPTY
        single = all(_is_single_pos(c) for c in src[1])
        if kind == "i_block":
            if single:
                return _block_single_pos(subs)
            raise ValueError(
                "phrase intervals require single-position sub-sources "
                "(term / or-of-terms)"
            )
        # NOTE: ordered has NO vectorized closed form on purpose — the
        # reference iterator's enumeration is lazy and can skip minimal
        # intervals whose sub-choices were passed over by the monotone
        # cursors (e.g. subs [3,4]/[4,6,8]/[3,5,7] emit only [3,5], not
        # [4,7]); freq-faithfulness requires replicating the walk itself,
        # which the fuzz duels in tests/test_intervals.py pin down.
        if kind == "i_unord" and single and len(subs) == 2:
            return _unordered_pair_single_pos(subs[0], subs[1])
        cand = _candidates(subs)
        if len(cand) == 0:
            return _EMPTY
        if kind == "i_unord" and single:
            return _unordered_nary_single_pos(subs, cand)
        return _per_doc_combine(kind, subs, cand)
    if kind in ("i_maxgaps", "i_maxwidth"):
        d, s, e, g = interval_stream(src[2], postings_by_term, pos_by_term)
        keep = (g <= src[1]) if kind == "i_maxgaps" else ((e - s + 1) <= src[1])
        return d[keep], s[keep], e[keep], g[keep]
    if kind == "i_extend":
        d, s, e, g = interval_stream(src[1], postings_by_term, pos_by_term)
        return d, np.maximum(s - src[2], 0), e + src[3], g
    if kind in ("i_containing", "i_not_containing"):
        big = interval_stream(src[1], postings_by_term, pos_by_term)
        small = interval_stream(src[2], postings_by_term, pos_by_term)
        mask = _contain_mask(big, small, "has_within")
        if kind == "i_not_containing":
            mask = ~mask
        d, s, e, g = big
        return d[mask], s[mask], e[mask], g[mask]
    if kind in ("i_contained_by", "i_not_contained_by"):
        small = interval_stream(src[1], postings_by_term, pos_by_term)
        big = interval_stream(src[2], postings_by_term, pos_by_term)
        mask = _contain_mask(small, big, "within")
        if kind == "i_not_contained_by":
            mask = ~mask
        d, s, e, g = small
        return d[mask], s[mask], e[mask], g[mask]
    if kind in ("i_overlapping", "i_non_overlapping"):
        a = interval_stream(src[1], postings_by_term, pos_by_term)
        b = interval_stream(src[2], postings_by_term, pos_by_term)
        mask = _contain_mask(a, b, "overlaps")
        if kind == "i_non_overlapping":
            mask = ~mask
        d, s, e, g = a
        return d[mask], s[mask], e[mask], g[mask]
    if kind == "i_offset":
        d, s, e, g = interval_stream(src[1], postings_by_term, pos_by_term)
        if src[2]:  # before: [max(0, start−1)]
            p = np.maximum(s - 1, 0)
        else:  # after: [end+1], clipped at MAX_VALUE−1 like the reference
            p = np.minimum(e + 1, _MAX_POS - 1)
        return d, p, p.copy(), np.zeros(len(p), dtype=np.int64)
    if kind == "i_atleast":
        return _atleast_stream(src[2], src[1], postings_by_term, pos_by_term)
    if kind == "i_none":
        return _EMPTY
    raise ValueError(f"bad interval node {src!r}")


# ---------------------------------------------------------------- scoring


def interval_score_fn(freqs, pivot, exp, boost, precision):
    """IntervalScoreFunction: saturation w·(1 − k/(k+f)) or sigmoid
    w·(1 − k^a/(f^a + k^a)) (IntervalScoreFunction.java:70-76,129-131),
    float32 in 'lucene' precision."""
    if precision == "lucene":
        f32 = np.float32
        f = freqs.astype(f32)
        if exp is None:
            return (f32(boost) * (f32(1.0) - f32(pivot) / (f32(pivot) + f))
                    ).astype(np.float64)
        # sigmoid does double math then one float cast
        val = boost * (1.0 - float(pivot) ** exp /
                       (np.power(f.astype(np.float64), exp) + float(pivot) ** exp))
        return val.astype(np.float32).astype(np.float64)
    f = freqs.astype(np.float64)
    if exp is None:
        return boost * (1.0 - pivot / (pivot + f))
    return boost * (1.0 - pivot ** exp / (np.power(f, exp) + pivot ** exp))


def interval_eval(node, postings_by_term, pos_by_term, precision):
    """IntervalScorer analog: enumerate the source's intervals, accumulate
    freq += 1/max(length − minExtent + 1, 1) per doc (float32 steps in
    'lucene' precision — IntervalScorer.java:66-75 ``float freq``), apply
    the score function.  → (docids, float64 scores)."""
    _, src, pivot, exp, boost = node[:5]
    d, s, e, _ = interval_stream(src, postings_by_term, pos_by_term)
    if len(d) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    min_ext = interval_min_extent(src)
    length = (e - s + 1).astype(np.float64)
    contrib = 1.0 / np.maximum(length - min_ext + 1, 1.0)
    udocs, inverse = np.unique(d, return_inverse=True)
    if precision == "lucene":
        freqs = np.zeros(len(udocs), dtype=np.float32)
        np.add.at(freqs, inverse, contrib.astype(np.float32))
        freqs = freqs.astype(np.float64)
    else:
        freqs = np.zeros(len(udocs), dtype=np.float64)
        np.add.at(freqs, inverse, contrib)
    scores = interval_score_fn(freqs, pivot, exp, boost, precision)
    return udocs, np.asarray(scores, dtype=np.float64)
