"""GraphTokenStreamFiniteStrings — token-graph path enumeration.

Reference: core/src/java/org/apache/lucene/util/graph/
GraphTokenStreamFiniteStrings.java — the query-side dual of
FlattenGraphFilter: a token graph (posInc/posLength side paths from
SynonymGraphFilter etc.) becomes a position-state automaton whose
transitions are labeled by token id (:189-250 build — stacked tokens
rewind the gap, holes stretch endPos, emitted tokens are linearized to
posLength 1 with stacked tokens inheriting the head's increment), and the
query builder consumes it as:

  - finite strings (:125-158): every source→accept path, in token-id
    order per state (Lucene's FiniteStringsIterator follows label-sorted
    transitions; labels are insertion-ordered token ids) — QueryBuilder
    builds one phrase per path;
  - articulation points (:163-186, recursion :254-287): cut vertices of
    the UNDIRECTED graph, returned in reverse discovery order —
    QueryBuilder splits the graph there and treats each segment
    independently;
  - hasSidePath (:90-103) / getTerms (:107-117) per state.

Token graphs label every transition with a distinct token id, so the
position automaton is already deterministic — the reference's
determinize() is an identity renumbering here and is omitted.
"""

from __future__ import annotations


class GraphTokenStream:
    """Build from a list of (term, pos_inc, pos_len) graph tokens."""

    def __init__(self, tokens):
        self.trans: list[tuple[int, int, int]] = []  # (src, dest, token_id)
        self.tokens: list[tuple[str, int]] = []      # id -> (term, out_inc)
        pos = -1
        prev_incr = 1
        state = -1
        gap = 0
        for term, incr, plen in tokens:
            if pos == -1 and incr < 1:
                raise ValueError(
                    "Malformed TokenStream, start token can't have "
                    "increment less than 1")
            if incr == 0:
                if gap > 0:
                    pos -= gap
            else:
                pos += 1
                gap = incr - 1
            end_pos = pos + plen + gap
            state = max(state, end_pos)
            out_inc = prev_incr if incr == 0 else incr
            self.tokens.append((term, out_inc))
            self.trans.append((pos, end_pos, len(self.tokens) - 1))
            pos += gap
            if incr > 0:
                prev_incr = incr
        # removeDeadStates (the reference applies it after determinize,
        # :80-84): a position-gap leaves an unreachable intermediate state
        # (see TestGraphTokenStreamFiniteStrings.testSingleGraphWithGap —
        # articulation points come back renumbered); drop states that are
        # not both reachable from 0 and co-reachable to the accept state,
        # renumber the survivors in ascending order.
        if state >= 0:
            fwd: dict[int, set[int]] = {}
            bwd: dict[int, set[int]] = {}
            for src, dest, _tid in self.trans:
                fwd.setdefault(src, set()).add(dest)
                bwd.setdefault(dest, set()).add(src)

            def closure(start, adj):
                seen = {start}
                stack = [start]
                while stack:
                    for nxt in adj.get(stack.pop(), ()):
                        if nxt not in seen:
                            seen.add(nxt)
                            stack.append(nxt)
                return seen

            live = closure(0, fwd) & closure(state, bwd)
            remap = {old: new for new, old in enumerate(sorted(live))}
            self.trans = [(remap[s], remap[d], tid)
                          for s, d, tid in self.trans
                          if s in live and d in live]
            self.num_states = len(live)
            self.accept = remap[state]
        else:
            self.num_states = 0
            self.accept = -1
        self._out: dict[int, list[tuple[int, int]]] = {}
        for src, dest, tid in self.trans:
            self._out.setdefault(src, []).append((tid, dest))
        for lst in self._out.values():
            lst.sort()  # token-id order == label-sorted transitions

    def finite_strings(self, start: int = 0, end: int | None = None):
        """All paths start→end as [(term, pos_inc), ...] lists, enumerated
        depth-first following label-sorted transitions."""
        if self.num_states == 0:
            return
        if end is None:
            end = self.accept
        path: list[tuple[str, int]] = []

        def dfs(s):
            if s == end:
                yield list(path)
                return
            for tid, dest in self._out.get(s, ()):
                if dest > end:
                    continue
                path.append(self.tokens[tid])
                yield from dfs(dest)
                path.pop()

        yield from dfs(start)

    def has_side_path(self, state: int) -> bool:
        """True when several transitions leave ``state`` toward DIFFERENT
        destinations (side paths of different length, e.g. new york / ny)."""
        outs = self._out.get(state, ())
        if len(outs) <= 1:
            return False
        first = outs[0][1]
        return any(dest != first for _, dest in outs[1:])

    def terms(self, state: int) -> list[str]:
        """Terms leaving ``state`` (getTerms), token-id order."""
        return [self.tokens[tid][0] for tid, _ in self._out.get(state, ())]

    def articulation_points(self) -> list[int]:
        """Cut vertices of the undirected graph, reverse discovery order
        (articulationPointsRecurse + Collections.reverse)."""
        if self.num_states == 0:
            return []
        und: dict[int, list[tuple[int, int]]] = {}
        for src, dest, tid in self.trans:
            und.setdefault(src, []).append((tid, dest))
            und.setdefault(dest, []).append((tid, src))
        for lst in und.values():
            lst.sort()
        visited = [False] * self.num_states
        depth = [0] * self.num_states
        low = [0] * self.num_states
        parent = [-1] * self.num_states
        points: list[int] = []

        def recurse(state, d):
            visited[state] = True
            depth[state] = d
            low[state] = d
            child_count = 0
            is_art = False
            for _tid, dest in und.get(state, ()):
                if not visited[dest]:
                    parent[dest] = state
                    recurse(dest, d + 1)
                    child_count += 1
                    if low[dest] >= depth[state]:
                        is_art = True
                    low[state] = min(low[state], low[dest])
                elif dest != parent[state]:
                    low[state] = min(low[state], depth[dest])
            if ((parent[state] != -1 and is_art)
                    or (parent[state] == -1 and child_count > 1)):
                points.append(state)

        import sys

        # the DFS recurses once per state (long flat streams = deep chains);
        # size the Python stack to the graph like the JVM's deeper default
        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 2 * self.num_states + 1000))
        try:
            recurse(0, 0)
        finally:
            sys.setrecursionlimit(old)
        points.reverse()
        return points
