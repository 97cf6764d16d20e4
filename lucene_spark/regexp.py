"""Faithful Lucene-RegExp engine: grammar-exact parser, interval NFA,
subset-construction DFA, and a numpy-vectorized batch term matcher.

Reference surface (cited, not copied):
  - ``lucene/core/src/java/org/apache/lucene/util/automaton/RegExp.java``
    — the grammar (class javadoc :43-365), the recursive-descent parser
    (:1159-1394), syntax flags (:408-434), ``ASCII_CASE_INSENSITIVE``
    (:435), predefined classes ``\\d \\D \\s \\S \\w \\W``
    (``expandPredefined`` :1239-1257), and the ``<n-m>`` interval rule
    (same-length operands -> fixed ``digits``, else leading zeros
    accepted; min/max swapped when reversed — ``parseSimpleExp``
    :1330-1360).
  - ``Automata.java`` — ``makeDecimalInterval`` (:457), ``makeString``
    (:505), ``makeAnyChar``/``makeAnyString``/``makeEmpty``.
  - ``Operations.java`` — determinize/complement/intersection/repeat
    semantics (complement is determinize + totalize + flip).
  - ``RegexpQuery.java:44`` — a regexp query matches the ENTIRE term and
    is evaluated by intersecting the compiled automaton with the term
    dictionary; this module is that automaton, and
    ``search.lucene_regexp_predicate`` is the term-dictionary
    intersection (isin pushdown for finite languages, prefix/length
    Catalyst prefilters + an Arrow-batched DFA walk otherwise).

The implementation is original: transitions carry codepoint INTERVALS
``[lo, hi]``; the DFA's alphabet is the partition of ``[0, 0x10FFFF]``
induced by all interval endpoints, so the transition table is a dense
``(n_states, n_classes)`` int32 array and matching N terms costs
O(max_len) numpy gathers — the scale path for vocabulary-sized term
dictionaries inside a pandas UDF.
"""
from __future__ import annotations

import numpy as np

MAX_CP = 0x10FFFF

# Syntax flags (RegExp.java:408-434) ------------------------------------
INTERSECTION = 0x0001
COMPLEMENT = 0x0002
EMPTY = 0x0004
ANYSTRING = 0x0008
AUTOMATON = 0x0010
INTERVAL = 0x0020
ALL = 0x00FF
NONE = 0x0000
# Matching flags (> 0xff)
ASCII_CASE_INSENSITIVE = 0x0100

DEFAULT_MAX_DETERMINIZED_STATES = 10_000
_MAX_NFA_STATES = 100_000

# predefined classes as interval lists (RegExp.expandPredefined
# :1239-1257 — \d=[0-9], \s=[ \t\n\r], \w=[a-zA-Z_0-9]; capitals are the
# single-char complements)
_PRE_D = [(48, 57)]
_PRE_S = [(9, 10), (13, 13), (32, 32)]
_PRE_W = [(48, 57), (65, 90), (95, 95), (97, 122)]


def _complement_intervals(ivs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Single-char complement within [0, MAX_CP] of a merged interval set."""
    ivs = _merge_intervals(ivs)
    out, prev = [], 0
    for lo, hi in ivs:
        if lo > prev:
            out.append((prev, lo - 1))
        prev = max(prev, hi + 1)
    if prev <= MAX_CP:
        out.append((prev, MAX_CP))
    return out


def _merge_intervals(ivs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    if not ivs:
        return []
    ivs = sorted(ivs)
    out = [list(ivs[0])]
    for lo, hi in ivs[1:]:
        if lo <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return [tuple(x) for x in out]


def _pre_class_intervals(ch: str) -> list[tuple[int, int]]:
    if ch == "d":
        return list(_PRE_D)
    if ch == "D":
        return _complement_intervals(_PRE_D)
    if ch == "s":
        return list(_PRE_S)
    if ch == "S":
        return _complement_intervals(_PRE_S)
    if ch == "w":
        return list(_PRE_W)
    if ch == "W":
        return _complement_intervals(_PRE_W)
    raise ValueError("invalid character class \\" + ch)


# ---------------------------------------------------------------------
# Parser — a Python port of the published grammar (RegExp.java:1159-1394).
# AST nodes are tuples tagged by kind.
# ---------------------------------------------------------------------
class _Parser:
    def __init__(self, s: str, flags: int):
        self.s = s
        self.pos = 0
        self.flags = flags

    def _peek(self, chars: str) -> bool:
        return self.pos < len(self.s) and self.s[self.pos] in chars

    def _match(self, ch: str) -> bool:
        if self.pos < len(self.s) and self.s[self.pos] == ch:
            self.pos += 1
            return True
        return False

    def _more(self) -> bool:
        return self.pos < len(self.s)

    def _next(self) -> str:
        if not self._more():
            raise ValueError("unexpected end-of-string")
        ch = self.s[self.pos]
        self.pos += 1
        return ch

    def _check(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    # grammar, precedence lowest -> highest: union | inter & concat
    # repeat ?*+{} compl ~ charclass [] simple
    def parse_union_exp(self):
        e = self.parse_inter_exp()
        if self._match("|"):
            e = ("union", e, self.parse_union_exp())
        return e

    def parse_inter_exp(self):
        e = self.parse_concat_exp()
        if self._check(INTERSECTION) and self._match("&"):
            e = ("inter", e, self.parse_inter_exp())
        return e

    def parse_concat_exp(self):
        e = self.parse_repeat_exp()
        if (
            self._more()
            and not self._peek(")|")
            and (not self._check(INTERSECTION) or not self._peek("&"))
        ):
            e = ("concat", e, self.parse_concat_exp())
        return e

    def parse_repeat_exp(self):
        e = self.parse_compl_exp()
        while self._peek("?*+{"):
            if self._match("?"):
                e = ("opt", e)
            elif self._match("*"):
                e = ("star", e)
            elif self._match("+"):
                e = ("repmin", e, 1)
            elif self._match("{"):
                start = self.pos
                while self._peek("0123456789"):
                    self._next()
                if start == self.pos:
                    raise ValueError(
                        f"integer expected at position {self.pos}")
                n = int(self.s[start:self.pos])
                m = -1
                if self._match(","):
                    start = self.pos
                    while self._peek("0123456789"):
                        self._next()
                    if start != self.pos:
                        m = int(self.s[start:self.pos])
                else:
                    m = n
                if not self._match("}"):
                    raise ValueError(f"expected '}}' at position {self.pos}")
                e = ("repmin", e, n) if m == -1 else ("repminmax", e, n, m)
        return e

    def parse_compl_exp(self):
        if self._check(COMPLEMENT) and self._match("~"):
            return ("comp", self.parse_compl_exp())
        return self.parse_charclass_exp()

    def parse_charclass_exp(self):
        if self._match("["):
            negate = bool(self._match("^"))
            e = self.parse_charclasses()
            if negate:
                # [^...] = anychar minus the class set (RegExp.java:1212:
                # intersection(anyChar, complement(classes)))
                e = ("class", _complement_intervals(_node_intervals(e)))
            if not self._match("]"):
                raise ValueError(f"expected ']' at position {self.pos}")
            return e
        return self.parse_simple_exp()

    def parse_charclasses(self):
        e = self.parse_charclass()
        while self._more() and not self._peek("]"):
            e = ("union", e, self.parse_charclass())
        return e

    def parse_charclass(self):
        pre = self.match_predefined_class()
        if pre is not None:
            return pre
        c = self.parse_char_exp()
        if self._match("-"):
            lo, hi = ord(c), ord(self.parse_char_exp())
            if lo > hi:
                raise ValueError(
                    f"invalid range: from ({lo}) cannot be > to ({hi})")
            return ("crange", lo, hi)
        return ("char", ord(c))

    def match_predefined_class(self):
        # RegExp.matchPredefinedCharacterClass:1259-1283 — consumes the
        # backslash; \\ is a literal backslash; a backslash before any
        # OTHER alphabetic char is an error; anything else falls through
        # to parseCharExp with the backslash already consumed.
        if self._match("\\"):
            if self._peek("dDwWsS"):
                return ("class", _pre_class_intervals(self._next()))
            if self._peek("\\"):
                return ("char", ord(self._next()))
            if self._peek("abcefghijklmnopqrtuvxyz") or self._peek(
                    "ABCEFGHIJKLMNOPQRTUVXYZ"):
                raise ValueError("invalid character class \\" + self._next())
        return None

    def parse_simple_exp(self):
        if self._match("."):
            return ("any",)
        if self._check(EMPTY) and self._match("#"):
            return ("emptylang",)
        if self._check(ANYSTRING) and self._match("@"):
            return ("anystring",)
        if self._match('"'):
            start = self.pos
            while self._more() and not self._peek('"'):
                self._next()
            if not self._match('"'):
                raise ValueError(f'expected \'"\' at position {self.pos}')
            return ("string", self.s[start:self.pos - 1])
        if self._match("("):
            if self._match(")"):
                return ("string", "")
            e = self.parse_union_exp()
            if not self._match(")"):
                raise ValueError(f"expected ')' at position {self.pos}")
            return e
        if (self._check(AUTOMATON) or self._check(INTERVAL)) and self._match("<"):
            start = self.pos
            while self._more() and not self._peek(">"):
                self._next()
            if not self._match(">"):
                raise ValueError(f"expected '>' at position {self.pos}")
            s = self.s[start:self.pos - 1]
            i = s.find("-")
            if i == -1:
                if not self._check(AUTOMATON):
                    raise ValueError(
                        f"interval syntax error at position {self.pos - 1}")
                # named automata need a provider; RegexpQuery's default has
                # none and throws exactly this (RegExp.java:747-750)
                raise ValueError(f"'{s}' not found")
            if not self._check(INTERVAL):
                raise ValueError(
                    f"illegal identifier at position {self.pos - 1}")
            smin, smax = s[:i], s[i + 1:]
            if (i == 0 or i == len(s) - 1 or i != s.rfind("-")
                    or not smin.isdigit() or not smax.isdigit()):
                raise ValueError(
                    f"interval syntax error at position {self.pos - 1}")
            imin, imax = int(smin), int(smax)
            digits = len(smin) if len(smin) == len(smax) else 0
            if imin > imax:  # the reference SWAPS, it does not reject
                imin, imax = imax, imin
            return ("interval", imin, imax, digits)
        pre = self.match_predefined_class()
        if pre is not None:
            return pre
        return ("char", ord(self.parse_char_exp()))

    def parse_char_exp(self) -> str:
        self._match("\\")
        return self._next()


def _node_intervals(node) -> list[tuple[int, int]]:
    """Flatten a char-class union tree into codepoint intervals (valid for
    the node kinds a character class can contain)."""
    k = node[0]
    if k == "char":
        return [(node[1], node[1])]
    if k == "crange":
        return [(node[1], node[2])]
    if k == "class":
        return list(node[1])
    if k == "union":
        return _node_intervals(node[1]) + _node_intervals(node[2])
    raise ValueError(f"not a character-class node: {k}")


# ---------------------------------------------------------------------
# NFA builder (Thompson over intervals) + subset-construction DFA
# ---------------------------------------------------------------------
class _NFA:
    def __init__(self, max_det_states: int):
        self.trans: list[list[tuple[int, int, int]]] = []
        self.eps: list[list[int]] = []
        self.max_det_states = max_det_states

    def state(self) -> int:
        if len(self.trans) >= _MAX_NFA_STATES:
            raise ValueError("regexp too complex (NFA state limit)")
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1

    def add(self, s: int, lo: int, hi: int, d: int) -> None:
        self.trans[s].append((lo, hi, d))

    def addeps(self, s: int, d: int) -> None:
        self.eps[s].append(d)


class _Compiler:
    def __init__(self, flags: int, max_det_states: int):
        self.flags = flags
        self.nfa = _NFA(max_det_states)
        self.max_det_states = max_det_states

    # each call returns (start, accepts) with freshly created states, so
    # {n,m} repetition can just compile the sub-tree repeatedly
    def compile(self, node):
        n, k = self.nfa, node[0]
        if k == "char":
            return self._char_fragment(node[1])
        if k == "crange":
            s, t = n.state(), n.state()
            n.add(s, node[1], node[2], t)
            return s, [t]
        if k == "class":
            s, t = n.state(), n.state()
            for lo, hi in node[1]:
                n.add(s, lo, hi, t)
            return s, [t]
        if k == "any":
            s, t = n.state(), n.state()
            n.add(s, 0, MAX_CP, t)
            return s, [t]
        if k == "emptylang":
            return n.state(), []
        if k == "string":
            if not node[1]:
                s = n.state()
                return s, [s]
            if self.flags & ASCII_CASE_INSENSITIVE:
                # toCaseInsensitiveString (RegExp.java:791-801)
                frag = self._char_fragment(ord(node[1][0]))
                for ch in node[1][1:]:
                    frag = self._concat(frag, self._char_fragment(ord(ch)))
                return frag
            s = n.state()
            cur = s
            for ch in node[1]:
                nxt = n.state()
                n.add(cur, ord(ch), ord(ch), nxt)
                cur = nxt
            return s, [cur]
        if k == "anystring":
            s = n.state()
            n.add(s, 0, MAX_CP, s)
            return s, [s]
        if k == "union":
            s = n.state()
            s1, a1 = self.compile(node[1])
            s2, a2 = self.compile(node[2])
            n.addeps(s, s1)
            n.addeps(s, s2)
            return s, a1 + a2
        if k == "concat":
            return self._concat(self.compile(node[1]), self.compile(node[2]))
        if k == "opt":
            s1, a1 = self.compile(node[1])
            s, t = self.nfa.state(), self.nfa.state()
            n.addeps(s, s1)
            n.addeps(s, t)
            for a in a1:
                n.addeps(a, t)
            return s, [t]
        if k == "star":
            s1, a1 = self.compile(node[1])
            s = n.state()
            n.addeps(s, s1)
            for a in a1:
                n.addeps(a, s)
            return s, [s]
        if k == "repmin":
            # Operations.repeat(a, min): min copies then star
            frag = None
            for _ in range(node[2]):
                piece = self.compile(node[1])
                frag = piece if frag is None else self._concat(frag, piece)
            starred = self.compile(("star", node[1]))
            return starred if frag is None else self._concat(frag, starred)
        if k == "repminmax":
            mn, mx = node[2], node[3]
            if mx < mn:  # {2,1} is the empty language
                return n.state(), []
            frag = None
            for _ in range(mn):
                piece = self.compile(node[1])
                frag = piece if frag is None else self._concat(frag, piece)
            for _ in range(mx - mn):
                piece = self.compile(("opt", node[1]))
                frag = piece if frag is None else self._concat(frag, piece)
            if frag is None:  # {0,0} -> empty string
                s = n.state()
                return s, [s]
            return frag
        if k == "inter":
            d1 = self._sub_dfa(node[1])
            d2 = self._sub_dfa(node[2])
            return self._embed(_product(d1, d2, self.max_det_states))
        if k == "comp":
            return self._embed(_complement(self._sub_dfa(node[1])))
        if k == "interval":
            return self._interval_fragment(node[1], node[2], node[3])
        raise ValueError(f"unknown node kind {k}")

    def _char_fragment(self, c: int):
        n = self.nfa
        s, t = n.state(), n.state()
        n.add(s, c, c, t)
        if self.flags & ASCII_CASE_INSENSITIVE and c <= 128:
            # toCaseInsensitiveChar (RegExp.java:770-789): ASCII-only alt case
            ch = chr(c)
            alt = ch.upper() if ch.islower() else ch.lower()
            if alt != ch and ord(alt) <= MAX_CP:
                n.add(s, ord(alt), ord(alt), t)
        return s, [t]

    def _concat(self, f1, f2):
        s1, a1 = f1
        s2, a2 = f2
        for a in a1:
            self.nfa.addeps(a, s2)
        return s1, a2

    def _sub_dfa(self, node) -> "DFA":
        sub = _Compiler(self.flags, self.max_det_states)
        start, accepts = sub.compile(node)
        return _determinize(sub.nfa, start, accepts, self.max_det_states)

    def _embed(self, dfa: "DFA"):
        """Splice a DFA back into the NFA as a fragment."""
        n = self.nfa
        base = [n.state() for _ in range(max(dfa.n_states, 1))]
        C = len(dfa.bounds)
        for st in range(dfa.n_states):
            row = dfa.trans[st]
            for c in range(C):
                d = int(row[c])
                if d < 0:
                    continue
                lo = int(dfa.bounds[c])
                hi = int(dfa.bounds[c + 1]) - 1 if c + 1 < C else MAX_CP
                n.add(base[st], lo, hi, base[d])
        accepts = [base[i] for i in range(dfa.n_states) if dfa.accept[i]]
        return base[dfa.start], accepts

    # --- Automata.makeDecimalInterval:457 semantics -------------------
    def _interval_fragment(self, mn: int, mx: int, digits: int):
        if digits > 0:
            if len(str(mx)) > digits:
                raise ValueError(
                    f"interval {mn}-{mx} does not fit in {digits} digits")
            return self._fixed_width(str(mn).zfill(digits),
                                     str(mx).zfill(digits))
        # digits <= 0: any number of leading zeros, then a canonical
        # (no-leading-zero) decimal representation of a value in [mn, mx]
        n = self.nfa
        s0 = n.state()
        n.add(s0, ord("0"), ord("0"), s0)
        accs: list[int] = []
        wmin, d = len(str(mn)), len(str(mx))
        for w in range(wmin, d + 1):
            lo = mn if w == wmin else 10 ** (w - 1)
            hi = min(mx, 10 ** w - 1)
            if lo > hi:
                continue
            fs, fa = self._fixed_width(str(lo).zfill(w), str(hi).zfill(w))
            n.addeps(s0, fs)
            accs.extend(fa)
        return s0, accs

    def _fixed_width(self, x: str, y: str):
        """Automaton for fixed-width decimal strings numerically in [x, y]
        (classic tight-low/tight-high digit construction)."""
        n = self.nfa
        w = len(x)
        acc = n.state()
        memo: dict[tuple[int, bool, bool], int] = {}
        d0, d9 = ord("0"), ord("9")

        def node(i: int, tl: bool, th: bool) -> int:
            if i == w:
                return acc
            key = (i, tl, th)
            if key in memo:
                return memo[key]
            s = n.state()
            memo[key] = s
            xl, yh = ord(x[i]), ord(y[i])
            if tl and th:
                if xl == yh:
                    n.add(s, xl, xl, node(i + 1, True, True))
                else:
                    n.add(s, xl, xl, node(i + 1, True, False))
                    n.add(s, yh, yh, node(i + 1, False, True))
                    if xl + 1 <= yh - 1:
                        n.add(s, xl + 1, yh - 1, node(i + 1, False, False))
            elif tl:
                n.add(s, xl, xl, node(i + 1, True, False))
                if xl + 1 <= d9:
                    n.add(s, xl + 1, d9, node(i + 1, False, False))
            elif th:
                n.add(s, yh, yh, node(i + 1, False, True))
                if d0 <= yh - 1:
                    n.add(s, d0, yh - 1, node(i + 1, False, False))
            else:
                n.add(s, d0, d9, node(i + 1, False, False))
            return s

        return node(0, True, True), [acc]


# ---------------------------------------------------------------------
# DFA
# ---------------------------------------------------------------------
class DFA:
    """bounds[i] is the first codepoint of alphabet class i (bounds[0]==0,
    classes partition [0, MAX_CP]); trans is (n_states, n_classes) int32
    with -1 = dead; start is always renumbered to 0 after trim."""

    __slots__ = ("bounds", "trans", "accept", "start", "n_states")

    def __init__(self, bounds: np.ndarray, trans: np.ndarray,
                 accept: np.ndarray, start: int):
        self.bounds = bounds
        self.trans = trans
        self.accept = accept
        self.start = start
        self.n_states = trans.shape[0]


def _eps_closure(nfa: _NFA, states) -> frozenset:
    seen = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for d in nfa.eps[s]:
            if d not in seen:
                seen.add(d)
                stack.append(d)
    return frozenset(seen)


def _determinize(nfa: _NFA, start: int, accepts, max_states: int) -> DFA:
    acc_set = set(accepts)
    pts = {0}
    for row in nfa.trans:
        for lo, hi, _ in row:
            pts.add(lo)
            if hi < MAX_CP:
                pts.add(hi + 1)
    bounds = np.array(sorted(pts), dtype=np.int64)
    C = len(bounds)
    init = _eps_closure(nfa, [start])
    index = {init: 0}
    order = [init]
    rows: list[list[int]] = []
    i = 0
    while i < len(order):
        cur = order[i]
        i += 1
        row = [-1] * C
        # collect this subset's transitions once, then route each class
        trs = [t for st in cur for t in nfa.trans[st]]
        if trs:
            for c in range(C):
                p = int(bounds[c])
                dst = {d for lo, hi, d in trs if lo <= p <= hi}
                if dst:
                    key = _eps_closure(nfa, dst)
                    j = index.get(key)
                    if j is None:
                        if len(order) >= max_states:
                            raise ValueError(
                                "Determinizing automaton would require more "
                                f"than {max_states} states")
                        j = len(order)
                        index[key] = j
                        order.append(key)
                    row[c] = j
        rows.append(row)
    trans = np.array(rows, dtype=np.int32).reshape(len(order), C)
    accept = np.array([bool(s & acc_set) for s in order], dtype=bool)
    return DFA(bounds, trans, accept, 0)


def _complement(dfa: DFA) -> DFA:
    n, C = dfa.n_states, len(dfa.bounds)
    trans = np.empty((n + 1, C), dtype=np.int32)
    trans[:n] = np.where(dfa.trans < 0, n, dfa.trans)
    trans[n] = n  # total sink
    accept = np.empty(n + 1, dtype=bool)
    accept[:n] = ~dfa.accept
    accept[n] = True
    return DFA(dfa.bounds, trans, accept, dfa.start)


def _product(d1: DFA, d2: DFA, max_states: int) -> DFA:
    bounds = np.union1d(d1.bounds, d2.bounds)
    c1 = np.searchsorted(d1.bounds, bounds, side="right") - 1
    c2 = np.searchsorted(d2.bounds, bounds, side="right") - 1
    C = len(bounds)
    index = {(d1.start, d2.start): 0}
    order = [(d1.start, d2.start)]
    rows = []
    i = 0
    while i < len(order):
        s1, s2 = order[i]
        i += 1
        t1 = d1.trans[s1][c1]
        t2 = d2.trans[s2][c2]
        row = [-1] * C
        for c in range(C):
            a, b = int(t1[c]), int(t2[c])
            if a < 0 or b < 0:
                continue
            key = (a, b)
            j = index.get(key)
            if j is None:
                if len(order) >= max_states:
                    raise ValueError(
                        "Determinizing automaton would require more than "
                        f"{max_states} states")
                j = len(order)
                index[key] = j
                order.append(key)
            row[c] = j
        rows.append(row)
    trans = np.array(rows, dtype=np.int32).reshape(len(order), C)
    accept = np.array(
        [d1.accept[a] and d2.accept[b] for a, b in order], dtype=bool)
    return DFA(bounds, trans, accept, 0)


def _trim(dfa: DFA) -> DFA:
    """Drop states unreachable from start or that cannot reach an accept;
    renumber with start = 0. An empty language trims to one dead start."""
    n, C = dfa.n_states, len(dfa.bounds)
    fwd = np.zeros(n, dtype=bool)
    stack = [dfa.start]
    fwd[dfa.start] = True
    while stack:
        s = stack.pop()
        for d in dfa.trans[s]:
            d = int(d)
            if d >= 0 and not fwd[d]:
                fwd[d] = True
                stack.append(d)
    # co-reachability: reverse edges
    rev: list[list[int]] = [[] for _ in range(n)]
    for s in range(n):
        for d in dfa.trans[s]:
            d = int(d)
            if d >= 0:
                rev[d].append(s)
    bwd = dfa.accept.copy()
    stack = list(np.nonzero(bwd)[0])
    while stack:
        s = int(stack.pop())
        for p in rev[s]:
            if not bwd[p]:
                bwd[p] = True
                stack.append(p)
    live = fwd & bwd
    if not live[dfa.start]:
        return DFA(np.array([0], dtype=np.int64),
                   np.full((1, 1), -1, dtype=np.int32),
                   np.array([False]), 0)
    old = [dfa.start] + [s for s in range(n) if live[s] and s != dfa.start]
    remap = np.full(n + 1, -1, dtype=np.int32)
    for new, o in enumerate(old):
        remap[o] = new
    t = dfa.trans[old]
    t = np.where(t < 0, -1, remap[t])
    return DFA(dfa.bounds, t.astype(np.int32), dfa.accept[old], 0)


def _minimize(dfa: DFA) -> DFA:
    """Moore partition refinement, then merge identical adjacent alphabet
    classes so the matcher's searchsorted table stays small."""
    n = dfa.n_states
    if n <= 1:
        return _merge_classes(dfa)
    block = dfa.accept.astype(np.int64)
    k_old = len(set(block.tolist()))
    while True:
        # signature: own block + blocks of every class successor; each
        # round only ever SPLITS blocks, so equal block counts = fixpoint
        succ = np.where(dfa.trans < 0, -1, block[np.clip(dfa.trans, 0, None)])
        uniq: dict[tuple, int] = {}
        nb = np.empty(n, dtype=np.int64)
        for i in range(n):
            sig = (int(block[i]),) + tuple(int(x) for x in succ[i])
            nb[i] = uniq.setdefault(sig, len(uniq))
        block = nb
        if len(uniq) == k_old:
            break
        k_old = len(uniq)
    k = int(block.max()) + 1
    rep = np.zeros(k, dtype=np.int64)
    for i in range(n - 1, -1, -1):
        rep[block[i]] = i
    trans = dfa.trans[rep]
    trans = np.where(trans < 0, -1, block[np.clip(trans, 0, None)]).astype(
        np.int32)
    accept = dfa.accept[rep]
    start = int(block[dfa.start])
    # renumber start to 0
    if start != 0:
        perm = np.arange(k)
        perm[[0, start]] = perm[[start, 0]]
        inv = np.empty(k, dtype=np.int64)
        inv[perm] = np.arange(k)
        trans = trans[perm]
        trans = np.where(trans < 0, -1, inv[np.clip(trans, 0, None)]).astype(
            np.int32)
        accept = accept[perm]
    return _merge_classes(DFA(dfa.bounds, trans, accept, 0))


def _merge_classes(dfa: DFA) -> DFA:
    C = len(dfa.bounds)
    if C <= 1:
        return dfa
    keep = [0]
    for c in range(1, C):
        if not np.array_equal(dfa.trans[:, c], dfa.trans[:, keep[-1]]):
            keep.append(c)
    if len(keep) == C:
        return dfa
    return DFA(dfa.bounds[keep], np.ascontiguousarray(dfa.trans[:, keep]),
               dfa.accept, dfa.start)


def _dfa_common_prefix(dfa: DFA) -> str:
    """Longest string every accepted string starts with: walk singleton
    single-char transitions from the start until an accept, branch, or
    cycle."""
    C = len(dfa.bounds)
    pre: list[str] = []
    st = dfa.start
    seen: set[int] = set()
    while st not in seen:
        seen.add(st)
        if dfa.accept[st]:
            break
        row = dfa.trans[st]
        live = np.nonzero(row >= 0)[0]
        if live.size != 1:
            break
        c = int(live[0])
        lo = int(dfa.bounds[c])
        hi = int(dfa.bounds[c + 1]) - 1 if c + 1 < C else MAX_CP
        if lo != hi:
            break
        pre.append(chr(lo))
        st = int(row[c])
    return "".join(pre)


# ---------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------
class LuceneRegexp:
    """Parse + compile a Lucene RegExp (default flags = RegExp.ALL, as
    RegexpQuery uses) to a trimmed, minimized DFA."""

    def __init__(self, pattern: str, syntax_flags: int = ALL,
                 match_flags: int = 0,
                 max_determinized_states: int = DEFAULT_MAX_DETERMINIZED_STATES):
        if syntax_flags > ALL:
            raise ValueError("Illegal syntax flag")
        self.pattern = pattern
        flags = syntax_flags | match_flags
        p = _Parser(pattern, flags)
        self.ast = p.parse_union_exp()
        if p._more():
            raise ValueError(f"end-of-string expected at position {p.pos}")
        comp = _Compiler(flags, max_determinized_states)
        start, accepts = comp.compile(self.ast)
        dfa = _determinize(comp.nfa, start, accepts, max_determinized_states)
        self.dfa = _minimize(_trim(dfa))

    # --- matching ------------------------------------------------------
    def matches(self, term: str) -> bool:
        return bool(self.match_batch([term])[0])

    def match_batch(self, terms) -> np.ndarray:
        """Vectorized whole-string match for a batch of terms. ``terms`` is
        any sequence of str (None → False)."""
        n = len(terms)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        clean = ["" if t is None else t for t in terms]
        lens = np.fromiter((len(t) for t in clean), dtype=np.int64, count=n)
        dfa = self.dfa
        if lens.max(initial=0) == 0:
            out[:] = bool(dfa.accept[dfa.start])
            out[np.fromiter((t is None for t in terms), dtype=bool,
                            count=n)] = False
            return out
        joined = "".join(clean)
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
        cls = (np.searchsorted(dfa.bounds, cps, side="right") - 1).astype(
            np.int64)
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        state = np.full(n, dfa.start, dtype=np.int32)
        alive = np.ones(n, dtype=bool)
        Lmax = int(lens.max())
        for j in range(Lmax):
            act = np.nonzero(alive & (lens > j))[0]
            if act.size == 0:
                break
            ns = dfa.trans[state[act], cls[offsets[act] + j]]
            state[act] = ns
            alive[act[ns < 0]] = False
        out[alive] = dfa.accept[state[alive]]
        for i, t in enumerate(terms):
            if t is None:
                out[i] = False
        return out

    def prefix_match_batch(self, terms) -> np.ndarray:
        """True where SOME prefix of the term (including the empty prefix
        and the whole term) lands in an accept state — the
        RegexCompletionQuery contract (suggest/document/
        RegexCompletionQuery.java: the regex automaton is the completion
        PREFIX, the key may continue arbitrarily).  Same vectorized walk
        as match_batch, accumulating accept hits at every step."""
        n = len(terms)
        out = np.zeros(n, dtype=bool)
        if n == 0:
            return out
        dfa = self.dfa
        clean = ["" if t is None else t for t in terms]
        lens = np.fromiter((len(t) for t in clean), dtype=np.int64, count=n)
        out[:] = bool(dfa.accept[dfa.start])  # empty prefix
        if lens.max(initial=0) > 0:
            joined = "".join(clean)
            cps = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
            cls = (np.searchsorted(dfa.bounds, cps, side="right") - 1).astype(
                np.int64)
            offsets = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            state = np.full(n, dfa.start, dtype=np.int32)
            alive = np.ones(n, dtype=bool)
            Lmax = int(lens.max())
            for j in range(Lmax):
                act = np.nonzero(alive & (lens > j))[0]
                if act.size == 0:
                    break
                ns = dfa.trans[state[act], cls[offsets[act] + j]]
                state[act] = ns
                dead = ns < 0
                alive[act[dead]] = False
                live = act[~dead]
                out[live] |= dfa.accept[state[live]]
        for i, t in enumerate(terms):
            if t is None:
                out[i] = False
        return out

    # --- rewrite helpers (the term-dictionary intersection analogs) ----
    def common_prefix(self) -> str:
        """Longest string every match must start with (pushdown prefilter —
        the analog of Lucene's CompiledAutomaton commonPrefix)."""
        return _dfa_common_prefix(self.dfa)

    def common_suffix(self) -> str:
        """Longest string every match must END with (the CompiledAutomaton
        commonSuffixRef analog used for leading-wildcard pushdown against
        a reversed-term sidecar).  Computed as the common prefix of the
        reversed language: reverse every DFA edge, determinize from the
        accept states, walk.  Returns "" when reversal would blow the
        state budget."""
        dfa = self.dfa
        if not dfa.accept.any():
            return ""
        n = _NFA(DEFAULT_MAX_DETERMINIZED_STATES)
        base = [n.state() for _ in range(dfa.n_states)]
        C = len(dfa.bounds)
        for st in range(dfa.n_states):
            row = dfa.trans[st]
            for c in range(C):
                d = int(row[c])
                if d < 0:
                    continue
                lo = int(dfa.bounds[c])
                hi = int(dfa.bounds[c + 1]) - 1 if c + 1 < C else MAX_CP
                n.add(base[d], lo, hi, base[st])  # reversed edge
        start = n.state()
        for st in np.nonzero(dfa.accept)[0]:
            n.addeps(start, base[int(st)])
        try:
            rev = _minimize(_trim(_determinize(
                n, start, [base[dfa.start]],
                DEFAULT_MAX_DETERMINIZED_STATES)))
        except ValueError:
            return ""
        return _dfa_common_prefix(rev)[::-1]

    def min_len(self) -> int:
        """Shortest accepted string length (∞ → 0 for the empty language)."""
        dfa = self.dfa
        if dfa.accept[dfa.start]:
            return 0
        from collections import deque
        dist = {dfa.start: 0}
        q = deque([dfa.start])
        while q:
            s = q.popleft()
            for d in dfa.trans[s]:
                d = int(d)
                if d >= 0 and d not in dist:
                    dist[d] = dist[s] + 1
                    if dfa.accept[d]:
                        return dist[d]
                    q.append(d)
        return 0

    def max_len(self) -> int | None:
        """Longest accepted string length, or None if unbounded (trimmed
        DFA has a cycle)."""
        dfa = self.dfa
        n = dfa.n_states
        if not dfa.accept.any():
            return None
        # detect cycle via DFS colors; if acyclic, longest-path DP
        color = np.zeros(n, dtype=np.int8)
        order: list[int] = []

        def dfs(root: int) -> bool:
            stack = [(root, iter([int(d) for d in dfa.trans[root] if d >= 0]))]
            color[root] = 1
            while stack:
                s, it = stack[-1]
                found = False
                for d in it:
                    if color[d] == 1:
                        return False
                    if color[d] == 0:
                        color[d] = 1
                        stack.append(
                            (d, iter([int(x) for x in dfa.trans[d] if x >= 0])))
                        found = True
                        break
                if not found:
                    color[s] = 2
                    order.append(s)
                    stack.pop()
            return True

        if not dfs(dfa.start):
            return None
        longest = np.full(n, -1, dtype=np.int64)
        for s in order:  # reverse topological
            if dfa.accept[s]:
                longest[s] = 0
            for d in dfa.trans[s]:
                d = int(d)
                if d >= 0 and longest[d] >= 0:
                    longest[s] = max(longest[s], longest[d] + 1)
        return int(longest[dfa.start])

    def finite_strings(self, limit: int = 256) -> list[str] | None:
        """Enumerate the language if finite and ≤ limit strings, else None
        (the Operations.getFiniteStrings analog backing the TermInSet
        rewrite)."""
        if self.is_empty():
            return []
        if self.max_len() is None:
            return None
        dfa = self.dfa
        C = len(dfa.bounds)
        out: list[str] = []
        stack: list[tuple[int, str]] = [(dfa.start, "")]
        while stack:
            s, p = stack.pop()
            if dfa.accept[s]:
                out.append(p)
                if len(out) > limit:
                    return None
            row = dfa.trans[s]
            for c in range(C):
                d = int(row[c])
                if d < 0:
                    continue
                lo = int(dfa.bounds[c])
                hi = int(dfa.bounds[c + 1]) - 1 if c + 1 < C else MAX_CP
                if hi - lo + 1 > limit:
                    return None
                for cp in range(lo, hi + 1):
                    stack.append((d, p + chr(cp)))
                    if len(stack) + len(out) > 4 * limit + 4:
                        return None
        return sorted(out)

    def is_empty(self) -> bool:
        return not bool(self.dfa.accept.any())

    def java_regex(self) -> str | None:
        """Translate the AST to an equivalent anchored Java-regex string
        for Spark ``rlike`` (pure-JVM codegen matching), or None when the
        pattern uses constructs with no clean Java-regex equivalent
        (complement, intersection, numeric intervals, empty language)."""
        try:
            body = _to_java_regex(self.ast)
        except _NoJavaRegex:
            return None
        return "(?s)^(?:" + body + ")$"


class _NoJavaRegex(Exception):
    pass


def _jr_escape_cp(c: int) -> str:
    ch = chr(c)
    if ch.isascii() and (ch.isalnum() or ch in " _"):
        return ch
    return "\\x{%X}" % c


def _jr_class(ivs: list[tuple[int, int]]) -> str:
    parts = []
    for lo, hi in ivs:
        if lo == hi:
            parts.append(_jr_escape_cp(lo))
        else:
            parts.append(f"{_jr_escape_cp(lo)}-{_jr_escape_cp(hi)}")
    return "[" + "".join(parts) + "]"


def _to_java_regex(node) -> str:
    k = node[0]
    if k == "char":
        return _jr_escape_cp(node[1])
    if k == "crange":
        return _jr_class([(node[1], node[2])])
    if k == "class":
        if not node[1]:
            raise _NoJavaRegex()
        return _jr_class(node[1])
    if k == "any":
        return "."
    if k == "string":
        return "".join(_jr_escape_cp(ord(ch)) for ch in node[1]) or "(?:)"
    if k == "anystring":
        return ".*"
    if k == "union":
        return f"(?:{_to_java_regex(node[1])}|{_to_java_regex(node[2])})"
    if k == "concat":
        return _to_java_regex(node[1]) + _to_java_regex(node[2])
    if k == "opt":
        return f"(?:{_to_java_regex(node[1])})?"
    if k == "star":
        return f"(?:{_to_java_regex(node[1])})*"
    if k == "repmin":
        return f"(?:{_to_java_regex(node[1])}){{{node[2]},}}"
    if k == "repminmax":
        if node[3] < node[2]:
            raise _NoJavaRegex()
        return f"(?:{_to_java_regex(node[1])}){{{node[2]},{node[3]}}}"
    # comp / inter / interval / emptylang: automaton-only
    raise _NoJavaRegex()
