"""Surround query-language parser — the proximity-operator syntax.

Reference: queryparser/src/java/org/apache/lucene/queryparser/surround/
parser/QueryParser.jj (grammar) + queryparser/.../surround/query/*.java
(query factories).  Operators in increasing precedence (QueryParser.jj
token block :210-218 and the production chain FieldsQuery → OrQuery →
AndQuery → NotQuery → NQuery → WQuery → PrimaryQuery):

  OR | AND | NOT | nN (unordered within distance n) | nW (ordered within
  distance n); distance defaults to 1 (QueryParser.jj:70) and a distance of
  n maps to SpanNearQuery slop = n - 1 (query/DistanceQuery.java:97).

Supported forms (the reference grammar, minus the noted engine subset):

  - infix:  ``table 5w hash``, ``window 3n scan``, ``a AND b OR c NOT d``
  - prefix: ``5W(table, hash, part)``, ``N(a, b)``, ``AND(a, b)``, ``OR(a, b)``
  - truncation: ``pre*`` (SrndPrefixQuery), ``wild*card`` / ``wil?card``
    (SrndTruncQuery) — at the boolean level they rewrite like classic-parser
    multiterm queries; INSIDE a distance operator they expand against the
    term dictionary into an or-of-terms sub-span (SpanNearClauseFactory
    visitMatchingTerms semantics, query/SpanNearClauseFactory.java:64-139)
  - weights: ``term^2`` / ``(...)^1.5`` — multiplicative, left-associative
    (QueryParser.jj OptionalWeights: ``q.setWeight(f * q.getWeight())``)
  - fields: ``f:`` prefixes route like the classic parser (FieldsQuery)
  - quoted literal terms: ``"term"`` (a single term, not a phrase —
    SimpleTerm production, QueryParser.jj SimpleTerm <QUOTED>)

Engine subset (documented divergences):

  - NOT is infix-only (as in the grammar); ``a NOT b`` → MUST a, MUST_NOT b
    (query/NotQuery.java:31-41).
  - Nested distance ops: the reference nests left-associatively
    (``a w b w c`` = DistanceQuery(DistanceQuery(a,b), c)); this engine's
    span kernel composes terms / or-of-terms only, so equal-distance chains
    FLATTEN to one n-ary near (same adjacency semantics for slop 0) and
    mixed-distance nesting raises ValueError.
  - Terms are analyzed with the index analyzer at rewrite() time; the
    reference surround parser is analyzer-free (SrndTermQuery uses the raw
    image).  Analysis here lowercases, matching the lowercased term dict.
  - Weights inside a distance operator raise (reference FIXME at
    NotQuery.java:37 shows even Lucene treats sub-weights loosely).

The output is the engine's raw AST — feed it to ``search()`` /
``count_hits()`` like any ``parse_query`` result.
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r'[^\s,()^:"]+')
_W_OP = re.compile(r"^([2-9][0-9]?|1[0-9])?[wW]$")
_N_OP = re.compile(r"^([2-9][0-9]?|1[0-9])?[nN]$")
_NUM = re.compile(r"^\d+(\.\d+)?$")


def _lex(q: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c in "(),:^":
            out.append(({"(": "lp", ")": "rp", ",": "comma",
                         ":": "colon", "^": "carat"}[c], c))
            i += 1
            continue
        if c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ValueError(f"unterminated quote in surround query: {q!r}")
            body = q[i + 1:j]
            if j + 1 < n and q[j + 1] == "*":
                out.append(("prefixterm", body))
                i = j + 2
            else:
                out.append(("quoted", body))
                i = j + 1
            continue
        m = _WORD_RE.match(q, i)
        if m is None:
            raise ValueError(f"cannot lex surround query at {q[i:]!r}")
        i = m.end()
        out.append(("word", m.group()))
    out.append(("eof", ""))
    return out


def _op_distance(tok: str) -> int:
    """QueryParser.jj getOpDistance: leading digits or 1 (:70, :126-131)."""
    digits = tok[:-1]
    return int(digits) if digits else 1


class _SurroundParser:
    def __init__(self, q: str, default_field: str = "text", fields=None):
        self.toks = _lex(q)
        self.pos = 0
        self.default_field = default_field
        self.fields = set(fields or ())

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        if t[0] != "eof":  # clamp: never run past the sentinel
            self.pos += 1
        return t

    def _is_kw(self, kw: str) -> bool:
        kind, text = self.peek()
        return kind == "word" and text.lower() == kw

    def _next_is_lp(self) -> bool:
        return self.toks[self.pos + 1][0] == "lp"

    def _expect(self, kind: str) -> None:
        got = self.next()
        if got[0] != kind:
            raise ValueError(f"expected {kind}, got {got[1]!r}")

    # --- production chain (QueryParser.jj FieldsQuery..PrimaryQuery) -----

    def parse(self) -> tuple:
        node = self.fields_query()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing input in surround query at "
                             f"{self.toks[self.pos:]!r}")
        return node

    def fields_query(self) -> tuple:
        names: list[str] = []
        while (
            self.peek()[0] == "word"
            and self.toks[self.pos + 1][0] == "colon"
        ):
            names.append(self.next()[1])
            self.next()  # colon
        node = self.or_query()
        if not names:
            return node
        routed = []
        for f in names:
            if f == self.default_field:
                routed.append(node)
            elif f in self.fields:
                routed.append(("field", f, node))
            else:
                routed.append(("match_none",))
        live = [r for r in routed if r[0] != "match_none"]
        if not live:
            return ("match_none",)
        return live[0] if len(live) == 1 else ("or", live)

    def or_query(self) -> tuple:
        subs = [self.and_query()]
        while self._is_kw("or"):
            self.next()
            subs.append(self.and_query())
        return subs[0] if len(subs) == 1 else ("or", subs)

    def and_query(self) -> tuple:
        subs = [self.not_query()]
        while self._is_kw("and"):
            self.next()
            subs.append(self.not_query())
        return subs[0] if len(subs) == 1 else ("andn", subs)

    def not_query(self) -> tuple:
        first = self.n_query()
        negs = []
        while self._is_kw("not"):
            self.next()
            negs.append(self.n_query())
        return first if not negs else ("notn", first, negs)

    def n_query(self) -> tuple:
        return self._distance_chain(self.w_query, _N_OP, ordered=False)

    def w_query(self) -> tuple:
        return self._distance_chain(self.primary, _W_OP, ordered=True)

    def _distance_chain(self, sub_fn, op_re, ordered: bool) -> tuple:
        node = sub_fn()
        subs: list[tuple] | None = None
        dist: int | None = None
        while True:
            kind, text = self.peek()
            if kind != "word" or not op_re.match(text):
                break
            self.next()
            d = _op_distance(text)
            if subs is None:
                subs, dist = [node], d
            elif d != dist:
                raise ValueError(
                    "mixed-distance nested surround chains are not supported"
                    f" (saw {dist} then {d}); use prefix {dist}W(...) form"
                )
            subs.append(sub_fn())
        if subs is None:
            return node
        return self._make_distance(subs, dist, ordered)

    def primary(self) -> tuple:
        kind, text = self.peek()
        if kind == "lp":
            self.next()
            node = self.fields_query()
            self._expect("rp")
            return self._weights(node)
        if kind == "word" and self._next_is_lp():
            # prefix operator: OR(...) AND(...) nW(...) nN(...)
            low = text.lower()
            if low in ("or", "and") or _W_OP.match(text) or _N_OP.match(text):
                self.next()
                args = self._query_list()
                if low == "or":
                    node = ("or", args)
                elif low == "and":
                    node = ("andn", args)
                else:
                    ordered = _W_OP.match(text) is not None
                    node = self._make_distance(args, _op_distance(text), ordered)
                return self._weights(node)
        if kind == "word" and (
            text.lower() in ("or", "and", "not")
            or _W_OP.match(text) or _N_OP.match(text)
        ):
            # operator token in term position (reference: <W>/<OR>/... are
            # dedicated tokens, so SimpleTerm cannot match them)
            raise ValueError(f"operator {text!r} where a term was expected")
        if kind in ("word", "quoted", "prefixterm"):
            self.next()
            return self._weights(self._simple_term(kind, text))
        raise ValueError(f"unexpected token {text!r} in surround query")

    def _query_list(self) -> list[tuple]:
        self._expect("lp")
        args = [self.fields_query()]
        while self.peek()[0] == "comma":
            self.next()
            args.append(self.fields_query())
        self._expect("rp")
        if len(args) < 2:
            raise ValueError("surround prefix operators need >= 2 operands")
        return args

    def _simple_term(self, kind: str, text: str) -> tuple:
        if kind == "quoted":
            return ("term", text)
        if kind == "prefixterm":  # "abc"* → prefix query
            return ("wildcard_raw", text.lower() + "%")
        if "*" in text or "?" in text:
            # SUFFIXTERM / TRUNCTERM → like-pattern (lowercased to match
            # the term dict, as the classic parser does)
            return ("wildcard_raw",
                    text.lower().replace("*", "%").replace("?", "_"))
        return ("term", text)

    def _weights(self, node: tuple) -> tuple:
        f = 1.0
        while self.peek()[0] == "carat":
            self.next()
            kind, text = self.next()
            if kind != "word" or not _NUM.match(text):
                raise ValueError(f"bad weight after ^: {text!r}")
            w = float(text)
            if w <= 0.0:
                raise ValueError(f"weights must be > 0, got {w}")
            f *= w
        return ("boost", node, f) if f != 1.0 else node

    # --- distance assembly ------------------------------------------------

    def _make_distance(self, subs: list[tuple], dist: int, ordered: bool) -> tuple:
        """DistanceQuery → span_near(slop = opDistance - 1, ordered)
        (query/DistanceQuery.java:97); sub-queries become span sub-clauses
        per SpanNearClauseFactory: term → SpanTermQuery, or-of-terms →
        SpanOrQuery, truncation → or-over-matching-terms (sprefix_raw,
        expanded against the index by search.expand_multiterm)."""
        span_subs = [self._to_span_sub(s) for s in subs]
        return ("span_near", span_subs, dist - 1, ordered)

    def _to_span_sub(self, n: tuple) -> tuple:
        kind = n[0]
        if kind == "term":
            return ("sterm", n[1])
        if kind == "wildcard_raw":
            return ("sprefix_raw", n[1])
        if kind == "or":
            terms = []
            for c in n[1]:
                if c[0] != "term":
                    raise ValueError(
                        "surround distance sub-queries compose terms and "
                        f"or-of-terms only (got {c[0]} inside OR)"
                    )
                terms.append(c[1])
            return ("span_or", terms)
        if kind == "span_near":
            raise ValueError(
                "nested distance operators with differing shape are not "
                "supported by the span kernel; flatten to one n-ary W(...)/"
                "N(...) with a single distance"
            )
        if kind == "boost":
            raise ValueError("weights inside a distance operator are not supported")
        raise ValueError(f"cannot use {kind} inside a distance operator")


def parse_surround(q: str, default_field: str = "text", fields=None) -> tuple:
    """Parse surround syntax into the engine AST (raw — pass to search()).
    ``fields``: known non-default indexed field names, as in parse_query."""
    return _SurroundParser(q, default_field, fields).parse()
