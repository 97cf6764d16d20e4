"""SimpleQueryParser: forgiving human query syntax.

Reference: queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java — a fault-tolerant parser where any input produces
SOME query:

  - ``+`` AND, ``|`` OR, ``-token`` negation, ``"..."`` phrase,
    ``term*`` prefix, ``term~N`` fuzzy, ``"..."~N`` near, ``( )`` precedence
  - right-to-left incremental precedence (:438-476 buildQueryTree): when the
    operator CHANGES, the whole current tree becomes one clause of a new
    BooleanQuery under the new operator — ``a | b + c`` = ``(a OR b) AND c``
  - errors never throw: an unclosed ``(`` or ``"`` is treated as extraneous
    (:268-272, :330-334), ``)`` with no opener is skipped (:172-174),
    operators with no left operand are ignored (:180-199)
  - ``\\`` escapes operator characters inside terms and phrases (:236-244)
  - negation wraps the branch in ``bq(MUST_NOT branch, SHOULD MatchAll)``
    (:448-453) — a COMPLEMENT, so with the default OR operator ``b -a``
    matches every doc without ``a`` plus every doc with ``b``, exactly like
    the reference (surprising but faithful)
  - ``*`` alone = MatchAllDocsQuery (:150-153); empty input = MatchNoDocs
  - fuzziness: bare ``~`` = 2, capped at LevenshteinAutomata
    .MAXIMUM_SUPPORTED_DISTANCE = 2, ``~0`` = plain term (:400-421)

Execution: trees WITHOUT complement/match-all nodes map onto the engine AST
and run through the pruned top-k kernels (``search``).  Trees WITH them run
through a DataFrame BooleanQuery evaluator (:func:`simple_search`): each leaf
scores via ``score_docs`` (all matches, distributed), a complement is an
anti-join against the doc table at MatchAll's constant score 1.0
(search/MatchAllDocsQuery.java:35), SHOULD-lists union + sum per docid and
MUST-lists additionally require the full clause count — BooleanQuery's
sum-of-matching-clause-scores semantics, expressed as joins Catalyst can
plan.  Nothing is collected until the final top-k.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from .analysis import ENGLISH_STOP_WORDS, analyze, analyze_with_positions

# flag bits (SimpleQueryParser.java:107-128)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_WS = {" ", "\t", "\n", "\r"}
_MAX_FUZZ = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    __slots__ = ("data", "index", "length", "top", "cur_op", "prev_op", "not_")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top: tuple | None = None
        self.cur_op: str | None = None   # "must" | "should"
        self.prev_op: str | None = None
        self.not_ = 0


class SimpleQueryParser:
    """Single-field SimpleQueryParser over the engine's analysis chain.

    ``default_operator``: "should" (reference default, :130) or "must"
    (setDefaultOperator).  ``flags``: bitwise OR of the *_OPERATOR flags,
    -1 = everything enabled (SimpleQueryParser.java:139-147).
    """

    def __init__(self, analyzer=ENGLISH_STOP_WORDS, flags: int = ALL_OPERATORS,
                 default_operator: str = "should"):
        if default_operator not in ("should", "must"):
            raise ValueError("default_operator must be 'should' or 'must'")
        self.analyzer = analyzer
        self.flags = flags
        self.default_operator = default_operator

    # ---------------------------------------------------------------- parse

    def parse(self, query_text: str) -> tuple:
        """Parse to an engine-AST tuple; never raises on malformed input.
        May contain ``("complement", sub)`` / ``("match_all",)`` nodes —
        run those through :func:`simple_search`, or :func:`to_engine_ast`
        when the tree has none."""
        if query_text.strip() == "*":
            return ("match_all",)
        state = _State(query_text, 0, len(query_text))
        self._parse_sub(state)
        return state.top if state.top is not None else ("match_none",)

    def _parse_sub(self, state: _State) -> None:
        # parseSubQuery (:168-228): one linear scan dispatching on the
        # current character; state.not_ resets after every non-'-' char
        f, data = self.flags, state.data
        while state.index < state.length:
            c = data[state.index]
            if c == "(" and f & PRECEDENCE_OPERATORS:
                self._consume_subquery(state)
            elif c == ")" and f & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous — ignored
            elif c == '"' and f & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif c == "+" and f & AND_OPERATOR:
                if state.cur_op is None and state.top is not None:
                    state.cur_op = "must"
                state.index += 1
            elif c == "|" and f & OR_OPERATOR:
                if state.cur_op is None and state.top is not None:
                    state.cur_op = "should"
                state.index += 1
            elif c == "-" and f & NOT_OPERATOR:
                state.not_ += 1
                state.index += 1
                continue  # two '-' in a row negate each other
            elif c in _WS and f & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_ = 0

    def _consume_subquery(self, state: _State) -> None:
        # consumeSubQuery (:230-287): find the balanced ')', recurse on the
        # slice with a fresh state, graft its top into ours
        f, data = self.flags, state.data
        state.index += 1
        start = state.index
        depth = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and f & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closer: '(' was extraneous
        elif state.index == start:
            state.cur_op = None  # '()' — the pending op dies with it
            state.index += 1
        else:
            sub = _State(data, start, state.index)
            self._parse_sub(sub)
            self._build(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        # consumePhrase (:289-355): copy until the closing '"', honoring
        # escapes; '"~' with trailing chars signals slop
        f, data = self.flags, state.data
        state.index += 1
        start = state.index
        buf: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and f & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    if (state.length > state.index + 1
                            and data[state.index + 1] == "~"
                            and f & NEAR_OPERATOR):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # no closer: '"' was extraneous
        elif state.index == start:
            state.cur_op = None
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build(state, self._new_phrase(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        # consumeToken (:357-424)
        f, data = self.flags, state.data
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and f & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and f & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and bool(f & PREFIX_OPERATOR)
            escaped = False
            buf.append(data[state.index])
            state.index += 1
        if not buf:
            return
        if fuzzy:
            token = "".join(buf)
            fz = min(self._parse_fuzziness(state), _MAX_FUZZ)
            branch = (self._new_default(token) if fz == 0
                      else ("fuzzy_raw", token.lower(), fz, 0))
        elif prefix:
            branch = ("wildcard_raw", "".join(buf[:-1]).lower() + "%")
        else:
            branch = self._new_default("".join(buf))
        self._build(state, branch)

    def _parse_fuzziness(self, state: _State) -> int:
        # parseFuzziness (:487-521): digits after '~' until a delimiter;
        # empty = 2, unparsable = 0, negative = 0
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        buf: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                buf.append(state.data[state.index])
        s = "".join(buf)
        if s == "":
            return 2
        try:
            return max(int(s), 0)
        except ValueError:
            return 0

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        f = self.flags
        return ((c == '"' and bool(f & PHRASE_OPERATOR))
                or (c == "|" and bool(f & OR_OPERATOR))
                or (c == "+" and bool(f & AND_OPERATOR))
                or (c in "()" and bool(f & PRECEDENCE_OPERATORS))
                or (c in _WS and bool(f & WHITESPACE_OPERATOR)))

    # --------------------------------------------------------- leaf factories

    def _new_default(self, text: str) -> tuple | None:
        # newDefaultQuery → QueryBuilder.createBooleanQuery(field, text,
        # defaultOperator): analyze; multi-token text joins under the
        # default operator
        toks = analyze(text, self.analyzer)
        if not toks:
            return None
        if len(toks) == 1:
            return ("term", toks[0])
        if self.default_operator == "must":
            return ("and", toks)
        return ("or", [("term", t) for t in toks])

    def _new_phrase(self, text: str, slop: int) -> tuple | None:
        # newPhraseQuery → createPhraseQuery: analyzed with position gaps
        toks, poss = analyze_with_positions(text, self.analyzer)
        if not toks:
            return None
        if len(toks) == 1:
            return ("term", toks[0])
        members = list(zip(toks, poss))
        return ("sloppy", members, slop) if slop > 0 else ("phrase", members)

    # ------------------------------------------------------------ tree build

    def _build(self, state: _State, branch: tuple | None) -> None:
        # buildQueryTree (:438-476): complement-wrap odd negation; same-op
        # clauses accumulate, an op CHANGE demotes the whole current tree to
        # one clause of a fresh node — right-to-left precedence
        if branch is None:
            # the reference resets cur_op only inside the branch!=null block
            # (:440,:473), so a branch that analyzes entirely away (stopword-
            # only token) leaves the pending operator armed for the next
            # token — faithful, if surprising
            return
        if state.not_ % 2 == 1:
            branch = ("complement", branch)
        if state.top is None:
            state.top = branch
        else:
            if state.cur_op is None:
                state.cur_op = self.default_operator
            if state.prev_op != state.cur_op:
                state.top = ("sqp_bool", state.cur_op, [state.top])
            state.top = ("sqp_bool", state.cur_op,
                         list(state.top[2]) + [branch])
            state.prev_op = state.cur_op
        state.cur_op = None


def parse_simple_query(query: str, analyzer=ENGLISH_STOP_WORDS,
                       flags: int = ALL_OPERATORS,
                       default_operator: str = "should") -> tuple:
    """Module-level convenience: parse and return the AST (see
    :class:`SimpleQueryParser`)."""
    return SimpleQueryParser(analyzer, flags, default_operator).parse(query)


# ------------------------------------------------------------------ execute


def _has_complement(node: tuple) -> bool:
    k = node[0]
    if k in ("complement", "match_all"):
        return True
    if k == "sqp_bool":
        return any(_has_complement(m) for m in node[2])
    return False


def to_engine_ast(node: tuple) -> tuple:
    """Lower a complement-free parse tree onto the engine AST:
    ``sqp_bool must`` → andn, ``sqp_bool should`` → or (rewrite() flattens
    and specializes all-term cases)."""
    k = node[0]
    if k == "sqp_bool":
        subs = [to_engine_ast(m) for m in node[2]]
        return ("andn", subs) if node[1] == "must" else ("or", subs)
    if k in ("complement", "match_all"):
        raise ValueError(
            "tree contains complement/match-all nodes; execute with "
            "simple_search (the kernel has no all-docs iterator)")
    return node


def eval_boolean_df(index, node: tuple, precision: str = "float64",
                    similarity: str = "bm25",
                    analyzer=ENGLISH_STOP_WORDS) -> DataFrame:
    """BooleanQuery evaluator over DataFrames for trees the pruned kernel
    can't express: returns (docid, score) of every matching doc.

    - leaf → ``score_docs`` (distributed, per-segment kernels)
    - ``match_all`` → the doc table at constant 1.0
      (MatchAllDocsQuery.java:35 scores boost=1)
    - ``complement`` → doc table ANTI JOIN sub-matches, at MatchAll's 1.0
      (the bq(MUST_NOT sub, SHOULD MatchAll) wrapper, :448-453)
    - ``should`` → union + per-docid SUM (BooleanQuery sums matching
      optional clause scores)
    - ``must`` → same sum, keeping docids matched by ALL clauses

    Sizes: the unions are match-set-sized, the groupBy shuffles (docid,
    score) pairs only, and complements are one anti-join against the doc
    table — no driver traffic, no cartesian terms, safe at any corpus size.
    """
    from .search import score_docs

    k = node[0]
    if k == "match_all":
        return _all_docs(index).withColumn("score", F.lit(1.0))
    if k == "complement":
        sub = eval_boolean_df(index, node[1], precision, similarity, analyzer)
        return (
            _all_docs(index)
            .join(sub.select("docid"), "docid", "left_anti")
            .withColumn("score", F.lit(1.0))
        )
    if k == "sqp_bool":
        occur, members = node[1], node[2]
        parts = [eval_boolean_df(index, m, precision, similarity, analyzer)
                 for m in members]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        agg = u.groupBy("docid").agg(
            F.sum("score").alias("score"), F.count("*").alias("nclauses"))
        if occur == "must":
            agg = agg.filter(F.col("nclauses") == len(members))
        return agg.select("docid", "score")
    return score_docs(index, node, precision=precision,
                      similarity=similarity, analyzer=analyzer)


def _all_docs(index) -> DataFrame:
    d = index.docs.select("docid")
    if index.tombstones is not None:
        d = d.join(index.tombstones.select("docid"), "docid", "left_anti")
    return d


def simple_search(index, query: str, k: int = 10,
                  analyzer=ENGLISH_STOP_WORDS, flags: int = ALL_OPERATORS,
                  default_operator: str = "should",
                  precision: str = "float64", similarity: str = "bm25"):
    """Parse ``query`` with SimpleQueryParser syntax and return top-k
    TopDocs.  Complement-free trees run the pruned kernel path; trees with
    negation/match-all run the DataFrame evaluator with a Spark-side
    TakeOrderedAndProject — only k rows reach the driver either way."""
    from .search import TopDocs, search

    node = parse_simple_query(query, analyzer, flags, default_operator)
    if node == ("match_none",):
        return TopDocs(np.empty(0, dtype=np.int64),
                       np.empty(0, dtype=np.float64))
    if not _has_complement(node):
        return search(index, to_engine_ast(node), k=k, precision=precision,
                      similarity=similarity, analyzer=analyzer)
    df = eval_boolean_df(index, node, precision, similarity, analyzer)
    rows = (
        df.orderBy(F.col("score").desc(), F.col("docid").asc())
        .limit(k).collect()
    )
    return TopDocs(
        np.array([r["docid"] for r in rows], dtype=np.int64),
        np.array([r["score"] for r in rows], dtype=np.float64),
    )
