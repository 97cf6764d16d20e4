"""Lucene expressions module analog: compile JS-like scoring expressions to
Catalyst SQL so they execute JVM-side (whole-stage codegen), never in Python.

Reference: lucene/expressions — JavascriptCompiler compiles a JavaScript-like
arithmetic language to bytecode over double-valued bindings
(expressions/src/java/org/apache/lucene/expressions/js/JavascriptCompiler.java:59-122,
grammar Javascript.g4); SimpleBindings maps variable names to
DoubleValuesSources (expressions/src/java/org/apache/lucene/expressions/
SimpleBindings.java).  The default function set is JavascriptCompiler.properties
(abs acos acosh asin asinh atan atan2 atanh ceil cos cosh exp floor haversin
ln log10 logn max min pow sin sinh sqrt tan tanh).

Semantics reproduced (all values are doubles, as in the reference):
  - ``cond ? a : b`` / ``!`` / ``&&`` / ``||`` treat nonzero as true and
    produce 1.0/0.0 (the compiler's D2L/IFEQ lowering);
  - comparisons produce 1.0/0.0;
  - bitwise ``& | ^ ~ << >> >>>`` convert operands to long first (D2L) and
    the result back to double, with Java's 6-bit shift-distance masking
    (Spark's shiftleft/shiftright/shiftrightunsigned share it);
  - ``logn(base, x)`` = ln(x)/ln(base) (MathUtil.log);
  - ``haversin(lat1,lon1,lat2,lon2)`` = great-circle km (SloppyMath
    haversinKilometers formula with the IUGG mean earth radius 6371.0087714;
    Lucene evaluates it with SloppyMath's table-driven approximations of
    sin/cos, so values may differ in the last ulps).

The compiler is the engine's UDF *front-end*, not a UDF: the output is a SQL
expression string usable anywhere Catalyst accepts one — e.g. as the
``source`` of :func:`lucene_spark.funcscore.function_score` — so at 100 TB
the expression runs vectorized inside the JVM with column pruning intact.
"""

from __future__ import annotations

import re

# name -> (sql_template_or_name, arity). Templates use {0}, {1}, ...
_FUNCTIONS: dict[str, tuple[str, int]] = {
    "abs": ("ABS({0})", 1),
    "acos": ("ACOS({0})", 1),
    "acosh": ("ACOSH({0})", 1),
    "asin": ("ASIN({0})", 1),
    "asinh": ("ASINH({0})", 1),
    "atan": ("ATAN({0})", 1),
    "atan2": ("ATAN2({0}, {1})", 2),
    "atanh": ("ATANH({0})", 1),
    "ceil": ("CEILING({0})", 1),
    "cos": ("COS({0})", 1),
    "cosh": ("COSH({0})", 1),
    "exp": ("EXP({0})", 1),
    "floor": ("FLOOR({0})", 1),
    "haversin": (
        "(2.0D * 6371.0087714D * ASIN(SQRT("
        "POWER(SIN(RADIANS(({2}) - ({0})) / 2.0D), 2.0D) + "
        "COS(RADIANS({0})) * COS(RADIANS({2})) * "
        "POWER(SIN(RADIANS(({3}) - ({1})) / 2.0D), 2.0D))))",
        4,
    ),
    "ln": ("LN({0})", 1),
    "log10": ("LOG10({0})", 1),
    "logn": ("(LN({1}) / LN({0}))", 2),
    "max": ("GREATEST({0}, {1})", 2),
    "min": ("LEAST({0}, {1})", 2),
    "pow": ("POWER({0}, {1})", 2),
    "sin": ("SIN({0})", 1),
    "sinh": ("SINH({0})", 1),
    "sqrt": ("SQRT({0})", 1),
    "tan": ("TAN({0})", 1),
    "tanh": ("TANH({0})", 1),
}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>0[xX][0-9a-fA-F]+|\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?
               |\d+(?:[eE][+-]?\d+)?)
      | (?P<ident>[A-Za-z_$][A-Za-z0-9_$]*(?:\.[A-Za-z_$][A-Za-z0-9_$]*)*)
      | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()?:,!~&|^<>])
    )""",
    re.VERBOSE,
)


def _lex(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if m is None or m.end() == i:
            rest = src[i:].strip()
            if not rest:
                break
            raise ValueError(f"unparsable expression at: {rest[:20]!r}")
        i = m.end()
        for kind in ("num", "ident", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


class _Compiler:
    """Precedence-climbing parser emitting a Spark SQL string.

    Mirrors Javascript.g4's precedence ladder: ternary < || < && < | < ^ <
    & < equality < relational < shift < additive < multiplicative < unary.
    """

    def __init__(self, tokens: list[tuple[str, str]], bindings: dict[str, str]):
        self.toks = tokens
        self.pos = 0
        self.bindings = bindings
        self.variables: set[str] = set()

    def peek(self) -> tuple[str, str]:
        return self.toks[self.pos]

    def eat(self, val: str | None = None) -> tuple[str, str]:
        k, v = self.toks[self.pos]
        if val is not None and v != val:
            raise ValueError(f"expected {val!r}, got {v!r}")
        self.pos += 1
        return k, v

    # --- precedence ladder -------------------------------------------------
    def parse(self) -> str:
        s = self.ternary()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing input at {self.peek()[1]!r}")
        return s

    def ternary(self) -> str:
        cond = self.logical_or()
        if self.peek()[1] == "?":
            self.eat("?")
            a = self.ternary()
            self.eat(":")
            b = self.ternary()
            return f"IF(({cond}) <> 0.0D, {a}, {b})"
        return cond

    def _bool_chain(self, sub, op_tok: str, sql_op: str) -> str:
        left = sub()
        if self.peek()[1] != op_tok:
            return left
        parts = [f"({left}) <> 0.0D"]
        while self.peek()[1] == op_tok:
            self.eat(op_tok)
            parts.append(f"({sub()}) <> 0.0D")
        return "CAST((" + f" {sql_op} ".join(parts) + ") AS DOUBLE)"

    def logical_or(self) -> str:
        return self._bool_chain(self.logical_and, "||", "OR")

    def logical_and(self) -> str:
        return self._bool_chain(self.bit_or, "&&", "AND")

    def _long_chain(self, sub, ops: dict[str, str]) -> str:
        left = sub()
        while self.peek()[1] in ops:
            _, op = self.eat()
            right = sub()
            tpl = ops[op]
            left = tpl.format(a=f"CAST({left} AS BIGINT)", b=f"CAST({right} AS BIGINT)")
            left = f"CAST({left} AS DOUBLE)"
        return left

    def bit_or(self) -> str:
        return self._long_chain(self.bit_xor, {"|": "({a} | {b})"})

    def bit_xor(self) -> str:
        return self._long_chain(self.bit_and, {"^": "({a} ^ {b})"})

    def bit_and(self) -> str:
        return self._long_chain(self.equality, {"&": "({a} & {b})"})

    def _cmp_chain(self, sub, ops: set[str]) -> str:
        left = sub()
        while self.peek()[1] in ops:
            _, op = self.eat()
            right = sub()
            sql = {"==": "=", "!=": "<>"}.get(op, op)
            left = f"CAST(({left}) {sql} ({right}) AS DOUBLE)"
        return left

    def equality(self) -> str:
        return self._cmp_chain(self.relational, {"==", "!="})

    def relational(self) -> str:
        return self._cmp_chain(self.shift, {"<", "<=", ">", ">="})

    def shift(self) -> str:
        left = self.additive()
        while self.peek()[1] in ("<<", ">>", ">>>"):
            _, op = self.eat()
            right = self.additive()
            fn = {"<<": "SHIFTLEFT", ">>": "SHIFTRIGHT", ">>>": "SHIFTRIGHTUNSIGNED"}[op]
            left = (
                f"CAST({fn}(CAST({left} AS BIGINT), CAST({right} AS INT)) AS DOUBLE)"
            )
        return left

    def additive(self) -> str:
        left = self.multiplicative()
        while self.peek()[1] in ("+", "-"):
            _, op = self.eat()
            left = f"({left} {op} {self.multiplicative()})"
        return left

    def multiplicative(self) -> str:
        left = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            _, op = self.eat()
            left = f"({left} {op} {self.unary()})"
        return left

    def unary(self) -> str:
        k, v = self.peek()
        if v == "-":
            self.eat()
            return f"(- {self.unary()})"
        if v == "+":
            self.eat()
            return self.unary()
        if v == "!":
            self.eat()
            return f"CAST(NOT(({self.unary()}) <> 0.0D) AS DOUBLE)"
        if v == "~":
            self.eat()
            return f"CAST(~CAST({self.unary()} AS BIGINT) AS DOUBLE)"
        return self.atom()

    def atom(self) -> str:
        k, v = self.peek()
        if v == "(":
            self.eat("(")
            inner = self.ternary()
            self.eat(")")
            return f"({inner})"
        if k == "num":
            self.eat()
            if v[:2].lower() == "0x":
                return f"CAST({int(v, 16)} AS DOUBLE)"
            return f"CAST({v} AS DOUBLE)"
        if k == "ident":
            self.eat()
            if self.peek()[1] == "(":
                return self.call(v)
            if v not in self.bindings:
                raise ValueError(
                    f"invalid expression {v!r}: unknown variable (bindings: "
                    f"{sorted(self.bindings)})"
                )
            self.variables.add(v)
            return f"({self.bindings[v]})"
        raise ValueError(f"unexpected token {v!r}")

    def call(self, name: str) -> str:
        if name not in _FUNCTIONS:
            raise ValueError(f"unknown function {name!r}")
        tpl, arity = _FUNCTIONS[name]
        self.eat("(")
        args = []
        if self.peek()[1] != ")":
            args.append(self.ternary())
            while self.peek()[1] == ",":
                self.eat(",")
                args.append(self.ternary())
        self.eat(")")
        if len(args) != arity:
            raise ValueError(
                f"function {name!r} takes {arity} argument(s), got {len(args)}"
            )
        return tpl.format(*args)


def compile_expression(expr: str, bindings: dict[str, str]) -> str:
    """Compile a Lucene-expressions string to a Spark SQL expression string.

    ``bindings``: variable name -> SQL expression/column name (the
    SimpleBindings analog — every variable the expression references must be
    bound, enforced at compile time like SimpleBindings.validate).  The
    conventional score binding is ``{"_score": "score"}``.

    >>> compile_expression("_score + ln(1 + popularity)",
    ...                    {"_score": "score", "popularity": "popularity"})
    '((score) + LN((CAST(1 AS DOUBLE) + (popularity))))'
    """
    c = _Compiler(_lex(expr), bindings)
    return c.parse()


def expression_column(expr: str, bindings: dict[str, str]):
    """compile_expression wrapped as a pyspark Column."""
    from pyspark.sql import functions as F

    return F.expr(compile_expression(expr, bindings))
