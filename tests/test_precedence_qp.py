"""PrecedenceQueryParser: AND > OR > juxtaposition grouping, asserted via
the reference TestPrecedenceQueryParser equivalences (both sides parsed by
the same parser, like the reference's Query.equals checks)."""

import pytest

from lucene_spark.search import parse_query, precedence_parse


@pytest.mark.parametrize("q1,q2,op", [
    # testPrecedence, default OR
    ("A AND B OR C AND D", "(A AND B) OR (C AND D)", "or"),
    ("A OR B C", "(A B) C", "or"),
    ("A AND B C", "(+A +B) C", "or"),
    ("A AND NOT B", "+A -B", "or"),
    ("A OR NOT B", "A -B", "or"),
    ("A OR NOT B AND C", "A (-B +C)", "or"),
    # default AND
    ("A AND B OR C AND D", "(A AND B) OR (C AND D)", "and"),
    ("A AND B C", "(A B) C", "and"),
    ("A AND B C", "(+A +B) C", "and"),
    ("A AND NOT B", "+A -B", "and"),
    ("A AND NOT B OR C", "(+A -B) OR C", "and"),
    # testSimple
    ("a AND b", "+a +b", "or"),
    ("(a AND b)", "+a +b", "or"),
    ("c OR (a AND b)", "c (+a +b)", "or"),
    ("a AND -b", "+a -b", "or"),
    ("a && b", "+a +b", "or"),
    ("a || b", "a b", "or"),
    ("(foo OR bar) AND (baz OR boo)", "+(foo bar) +(baz boo)", "or"),
    ("((a OR b) AND NOT c) OR d", "(+(a b) -c) d", "or"),
])
def test_precedence_equivalences(q1, q2, op):
    assert precedence_parse(q1, operator=op) == \
        precedence_parse(q2, operator=op)


def test_differs_from_classic():
    # the classic parser flattens 'a AND b OR c AND d' into one boolean;
    # the precedence parser groups the AND pairs
    p = precedence_parse("a AND b OR c AND d")
    c = parse_query("a AND b OR c AND d")
    assert p != c
    assert p == precedence_parse("(a AND b) (c AND d)")


def test_atoms_flow_through():
    # phrases / ranges / fuzzy atoms reuse the classic atom parser
    assert precedence_parse('"x y"~2 AND z') == \
        precedence_parse('(+"x y"~2 +z)')
    assert precedence_parse("[a TO b] AND bar") == \
        precedence_parse("+[a TO b] +bar")
