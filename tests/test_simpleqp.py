"""SimpleQueryParser tests.

Vectors replicate queryparser/src/test/.../simple/TestSimpleQueryParser.java
(whitespace+lowercase MockAnalyzer, default operator MUST, per its parse()
helper at :57-62) as engine-AST assertions, plus Spark execution tests for
the complement/match-all DataFrame path.
"""

import numpy as np
import pytest

from lucene_spark.analysis import Analyzer
from lucene_spark.simpleqp import (
    AND_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    WHITESPACE_OPERATOR,
    SimpleQueryParser,
    parse_simple_query,
    simple_search,
    to_engine_ast,
)
from lucene_spark.tokenizers import whitespace_tokenize


def mock_analyzer():
    # MockAnalyzer(random()) in the reference tests = whitespace + lowercase
    return Analyzer(stopwords=frozenset(), tokenizer=whitespace_tokenize)


def parse(text, flags=-1, default_operator="must"):
    return SimpleQueryParser(mock_analyzer(), flags, default_operator).parse(text)


T = lambda t: ("term", t)
MUST = lambda *ms: ("sqp_bool", "must", list(ms))
SHOULD = lambda *ms: ("sqp_bool", "should", list(ms))
NOT = lambda m: ("complement", m)


# ------------------------------------------------------------- testTerm etc.


def test_term():
    assert parse("foobar") == T("foobar")


def test_fuzzy():
    # testFuzzy: bare ~ = 2; non-numeric suffix = plain term; >2 capped
    assert parse("foobar~2") == ("fuzzy_raw", "foobar", 2, 0)
    assert parse("foobar~") == ("fuzzy_raw", "foobar", 2, 0)
    assert parse("foobar~a") == T("foobar")
    assert parse("foobar~1a") == T("foobar")
    assert parse("foo~3 bar") == MUST(("fuzzy_raw", "foo", 2, 0), T("bar"))
    assert parse("foobar~0") == T("foobar")


def test_phrase():
    assert parse('"foo bar"') == ("phrase", [("foo", 0), ("bar", 1)])


def test_phrase_with_slop():
    members = [("foo", 0), ("bar", 1)]
    assert parse('"foo bar"~2') == ("sloppy", members, 2)
    assert parse('"foo bar"~10') == ("sloppy", members, 10)
    assert parse('"foo bar"~') == ("phrase", members)
    assert parse('"foo bar"~a') == ("phrase", members)
    assert parse('"foo bar"~1a') == ("phrase", members)
    assert parse('"foo bar"~-1') == ("phrase", members)
    assert parse('"foo bar"~12 baz') == MUST(("sloppy", members, 12), T("baz"))


def test_prefix():
    assert parse("foobar*") == ("wildcard_raw", "foobar%")


def test_and_or_not():
    assert parse("star wars") == MUST(T("star"), T("wars"))
    assert parse("star+wars") == MUST(T("star"), T("wars"))
    assert parse("star|wars") == SHOULD(T("star"), T("wars"))
    assert parse('"foo bar" "eek eek"') == MUST(
        ("phrase", [("foo", 0), ("bar", 1)]),
        ("phrase", [("eek", 0), ("eek", 1)]),
    )
    assert parse("-foo") == NOT(T("foo"))
    assert parse("-(foo)") == NOT(T("foo"))
    assert parse("---foo") == NOT(T("foo"))
    assert parse("--foo") == T("foo")  # double negation cancels


def test_crazy_prefixes():
    # testCrazyPrefixes1/2, testTermInDisguise — escapes defeat operators
    assert parse("st*ar*") == ("wildcard_raw", "st*ar%")
    assert parse("st*ar\\\\**") == ("wildcard_raw", "st*ar\\*%")
    assert parse("sT*Ar\\\\\\*") == T("st*ar\\*")


def test_garbage_term():
    for q in ["star", "star\n", "star\r", "star\t", "star(", "star)",
              'star"', "\t \r\n\nstar   \n \r \t ", '- + "" - star \\']:
        assert parse(q) == T("star"), q


def test_garbage_empty():
    for q in ["", "  ", "\\ ", "\\ \\ ", '""', '" "', '" "|" "',
              '(" "|" ")', '" " " "', '(" " " ")']:
        assert parse(q) == ("match_none",), repr(q)


def test_garbage_and_or():
    expected = MUST(T("star"), T("wars"))
    for q in ["star wars", "star+wars", "     star     wars   ",
              "     star +    wars   ", "  |     star + + |   wars   ",
              "  |     star + + |   wars   \\"]:
        assert parse(q) == expected, q
    expected = SHOULD(T("star"), T("wars"))
    for q in ["star|wars", "     star |    wars   ",
              "  |     star | + |   wars   ", "  +     star | + +   wars   \\"]:
        assert parse(q) == expected, q


def test_garbage_not_phrase_subquery():
    expected = NOT(T("star"))
    for q in ["-star", "---star", "- -star -"]:
        assert parse(q) == expected, q
    expected = ("phrase", [("star", 0), ("wars", 1)])
    for q in ['"star wars"', '"star wars\\ "', '"" | "star wars"',
              '          "star wars"        ""\\']:
        assert parse(q) == expected, q
    for q in ["(star)", "(star))", "((star)", "     -()(star)        \n\n\r     ",
              "| + - ( + - |      star    \n      ) \n"]:
        assert parse(q) == T("star"), q


def test_compound():
    assert parse("star wars empire") == MUST(T("star"), T("wars"), T("empire"))
    assert parse("star+wars + empire") == MUST(T("star"), T("wars"), T("empire"))
    assert parse(" | --star wars empire \n\\") == MUST(
        T("star"), T("wars"), T("empire"))
    assert parse("star|wars|empire") == SHOULD(T("star"), T("wars"), T("empire"))
    assert parse(" | --star|wars|empire \n\\") == SHOULD(
        T("star"), T("wars"), T("empire"))


def test_complex_precedence():
    # testComplex00: operator change wraps the current tree (right-to-left)
    c00 = MUST(SHOULD(T("star"), T("wars")), T("empire"))
    for q in ["star|wars empire", "star|wars + empire",
              "star| + wars + ----empire |"]:
        assert parse(q) == c00, q
    c01 = SHOULD(MUST(T("star"), T("wars")), T("empire"))
    for q in ["star wars | empire", "star + wars|empire",
              "star + | wars | ----empire +"]:
        assert parse(q) == c01, q
    c03 = MUST(
        SHOULD(MUST(T("star"), T("wars")), T("empire"), T("strikes")),
        T("back"))
    assert parse("star wars | empire | strikes back") == c03
    c04 = SHOULD(MUST(T("star"), T("wars")), T("empire"),
                 MUST(T("strikes"), T("back")))
    assert parse("(star wars) | empire | (strikes back)") == c04
    assert parse(
        "(star + | wars |) | ----empire | + --(strikes + | --back) \\") == c04


def test_match_all_star():
    assert parse("*") == ("match_all",)
    assert parse(" * ") == ("match_all",)


def test_disable_flags():
    # testDisablePhrase/Prefix/AND/OR/NOT/Precedence/Whitespace/Fuzziness —
    # the reference's parseKeyword helper: keyword analyzer, flag masked out
    from lucene_spark.tokenizers import keyword_analyzer

    def pk(text, flags):
        return SimpleQueryParser(keyword_analyzer(), flags, "must").parse(text)

    assert pk('"test"', -1 & ~PHRASE_OPERATOR) == T('"test"')
    assert pk("test*", -1 & ~PREFIX_OPERATOR) == T("test*")
    assert pk("foo+bar", -1 & ~AND_OPERATOR) == T("foo+bar")
    assert pk("+foo+bar", -1 & ~AND_OPERATOR) == T("+foo+bar")
    assert pk("foo|bar", -1 & ~OR_OPERATOR) == T("foo|bar")
    assert pk("|foo|bar", -1 & ~OR_OPERATOR) == T("|foo|bar")
    assert pk("-foo", -1 & ~NOT_OPERATOR) == T("-foo")
    assert pk("(foo)", -1 & ~PRECEDENCE_OPERATORS) == T("(foo)")
    assert pk(")foo(", -1 & ~PRECEDENCE_OPERATORS) == T(")foo(")
    assert pk("foo foo", -1 & ~WHITESPACE_OPERATOR) == T("foo foo")
    assert pk(" foo foo\n ", -1 & ~WHITESPACE_OPERATOR) == T(" foo foo\n ")
    from lucene_spark.simpleqp import ESCAPE_OPERATOR, FUZZY_OPERATOR

    assert pk("foo\\bar", -1 & ~ESCAPE_OPERATOR) == T("foo\\bar")
    assert pk("foo~1", -1 & ~FUZZY_OPERATOR) == T("foo~1")


def test_default_operator_should():
    assert parse("star wars", default_operator="should") == SHOULD(
        T("star"), T("wars"))
    # b -a under default OR: OR(b, complement(a)) — the faithful surprise
    assert parse("b -a", default_operator="should") == SHOULD(
        T("b"), NOT(T("a")))


def test_to_engine_ast():
    assert to_engine_ast(MUST(T("a"), T("b"))) == ("andn", [T("a"), T("b")])
    assert to_engine_ast(SHOULD(T("a"), MUST(T("b"), T("c")))) == (
        "or", [T("a"), ("andn", [T("b"), T("c")])])
    with pytest.raises(ValueError):
        to_engine_ast(NOT(T("a")))


# ---------------------------------------------------------------- execution


CORPUS = [
    ("u0", "spark query engine"),
    ("u1", "spark shuffle"),
    ("u2", "query planner"),
    ("u3", "storage layer"),
    ("u4", "spark query planner engine"),
]


@pytest.fixture(scope="module")
def sq_index(spark):
    from lucene_spark.index import build_index

    pages = spark.createDataFrame(CORPUS, "url string, text string")
    return build_index(spark, pages, with_positions=True)


def test_simple_search_kernel_path(spark, sq_index):
    # complement-free query runs the pruned kernel; parity vs search()
    from lucene_spark.search import search

    td = simple_search(sq_index, "spark + query", k=5)
    want = search(sq_index, ("andn", [T("spark"), T("query")]), k=5,
                  precision="float64")
    assert td.docids.tolist() == want.docids.tolist()
    np.testing.assert_allclose(td.scores, want.scores)
    assert set(td.docids.tolist()) == {0, 4}


def test_simple_search_negation(spark, sq_index):
    # default OR: 'query -spark' = docs with query, plus all docs w/o spark,
    # complement scored at MatchAll's constant 1.0
    from lucene_spark.search import score_docs

    td = simple_search(sq_index, "query -spark", k=10)
    got = dict(zip(td.docids.tolist(), td.scores.tolist()))
    qs = {r["docid"]: r["score"]
          for r in score_docs(sq_index, "query", precision="float64").collect()}
    expect = {}
    for d in range(5):
        s = qs.get(d, 0.0) + (1.0 if d in (2, 3) else 0.0)  # no-spark: 2,3
        if s > 0:
            expect[d] = s
    assert got == pytest.approx(expect)


def test_simple_search_must_with_negation(spark, sq_index):
    # default MUST: 'query -spark' = query AND NOT spark = doc 2 only,
    # scored bm25(query) + 1.0 (the complement clause contributes MatchAll's
    # score to the conjunction sum, BooleanWeight sums all scoring clauses)
    from lucene_spark.search import score_docs

    td = simple_search(sq_index, "query -spark", k=10,
                       default_operator="must")
    assert td.docids.tolist() == [2]
    qs = {r["docid"]: r["score"]
          for r in score_docs(sq_index, "query", precision="float64").collect()}
    assert td.scores[0] == pytest.approx(qs[2] + 1.0)


def test_simple_search_match_all(spark, sq_index):
    td = simple_search(sq_index, "*", k=10)
    assert td.docids.tolist() == [0, 1, 2, 3, 4]
    assert td.scores.tolist() == [1.0] * 5


def test_simple_search_pure_negation(spark, sq_index):
    td = simple_search(sq_index, "-spark", k=10)
    assert td.docids.tolist() == [2, 3]
    assert td.scores.tolist() == [1.0, 1.0]


def test_simple_search_empty(spark, sq_index):
    td = simple_search(sq_index, "  ", k=10)
    assert td.docids.tolist() == []
