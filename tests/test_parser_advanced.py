"""Classic-QueryParser surface: field:term, ^boost, fuzzy~N (Damerau with
transpositions), wild*cards, [a TO b] ranges, arbitrary nesting, and the
generalized boolean kinds (andn/reqoptn/notn) they produce.  Reference:
queryparser/.../classic/QueryParser.jj, QueryParserBase.java:112,437;
FuzzyQuery.java:52,177 (transpositions default true)."""

import numpy as np
import pytest

from lucene_spark.corpus import generate_pages
from lucene_spark.index import build_index
from lucene_spark.search import (
    damerau_levenshtein,
    expand_terms,
    match_any_docs,
    parse_query,
    search,
)


@pytest.fixture(scope="module")
def idx(spark):
    pages = generate_pages(300, seed=9, n_stems=120)
    return build_index(spark, spark.createDataFrame(pages), seg_size=64,
                       with_positions=True)


def test_damerau_matches_duckdb_semantics():
    import duckdb

    con = duckdb.connect()
    cases = [("ca", "abc"), ("abc", "acb"), ("abc", "ab"), ("ab", "ba"),
             ("teh", "the"), ("xy", "yxz"), ("court", "cuort"), ("a", "a")]
    for a, b in cases:
        want = con.execute(f"SELECT damerau_levenshtein('{a}','{b}')").fetchone()[0]
        assert damerau_levenshtein(a, b, cap=5) == want, (a, b)


def test_fuzzy_transpositions_vs_plain(spark):
    rows = [("u1", "abc xyz"), ("u2", "acb xyz"), ("u3", "qqq zzz")]
    idx = build_index(spark, spark.createDataFrame(rows, "url string, text string"),
                      seg_size=16)
    # transposed form is ONE edit under Damerau (FuzzyQuery default) ...
    assert set(expand_terms(idx, fuzzy=("acb", 1))) == {"abc", "acb"}
    # ... but TWO under plain Levenshtein (transpositions=False)
    assert set(expand_terms(idx, fuzzy=("acb", 1), transpositions=False)) == {"acb"}
    # prefix_length pins the leading chars exactly
    assert set(expand_terms(idx, fuzzy=("acb", 2, 2))) == {"acb"}
    with pytest.raises(ValueError, match="max_edits"):
        expand_terms(idx, fuzzy=("abc", 3))


def test_string_fuzzy_query_end_to_end(spark):
    rows = [("u1", "abc xyz"), ("u2", "acb xyz"), ("u3", "qqq zzz")]
    idx = build_index(spark, spark.createDataFrame(rows, "url string, text string"),
                      seg_size=16)
    td = search(idx, "acb~1", k=10)
    assert len(td.docids) == 2  # both docs match the blended fuzzy


def test_boost_string_syntax_equals_boosts_dict(idx):
    a = search(idx, "court^2 law", k=15)
    b = search(idx, "court law", k=15, boosts={"court": 2.0})
    np.testing.assert_array_equal(a.docids, b.docids)
    np.testing.assert_array_equal(a.scores, b.scores)
    # boost on a parenthesized group distributes to the leaves (BoostQuery
    # createWeight propagation)
    c = search(idx, "(court law)^2", k=15)
    d = search(idx, "court law", k=15, boosts={"court": 2.0, "law": 2.0})
    np.testing.assert_array_equal(c.docids, d.docids)
    np.testing.assert_array_equal(c.scores, d.scores)


def test_wildcard_and_range_string_syntax(idx):
    # wildcard → CONSTANT_SCORE rewrite: every hit scores 1.0
    td = search(idx, "cour*", k=10**6)
    assert len(td.docids) > 0
    assert set(td.scores.tolist()) == {1.0}
    want = {r["docid"] for r in match_any_docs(idx, expand_terms(idx, like="cour%")).collect()}
    assert set(td.docids.tolist()) == want
    # inclusive vs exclusive range
    incl = set(expand_terms(idx, lower="law", upper="lead"))
    excl = set(expand_terms(idx, lower="law", upper="lead",
                            lower_inclusive=False, upper_inclusive=False))
    assert excl == incl - {"law", "lead"}


def test_phrase_with_operators(idx):
    # ADVICE fix: '"a b" AND c' keeps phrase semantics inside the AND
    node = parse_query('"court law" AND judge')
    assert node[0] == "andn" and node[1][0][0] == "phrase_raw"
    td = search(idx, '"court law" AND judge', k=20)
    # every hit must contain the exact phrase AND the term
    phrase_only = set(search(idx, '"court law"', k=10**6).docids.tolist())
    judge_only = {r["docid"] for r in match_any_docs(idx, ["judge"]).collect()}
    assert set(td.docids.tolist()) <= (phrase_only & judge_only)
    # prune/no-prune duel on the composite kinds
    for q in ['"court law" AND judge', '(court OR law) AND judge',
              'court AND law OR judge', 'judge NOT "court law"']:
        a = search(idx, q, k=10, prune=True)
        b = search(idx, q, k=10, prune=False)
        np.testing.assert_array_equal(a.docids, b.docids, err_msg=q)
        np.testing.assert_array_equal(a.scores, b.scores, err_msg=q)


def test_field_syntax(idx):
    a = search(idx, "text:court", k=10)
    b = search(idx, "court", k=10)
    np.testing.assert_array_equal(a.docids, b.docids)
    assert len(search(idx, "title:court", k=10).docids) == 0
    assert len(search(idx, "title:(court law)", k=10).docids) == 0


def test_pure_negative_matches_nothing(idx):
    assert len(search(idx, "NOT court", k=10).docids) == 0
    assert len(search(idx, "-court", k=10).docids) == 0


def test_escape_handling():
    # QueryParserBase.discardEscapeChar: escaped specials are literal term
    # chars; unescaped keep their operator meaning
    from lucene_spark.search import parse_query

    assert parse_query(r"foo\*bar") == ("term", "foo*bar")
    assert parse_query(r"a\:b") == ("term", "a:b")
    assert parse_query(r"esc\~term") == ("term", "esc~term")
    assert parse_query(r"p\^q") == ("term", "p^q")
    assert parse_query(r"field\:x") == ("term", "field:x")
    # mixed: escaped star literal, unescaped star wildcard
    assert parse_query(r"a\*b*c") == ("wildcard_raw", "a*b%c")
    # escaped chars inside phrases
    assert parse_query(r'"say \"hi\""') == ("phrase_raw", 'say "hi"')
    # suffixes still strip when unescaped
    assert parse_query(r"boost\^x^3") == (
        "boost", ("term", "boost^x"), 3.0)


def test_escape_pairs_counted_not_single_lookbehind():
    # an ESCAPED BACKSLASH before a special char leaves the special char
    # unescaped: 'foo\\^2' = term 'foo\' with a real ^2 boost (escape runs
    # counted pairwise, ADVICE r3)
    from lucene_spark.search import parse_query

    assert parse_query("foo\\\\^2") == ("boost", ("term", "foo\\"), 2.0)
    assert parse_query("foo\\\\~1") == (
        "fuzzy_raw", "foo\\", 1, 0)
    # triple backslash: pair + escape → the suffix char is literal
    assert parse_query("foo\\\\\\^2") == ("term", "foo\\^2")
    # escaped backslash then a wildcard: the '*' is a REAL wildcard
    assert parse_query("a\\\\*b") == ("wildcard_raw", "a\\%b")


def test_field_name_unescaped():
    # 'text' reached via an escaped char in the field name must resolve to
    # the same (default) field, and the split must honour escape pairs
    from lucene_spark.search import parse_query

    assert parse_query(r"te\xt:foo") == ("term", "foo")
    # escaped ':' inside what would otherwise be a field prefix keeps the
    # whole thing one term
    assert parse_query(r"a\:b:foo", fields=()) == ("match_none",)


class TestLuceneRegexpOperators:
    """The full Lucene-RegExp grammar compiles through the automaton
    engine (lucene_spark.regexp): nested complement, intersection at any
    depth, and <n-m> decimal intervals with makeDecimalInterval's exact
    digits rule are all first-class now."""

    def test_mid_concat_complement_supported(self):
        # '~' binds to the NEXT element (RegExp.java parseComplExp), so
        # ab~cd = "ab" + (any string != "c") + "d"
        from pyspark.sql import functions as F
        from lucene_spark.regexp import LuceneRegexp
        from lucene_spark.search import lucene_regexp_predicate
        lucene_regexp_predicate(F.col("t"), "ab~cd")  # builds
        rx = LuceneRegexp("ab~cd")
        assert rx.matches("abd") and rx.matches("abxd")
        assert rx.matches("abccd")
        assert not rx.matches("abcd") and not rx.matches("ab")

    def test_whole_branch_complement_builds(self):
        from pyspark.sql import functions as F
        from lucene_spark.search import lucene_regexp_predicate
        lucene_regexp_predicate(F.col("t"), "~(abc)")
        lucene_regexp_predicate(F.col("t"), ".*a.*&~(ab.*)")

    def test_escaped_ops_are_literal(self):
        from pyspark.sql import functions as F
        from lucene_spark.search import lucene_regexp_predicate
        from lucene_spark.regexp import LuceneRegexp
        lucene_regexp_predicate(F.col("t"), r"abc\&def")
        lucene_regexp_predicate(F.col("t"), r"\~abc")
        assert LuceneRegexp(r"abc\&def").matches("abc&def")
        assert LuceneRegexp(r"\~abc").matches("~abc")

    def test_reversed_interval_swaps_like_reference(self):
        # RegExp.parseSimpleExp:1352 SWAPS min>max instead of rejecting
        from lucene_spark.regexp import LuceneRegexp
        rx = LuceneRegexp("foo<9-1>")
        assert rx.matches("foo5") and rx.matches("foo1") and rx.matches("foo9")
        assert not rx.matches("foo0")

    def test_regexp_operators_end_to_end(self, spark):
        """Intersection, union, complement-branch and interval against a
        real term dictionary."""
        from lucene_spark.index import build_index
        from lucene_spark.search import expand_terms
        pages = spark.createDataFrame(
            [("u1", "testing tester tested retest contest item1 item27 "
                    "item99 item100 toast")],
            "url string, text string")
        idx = build_index(spark, pages)
        # intersection: starts with test AND ends with ing
        assert expand_terms(idx, rlike="test.*&.*ing") == ["testing"]
        # union
        assert expand_terms(idx, rlike="toast|contest") == [
            "contest", "toast"]
        # whole-branch complement: all test.* except testing
        assert expand_terms(idx, rlike="test.*&~(testing)") == [
            "tested", "tester"]
        # numeric interval with leading-zero semantics
        assert expand_terms(idx, rlike="item<2-99>") == ["item27", "item99"]
        assert expand_terms(idx, rlike="item<1-100>") == [
            "item1", "item100", "item27", "item99"]
        # automaton-only shapes that the pre-engine translator rejected:
        # mid-concatenation complement
        assert expand_terms(idx, rlike="te~(x)ed") == ["tested"]
        # nested complement-of-complement
        assert expand_terms(idx, rlike="~(~(toast))") == ["toast"]

    def test_regexp_whole_term_anchoring(self, spark):
        """RegexpQuery matches the entire term (RegexpQuery.java:44), so
        'test.*' must NOT match 'contest'/'retest' (unanchored rlike would)."""
        from lucene_spark.index import build_index
        from lucene_spark.search import expand_terms
        pages = spark.createDataFrame(
            [("u1", "testing tester tested retest contest toast")],
            "url string, text string")
        idx = build_index(spark, pages)
        assert expand_terms(idx, rlike="test.*") == [
            "tested", "tester", "testing"]
        assert expand_terms(idx, rlike=".*test") == ["contest", "retest"]


# ------------------------------------------------ NGramPhraseQuery rewrite

def test_ngram_phrase_rewrite_vectors():
    from lucene_spark.search import ngram_phrase_rewrite

    # optimizable: every n-th + last, re-indexed at original offsets
    m = [("ab", 0), ("bc", 1), ("cd", 2), ("de", 3), ("ef", 4)]
    assert ngram_phrase_rewrite(m, 2) == (
        "phrase", [("ab", 0), ("cd", 2), ("ef", 4)])
    assert ngram_phrase_rewrite(m, 3) == (
        "phrase", [("ab", 0), ("de", 3), ("ef", 4)])
    # not optimizable: n < 2, < 3 terms, or a position gap
    assert ngram_phrase_rewrite(m, 1) == ("phrase", m)
    assert ngram_phrase_rewrite(m[:2], 2) == ("phrase", m[:2])
    gap = [("ab", 0), ("bc", 2), ("cd", 3)]
    assert ngram_phrase_rewrite(gap, 2) == ("phrase", gap)


def test_ngram_phrase_rewrite_match_identical(spark):
    """The rewritten phrase is match-identical to the full phrase on a real
    2-gram index (NGramPhraseQuery.rewrite's contract)."""
    from lucene_spark.index import build_index
    from lucene_spark.search import ngram_phrase_rewrite, search

    words = ["abcdef", "abcxef", "zabcde", "abdcef", "xyabcd", "aqcdef"]
    pages = spark.createDataFrame(
        [(str(i), " ".join(w[j:j + 2] for j in range(len(w) - 1)))
         for i, w in enumerate(words)],
        "url string, text string")
    idx = build_index(spark, pages, with_positions=True)
    full = [("ab", 0), ("bc", 1), ("cd", 2), ("de", 3)]  # "abcde"
    node_full = ("phrase", full)
    node_rw = ngram_phrase_rewrite(full, 2)
    assert node_rw == ("phrase", [("ab", 0), ("cd", 2), ("de", 3)])
    got_full = search(idx, node_full, k=100, precision="float64").docids
    got_rw = search(idx, node_rw, k=100, precision="float64").docids
    assert sorted(got_full.tolist()) == sorted(got_rw.tolist())
    # docs 0 ("abcdef") and 2 ("zabcde") contain "abcde"
    urls = {r["docid"]: r["url"] for r in idx.docs.select("docid", "url").collect()}
    assert sorted(urls[d] for d in got_rw.tolist()) == ["0", "2"]
