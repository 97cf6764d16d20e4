"""CoreParser XML query syntax → engine AST (pure parsing, no Spark)."""

import pytest

from lucene_spark.search import parse_query
from lucene_spark.xmlparser import parse_xml_query


def test_term_and_boost():
    assert parse_xml_query("<TermQuery>court</TermQuery>") == ("term", "court")
    assert parse_xml_query('<TermQuery boost="2">court</TermQuery>') == (
        "boost", ("term", "court"), 2.0)


def test_boolean_matches_classic_parser():
    xml = """
    <BooleanQuery>
      <Clause occurs="must"><TermQuery>key</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>window</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>dup</TermQuery></Clause>
    </BooleanQuery>"""
    assert parse_xml_query(xml) == parse_query("+key window dup")
    xml2 = """
    <BooleanQuery>
      <Clause occurs="must"><TermQuery>court</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>law</TermQuery></Clause>
    </BooleanQuery>"""
    assert parse_xml_query(xml2) == parse_query("court NOT law")


def test_terms_dismax_range_user():
    assert parse_xml_query("<TermsQuery>a1 b2 c3</TermsQuery>") == (
        "or", [("term", "a1"), ("term", "b2"), ("term", "c3")])
    assert parse_xml_query(
        '<DisjunctionMaxQuery tieBreaker="0.3">'
        "<TermQuery>x1</TermQuery><TermQuery>y1</TermQuery>"
        "</DisjunctionMaxQuery>"
    ) == ("dismax", [("term", "x1"), ("term", "y1")], 0.3)
    assert parse_xml_query(
        '<RangeQuery lowerTerm="Apple" upperTerm="Cherry" includeUpper="false"/>'
    ) == ("range_raw", "apple", "cherry", True, False)
    assert parse_xml_query(
        "<UserQuery>(court AND law) OR ships</UserQuery>"
    ) == parse_query("(court AND law) OR ships")


def test_spans():
    assert parse_xml_query(
        '<SpanNear slopFactor="2" inOrder="false">'
        "<SpanTerm>key</SpanTerm><SpanOrTerms>window batch</SpanOrTerms>"
        "</SpanNear>"
    ) == ("span_near",
          [("sterm", "key"), ("span_or", ["window", "batch"])], 2, False)
    assert parse_xml_query(
        '<SpanFirst end="3"><SpanTerm>key</SpanTerm></SpanFirst>'
    ) == ("span_first", ("sterm", "key"), 3)
    assert parse_xml_query(
        "<SpanNot><SpanTerm>key</SpanTerm><SpanTerm>slow</SpanTerm></SpanNot>"
    ) == ("span_not", ("sterm", "key"), ("sterm", "slow"), 0, 0)


def test_field_routing_and_rejections():
    assert parse_xml_query(
        '<TermQuery fieldName="title">x1</TermQuery>', fields=["title"]
    ) == ("field", "title", ("term", "x1"))
    assert parse_xml_query(
        '<TermQuery fieldName="nope">x1</TermQuery>') == ("match_none",)
    with pytest.raises(ValueError, match="ConstantScoreQuery"):
        parse_xml_query("<ConstantScoreQuery><TermQuery>x</TermQuery></ConstantScoreQuery>")
    with pytest.raises(ValueError, match="MatchAllDocsQuery"):
        parse_xml_query("<MatchAllDocsQuery/>")
    # MatchAllDocs composes as a no-op must clause
    xml = """
    <BooleanQuery>
      <Clause occurs="must"><MatchAllDocsQuery/></Clause>
      <Clause occurs="must"><TermQuery>key</TermQuery></Clause>
    </BooleanQuery>"""
    assert parse_xml_query(xml) == ("term", "key")
