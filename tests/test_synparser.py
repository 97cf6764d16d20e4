"""Solr / WordNet synonym-file parsers — vectors from
TestSolrSynonymParser.java / TestWordnetSynonymParser.java."""

import pytest

from lucene_spark.filters import (
    parse_solr_synonyms, parse_wordnet_synonyms, synonym_rules_to_mapping,
)


def tok(s):  # whitespace-lowercase analyzer, like the reference MockAnalyzer
    return s.lower().split()


def test_solr_simple_expand():
    text = ("i-pod, ipod, ipoooood\n"
            "foo => foo bar\n"
            "foo => baz\n"
            "this test, that testing")
    rules = parse_solr_synonyms(text, expand=True, analyzer=tok)
    # explicit mappings never keep the original
    assert (("foo",), ("foo", "bar"), False) in rules
    assert (("foo",), ("baz",), False) in rules
    # equivalence class: all ordered pairs, original kept
    assert (("ipod",), ("i-pod",), True) in rules
    assert (("i-pod",), ("ipoooood",), True) in rules
    assert (("this", "test"), ("that", "testing"), True) in rules
    assert (("that", "testing"), ("this", "test"), True) in rules


def test_solr_no_expand_maps_to_first():
    rules = parse_solr_synonyms("a, b, c", expand=False, analyzer=tok)
    assert rules == [(("a",), ("a",), False), (("b",), ("a",), False),
                     (("c",), ("a",), False)]


def test_solr_invalid_double_arrow():
    with pytest.raises(ValueError):
        parse_solr_synonyms("a => b => c", analyzer=tok)


def test_solr_escapes_and_comments():
    text = "#comment\n\na\\=>a => b\\=>b\na\\,a => b\\,b"
    rules = parse_solr_synonyms(text, analyzer=tok)
    assert (("a=>a",), ("b=>b",), False) in rules
    assert (("a,a",), ("b,b",), False) in rules


def test_wordnet_synset():
    text = ("s(100000001,1,'second',n,1,0).\n"
            "s(100000001,2,'2nd',n,1,0).\n"
            "s(100000001,3,'two',n,1,0).\n"
            "s(100000002,1,'bob''s',n,1,0).\n")
    rules = parse_wordnet_synonyms(text, expand=True, analyzer=tok)
    # the three-member synset expands all-pairs; the single-member synset
    # (with the doubled-quote unescape) drops
    assert (("second",), ("2nd",), True) in rules
    assert (("two",), ("second",), True) in rules
    assert len(rules) == 6
    rules = parse_wordnet_synonyms(text, expand=False, analyzer=tok)
    assert (("2nd",), ("second",), False) in rules
    assert len(rules) == 3


def test_rules_to_single_token_mapping():
    rules = parse_solr_synonyms("fast, quick\nfoo => foo bar",
                                analyzer=tok)
    mp = synonym_rules_to_mapping(rules)
    assert mp == {"fast": ("quick",), "quick": ("fast",)}
