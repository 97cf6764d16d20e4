"""WikipediaTokenizer goldens: every TestWikipediaTokenizer vector
(tokens, types, offsets, position increments, flags) extracted from the
reference test source."""

import os
import re

import pytest

from lucene_spark.wikipedia import (BOTH, TOKENS_ONLY, UNTOKENIZED_ONLY,
                                    UNTOKENIZED_TOKEN_FLAG,
                                    wikipedia_tokenize)

_PATH = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
         "lucene/analysis/wikipedia/TestWikipediaTokenizer.java")

_CONSTS = {"INTERNAL_LINK": "il", "EXTERNAL_LINK": "el",
           "EXTERNAL_LINK_URL": "elu", "CITATION": "ci", "CATEGORY": "c",
           "BOLD": "b", "ITALICS": "i", "BOLD_ITALICS": "bi",
           "HEADING": "h", "SUB_HEADING": "sh",
           "UNTOKENIZED_TOKEN_FLAG": "1"}


def _src():
    if not os.path.exists(_PATH):
        pytest.skip("reference test source not available")
    return open(_PATH, encoding="utf-8").read()


def _method(name):
    src = _src()
    start = src.index(f"void {name}(")
    return src[start:src.index("\n  }", start)]


def _arrays(body):
    out = []
    for m in re.finditer(r"new (?:String|int)\[\]\s*\{(.*?)\}", body,
                         re.S):
        items = []
        for tok in re.findall(r'"((?:[^"\\]|\\.)*)"|([A-Z_]+|\d+)',
                              m.group(1)):
            if tok[0] or tok[0] == "":
                if tok[1]:
                    items.append(_CONSTS.get(tok[1], tok[1]))
                else:
                    items.append(tok[0].replace('\\"', '"')
                                 .replace("\\\\", "\\"))
        out.append(items)
    return out


def _java_str(body, var=None):
    # concatenated Java string literal (the test inputs)
    parts = re.findall(r'"((?:[^"\\]|\\.)*)"', body)
    return "".join(p.replace('\\"', '"') for p in parts)


def _incs(tokens):
    prev = -1
    out = []
    for t in tokens:
        out.append(t.pos - prev)
        prev = t.pos
    return out


def test_simple():
    toks = wikipedia_tokenize("This is a [[Category:foo]]")
    assert [t.text for t in toks] == ["This", "is", "a", "foo"]
    assert [t.start for t in toks] == [0, 5, 8, 21]
    assert [t.end for t in toks] == [4, 7, 9, 24]
    assert [t.type for t in toks] == ["<ALPHANUM>"] * 3 + ["c"]
    assert _incs(toks) == [1, 1, 1, 1]


def test_handwritten():
    body = _method("testHandwritten")
    text = _java_str(body.split("WikipediaTokenizer", 1)[0])
    want_tokens, want_types = _arrays(
        body.split("assertTokenStreamContents", 1)[1])[:2]
    toks = wikipedia_tokenize(text)
    assert [t.text for t in toks] == want_tokens
    assert [t.type for t in toks] == want_types


_LINK_PHRASES = ("click [[link here again]] click "
                 "[http://lucene.apache.org here again] "
                 "[[Category:a b c d]]")


def test_link_phrases():
    toks = wikipedia_tokenize(_LINK_PHRASES)
    assert [t.text for t in toks] == [
        "click", "link", "here", "again", "click",
        "http://lucene.apache.org", "here", "again", "a", "b", "c", "d"]
    assert _incs(toks) == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_links():
    body = _method("testLinks")
    text = _java_str(body.split("WikipediaTokenizer", 1)[0])
    want_tokens, want_types = _arrays(
        body.split("assertTokenStreamContents", 1)[1])[:2]
    toks = wikipedia_tokenize(text)
    assert [t.text for t in toks] == want_tokens
    assert [t.type for t in toks] == want_types


_UNTOK_TEXT = ("[[Category:a b c d]] [[Category:e f g]] [[link here]] "
               "[[link there]] ''italics here'' something "
               "''more italics'' [[Category:h   i   j]]")
_UNTOKS = frozenset({"c", "i"})


def test_lucene1133_untokenized_only():
    # untoks don't change TOKENS_ONLY output
    toks = wikipedia_tokenize(_LINK_PHRASES, TOKENS_ONLY, _UNTOKS)
    assert _incs(toks) == [1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1]
    toks = wikipedia_tokenize(_UNTOK_TEXT, UNTOKENIZED_ONLY, _UNTOKS)
    assert [t.text for t in toks] == [
        "a b c d", "e f g", "link", "here", "link", "there",
        "italics here", "something", "more italics", "h   i   j"]
    assert [t.start for t in toks] == [11, 32, 42, 47, 56, 61, 71, 86,
                                       98, 124]
    assert [t.end for t in toks] == [18, 37, 46, 51, 60, 66, 83, 95,
                                     110, 133]
    assert _incs(toks) == [1] * 10


def test_both():
    toks = wikipedia_tokenize(_UNTOK_TEXT, BOTH, _UNTOKS)
    assert [t.text for t in toks] == [
        "a b c d", "a", "b", "c", "d", "e f g", "e", "f", "g", "link",
        "here", "link", "there", "italics here", "italics", "here",
        "something", "more italics", "more", "italics", "h   i   j",
        "h", "i", "j"]
    assert [t.start for t in toks] == [
        11, 11, 13, 15, 17, 32, 32, 34, 36, 42, 47, 56, 61, 71, 71, 79,
        86, 98, 98, 103, 124, 124, 128, 132]
    assert [t.end for t in toks] == [
        18, 12, 14, 16, 18, 37, 33, 35, 37, 46, 51, 60, 66, 83, 78, 83,
        95, 110, 102, 110, 133, 125, 129, 133]
    assert _incs(toks) == [1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0,
                           1, 1, 1, 0, 1, 1, 0, 1, 1]
    flags = [t.flags for t in toks]
    # the five untokenized spans (3 categories + 2 italics) carry the flag
    assert [f for f in flags if f] == [UNTOKENIZED_TOKEN_FLAG] * 5
    assert flags[0] == flags[5] == flags[13] == flags[17] == flags[20] \
        == UNTOKENIZED_TOKEN_FLAG
