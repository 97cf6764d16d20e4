"""ExtendableQueryParser analog (queryparser/ext) — the reference tests
(ext/TestExtendableQueryParser.java) drive an ExtensionStub that turns the
raw extension text into a term query on the resolved field."""

import pytest

from lucene_spark.search import (
    Extensions, escape_query, extendable_parse, parse_query,
)


def stub(parser, field, text):
    """ExtensionStub.java: TermQuery(field, raw text) — lowercased here so
    the node matches the engine's analyzed-term contract."""
    node = ("term", text.lower())
    if field != parser.default_field:
        node = ("field", field, node)
    return node


def exts(delim=":"):
    e = Extensions(delim)
    e.add("testExt", stub)
    return e


def test_split_extension_field():
    e = Extensions()
    assert e.split_extension_field("text", "aField") == ("aField", None)
    assert e.split_extension_field("text", "aField:key") == ("aField", "key")
    assert e.split_extension_field("text", ":key") == ("text", "key")
    # split on the FIRST occurrence (Extensions.java:106)
    assert e.split_extension_field("text", "a:b:c") == ("a", "b:c")


def test_build_extension_field_inverts_split():
    for d in (":", "-", "|"):
        e = Extensions(d)
        built = e.build_extension_field("testExt", "aField")
        # the whole field+delim+key string is escaped (Extensions.java:
        # 156-161), so the delimiter rides escaped inside the field token
        assert built == escape_query("aField" + d + "testExt")
        assert e.split_extension_field("text", "aField" + d + "testExt") == (
            "aField", "testExt")


@pytest.mark.parametrize("delim", [":", "-", "|"])
def test_ext_field_unquoted(delim):
    e = exts(delim)
    field = e.build_extension_field("testExt", "aField")
    node = extendable_parse(f"{field}:foo bar", e, fields=["aField"])
    assert node == ("or", [("field", "aField", ("term", "foo")),
                           ("term", "bar")])


@pytest.mark.parametrize("delim", [":", "-", "|"])
def test_ext_default_field(delim):
    e = exts(delim)
    field = e.build_extension_field("testExt")
    node = extendable_parse(f'{field}:"foo \\& bar"', e)
    assert node == ("term", "foo & bar")


def test_unescaped_delimiter_inside_field_is_split_first():
    # TestExtendableQueryParser.testUnescapedExtDelimiter: with ':' as the
    # delimiter, 'aField:testExt:"..."' splits field 'aField' + key
    # 'testExt' only when the first colon is ESCAPED; unescaped, the classic
    # parser takes field='aField' and the rest is a plain token
    e = exts(":")
    node = extendable_parse('aField:testExt:"foo"', e, fields=["aField"])
    # field 'aField' has no delimiter -> no extension -> classic path:
    # 'testExt:"foo"' is not a known field pattern under field aField
    assert node is not None


def test_boost_and_fallbacks():
    e = exts()
    f = e.build_extension_field("testExt", "aField")
    assert extendable_parse(f"{f}:foo^2", e, fields=["aField"]) == (
        "boost", ("field", "aField", ("term", "foo")), 2.0)
    # wildcard / fuzzy atoms do NOT route to extensions (they go through
    # getWildcardQuery/getFuzzyQuery in the reference) — unknown field
    assert extendable_parse(f"{f}:fo*", e, fields=["aField"]) == (
        "match_none",)
    # unregistered key -> unknown field -> no hits
    assert extendable_parse(r"aField\:nosuch:foo", e, fields=["aField"]) == (
        "match_none",)
    # non-extension queries parse exactly like the classic parser
    assert extendable_parse("alpha AND beta", e) == \
        parse_query("alpha AND beta")
