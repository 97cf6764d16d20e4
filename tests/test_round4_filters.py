"""Round-4 analysis/common closures: the remaining small token filters,
char filter, and tokenizers from the reference inventory, each asserted
against goldens lifted from the reference's own test sources."""

import struct

from lucene_spark.filters import (
    MappingCharFilter,
    codepoint_count_filter,
    date_recognizer,
    drop_if_flagged,
    encode_payload_float,
    fix_broken_offsets,
    fixed_shingle,
    limit_token_offset,
    limit_token_position,
    numeric_payload,
    pattern_capture_group,
    pattern_keyword_marker,
    pattern_typing,
    protected_term_filter,
    token_offset_payload,
    type_as_payload,
    type_as_synonym,
)
from lucene_spark.stemmers import spanish_minimal_stem
from lucene_spark.tokenizers import (
    pattern_tokenize,
    simple_pattern_split_tokenize,
    simple_pattern_tokenize,
    unicode_whitespace_tokenize,
    whitespace_tokenize,
)


def test_codepoint_count_filter():
    f = codepoint_count_filter(2, 4)
    assert f("ab") == "ab" and f("abcd") == "abcd"
    assert f("a") is None and f("abcde") is None
    # astral codepoints count once (TestCodepointCountFilter surrogates)
    assert codepoint_count_filter(1, 1)("\U0001D122") == "\U0001D122"


def test_date_recognizer():
    # TestDateRecognizerFilter: 2 of the tokens parse as MM/dd/yyyy
    text = ("The red fox jumped over the lazy dogs on 7/11/2006 "
            "The dogs finally reacted on 7/12/2006")
    f = date_recognizer("%m/%d/%Y")
    kept = [t for t in whitespace_tokenize(text) if f(t)]
    assert kept == ["7/11/2006", "7/12/2006"]


def test_drop_if_flagged():
    # TestDropIfFlaggedFilter: only tokens with ALL drop bits vanish
    toks = [("keep0", 0), ("drop3", 3), ("keep1", 1), ("keep2", 2)]
    assert drop_if_flagged(toks, 3) == ["keep0", "keep1", "keep2"]


def test_fix_broken_offsets():
    assert fix_broken_offsets([(0, 3), (2, 5), (1, 4), (7, 6)]) == [
        (0, 3), (2, 5), (2, 4), (7, 7)]


def test_limit_token_offset():
    # TestLimitTokenOffsetFilter: maxStartOffset 3 keeps the first 2
    toks = list(zip(["short", "toolong", "evenmuchlongertext", "a"],
                    [(0, 5), (6, 13), (14, 32), (33, 34)]))
    assert limit_token_offset(toks, 6) == ["short", "toolong"]
    assert limit_token_offset(toks, 0) == ["short"]


def test_limit_token_position():
    # TestLimitTokenPositionFilter.testMaxPosition2
    assert limit_token_position(["one", "two", "three", "four"], 2) == [
        "one", "two"]
    # honors gaps: token at absolute position 3 is 1-based position 4
    assert limit_token_position(["a", "b"], 3, positions=[0, 3]) == ["a"]


def test_numeric_and_offset_and_type_payloads():
    out = numeric_payload([("dogs", "D"), ("the", "word")], 3.0, "D")
    assert out[0] == ("dogs", struct.pack(">f", 3.0))
    assert out[1] == ("the", None)
    assert encode_payload_float(1.0) == b"\x3f\x80\x00\x00"
    assert token_offset_payload([("foo", (4, 10))]) == [
        ("foo", struct.pack(">ii", 4, 10))]
    assert type_as_payload([("foo", "JJ"), ("bar", "")]) == [
        ("foo", b"JJ"), ("bar", None)]


def test_type_as_synonym():
    # TestTypeAsSynonymFilter.testSimple: type emitted at the same position
    toks, poss = type_as_synonym([("foo", "bar"), ("foo", "word")])
    assert toks == ["foo", "bar", "foo", "word"]
    assert poss == [0, 0, 1, 1]
    # testWithPrefixAndIgnore
    toks, poss = type_as_synonym(
        [("foo", "bar"), ("foo", "word"), ("foo", "ignoreme")],
        prefix="pfx_", ignore={"word", "ignoreme"})
    assert toks == ["foo", "pfx_bar", "foo", "foo"]
    assert poss == [0, 0, 1, 2]


def test_pattern_capture_group_camel_case():
    # TestPatternCaptureGroupTokenFilter.testCamelCase
    pats = [
        r"([A-Z]{2,})",
        r"(?<![A-Z])([A-Z][a-z]+)",
        r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
        r"([0-9]+)",
    ]
    f = pattern_capture_group(pats, preserve_original=False)
    assert f("letsPartyLIKEits1999_dude") == [
        "lets", "Party", "LIKE", "its", "1999", "dude"]
    f = pattern_capture_group(pats, preserve_original=True)
    assert f("letsPartyLIKEits1999_dude") == [
        "letsPartyLIKEits1999_dude",
        "lets", "Party", "LIKE", "its", "1999", "dude"]
    # no patterns → token passes through
    assert pattern_capture_group([])("foobarbaz") == ["foobarbaz"]


def test_pattern_keyword_marker_and_protected_term():
    stem = pattern_keyword_marker(r".+ed", lambda t: t.rstrip("s"))
    assert stem("jumped") == "jumped"      # protected by pattern
    assert stem("dogs") == "dog"
    prot = protected_term_filter({"foobar"}, lambda t: t.upper())
    assert prot("foobar") == "foobar"
    assert prot("baz") == "BAZ"


def test_pattern_typing():
    # TestPatternTypingFilter.testPatterns: 401(k)/401k → legal2_401_k
    f = pattern_typing([(r"^(\d+)\(?([a-z])\)?$", 2, "legal2_$1_$2")])
    assert f("401(k)") == ("401(k)", "legal2_401_k", 2)
    assert f("401k") == ("401k", "legal2_401_k", 2)
    assert f("One") == ("One", "word", 0)


def test_pattern_tokenizer_split_and_group():
    # TestPatternTokenizer.testSplitting table
    cases = [
        (-1, "--", "aaa--bbb--ccc", ["aaa", "bbb", "ccc"]),
        (-1, ":", "aaa:bbb:ccc", ["aaa", "bbb", "ccc"]),
        (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
        (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
        (-1, "o", "boo:and:foo", ["b", ":and:f"]),
        (0, ":", "boo:and:foo", [":", ":"]),
        (0, r"'([^']+)'", "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
        (1, r"'([^']+)'", "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
    ]
    for group, pat, text, want in cases:
        toks, offs = pattern_tokenize(text, pat, group)
        assert toks == want, (pat, text)
        for t, (s, e) in zip(toks, offs):
            assert text[s:e] == t


def test_simple_pattern_tokenizers():
    assert simple_pattern_tokenize("aa1bb22cc333", "[0-9]+") == [
        "1", "22", "333"]
    assert simple_pattern_split_tokenize("aaXbbYcc", "[XY]") == [
        "aa", "bb", "cc"]
    assert simple_pattern_split_tokenize("XabX", "X") == ["ab"]


def test_unicode_whitespace_tokenizer():
    # core/TestUnicodeWhitespaceTokenizer: NBSP is whitespace here
    assert unicode_whitespace_tokenize("Tokenizer\xa0test") == [
        "Tokenizer", "test"]
    assert unicode_whitespace_tokenize("a b c d") == [
        "a", "b", "c", "d"]


def test_fixed_shingle_bigram_and_trigram():
    # TestFixedShingleFilter.testBiGramFilter / testTriGramFilter
    toks = ["please", "divide", "this", "sentence", "into", "shingles"]
    offs = [(0, 6), (7, 13), (14, 18), (19, 27), (28, 32), (33, 41)]
    out, pos, oo = fixed_shingle(toks, 2, offsets=offs)
    assert out == ["please divide", "divide this", "this sentence",
                   "sentence into", "into shingles"]
    assert [s for s, _ in oo] == [0, 7, 14, 19, 28]
    assert [e for _, e in oo] == [13, 18, 27, 32, 41]
    out, _, _ = fixed_shingle(toks, 3, offsets=offs)
    assert out == ["please divide this", "divide this sentence",
                   "this sentence into", "sentence into shingles"]
    out, _, _ = fixed_shingle(
        toks, 2, sep="<SEP>", offsets=offs)
    assert out[0] == "please<SEP>divide"
    # shingle size greater than stream length → nothing
    assert fixed_shingle(["please", "divide"], 3,
                         offsets=[(0, 6), (7, 13)])[0] == []


def test_fixed_shingle_stopword_gaps_and_trailing():
    # testWithStopwords: positions 0,1,3,5 (gaps at 2 and 4)
    toks = ["please", "divide", "sentence", "shingles"]
    offs = [(0, 6), (7, 13), (19, 27), (33, 41)]
    out, pos, oo = fixed_shingle(toks, 3, positions=[0, 1, 3, 5],
                                 offsets=offs)
    assert out == ["please divide _", "divide _ sentence",
                   "sentence _ shingles"]
    assert pos == [0, 1, 3]
    assert oo == [(0, 13), (7, 27), (19, 41)]
    # testConsecutiveStopwords (positions 1,2,3,6,7; size 4)
    out, _, oo = fixed_shingle(
        ["b", "c", "d", "b", "c"], 4, positions=[1, 2, 3, 6, 7],
        offsets=[(2, 3), (4, 5), (6, 7), (12, 13), (14, 15)])
    assert out == ["b c d _", "c d _ _", "d _ _ b"]
    assert oo == [(2, 7), (4, 7), (6, 13)]
    # testTrailingStopwords / testMultipleTrailingStopwords
    out, _, oo = fixed_shingle(
        ["b", "c", "d"], 3, offsets=[(0, 1), (2, 3), (4, 5)],
        trailing_positions=1)
    assert out == ["b c d", "c d _"]
    assert oo == [(0, 5), (2, 5)]
    out, _, _ = fixed_shingle(
        ["b", "c", "d"], 3, offsets=[(0, 1), (2, 3), (4, 5)],
        trailing_positions=2)
    assert out == ["b c d", "c d _", "d _ _"]


def test_mapping_char_filter_token_stream():
    # TestMappingCharFilter.testTokenStream: offsets corrected to RAW text
    m = MappingCharFilter({
        "aa": "a", "bbb": "b", "cccc": "cc", "h": "i", "j": "jj",
        "k": "kkk", "ll": "llll", "empty": "",
        "\U0001D122": "fclef", "！": "full-width-exclamation",
    })
    raw = "h i j k ll cccc bbb aa"
    out, offs, diffs = m.filter_with_offsets(raw)
    assert out == "i i jj kkk llll cc b a"
    toks = []
    pos = 0
    for t in out.split(" "):
        s = out.index(t, pos)
        e = s + len(t)
        pos = e
        toks.append((t, m.correct_offset(s, offs, diffs),
                     m.correct_offset(e, offs, diffs)))
    want = [("i", 0, 1), ("i", 2, 3), ("jj", 4, 5), ("kkk", 6, 7),
            ("llll", 8, 10), ("cc", 11, 15), ("b", 16, 19),
            ("a", 20, 22)]
    assert toks == want
    # 1-to-0 (deletion) and surrogate-pair keys
    assert m("empty") == ""
    assert m("\U0001D122!") == "fclef!"


def test_spanish_minimal_stem():
    # TestSpanishMinimalStemFilter goldens
    for w, want in [("actrices", "actriz"), ("niños", "nino"),
                    ("países", "pais"), ("caragodor", "caragodor"),
                    ("móviles", "movil"), ("chicas", "chica"),
                    ("", "")]:
        assert spanish_minimal_stem(w) == want
