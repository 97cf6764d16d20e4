"""ClassicTokenizer / ClassicFilter / ClassicAnalyzer goldens.

Reference:
  lucene/analysis/common/src/java/org/apache/lucene/analysis/classic/
    ClassicTokenizerImpl.jflex      — the grammar (rules at 116-127)
    ClassicTokenizer.java:130-155   — maxTokenLength skip, ACRONYM_DEP→HOST
    ClassicFilter.java              — acronym dot strip, 's strip
  lucene/analysis/common/src/test/org/apache/lucene/analysis/classic/
    TestClassicAnalyzer.java        — every golden below (line refs inline)
"""

import pytest

from lucene_spark.tokenizers import (classic_tokenize, classic_filter,
                                     classic_analyzer)


def analyze(text):
    return classic_analyzer().analyze_text(text)[0]


# TestClassicAnalyzer.java goldens: (input, expected analyzed tokens).
GOLDENS = [
    ("B2B", ["b2b"]),                                     # :84
    ("2B", ["2b"]),                                       # :85
    ("word_having_underscore", ["word", "having", "underscore"]),  # :90
    ("word_with_underscore_and_stopwords",
     ["word", "underscore", "stopwords"]),                # :91
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),  # :97
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),       # :98
    ("ac/dc", ["ac", "dc"]),                              # :99
    ("O'Reilly", ["o'reilly"]),                           # :105
    ("you're", ["you're"]),                               # :106
    ("she's", ["she"]),                                   # :107
    ("Jim's", ["jim"]),                                   # :108
    ("don't", ["don't"]),                                 # :109
    ("O'Reilly's", ["o'reilly"]),                         # :110
    ("s-class", ["s", "class"]),                          # :116
    ("t-com", ["t", "com"]),                              # :117
    ("a-class", ["class"]),                               # :119 ('a' stopped)
    ("AT&T", ["at&t"]),                                   # :124
    ("Excite@Home", ["excite@home"]),                     # :125
    ("www.nutch.org.", ["www.nutch.org"]),                # :132
    ("www.nutch.org", ["www.nutch.org"]),                 # :144
    ("test@example.com", ["test@example.com"]),           # :164
    ("first.lastname@example.com",
     ["first.lastname@example.com"]),                     # :165
    ("first_lastname@example.com",
     ["first_lastname@example.com"]),                     # :166
    ("21.35", ["21.35"]),                                 # :172
    ("R2D2 C3PO", ["r2d2", "c3po"]),                      # :173
    ("216.239.63.104", ["216.239.63.104"]),               # :174
    ("1-2-3", ["1-2-3"]),                                 # :175
    ("a1-b2-c3", ["a1-b2-c3"]),                           # :176
    ("a1-b-c3", ["a1-b-c3"]),                             # :177
    ("David has 5000 bones", ["david", "has", "5000", "bones"]),  # :182
    ("C embedded developers wanted",
     ["c", "embedded", "developers", "wanted"]),          # :188
    ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),    # :189
    ("foo      bar .  FOO <> BAR",
     ["foo", "bar", "foo", "bar"]),                       # :190
    ('"QUOTED" word', ["quoted", "word"]),                # :191
    ("U.S.A.", ["usa"]),                                  # :196
    ("C++", ["c"]),                                       # :202
    ("C#", ["c"]),                                        # :203
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),  # :208 (Korean ≠ CJ)
    ("2004.jpg", ["2004.jpg"]),                           # :215
    ("62.46", ["62.46"]),                                 # :219
    ("978-0-94045043-1", ["978-0-94045043-1"]),           # :224
    ("78academyawards/rules/rule02.html",
     ["78academyawards/rules/rule02.html"]),              # :228-232
    ("2006-03-11t082958z_01_ban130523_rtridst_0_ozabs",
     ["2006-03-11t082958z_01_ban130523_rtridst_0_ozabs"]),  # :236-240
    ("mid-20th", ["mid-20th"]),                           # :244
]


@pytest.mark.parametrize("text,want", GOLDENS)
def test_classic_analyzer_golden(text, want):
    assert analyze(text) == want


def test_compliance_many_tokens():
    # TestClassicAnalyzer.testComplianceManyTokens (:247-275), tokens+types.
    text = ("/money.cnn.com/magazines/fortune/fortune_archive/2007/03/19/"
            "8402357/index.htm safari-0-sheikh-zayed-grand-mosque.jpg")
    toks, types = classic_tokenize(text, with_types=True)
    assert toks == ["money.cnn.com", "magazines", "fortune", "fortune",
                    "archive/2007/03/19/8402357", "index.htm",
                    "safari-0-sheikh", "zayed", "grand", "mosque.jpg"]
    assert types == ["HOST", "ALPHANUM", "ALPHANUM", "ALPHANUM", "NUM",
                     "HOST", "NUM", "ALPHANUM", "ALPHANUM", "HOST"]


def test_token_types():
    toks, types = classic_tokenize(
        "U.S.A. AT&T t@e.com www.x.org 1-2-3 日本 word 1.2.3.",
        with_types=True)
    assert list(zip(toks, types)) == [
        ("U.S.A.", "ACRONYM"), ("AT&T", "COMPANY"), ("t@e.com", "EMAIL"),
        ("www.x.org", "HOST"), ("1-2-3", "NUM"), ("日", "CJ"), ("本", "CJ"),
        ("word", "ALPHANUM"),
        ("1.2.3", "HOST"),  # ACRONYM_DEP re-typed, trailing dot stripped
    ]


def test_classic_filter():
    assert classic_filter("U.S.A.", "ACRONYM") == "USA"
    assert classic_filter("O'Reilly's", "APOSTROPHE") == "O'Reilly"
    assert classic_filter("don't", "APOSTROPHE") == "don't"
    assert classic_filter("www.x.org", "HOST") == "www.x.org"


def test_max_token_length_skips():
    # TestClassicAnalyzer.testMaxTermLength (:55-58): too-long terms skipped.
    toks = classic_tokenize("ab cd toolong xy z", max_token_length=5)
    assert toks == ["ab", "cd", "xy", "z"]
    # :79 — a 256-char term is discarded entirely, neighbors survive
    long = "x" * 256
    assert classic_tokenize(f"ab {long} z") == ["ab", "z"]
    assert classic_tokenize(f"ab {'x' * 255} z") == ["ab", "x" * 255, "z"]


def test_num_alternation_exact():
    # jflex:93-98 — every OTHER segment must carry a digit; trailing
    # digit-free runs fall off the match.
    assert classic_tokenize("a-b-c") == ["a", "b", "c"]
    assert classic_tokenize("safari-0-sheikh-zayed") == \
        ["safari-0-sheikh", "zayed"]
    assert classic_tokenize("1-a-2-b-3") == ["1-a-2-b-3"]
    assert classic_tokenize("x_1_y_2_z") == ["x_1_y_2_z"]
