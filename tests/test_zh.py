"""smartcn-lite Chinese HHMM segmentation goldens.

Reference: lucene/analysis/smartcn/src/test/org/apache/lucene/analysis/
cn/smart/TestSmartChineseAnalyzer.java (line refs inline) — every
dictionary-independent golden, run through the full analyzer chain
(HMMChineseTokenizer → Porter → punctuation StopFilter,
SmartChineseAnalyzer.java:123-134)."""

import pytest

from lucene_spark.zh import (zh_tokenize, hhmm_segment, get_char_type,
                             smart_chinese_analyzer, MAX_FREQUENCE)

AN = smart_chinese_analyzer()


def analyze(text):
    return AN.analyze_text(text)[0]


BASE = ["我", "购买", "了", "道具", "和", "服装"]

GOLDENS = [
    ("我购买了道具和服装。", BASE),                       # :29-31
    ("我购买了道具和服装。 我购买了道具和服装。", BASE * 2),  # :43-46
    ("我购买了道具和服装　我购买了道具和服装。", BASE * 2),   # :87-89 (ideo space)
    ("我购买 Tests 了道具和服装",
     ["我", "购买", "test", "了", "道具", "和", "服装"]),   # :143-144
    ("我购买 Tests 了道具和服装1234",
     ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]),  # :153-156
    ("我购买 Ｔｅｓｔｓ 了道具和服装１２３４",
     ["我", "购买", "test", "了", "道具", "和", "服装", "1234"]),  # :165-168
    ("我购买︱ Tests 了道具和服装",
     ["我", "购买", "test", "了", "道具", "和", "服装"]),   # :177-178
    ("我购买 روبرتTests 了道具和服装",
     ["我", "购买", "ر", "و", "ب", "ر", "ت",
      "test", "了", "道具", "和", "服装"]),                # :188-191
    ("优素福·拉扎·吉拉尼",
     ["优", "素", "福", "拉", "扎", "吉", "拉", "尼"]),     # :202 (OOV)
    ("优素福拉扎吉拉尼",
     ["优", "素", "福", "拉", "扎", "吉", "拉", "尼"]),     # :204
    ("Title:San", ["titl", "san"]),                        # :126 (porter+stop)
]


@pytest.mark.parametrize("text,want", GOLDENS)
def test_smartcn_golden(text, want):
    assert analyze(text) == want


def test_surrogate_pairs():
    # testSurrogatePairCharacter (:52-78): supplementary ideographs and
    # post-U+9FA5 BMP ideographs each surface as their own token.
    s = ("\U00020F3B\U00020F4A\U00020F73\U00020F5B鿏\U0002B7FC"
         "\U00020F2D鿔")
    assert analyze(s) == list(s)


def test_stopwords_off_keeps_comma():
    # testChineseStopWordsOff (:103-110): without the stop filter the
    # IDEOGRAPHIC FULL STOP surfaces as the ',' COMMON_DELIMITER.
    assert zh_tokenize("我购买了道具和服装。") == BASE + [","]


def test_char_types():
    # Utility.getCharType (Utility.java:140-159)
    assert get_char_type("中") == 1            # HANZI
    assert get_char_type("鿏") == 8        # OTHER (> U+9FA5)
    assert get_char_type("a") == 2 and get_char_type("Z") == 2
    assert get_char_type("7") == 3
    assert get_char_type("　") == 0            # ideographic space
    assert get_char_type("。") == 6            # DELIMITER
    assert get_char_type("！") == 6            # 0xFE30-0xFF63 delimiter
    assert get_char_type("Ｔ") == 4 and get_char_type("１") == 5
    assert get_char_type("\U00020F3B") == 7    # surrogate-pair ideograph


def test_word_spans_space():
    # HHMMSegmenter.java:94 — the dictionary prefix walk skips SPACE_LIKE,
    # so a compound split by a space still segments as one word.
    toks = [t for t in hhmm_segment("购 买")]
    assert any(t.word == "购买" for t in toks)


def test_delimiter_frequency_is_max():
    toks = hhmm_segment("。")
    assert toks[-1].freq == MAX_FREQUENCE


def test_large_sentence_linear():
    # LUCENE-3026 (:236-260): 5000 repetitions must process without blowup.
    text = "我购买了道具和服装。" * 200
    assert analyze(text) == BASE * 200
