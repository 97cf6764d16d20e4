"""Thai analysis: every TestThaiAnalyzer golden
(analysis/common/src/test/.../th/TestThaiAnalyzer.java) through the
curated-lexicon segmentation chain."""

from lucene_spark.analysis import ENGLISH_STOP_WORDS
from lucene_spark.th import (THAI_LEXICON, THAI_STOP_WORDS, thai_analyzer,
                             thai_tokenize)


def test_offsets_golden_tokens():
    a = thai_analyzer(stopwords=())
    toks, poss = a.analyze_text("การที่ได้ต้องแสดงว่างานดี")
    assert toks == ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]
    assert poss == [0, 1, 2, 3, 4, 5, 6, 7]


def test_stop_words_golden_position_gaps():
    a = thai_analyzer()
    toks, poss = a.analyze_text("การที่ได้ต้องแสดงว่างานดี")
    assert toks == ["แสดง", "งาน", "ดี"]
    # reference posincs {5, 2, 1} == raw positions 4, 6, 7
    assert poss == [4, 6, 7]


def test_position_increments_english_stop():
    a = thai_analyzer(stopwords=ENGLISH_STOP_WORDS)
    for text in ("การที่ได้ต้อง the แสดงว่างานดี",
                 "การที่ได้ต้องthe แสดงว่างานดี"):
        toks, poss = a.analyze_text(text)
        assert toks == ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า",
                        "งาน", "ดี"]
        # 'the' leaves a gap: increments 1,1,1,1,2,1,1,1
        assert poss == [0, 1, 2, 3, 5, 6, 7, 8]


def test_mixed_latin_and_reuse():
    a = thai_analyzer(stopwords=())
    assert a.analyze_text("")[0] == []
    toks, _ = a.analyze_text("บริษัทชื่อ XY&Z - คุยกับ xyz@demo.com")
    assert toks == ["บริษัท", "ชื่อ", "xy", "z", "คุย", "กับ", "xyz",
                    "demo.com"]
    toks, _ = a.analyze_text("ภาษาไทย")
    assert toks == ["ภาษา", "ไทย"]


def test_digit_fold():
    a = thai_analyzer()
    assert a.analyze_text("๑๒๓๔")[0] == ["1234"]


def test_two_sentences():
    a = thai_analyzer(stopwords=())
    toks, _ = a.analyze_text("This is a test. การที่ได้ต้องแสดงว่างานดี")
    assert toks == ["this", "is", "a", "test", "การ", "ที่", "ได้",
                    "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]


def test_unknown_runs_stay_whole_and_lexicon_extends():
    # an unknown Thai stretch between lexicon hits is one token
    toks = thai_tokenize("ภาษาxไทย")
    assert toks == ["ภาษา", "x", "ไทย"]
    assert len(THAI_STOP_WORDS) == 115
    # extra_words extends segmentation without touching the module table
    assert "ทดสอบ" not in THAI_LEXICON
    assert thai_tokenize("ภาษาทดสอบ", extra_words=("ทดสอบ",)) == \
        ["ภาษา", "ทดสอบ"]


def test_routing_th():
    from lucene_spark.intl import routing_analyzer_with_intl

    ra = routing_analyzer_with_intl()
    toks, _ = ra.for_lang("th").analyze_text("การที่ได้ต้องแสดงว่างานดี")
    assert toks == ["แสดง", "งาน", "ดี"]
