"""nori-lite Korean analysis: the reference TestKoreanAnalyzer goldens the
curated lexicon covers, decompound modes, POS stop tags, routing."""

from lucene_spark.ko import (
    KoreanAnalyzer,
    _is_stop_tag,
    ko_analyze,
    ko_tokenize,
)


def test_reference_analyzer_goldens():
    # TestKoreanAnalyzer.java:31-34 — default chain: morphological
    # decomposition + default POS stop tags
    assert ko_analyze("한국은 대단한 나라입니다.") == ["한국", "대단", "나라", "이"]
    # TestKoreanAnalyzer.java:78-81 — compound decomposition, digits kept
    assert ko_analyze("2018 평창 동계올림픽대회") == [
        "2018", "평창", "동계", "올림픽", "대회"]


def test_morpheme_decomposition():
    toks = [(t.surface, t.pos) for t in ko_tokenize("나라입니다")]
    assert toks == [("나라", "NNG"), ("이", "VCP"), ("ᄇ니다", "EF")]
    toks = [(t.surface, t.pos) for t in ko_tokenize("대단한")]
    assert toks == [("대단", "XR"), ("하", "XSA"), ("ᆫ", "ETM")]


def test_decompound_none_keeps_compound():
    # KoreanTokenizer DecompoundMode.NONE
    toks = [t.surface for t in ko_tokenize("동계올림픽대회", decompound="none")]
    assert toks == ["동계올림픽대회"]


def test_default_stop_tags():
    # KoreanPartOfSpeechStopFilter.java:36-56
    for tag in ("EF", "ETM", "EP", "JX", "JKS", "JKO", "IC", "MAG",
                "XSA", "XSV", "SP"):
        assert _is_stop_tag(tag), tag
    for tag in ("NNG", "NNP", "XR", "VCP", "VV", "VA", "SN", "SL"):
        assert not _is_stop_tag(tag), tag


def test_unknown_words():
    # 서울 is not in the lexicon: unknown hangul stem + known particle
    out = ko_analyze("서울은 나라의 대회")
    assert out == ["서울", "나라", "대회"]


def test_routing_interface():
    toks, poss = KoreanAnalyzer().analyze_text("한국은 대단한 나라입니다.")
    assert toks == ["한국", "대단", "나라", "이"]
    assert poss == sorted(poss)


def test_routing_hangul_detection():
    from lucene_spark.intl import routing_analyzer_with_intl

    ra = routing_analyzer_with_intl()
    toks, _ = ra.analyze_text("한국은 대단한 나라입니다.")
    assert toks == ["한국", "대단", "나라", "이"]
    toks, _ = ra.analyze_text("関西国際空港に行った")       # kana → ja
    assert toks == ["関西", "国際", "空港", "行く"]
    toks, _ = ra.analyze_text("这是一个测试")               # Han → cjk
    assert toks == ["这是", "是一", "一个", "个测", "测试"]


def test_korean_number_reference_goldens():
    # TestKoreanNumberFilter.java:120-176
    from lucene_spark.ko import parse_korean_number as p

    for s, want in [
        ("3", "3"), ("３", "3"), ("삼", "3"), ("03", "3"), ("영삼", "3"),
        ("영영삼", "3"),
        ("천", "1000"), ("1천", "1000"), ("일천", "1000"),
        ("일영영영", "1000"), ("１０백", "1000"),
        ("삼오칠팔구", "35789"), ("육백이만오천일", "6025001"),
        ("조육백만오천일", "1000006005001"),
        ("십조육백만오천일", "10000006005001"),
        ("일경일", "10000000000000001"), ("십경십", "100000000000000010"),
        ("해경조억만천백십일", "100010001000100011111"),
        ("삼천2백２십삼", "3223"), ("３２이삼", "3223"),
        ("십십", "20"), ("백백백", "300"), ("천천천천", "4000"),
        ("영일이삼사오육칠팔구구팔칠육오사삼이일영", "1234567899876543210"),
        ("십만이천오백", "102500"), ("600만", "6000000"), ("백만", "1000000"),
    ]:
        assert p(s) == want, s
    assert p("가나다") is None
