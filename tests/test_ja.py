"""kuromoji-lite Japanese analysis: the reference goldens the curated
lexicon covers (TestJapaneseTokenizer / search-segmentation-tests.txt),
mode behavior, the analyzer chain, and routing."""

from lucene_spark.ja import (
    JapaneseAnalyzer,
    base_form,
    ja_analyze,
    ja_tokenize,
    katakana_stem,
    pos_stop,
)


def seg(t, mode="search"):
    return [x.surface for x in ja_tokenize(t, mode=mode)]


def test_reference_goldens_search_mode():
    # TestJapaneseTokenizer.java:285,470 + search-segmentation-tests.txt
    assert seg("これは本ではない") == ["これ", "は", "本", "で", "は", "ない"]
    assert seg("関西国際空港に行った") == ["関西", "国際", "空港", "に", "行っ", "た"]
    assert seg("麻薬の密売は根こそぎ絶やさなければならない") == [
        "麻薬", "の", "密売", "は", "根こそぎ", "絶やさ", "なけれ", "ば",
        "なら", "ない"]
    # search-mode decompounding (search-segmentation-tests.txt)
    assert seg("東京大学") == ["東京", "大学"]
    assert seg("京都大学") == ["京都", "大学"]
    assert seg("シニアソフトウェアエンジニア") == [
        "シニア", "ソフトウェア", "エンジニア"]


def test_normal_mode_keeps_compounds():
    # TestJapaneseTokenizer.testNormalMode
    assert seg("シニアソフトウェアエンジニア", "normal") == ["シニアソフトウェアエンジニア"]
    assert seg("東京大学", "normal") == ["東京大学"]
    assert seg("関西国際空港", "normal") == ["関西国際空港"]


def test_search_penalty_constants():
    # JapaneseTokenizer.java:106-112
    from lucene_spark import ja

    assert ja.SEARCH_MODE_KANJI_PENALTY == 3000
    assert ja.SEARCH_MODE_OTHER_PENALTY == 1700
    assert ja.SEARCH_MODE_KANJI_LENGTH == 2
    assert ja.SEARCH_MODE_OTHER_LENGTH == 7


def test_unknown_words_and_mixed_text():
    toks = seg("勉強する")           # 勉強 is not in the lexicon
    assert toks == ["勉強", "する"]
    toks = seg("Sparkで検索")
    assert toks == ["Spark", "で", "検索"]
    assert seg("2024年") == ["2024", "年"]


def test_base_form_filter():
    toks = base_form(ja_tokenize("関西国際空港に行った"))
    assert [t.surface for t in toks] == ["関西", "国際", "空港", "に", "行く", "た"]


def test_pos_stop_filter():
    toks = pos_stop(ja_tokenize("これは本ではない"))
    assert [t.surface for t in toks] == ["これ", "本"]


def test_katakana_stem():
    # JapaneseKatakanaStemFilter.java:67-78 (min length 4)
    assert katakana_stem("コンピューター") == "コンピュータ"
    assert katakana_stem("サーバー") == "サーバ"
    assert katakana_stem("カー") == "カー"          # below minimum
    assert katakana_stem("メモリ") == "メモリ"       # no trailing mark


def test_full_analyzer_chain():
    assert ja_analyze("関西国際空港に行った") == ["関西", "国際", "空港", "行く"]
    assert ja_analyze("コンピューターで計算する") == ["コンピュータ", "計算"]


def test_analyzer_interface_position_gaps():
    toks, poss = JapaneseAnalyzer().analyze_text("これは本ではない")
    assert toks == ["本"]       # これ is a reference stopword, rest stopped by POS
    assert poss == [2]          # particles leave position gaps


def test_user_dictionary_segmentation():
    # dict/UserDictionary.java: compound emits its listed parts
    ud = {"日本経済新聞": ["日本", "経済", "新聞"]}
    toks = ja_tokenize("日本経済新聞を読む", mode="normal", user_dict=ud)
    assert [t.surface for t in toks][:3] == ["日本", "経済", "新聞"]


def test_routing_kana_vs_han():
    from lucene_spark.intl import routing_analyzer_with_intl

    ra = routing_analyzer_with_intl()
    toks, _ = ra.analyze_text("関西国際空港に行った")
    assert toks == ["関西", "国際", "空港", "行く"]
    toks, _ = ra.analyze_text("这是一个测试")       # Han only → CJK bigrams
    assert toks == ["这是", "是一", "一个", "个测", "测试"]


def test_iteration_mark_reference_goldens():
    # TestJapaneseIterationMarkCharFilter.java:73-131 (keywordAnalyzer
    # column = the raw char-filter output)
    from lucene_spark.ja import iteration_mark_normalize as f

    for s, want in [
        ("時々", "時時"), ("馬鹿々々しい", "馬鹿馬鹿しい"),
        ("ミスヾ", "ミスズ"), ("おゝの", "おおの"), ("みすゞ", "みすず"),
        ("じゞ", "じじ"), ("じゝ", "じし"), ("ところゞゝゝ", "ところどころ"),
        ("abcところゝゝゝゝ", "abcところcところ"),
        ("abcところゞゝゝゝ", "abcところcところ"),
        ("ところゞゝゝゞゝゞ", "ところどころゞゝゞ"),
        ("々", "々"), ("ゞ", "ゞ"), ("ゞゝ", "ゞゝ"),
        ("。ゝ", "。ゝ"), ("。。ゝゝ", "。。ゝゝ"), ("？ゝ", "？？"),
    ]:
        assert f(s) == want, s
        assert len(f(s)) == len(s)      # 1:1 mapping — offsets preserved


def test_japanese_number_reference_goldens():
    # TestJapaneseNumberFilter.java:88-239
    from lucene_spark.ja import parse_japanese_number as p

    for s, want in [
        ("3", "3"), ("３", "3"), ("三", "3"), ("〇三", "3"), ("００３", "3"),
        ("千", "1000"), ("1千", "1000"), ("一千", "1000"),
        ("一〇〇〇", "1000"), ("１０百", "1000"),
        ("三五七八九", "35789"), ("六百二万五千一", "6025001"),
        ("兆六百万五千一", "1000006005001"),
        ("十兆六百万五千一", "10000006005001"),
        ("一京一", "10000000000000001"), ("十京十", "100000000000000010"),
        ("垓京兆億万千百十一", "100010001000100011111"),
        ("三千2百２十三", "3223"), ("３２二三", "3223"),
        ("十十", "20"), ("百百百", "300"), ("千千千千", "4000"),
        ("〇一二三四五六七八九九八七六五四三二一〇", "1234567899876543210"),
        ("〇〇七", "7"), ("〇〇", "0"),
        ("１．２万３４５．６７", "12345.67"), ("３．２千", "3200"),
        ("4,647", "4647"), ("4,647.0010", "4647.001"), ("15,7", "157"),
        ("1000.1000", "1000.1"), ("1000.0000", "1000"),
        ("十万二千五百", "102500"), ("１０万", "100000"),
        ("６００万", "6000000"), ("100万", "1000000"),
    ]:
        assert p(s) == want, s
    assert p("abc") is None
    assert p("") is None


def test_japanese_number_token_stream():
    from lucene_spark.ja import japanese_number_filter

    assert japanese_number_filter(["１０", "万"]) == ["100000"]
    assert japanese_number_filter(["-", "100", "万"]) == ["-", "1000000"]
    assert japanese_number_filter(["ワイン", "十", "万", "円"]) == [
        "ワイン", "100000", "円"]


def test_reading_form_reference_goldens():
    # TestJapaneseReadingFormFilter.java:66-96
    from lucene_spark.ja import ja_tokenize, reading_form

    toks = ja_tokenize("今夜はロバート先生と話した")
    assert reading_form(toks) == [
        "コンヤ", "ハ", "ロバート", "センセイ", "ト", "ハナシ", "タ"]
    assert reading_form(toks, use_romaji=True) == [
        "kon'ya", "ha", "robato", "sensei", "to", "hanashi", "ta"]


def test_romanize_digraphs_and_gemination():
    from lucene_spark.ja import romanize

    assert romanize("キャット") == "kyatto"
    assert romanize("シャシン") == "shashin"
    assert romanize("ジョジョ") == "jojo"
    assert romanize("チャチ") == "chachi"
    assert romanize("ニッポン") == "nippon"
    assert romanize("トウキョウ") == "toukyou"
