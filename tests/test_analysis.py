"""Analyzer golden tests mirroring core/src/test/.../analysis/standard/
TestStandardAnalyzer.java (token expectations) + StandardAnalyzer defaults."""

import pandas as pd

from lucene_spark.analysis import ENGLISH_STOP_WORDS, analyze, analyze_series, tokenize

# (input, expected tokens from StandardTokenizer) — TestStandardAnalyzer.java
TOKENIZER_GOLDENS = [
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),  # :400-401
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),  # :402-403
    ("ac/dc", ["ac", "dc"]),  # :404
    ("O'Reilly", ["O'Reilly"]),  # :409
    ("you're", ["you're"]),
    ("she's", ["she's"]),
    ("Jim's", ["Jim's"]),
    ("don't", ["don't"]),
    ("O'Reilly's", ["O'Reilly's"]),  # :414
    ("21.35", ["21.35"]),  # :419
    ("R2D2 C3PO", ["R2D2", "C3PO"]),  # :420
    ("216.239.63.104", ["216.239.63.104"]),  # :421
    ("David has 5000 bones", ["David", "has", "5000", "bones"]),  # :427-428
    ("C embedded developers wanted", ["C", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "FOO", "BAR"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "FOO", "BAR"]),
    ('"QUOTED" word', ["QUOTED", "word"]),  # :439
    ("", []),  # :375
    (".", []),
    (" ", []),
    ("B2B", ["B2B"]),  # :394
    ("2B", ["2B"]),  # :395
    # CJK: ideographs one per token, fullwidth forms are alnum (:370-372)
    ("我是中国人。 １２３４ Ｔｅｓｔｓ", ["我", "是", "中", "国", "人", "１２３４", "Ｔｅｓｔｓ"]),
    # Korean: hangul runs (:444)
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
    # Armenian digits-with-comma (:148-158 subset)
    ("4,600 հայերեն", ["4,600", "հայերեն"]),
]


def test_tokenizer_goldens():
    for text, expected in TOKENIZER_GOLDENS:
        assert tokenize(text) == expected, text


def test_max_token_length_skip_not_truncate():
    # StandardTokenizer.java:144-168: over-long tokens are skipped entirely
    long_tok = "x" * 256
    assert tokenize(f"aaa {long_tok} bbb") == ["aaa", "bbb"]
    assert tokenize("x" * 255) == ["x" * 255]


def test_stop_words_list_is_the_english_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    for w in ["a", "an", "and", "the", "to", "was", "will", "with", "such"]:
        assert w in ENGLISH_STOP_WORDS
    assert "from" not in ENGLISH_STOP_WORDS


def test_analyze_lowercases_and_stops():
    assert analyze("The Quick BROWN fox") == ["quick", "brown", "fox"]
    assert analyze("THE AND OF TO") == []  # stopword-only
    assert analyze("Don't STOP The Music") == ["don't", "stop", "music"]


def test_analyze_series():
    s = pd.Series(["Hello World", None, "the a an"])
    out = analyze_series(s)
    assert out.tolist() == [["hello", "world"], [], []]


def test_field_length_counts_emitted_tokens_only():
    # norm length = tokens emitted by the full chain (IndexingChain.java:1216)
    toks = analyze("the cat and the hat")
    assert toks == ["cat", "hat"]
    assert len(toks) == 2


def test_emoji_single_tokens():
    assert tokenize("emoji 💩 here") == ["emoji", "💩", "here"]
    # ZWJ sequence is one token
    assert tokenize("a 👩‍❤️‍👩 b") == ["a", "👩‍❤️‍👩", "b"]
    # flag = regional indicator pair
    assert tokenize("us 🇺🇸 flag") == ["us", "🇺🇸", "flag"]


def test_katakana_runs_hiragana_singles():
    assert tokenize("カタカナ") == ["カタカナ"]
    assert tokenize("ひらがな") == ["ひ", "ら", "が", "な"]


def test_cjk_bigram_stream():
    """CJKBigramFilter semantics: runs bigram, lone chars stay unigrams,
    non-CJK passes through; bigrams merge ACROSS whitespace (positions are
    tokenizer indexes, like Lucene's posIncrement chain)."""
    from lucene_spark.analysis import analyze_with_positions, cjk_analyzer

    a = cjk_analyzer()
    toks, poss = analyze_with_positions("株式会社", a)
    assert toks == ["株式", "式会", "会社"] and poss == [0, 1, 2]
    toks, _ = analyze_with_positions("一", a)
    assert toks == ["一"]
    # whitespace between ideographs does not break the bigram chain
    toks, _ = analyze_with_positions("東京 大学", a)
    assert toks == ["東京", "京大", "大学"]
    # Latin + the stop filter still apply
    toks, _ = analyze_with_positions("the 東京 tower", a)
    assert toks == ["東京", "tower"]


def test_routing_analyzer_detects_script():
    from lucene_spark.analysis import RoutingAnalyzer, analyze

    r = RoutingAnalyzer()
    assert analyze("the quick fox", r) == ["quick", "fox"]
    assert analyze("ここは東京です", r) == ["ここ", "こは", "は東", "東京", "京で", "です"]
    assert r.for_lang("cjk") is r.routes["cjk"]
    assert r.for_lang("en") is r.default


def test_lang_routed_build_partition_invariance(spark):
    """A RoutingAnalyzer-built index is identical regardless of input
    partitioning (the invariance contract every analyzer chain must keep)."""
    import pandas as pd

    from lucene_spark.analysis import RoutingAnalyzer
    from lucene_spark.index import build_index

    rows = []
    for i in range(60):
        if i % 3 == 0:
            rows.append({"doc_id": i, "url": f"u{i}",
                         "text": "spark 東京大学 batch 株式会社"})
        else:
            rows.append({"doc_id": i, "url": f"u{i}",
                         "text": "the spark batch window key"})
    pdf = pd.DataFrame(rows)
    outs = []
    for nparts in (2, 8):
        docs = spark.createDataFrame(pdf).repartition(nparts)
        idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                          docid_col="doc_id", stopwords=RoutingAnalyzer())
        outs.append(
            sorted(tuple(r) for r in
                   idx.termdict.select("term", "df", "cf").collect())
        )
    assert outs[0] == outs[1]
    terms = [t for t, _, _ in outs[0]]
    assert "東京" in terms and "京大" in terms and "大学" in terms
    assert "the" not in terms


def test_query_auto_stop_words(spark):
    # query/QueryAutoStopWordAnalyzer.java:79,94 — df-derived stop set
    import pytest

    from lucene_spark.analysis import english_analyzer, query_auto_stop_words
    from lucene_spark.index import build_index

    pages = spark.createDataFrame(
        [(f"u{i}", "common filler " + ("rare " if i == 0 else ""))
         for i in range(10)],
        "url string, text string")
    idx = build_index(spark, pages)
    an = query_auto_stop_words(idx, english_analyzer(),
                               max_percent_docs=0.5)
    assert an.analyze_text("common rare filler")[0] == ["rare"]
    an = query_auto_stop_words(idx, english_analyzer(), max_doc_freq=9)
    assert an.analyze_text("common rare filler")[0] == ["rare"]
    # the base analyzer's own stop set is preserved
    assert an.analyze_text("the rare")[0] == ["rare"]
    with pytest.raises(ValueError):
        query_auto_stop_words(idx)
