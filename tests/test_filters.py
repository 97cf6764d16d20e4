"""Token-filter tests: Porter stemmer vectors (the algorithm's published
examples), possessive/fold/length semantics, shingles/n-grams (Python and
Catalyst Column forms agree), and the EnglishAnalyzer chain end-to-end
through build_index + search.  Reference patterns: en/TestPorterStemFilter,
miscellaneous/TestASCIIFoldingFilter, shingle/ShingleFilterTest."""

import numpy as np
import pytest

from lucene_spark.analysis import Analyzer, analyze, analyze_with_positions, english_analyzer
from lucene_spark.filters import (
    ascii_fold,
    char_ngrams,
    edge_ngram_col,
    edge_ngrams,
    length_filter,
    porter_stem,
    shingle_col,
    shingle_tokens,
    strip_possessive,
)

# Published Porter examples: the paper's §2 worked example, the step-1
# comment table (full-pipeline outputs), and the connect family.
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "matting": "mat", "mating": "mate", "meeting": "meet",
    "milling": "mill", "messing": "mess", "meetings": "meet",
    "agreed": "agre", "disabled": "disabl", "feed": "feed",
    "happy": "happi", "sky": "sky",
    "connect": "connect", "connected": "connect", "connecting": "connect",
    "connection": "connect", "connections": "connect",
    "generalizations": "gener", "oscillators": "oscil",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "homologou": "homolog", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "controll": "control",
    "roll": "roll",
}


def test_porter_vectors():
    bad = {w: (porter_stem(w), want) for w, want in PORTER_VECTORS.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_porter_short_words_untouched():
    for w in ("a", "is", "be", "ax"):
        assert porter_stem(w) == w


def test_porter_idempotent_on_many():
    # stem(stem(w)) == stem(w) for the vector set (a well-known property
    # check; not universally true for Porter but holds on these)
    for w in PORTER_VECTORS.values():
        assert porter_stem(porter_stem(w)) == porter_stem(w)


def test_possessive_variants():
    assert strip_possessive("o'reilly's") == "o'reilly"
    assert strip_possessive("bob’s") == "bob"
    assert strip_possessive("x＇s") == "x"
    assert strip_possessive("its") == "its"  # no apostrophe → untouched
    assert strip_possessive("'s") == ""


def test_ascii_fold():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("Ångström") == "Angstrom"
    assert ascii_fold("łódź") == "lodz"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("Æon") == "AEon"
    assert ascii_fold("þorn") == "thorn"
    assert ascii_fold("plain_ascii-123") == "plain_ascii-123"


def test_length_filter_positions_gap():
    an = Analyzer(post_filters=(length_filter(3, 10),))
    toks, poss = analyze_with_positions("an ox and a fox jumped", an)
    # 'an'/'a' are stopwords, 'ox' removed by length; gaps preserved
    assert toks == ["fox", "jumped"]
    assert poss == [4, 5]


def test_english_analyzer_chain():
    an = english_analyzer()
    assert analyze("it's the committee's meetings", an) == ["committe", "meet"]
    # possessive strips BEFORE the stop filter: "it's" → "it" → stopped
    assert "it" not in analyze("it's fine", an)


def test_shingles_and_ngrams():
    assert shingle_tokens(["new", "york", "city"]) == ["new york", "york city"]
    assert shingle_tokens(["a"], 2, 2) == []
    assert shingle_tokens(["a", "b"], 2, 3) == ["a b"]
    assert edge_ngrams("lucene", 2, 4) == ["lu", "luc", "luce"]
    assert edge_ngrams("ab", 2, 4) == ["ab"]
    assert char_ngrams("abcd", 3, 4) == ["abc", "bcd", "abcd"]


def test_column_forms_agree_with_python(spark):
    import pyspark.sql.functions as F

    rows = [(["new", "york", "city", "hall"],), (["one"],), ([],)]
    df = spark.createDataFrame(rows, "tokens array<string>")
    got = [r[0] for r in df.select(shingle_col("tokens", 2).alias("s")).collect()]
    want = [shingle_tokens(t[0], 2, 2) for t in rows]
    assert got == want

    tdf = spark.createDataFrame([("lucene",), ("ab",), ("a",)], "term string")
    got2 = [r[0] for r in tdf.select(edge_ngram_col("term", 2, 4).alias("g")).collect()]
    assert got2 == [["lu", "luc", "luce"], ["ab"], []]


def test_stemmed_index_search(spark):
    from lucene_spark.index import build_index
    from lucene_spark.search import search

    an = english_analyzer()
    pages = spark.createDataFrame(
        [("u0", "the committee's meetings ran late"),
         ("u1", "several committees run relational analyses"),
         ("u2", "nothing related here at all")],
        "url string, text string",
    )
    idx = build_index(spark, pages, stopwords=an)
    a = search(idx, "meetings", k=10, analyzer=an)
    b = search(idx, "meeting", k=10, analyzer=an)
    assert a.docids.tolist() == b.docids.tolist() == [0]
    c = search(idx, "committee's", k=10, analyzer=an)
    d = search(idx, "committees", k=10, analyzer=an)
    assert c.docids.tolist() == d.docids.tolist()
    assert len(c.docids) == 2


def test_trim_elision_decimal_digit():
    from lucene_spark.filters import decimal_digit, elision, trim

    assert trim("  x ") == "x"
    assert elision("l'avion") == "avion"
    assert elision("qu'il") == "il"
    assert elision("d'accord") == "accord"
    assert elision("don't") == "don't"  # 'don' is not an elided article
    assert elision("o'reilly") == "o'reilly"
    assert decimal_digit("١٢٣") == "123"
    assert decimal_digit("４２") == "42"
    assert decimal_digit("abc123") == "abc123"


def test_french_style_chain():
    from lucene_spark.analysis import Analyzer, analyze
    from lucene_spark.filters import elision

    an = Analyzer(stopwords=frozenset(), pre_filters=(elision,))
    assert analyze("L'avion de qu'il", an) == ["avion", "de", "il"]


def test_html_strip_char_filter(spark):
    """CharFilter slot: html_strip runs before the tokenizer; an index
    built over HTML matches one built over the plain text."""
    import pytest as _pt

    from lucene_spark.analysis import (
        Analyzer,
        analyze,
        analyze_with_offsets,
        analyze_with_positions,
    )
    from lucene_spark.filters import html_strip
    from lucene_spark.index import build_index
    from lucene_spark.search import search

    a = Analyzer(char_filters=(html_strip,))
    assert html_strip("<p>spark <b>window</b></p>") == "spark window"
    assert analyze("<p>spark the <b>window</b></p>", a) == ["spark", "window"]
    # positions keep the stopword gap through the char filter
    toks, poss = analyze_with_positions("<p>spark the <b>window</b></p>", a)
    assert toks == ["spark", "window"] and poss == [0, 2]
    # offsets honestly refuse (no correctOffset)
    with _pt.raises(ValueError):
        analyze_with_offsets("<p>x</p>", a)

    rows = [(i, f"<html><body><p>spark window w{i}</p></body></html>")
            for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, html string")
    idx = build_index(spark, docs, text_col="html", key_col="doc_id",
                      docid_col="doc_id", stopwords=a)
    plain = spark.createDataFrame(
        [(i, f"spark window w{i}") for i in range(6)],
        "doc_id long, text string")
    idx2 = build_index(spark, plain, text_col="text", key_col="doc_id",
                       docid_col="doc_id")
    t1 = search(idx, "spark window", k=6, precision="float64")
    t2 = search(idx2, "spark window", k=6, precision="float64")
    assert t1.docids.tolist() == t2.docids.tolist()
    assert t1.scores.tolist() == t2.scores.tolist()


def test_fuzzy_like_this(spark):
    """FuzzyLikeThisQuery (sandbox/queries/FuzzyLikeThisQuery.java:64-337):
    fuzzified free text, boost^2*idf variant scores, df=1 term statistics."""
    import math

    import numpy as np
    import pytest as _pt

    from lucene_spark.index import build_index
    from lucene_spark.search import fuzzy_like_this, search
    from lucene_spark.similarity import BM25Scorer, CollectionStats

    corpus = [
        (0, "spark window", "en"),
        (1, "spark windom", "en"),
        (2, "sparx window window", "en"),
        (3, "unrelated terms", "en"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id")
    node = fuzzy_like_this(idx, "spark windoq", max_edits=1)
    assert node[0] == "scored_or"
    terms = {t for t, _ in node[1]}
    # spark (exact, boost 1) + sparx (ed1) + window/windom (ed1 of windoq)
    assert terms == {"spark", "sparx", "window", "windom"}
    sc = dict(node[1])
    n = 4
    # scorer weight = variant score x BM25-idf at the ARTIFICIAL df=1
    idf1 = math.log(1 + (n - 1 + 0.5) / (1 + 0.5))
    idf_spark = math.log((n + 1) / (2 + 1)) + 1  # Classic idf, df(spark)=2
    assert sc["spark"].weight == _pt.approx(1.0 * idf_spark * idf1, rel=1e-12)
    # windoq unindexed -> integer-avg variant df: (df(window)=2 + df(windom)=1)//2 = 1
    idf_w = math.log((n + 1) / (1 + 1)) + 1
    b = 1.0 - 1.0 / 6.0
    assert sc["window"].weight == _pt.approx(b * b * idf_w * idf1, rel=1e-12)

    td = search(idx, node, k=10, precision="float64")
    got = dict(zip(td.docids.tolist(), td.scores.tolist()))
    assert set(got) == {0, 1, 2}
    # per-doc duel: sum over matched variants of boost * bm25(tf, dl, df=1)
    stats = CollectionStats(idx.doc_count, idx.sum_total_term_freq)
    def bm25_df1(w, tf, dl):
        s = BM25Scorer(1, stats, boost=w, precision="float64")
        return float(s.score_from_dl(np.array([tf]), np.array([dl]))[0])
    want0 = bm25_df1(1.0 * idf_spark, 1, 2) + bm25_df1(
        b * b * idf_w, 1, 2)
    assert got[0] == _pt.approx(want0, rel=1e-12)
    # ignore_tf -> constant-score OR
    nodec = fuzzy_like_this(idx, "spark windoq", max_edits=1, ignore_tf=True)
    assert nodec[0] == "or" and all(c[0] == "const" for c in nodec[1])
    # nothing survives
    assert fuzzy_like_this(idx, "zzzzzz", max_edits=1) is None


# -------------------------------------- WordDelimiterGraphFilter


def test_word_delimiter_parts_javadoc_examples():
    from lucene_spark.filters import word_delimiter_parts as wdp

    assert wdp("PowerShot")[0] == ["Power", "Shot"]
    assert wdp("500-42")[0] == ["500", "42"]
    assert wdp("wi-fi")[0] == ["wi", "fi"]
    assert wdp("j2se")[0] == ["j", "2", "se"]
    assert wdp("O'Neil's")[0] == ["O", "Neil"]
    assert wdp("NFCCard")[0] == ["NFC", "Card"]       # acronym rule
    assert wdp("SD500")[0] == ["SD", "500"]
    assert wdp("big")[0] == ["big"]
    # flag toggles
    assert wdp("j2se", split_on_numerics=False)[0] == ["j2se"]
    assert wdp("PowerShot", split_on_case_change=False)[0] == ["PowerShot"]
    assert wdp("O'Neil's", stem_english_possessive=False)[0] == [
        "O", "Neil", "s"]
    # part typing: digits are number parts
    assert wdp("SD500")[1] == [True, False]


def test_word_delimiter_graph_positions_and_catenation():
    from lucene_spark.filters import word_delimiter_graph as wdg

    f = wdg()
    toks, poss = f(["Hello", "PowerShot", "world"], [0, 1, 2])
    assert toks == ["Hello", "Power", "Shot", "world"]
    assert poss == [0, 1, 2, 3]  # downstream positions shift
    fc = wdg(catenate_all=True, preserve_original=True)
    toks, poss = fc(["wi-fi-4000"], [0])
    assert set(zip(toks, poss)) == {("wi-fi-4000", 0), ("wi", 0), ("fi", 1),
                                    ("4000", 2), ("wifi4000", 0)}
    fw = wdg(catenate_words=True)
    toks, poss = fw(["wi-fi", "x2000"], [0, 1])
    assert set(zip(toks, poss)) == {("wi", 0), ("fi", 1), ("wifi", 0),
                                    ("x", 2), ("2000", 3)}
    # number-part generation off: parts dropped, catenation still emitted
    fn = wdg(generate_number_parts=False, catenate_numbers=True)
    toks, poss = fn(["500-42"], [0])
    assert ("50042", 0) in set(zip(toks, poss))
    assert "500" not in toks and "42" not in toks


def test_word_delimiter_index_phrase(spark):
    """An index built with the WDGF analyzer matches phrase queries across
    split parts ("PowerShot" answers "power shot") — the filter's canonical
    use (WordDelimiterGraphFilter.java:60 javadoc)."""
    from lucene_spark.analysis import Analyzer
    from lucene_spark.filters import word_delimiter_graph
    from lucene_spark.index import build_index
    from lucene_spark.search import search

    docs = spark.createDataFrame(
        [(0, "the new PowerShot camera shipped"),
         (1, "power shot separated words here"),
         (2, "an unrelated document entirely")],
        "doc_id long, text string")
    an = Analyzer(graph_filters=(word_delimiter_graph(),))
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", stopwords=an, with_positions=True)
    td = search(idx, '"power shot"', k=10)
    assert set(td.docids.tolist()) == {0, 1}
    # offsets entry point refuses graph-filtered analyzers (honest refusal)
    import pytest as _pytest
    from lucene_spark.analysis import analyze_with_offsets
    with _pytest.raises(ValueError, match="graph filters"):
        analyze_with_offsets("PowerShot", an)


# ------------------------- CommonGrams / KeywordMarker / StemmerOverride


def test_common_grams_index_and_query_mode():
    from lucene_spark.filters import common_grams

    f = common_grams({"the"})
    toks, poss = f(["the", "quick", "brown", "fox"], [0, 1, 2, 3])
    assert toks == ["the", "the_quick", "quick", "brown", "fox"]
    assert poss == [0, 0, 1, 2, 3]  # bigram at first word's position
    q = common_grams({"the"}, query_mode=True)
    assert q(["the", "quick", "brown", "fox"], [0, 1, 2, 3])[0] == [
        "the_quick", "brown", "fox"]
    # chained commons: every covered unigram drops, grams overlap
    assert q(["brown", "the", "fox"], [0, 1, 2])[0] == [
        "brown_the", "the_fox"]
    # a position GAP between tokens blocks the gram (non-adjacent)
    assert f(["the", "fox"], [0, 2])[0] == ["the", "fox"]


def test_common_grams_searchable(spark):
    """Index side emits grams; query side (query_mode) finds them — the
    reference pairing (CommonGramsFilter + CommonGramsQueryFilter)."""
    from lucene_spark.analysis import Analyzer
    from lucene_spark.filters import common_grams
    from lucene_spark.index import build_index
    from lucene_spark.search import search

    an = Analyzer(stopwords=frozenset(),
                  stream_filters=(common_grams({"the"}),))
    docs = spark.createDataFrame(
        [(0, "over the lazy dog"), (1, "a lazy afternoon nap")],
        "doc_id long, text string")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", stopwords=an)
    td = search(idx, "the_lazy", k=10)
    assert td.docids.tolist() == [0]
    td2 = search(idx, "lazy", k=10)
    assert set(td2.docids.tolist()) == {0, 1}


def test_keyword_marker_and_stemmer_override():
    from lucene_spark.filters import (keyword_marker, porter_stem,
                                      stemmer_override)

    km = keyword_marker({"meetings"}, porter_stem)
    assert km("meetings") == "meetings"      # protected: bypasses Porter
    assert km("connections") == "connect"
    so = stemmer_override({"mice": "mouse"}, porter_stem)
    assert so("mice") == "mouse"             # dictionary wins
    assert so("caresses") == "caress"        # fallthrough stems
    so2 = stemmer_override({"x": "y"})       # no inner stemmer
    assert so2("x") == "y" and so2("z") == "z"


# ------------------------------- PatternReplace / Phonetic (Soundex)


def test_pattern_replace_token_filter():
    from lucene_spark.filters import pattern_replace

    pr = pattern_replace(r"\d+", "#")
    assert pr("abc123def45") == "abc#def#"
    assert pr("nochange") == "nochange"
    assert pattern_replace(r".*")("drop") is None  # emptied token removed


def test_pattern_replace_char_filter_offsets():
    from lucene_spark.filters import PatternReplaceCharFilter

    cf = PatternReplaceCharFilter(r"\s+", " ")
    out, offs, diffs = cf.filter_with_offsets("a   b    c")
    assert out == "a b c"
    # token spans over the collapsed text map back to raw offsets
    assert cf.correct_offset(2, offs, diffs) == 4   # 'b'
    assert cf.correct_offset(4, offs, diffs) == 9   # 'c'
    assert cf.correct_offset(0, offs, diffs) == 0   # 'a' untouched
    # longer replacement: negative deltas
    cf2 = PatternReplaceCharFilter(r"x", "xxx")
    out2, offs2, diffs2 = cf2.filter_with_offsets("ax b")
    assert out2 == "axxx b"
    assert cf2.correct_offset(5, offs2, diffs2) == 3  # 'b'


def test_pattern_replace_char_filter_in_chain(spark):
    """Offsets compose: highlighting over pattern-replaced analysis points
    at the raw text (the CharFilter.correctOffset contract)."""
    from lucene_spark.analysis import Analyzer, analyze_with_offsets
    from lucene_spark.filters import PatternReplaceCharFilter

    an = Analyzer(char_filters=(PatternReplaceCharFilter(r"-+", " "),))
    raw = "well--known  spark"
    toks, poss, starts, ends = analyze_with_offsets(raw, an)
    assert toks == ["well", "known", "spark"]
    spans = [raw[s:e] for s, e in zip(starts, ends)]
    assert spans[0] == "well" and raw[starts[1]:].startswith("known")
    assert raw[starts[2]:ends[2]] == "spark"


def test_soundex_vectors_and_search(spark):
    from lucene_spark.analysis import Analyzer
    from lucene_spark.filters import phonetic_inject, soundex
    from lucene_spark.index import build_index
    from lucene_spark.search import search

    assert soundex("Robert") == soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"   # h/w collapse rule
    assert soundex("Tymczak") == "T522"    # vowel separation rule
    assert soundex("Lee") == "L000"        # padding
    assert soundex("123") == "123"         # non-alpha passthrough

    an = Analyzer(stopwords=frozenset(),
                  stream_filters=(phonetic_inject(),))
    docs = spark.createDataFrame(
        [(0, "john smith wrote this"), (1, "jane smyth replied today"),
         (2, "someone else entirely")],
        "doc_id long, text string")
    idx = build_index(spark, docs, text_col="text", key_col="doc_id",
                      docid_col="doc_id", stopwords=an)
    # sounds-like: querying the CODE of smith matches both spellings
    td = search(idx, soundex("smith").lower(), k=10)
    assert set(td.docids.tolist()) == {0, 1}
    # exact term still works (inject=true keeps the original)
    td2 = search(idx, "smith", k=10)
    assert td2.docids.tolist() == [0]


def test_fingerprint_and_stream_filters():
    from lucene_spark.analysis import Analyzer
    from lucene_spark.filters import (
        fingerprint_filter,
        keyword_repeat_stem,
        limit_token_count,
        porter_stem,
        reverse_string,
        truncate_filter,
    )

    an = Analyzer(stream_filters=(fingerprint_filter(),))
    # sorted + dedup + single token; stopwords removed first
    assert an.analyze_text("the Quick quick Brown fox")[0] == [
        "brown fox quick"]
    # over the cap -> nothing (FingerprintFilter.java:63-64)
    an2 = Analyzer(stream_filters=(fingerprint_filter(max_output_token_size=5),))
    assert an2.analyze_text("alpha beta")[0] == []
    # separator
    an3 = Analyzer(stream_filters=(fingerprint_filter(separator="_"),))
    assert an3.analyze_text("bb aa")[0] == ["aa_bb"]

    lim = Analyzer(stream_filters=(limit_token_count(2),))
    assert lim.analyze_text("one two three four")[0] == ["one", "two"]

    rev = Analyzer(stopwords=frozenset(), post_filters=(reverse_string,))
    assert rev.analyze_text("abc xyz")[0] == ["cba", "zyx"]

    tr = Analyzer(stopwords=frozenset(), post_filters=(truncate_filter(3),))
    assert tr.analyze_text("abcdef ab")[0] == ["abc", "ab"]

    kr = Analyzer(stream_filters=(keyword_repeat_stem(porter_stem),))
    toks, poss = kr.analyze_text("running fox")
    # original + stem at the same position; unchanged tokens emit once
    assert toks == ["running", "run", "fox"]
    assert poss == [0, 0, 1]


# ------------------------------------------- hyphenated / concat / minhash


def test_hyphenated_words_chains():
    from lucene_spark.filters import hyphenated_words

    # single join, chain of three, pending chain at end-of-stream
    assert hyphenated_words(["multi-", "part"]) == ["multipart"]
    assert hyphenated_words(["a-", "b-", "c", "x"]) == ["abc", "x"]
    assert hyphenated_words(["tail-"]) == ["tail"]
    assert hyphenated_words(["plain", "words"]) == ["plain", "words"]
    # a bare '-' token OPENS a chain with an empty accumulation (the
    # reference has no length guard), so the next token closes it alone
    assert hyphenated_words(["foo", "-", "bar"]) == ["foo", "bar"]
    assert hyphenated_words(["-", "x"]) == ["x"]
    # empty chain left open at end-of-stream emits nothing (the
    # reference's exhausted branch guards hyphenated.length() > 0)
    assert hyphenated_words(["-"]) == []


def test_concatenate_graph():
    from lucene_spark.filters import concatenate_graph

    assert concatenate_graph(["a", "b", "c"]) == ["a b c"]
    assert concatenate_graph(["a", "b"], token_separator=None) == ["ab"]
    assert concatenate_graph([]) == []


def test_minhash_filter_rotation(spark):
    from lucene_spark.textops import minhash_filter

    # 3 tokens -> exactly one 3-shingle -> one non-empty bucket; with
    # rotation every one of the 8 buckets must carry that single hash
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string")
    plain = minhash_filter(docs, n=3, bucket_count=8,
                           with_rotation=False).collect()
    assert len(plain) == 1
    h = plain[0]["minh"]
    rot = minhash_filter(docs, n=3, bucket_count=8,
                         with_rotation=True).collect()
    assert len(rot) == 8
    assert all(r["minh"] == h for r in rot)
    assert sorted(r["bucket"] for r in rot) == list(range(8))


def test_minhash_filter_hash_set_size(spark):
    from lucene_spark.textops import minhash_filter

    docs = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(40)))],
        "doc_id long, text string")
    one = minhash_filter(docs, n=3, bucket_count=4, hash_set_size=1)
    two = minhash_filter(docs, n=3, bucket_count=4, hash_set_size=2)
    p1 = one.toPandas().sort_values(["bucket", "rank"])
    p2 = two.toPandas().sort_values(["bucket", "rank"])
    # rank-0 rows agree; rank-1 rows are strictly larger within the bucket
    m1 = dict(zip(p1["bucket"], p1["minh"]))
    for b, g in p2.groupby("bucket"):
        hs = g.sort_values("rank")["minh"].tolist()
        assert hs[0] == m1[b]
        assert hs == sorted(hs) and len(set(hs)) == len(hs)


def test_delimited_term_frequency():
    from lucene_spark.filters import delimited_term_frequency

    f = delimited_term_frequency()
    toks, poss = f(["cat|3", "dog", "bird|1"], [0, 1, 2])
    assert toks == ["cat", "cat", "cat", "dog", "bird"]
    assert poss == [0, 0, 0, 1, 2]
    import pytest as _pt
    with _pt.raises(ValueError):
        f(["x|0"], [0])
    with _pt.raises(ValueError):
        f(["x|-2"], [0])


def test_delimited_tf_index_roundtrip(spark):
    # custom tf flows into postings tf and field length, like
    # invertState.length += termFrequency
    from lucene_spark.analysis import Analyzer
    from lucene_spark.filters import delimited_term_frequency
    from lucene_spark.index import build_index
    from lucene_spark.tokenizers import whitespace_tokenize
    from pyspark.sql import functions as F

    an = Analyzer(stopwords=frozenset(), tokenizer=whitespace_tokenize,
                  stream_filters=[delimited_term_frequency()])
    docs = spark.createDataFrame(
        [("u1", "cat|5 dog"), ("u2", "cat dog dog")],
        "url string, text string")
    idx = build_index(spark, docs, text_col="text", key_col="url",
                      seg_size=8, stopwords=an)
    td = idx.termdict.orderBy("term").collect()
    assert {r["term"]: (r["df"], r["cf"]) for r in td} == {
        "cat": (2, 6), "dog": (2, 3)}
    assert idx.sum_total_term_freq == 9  # dl 6 + 3


def test_synonym_inject_phrase_positions(spark):
    # stacked synonym shares its head's position: a phrase across the
    # synonym must match exactly like the original term
    from lucene_spark.analysis import Analyzer
    from lucene_spark.filters import synonym_inject
    from lucene_spark.index import build_index
    from lucene_spark.search import search

    an = Analyzer(stopwords=frozenset(),
                  stream_filters=[synonym_inject({"car": ["auto"]})])
    docs = spark.createDataFrame(
        [("u1", "fast car race"), ("u2", "fast boat race")],
        "url string, text string")
    idx = build_index(spark, docs, text_col="text", key_col="url",
                      seg_size=8, with_positions=True, stopwords=an)
    # synonym searchable
    assert search(idx, "auto", k=5, analyzer=an).docids.tolist() == [0]
    # phrase through the stacked position
    assert search(idx, '"fast auto"', k=5, analyzer=an,
                  precision="float64").docids.tolist() == [0]
    # field length includes the stacked token (dl 4 vs 3)
    assert idx.sum_total_term_freq == 7


def test_normalization_filters():
    from lucene_spark.filters import (
        apostrophe, german_normalize, scandinavian_fold,
        scandinavian_normalize,
    )

    # full javadoc equivalence classes collapse to one form
    fold_cls = ["blåbærsyltetøj", "blåbärsyltetöj", "blaabaarsyltetoej",
                "blabarsyltetoj"]
    assert {scandinavian_fold(w) for w in fold_cls} == {"blabarsyltetoj"}
    fold_cls2 = ["räksmörgås", "ræksmørgås", "raeksmoergaas", "raksmorgas"]
    assert {scandinavian_fold(w) for w in fold_cls2} == {"raksmorgas"}
    norm_cls = ["blåbærsyltetøj", "blåbärsyltetöj", "blaabaersyltetoej"]
    assert {scandinavian_normalize(w) for w in norm_cls} == {"blåbærsyltetøj"}
    # German FSM: ue folds only when not after vowel/q; ß doubles
    assert german_normalize("weißbier") == "weissbier"
    assert german_normalize("mueller") == "muller"
    assert german_normalize("quelle") == "quelle"     # q guards ue
    assert german_normalize("frauen") == "frauen"     # vowel guards ue
    assert german_normalize("häuser") == "hauser"
    assert apostrophe("türkiye'nin") == "türkiye"
    assert apostrophe("o’brien") == "o"
    assert apostrophe("none") == "none"


def test_delimited_boost_and_tee_sink():
    # boost/DelimitedBoostTokenFilter.java:33-55 + sinks/TeeSinkTokenFilter
    from lucene_spark.analysis import english_analyzer
    from lucene_spark.filters import TeeSink, delimited_boost

    f = delimited_boost()
    toks, poss = f(["hello|2.0", "world", "x|0.5"], [0, 1, 2])
    assert toks == ["hello", "world", "x"]
    assert poss == [0, 1, 2]
    assert f.collected == {"hello": 2.0, "x": 0.5}

    tee = TeeSink(english_analyzer(), "quick brown foxes")
    s1, s2 = tee.new_sink(), tee.new_sink()
    assert s1 == s2 == (["quick", "brown", "fox"], [0, 1, 2])
    s1[0].append("mutated")
    assert tee.new_sink()[0] == ["quick", "brown", "fox"]
