"""Serbian normalization golden vectors (reference tests:
sr/TestSerbianNormalizationFilter.java, sr/TestSerbianNormalizationRegularFilter.java)."""

from lucene_spark.filters import serbian_normalize, serbian_normalize_regular

CYR = "абвгдђежзијклљмнњопрстћуфхцчџш"


def test_serbian_bald_alphabet():
    assert serbian_normalize(CYR) == "abvgddjezzijklljmnnjoprstcufhccdzs"


def test_serbian_regular_alphabet():
    assert serbian_normalize_regular(CYR) == "abvgdđežzijklljmnnjoprstćufhcčdžš"


def test_serbian_bald_latin_folding():
    assert serbian_normalize("đubrište") == "djubriste"
    assert serbian_normalize("čokančićem") == "cokancicem"
    assert serbian_normalize("plain") == "plain"
    assert serbian_normalize("") == ""


def test_serbian_regular_latin_passthrough():
    assert serbian_normalize_regular("đubrište") == "đubrište"
    assert serbian_normalize_regular("") == ""


def test_serbian_snowball_analyzer_goldens():
    # sr/TestSerbianAnalyzer.java: the full SerbianAnalyzer chain —
    # Snowball SerbianStemmer then SerbianNormalizationFilter
    from lucene_spark.sr import serbian_analyzer, serbian_stem

    a = serbian_analyzer()
    for w, want in [("abdiciraće", "abdicirac"),
                    ("decimalnim", "decimaln"),
                    ("đubrište", "djubrist"),
                    ("decimalni", "decimaln")]:
        toks, _ = a.analyze_text(w)
        assert toks == [want], w
    # the Cyrillic form transliterates inside the stemmer
    toks, _ = a.analyze_text("абдицираће")
    assert toks == ["abdicirac"]
    # ije/je prelude runs before dj-folding (the algorithm's order):
    # consonant-je-consonant contracts first, so dj+e never becomes đe
    assert serbian_stem("djevojka") == "devojk"
    assert serbian_stem("đevojka") == "đevojk"
