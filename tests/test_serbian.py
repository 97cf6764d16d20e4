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
