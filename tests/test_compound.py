"""DictionaryCompoundWordTokenFilter golden vectors
(analysis/common/src/test/.../compound/TestCompoundWordTokenFilter.java:
testDumbCompoundWordsSE / testDumbCompoundWordsSELongestMatch)."""

from lucene_spark.analysis import Analyzer
from lucene_spark.filters import dictionary_compound

SE_DICT = ["Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
           "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll",
           "Sko", "Vind", "Rute", "Torkare", "Blad"]


def test_dictionary_compound_se():
    f = dictionary_compound(SE_DICT)
    toks = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba").split()
    t, p = f(toks, list(range(len(toks))))
    assert t == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor",
        "Biltak", "Bil", "tak", "Slagborr", "Slag", "borr",
        "Hammarborr", "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral",
        "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral",
        "makare", "gesäll",
        "Skomakare", "Sko", "makare",
        "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad", "abba",
    ]
    # every subword stacks at its compound's position (posIncrement 0)
    by_tok = dict(zip(t, p))
    assert by_tok["dörr"] == by_tok["Bildörr"] == 0
    assert by_tok["abba"] == 12


def test_dictionary_compound_longest_match():
    d = [w for w in SE_DICT if w != "Fiol"] + ["Fiols", "Fiolsfodral"]
    f = dictionary_compound(d, only_longest_match=True)
    t, _ = f(["Basfiolsfodralmakaregesäll"], [0])
    assert t == ["Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral",
                 "fodral", "makare", "gesäll"]


def test_dictionary_compound_min_word_size():
    # words shorter than minWordSize pass through undecomposed
    f = dictionary_compound(["ab", "ba"], min_word_size=5)
    t, _ = f(["abba"], [0])
    assert t == ["abba"]


def test_compound_through_analyzer():
    an = Analyzer(stream_filters=(dictionary_compound(SE_DICT),))
    toks, pos = an.analyze_text("Slagborr och Bildörr")
    assert toks == ["slagborr", "slag", "borr", "och", "bildörr",
                    "bil", "dörr"]
    assert pos == [0, 0, 0, 1, 2, 2, 2]
