"""Double Metaphone: the reference's TestDoubleMetaphoneFilter goldens +
published algorithm pairs (Philips 2000)."""

from lucene_spark.metaphone import double_metaphone, double_metaphone_inject


def test_reference_filter_goldens():
    # TestDoubleMetaphoneFilter.java:30-70
    assert double_metaphone_inject(["international"], 4, False) == ["ANTR"]
    assert double_metaphone_inject(["international"], 4, True) == [
        "international", "ANTR"]
    assert double_metaphone_inject(["Kuczewski"], 4, False) == ["KSSK", "KXFS"]
    assert double_metaphone_inject(["international"], 8, False) == ["ANTRNXNL"]
    assert double_metaphone_inject(["12345", "#$%@#^%&"], 8, True) == [
        "12345", "#$%@#^%&"]
    assert double_metaphone_inject(["12345", "#$%@#^%&", "hello"], 8, False) \
        == ["12345", "#$%@#^%&", "HL"]


def test_published_pairs():
    # classic pairs from the published algorithm description
    cases = {
        "smith": ("SM0", "XMT"), "schmidt": ("XMT", "SMT"),
        "snider": ("SNTR", "XNTR"), "schneider": ("XNTR", "SNTR"),
        "jose": ("HS", "HS"), "thomas": ("TMS", "TMS"),
        "ghost": ("KST", "KST"), "caesar": ("SSR", "SSR"),
        "chianti": ("KNT", "KNT"), "michael": ("MKL", "MXL"),
        "school": ("SKL", "SKL"), "philip": ("FLP", "FLP"),
        "wright": ("RT", "RT"), "knight": ("NT", "NT"),
        "edge": ("AJ", "AJ"), "edgar": ("ATKR", "ATKR"),
        "accident": ("AKST", "AKST"), "bacchus": ("PKS", "PKS"),
        "island": ("ALNT", "ALNT"), "sugar": ("XKR", "SKR"),
        "dumb": ("TM", "TM"), "xavier": ("SF", "SFR"),
    }
    for w, want in cases.items():
        assert double_metaphone(w) == want, w


def test_phonetic_match_property():
    # the point of the encoder: spelling variants share a code
    for a, b in [("smith", "schmidt"), ("snider", "schneider"),
                 ("arnow", "arnoff")]:
        ca, cb = double_metaphone(a), double_metaphone(b)
        assert set(ca) & set(cb), (a, b, ca, cb)
