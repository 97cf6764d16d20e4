"""Phonetic encoder goldens: every reference TestPhoneticFilter /
TestDaitchMokotoffSoundexFilter vector plus published algorithm
examples."""

from lucene_spark.phonetic import (caverphone2, cologne_phonetic,
                                   daitch_mokotoff, metaphone, nysiis,
                                   phonetic_inject)


def test_metaphone_reference_goldens():
    # TestPhoneticFilter.java:39-44
    assert [metaphone(w) for w in "aaa bbb ccc easgasg".split()] == \
        ["A", "B", "KKK", "ESKS"]
    # initial-pair exceptions (Philips 1990): KN- drops K, X- becomes S
    assert metaphone("Knight") == "NT"
    assert metaphone("Xavier") == "SFR"
    assert metaphone("WHale")[0] == "W"


def test_caverphone2_reference_goldens():
    # TestPhoneticFilter.java:77-95
    assert [caverphone2(w) for w in "Darda Karleen Datha Carlene".split()] \
        == ["TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111"]
    # Hood 2004 published examples
    assert caverphone2("Peter") == "PTA1111111"
    assert caverphone2("Stevenson") == "STFNSN1111"
    # Hood 2004: Darda/Datha and Karleen/Carlene collide (asserted above)
    assert caverphone2("") == "1111111111"


def test_nysiis_reference_goldens():
    # TestPhoneticFilter.java:97-102
    assert [nysiis(w) for w in "aaa bbb ccc easgasg".split()] == \
        ["A", "B", "C", "EASGAS"]
    # the strict key is capped at 6
    assert all(len(nysiis(w)) <= 6
               for w in ("washington", "mcdonald", "knuth"))
    assert nysiis("KNIGHT") == "NAGT"  # KN -> NN transcode
    assert nysiis("SCHMIDT") == "SNAD"  # SCH -> SSS, duplicates collapse


def test_cologne_published_examples():
    # Postel 1969 worked examples
    assert cologne_phonetic("Müller-Lüdenscheidt") == "65752682"
    assert cologne_phonetic("Breschnew") == "17863"
    assert cologne_phonetic("Wikipedia") == "3412"
    # phonetically equal German pairs
    assert cologne_phonetic("Meyer") == cologne_phonetic("Maier")


def test_daitch_mokotoff_reference_goldens():
    # TestDaitchMokotoffSoundexFilter.java:32-44 — incl. the 6-way branch
    assert daitch_mokotoff("aaa") == ["000000"]
    assert daitch_mokotoff("bbb") == ["700000"]
    assert daitch_mokotoff("ccc") == ["400000", "450000", "454000",
                                      "500000", "540000", "545000"]
    assert daitch_mokotoff("easgasg") == ["045450"]
    # published D-M examples: Moskowitz/Moskovitz both 645740, Mintz 664000
    assert daitch_mokotoff("Moskowitz") == ["645740"]
    assert daitch_mokotoff("Moskovitz") == ["645740"]
    assert daitch_mokotoff("Mintz") == ["664000"]


def test_phonetic_inject_stream_semantics():
    # PhoneticFilter inject=true keeps originals after the codes
    toks = "aaa bbb ccc easgasg".split()
    assert phonetic_inject(toks, metaphone, inject=True) == \
        ["A", "aaa", "B", "bbb", "KKK", "ccc", "ESKS", "easgasg"]
    assert phonetic_inject(toks, metaphone, inject=False) == \
        ["A", "B", "KKK", "ESKS"]
    # DaitchMokotoffSoundexFilter emits every branch
    assert phonetic_inject(["ccc"], daitch_mokotoff, inject=False) == \
        ["400000", "450000", "454000", "500000", "540000", "545000"]
    assert phonetic_inject(["aaa"], daitch_mokotoff, inject=True) == \
        ["000000", "aaa"]
