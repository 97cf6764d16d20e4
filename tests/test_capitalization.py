"""CapitalizationFilter + KeepWordFilter golden vectors
(miscellaneous/TestCapitalizationFilter.java:38-190,
miscellaneous/TestKeepWordFilter.java)."""

from lucene_spark.filters import capitalization, keep_word

KEEP = {"and", "the", "it", "BIG"}


def test_capitalization_single_words():
    cap = capitalization(keep=KEEP)
    assert cap("kiTTEN") == "Kitten"
    assert cap("and") == "And"        # keep word, forceFirstLetter at word 0
    assert cap("AnD") == "And"        # case-sensitive keep: not kept
    assert cap("big") == "Big"
    assert cap("BIG") == "BIG"        # kept verbatim (first already upper)
    assert capitalization(keep=KEEP, force_first_letter=False)("AnD") == "And"


def test_capitalization_keyword_mode():
    cap = capitalization(only_first_word=True, keep=KEEP)
    assert cap("Hello thEre my Name is Ryan") == "Hello there my name is ryan"
    each = capitalization(only_first_word=False, keep=KEEP)
    assert each("Hello thEre my Name is Ryan") == "Hello There My Name Is Ryan"
    assert each("the The the") == "The The the"


def test_capitalization_min_length_and_prefix():
    m3 = capitalization(only_first_word=False, keep=KEEP, min_word_length=3)
    assert m3("Hello thEre my Name is Ryan") == "Hello There my Name is Ryan"
    assert capitalization(keep=KEEP)("McKinley") == "Mckinley"
    assert capitalization(keep=KEEP,
                          ok_prefix=("McK",))("McKinley") == "McKinley"


def test_capitalization_numbers_and_word_count():
    each = capitalization(only_first_word=False, keep=KEEP,
                          force_first_letter=False)
    assert each("1st 2nd third") == "1st 2nd Third"
    # maxWordCount exceeded restores the original token
    two = capitalization(only_first_word=False, max_word_count=2)
    assert two("1st 2nd third") == "1st 2nd third"


def test_keep_word():
    kw = keep_word(["aaa", "bbb"])
    assert kw("aaa") == "aaa"
    assert kw("xxx") is None
    kwl = keep_word(["aaa", "BBB"], lowercase_match=True)
    assert kwl("AAA") == "AAA"
    assert kwl("bbb") == "bbb"
    assert kwl("ccc") is None
