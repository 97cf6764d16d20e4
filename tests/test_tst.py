"""TSTLookup port — hand-traced traversal-order vectors against
suggest/tst TSTAutocomplete.java + property checks."""

import random

from lucene_spark.tst import TSTLookup


def test_hand_traced_traversal_order():
    # balanced build of aa/ab/ac: node 'b' holds "ab", lo="aa", hi="ac";
    # the stack pops HI first -> ab, ac, aa (NOT sorted order)
    t = TSTLookup([("ab", 2), ("aa", 1), ("ac", 3)])
    assert t.lookup("a", 10) == [("ab", 2), ("ac", 3), ("aa", 1)]
    # chain case: a/ab/abc emits in prefix-walk order
    t = TSTLookup([("a", 1), ("ab", 2), ("abc", 3), ("b", 4)])
    assert t.lookup("a", 10) == [("a", 1), ("ab", 2), ("abc", 3)]
    assert t.lookup("b", 10) == [("b", 4)]
    # first-num cut follows the traversal, not weights
    t = TSTLookup([("ab", 2), ("aa", 9), ("ac", 3)])
    assert t.lookup("a", 2) == [("ab", 2), ("ac", 3)]


def test_only_more_popular():
    t = TSTLookup([("ab", 2), ("aa", 9), ("ac", 3), ("ad", 7)])
    assert t.lookup("a", 2, only_more_popular=True) == [("aa", 9), ("ad", 7)]
    assert t.lookup("a", 10, only_more_popular=True) == [
        ("aa", 9), ("ad", 7), ("ac", 3), ("ab", 2)]


def test_miss_and_exact():
    t = TSTLookup([("alpha", 1), ("beta", 2)])
    assert t.lookup("gamma", 5) == []
    assert t.lookup("alpha", 5) == [("alpha", 1)]


def test_utf16_sort_order_build():
    # U+FF00 (halfwidth form) sorts AFTER U+10000 in UTF-8 byte order but
    # BEFORE it in UTF-16 code-unit order? No: U+10000 encodes as the
    # surrogate pair D800 DC00, and 0xD800 < 0xFF00 — so the supplementary
    # char sorts FIRST under UTF-16, the reverse of UTF-8 bytes
    hi_bmp = "＀"
    astral = "\U00010000"
    assert hi_bmp.encode("utf-8") < astral.encode("utf-8")
    t = TSTLookup([(hi_bmp, 1), (astral, 2), ("z", 3)])
    # both still retrievable; the build just must not crash on astral keys
    assert t.lookup(hi_bmp, 5) == [(hi_bmp, 1)]
    assert t.lookup("z", 5) == [("z", 3)]


def test_completion_set_matches_prefix_filter_fuzz():
    rng = random.Random(5)
    for _ in range(100):
        keys = {"".join(rng.choice("abcd") for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(1, 30))}
        entries = [(k, rng.randint(0, 9)) for k in sorted(keys)]
        t = TSTLookup(entries)
        for pre in ("a", "ab", "c", "dd"):
            got = {k for k, _ in t.lookup(pre, 1000)}
            exp = {k for k, _ in entries if k.startswith(pre)}
            assert got == exp, (entries, pre)
        # popular mode returns weight-desc
        vals = [v for _, v in t.lookup("a", 1000, only_more_popular=True)]
        assert vals == sorted(vals, reverse=True)


def test_jaspell_sorted_order_and_case_folding():
    from lucene_spark.tst import JaspellLookup

    j = JaspellLookup([("ab", 2), ("aa", 1), ("ac", 3), ("b", 9)])
    # sorted (in-order) completion order, unlike TSTLookup's stack order
    assert j.lookup("a", 10) == [("aa", 1), ("ab", 2), ("ac", 3)]
    assert j.lookup("a", 2) == [("aa", 1), ("ab", 2)]
    # case-insensitive paths: keys canonicalize to the FIRST-SEEN casing
    # of every SHARED path char — "apric" forked off Apple's tree at 'r',
    # so its reconstructed key starts with Apple's 'A' ("Apric"); getKey
    # rebuilds from stored splitchars (JaspellTernarySearchTrie.getKey)
    j = JaspellLookup([("Apple", 5), ("apric", 3)])
    assert j.lookup("APP", 10) == [("Apple", 5)]
    assert j.lookup("a", 10) == [("Apple", 5), ("Apric", 3)]
    # a later same-path key inherits the stored casing of shared chars
    j = JaspellLookup([("AB", 1), ("abc", 2)])
    assert j.lookup("ab", 10) == [("AB", 1), ("ABc", 2)]


def test_jaspell_popular_window():
    from lucene_spark.tst import JaspellLookup

    # onlyMorePopular heaps only the first 2*num SORTED completions:
    # with num=1 the window is [aa, ab] — the heavier 'az' is never seen
    j = JaspellLookup([("aa", 1), ("ab", 5), ("az", 99)])
    assert j.lookup("a", 1, only_more_popular=True) == [("ab", 5)]
    assert j.lookup("a", 3, only_more_popular=True) == [
        ("az", 99), ("ab", 5), ("aa", 1)]
