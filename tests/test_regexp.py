"""Lucene-RegExp automaton engine parity tests.

Behavioral goldens come from the reference suites (not copied code):
  - lucene/core/src/test/org/apache/lucene/search/TestRegexpQuery.java
    (:52-147 — the single-doc term fixture and every count assertion)
  - lucene/core/src/test/org/apache/lucene/util/automaton/TestRegExp.java
    (:28-34 smoke, :115-126 char-class errors)
plus property fuzz: equivalence with Python ``re`` on the shared syntax
subset, boolean-algebra identities for the automaton-only operators, and
brute-force value checks for <n-m> decimal intervals.
"""
import itertools
import random
import re

import numpy as np
import pytest

from lucene_spark.regexp import (
    ALL,
    ASCII_CASE_INSENSITIVE,
    LuceneRegexp,
)

# the TestRegexpQuery fixture doc's terms (whitespace-tokenized, as the
# reference's newTextField does for this content)
TERMS = ("the quick brown fox jumps over the lazy ??? dog 493432 49344 "
         "[foo] 12.3 \\").split(" ")


def nhits(pat, **kw):
    return int(LuceneRegexp(pat, **kw).match_batch(TERMS).any())


class TestReferenceGoldens:
    def test_smoke(self):
        # TestRegExp.java:28-34
        r = LuceneRegexp("a(b+|c+)d")
        assert r.matches("abbbbbd")
        assert r.matches("acd")
        assert not r.matches("ad")

    def test_regex_1_2_3(self):
        assert nhits("q.[aeiou]c.*") == 1
        assert nhits(".[aeiou]c.*") == 0
        assert nhits("q.[aeiou]c") == 0

    def test_numeric_range(self):
        assert nhits("<420000-600000>") == 1
        assert nhits("<493433-600000>") == 0

    def test_character_classes(self):
        # TestRegexpQuery.testCharacterClasses, every assertion
        assert nhits(r"\d") == 0
        assert nhits(r"\d*") == 1
        assert nhits(r"\d{6}") == 1
        assert nhits(r"[a\d]{6}") == 1
        assert nhits(r"\d{2,7}") == 1
        assert nhits(r"\d{4}") == 0
        assert nhits(r"\dog") == 0
        assert nhits(r"493\d32") == 1
        assert nhits(r"\wox") == 1
        assert nhits(r"493\w32") == 1
        assert nhits(r"\?\?\?") == 1
        assert nhits(r"\?\W\?") == 1
        assert nhits(r"\?\S\?") == 1
        assert nhits(r"\[foo\]") == 1
        assert nhits(r"\[\w{3}\]") == 1
        assert nhits(r"\s.*") == 0
        assert nhits(r"\S*ck") == 1
        assert nhits(r"[\d\.]{3,10}") == 1
        assert nhits(r"\d{1,3}(\.(\d{1,2}))+") == 1
        assert nhits("\\\\") == 1
        assert nhits("\\\\.*") == 1

    def test_invalid_backslash_class_rejected(self):
        with pytest.raises(ValueError, match="invalid character class"):
            LuceneRegexp(r"\p")

    def test_case_insensitive(self):
        assert nhits("Quick") == 0
        assert nhits("Quick", match_flags=ASCII_CASE_INSENSITIVE) == 1

    def test_complement(self):
        # testRegexComplement: ~ binds to the next element
        assert nhits("4934~[3]") == 1
        assert nhits("~#") == 1  # complement of the empty language = all

    def test_boost_like_empty_block(self):
        # TestRegExp.testRepeatWithEmptyLanguage / testRepeatWithEmptyString
        for pat in ["#*", "#+", "#{2,10}", "#?", "()+", "()*"]:
            LuceneRegexp(pat)  # builds without blowing up
        assert LuceneRegexp("#*").matches("")
        assert not LuceneRegexp("#+").matches("")
        assert LuceneRegexp("a#?b").matches("ab")


class TestIntervalSemantics:
    def test_leading_zeros_when_lengths_differ(self):
        r = LuceneRegexp("<2-99>")
        for ok in ["2", "27", "99", "05", "007", "099"]:
            assert r.matches(ok), ok
        for no in ["1", "0", "100", "999", "", "x7"]:
            assert not r.matches(no), no

    def test_fixed_digits_when_lengths_equal(self):
        r = LuceneRegexp("<7-7>")
        assert r.matches("7") and not r.matches("07")
        r = LuceneRegexp("<01-10>")
        assert r.matches("01") and r.matches("10") and r.matches("05")
        assert not r.matches("5") and not r.matches("11")
        assert not r.matches("005")

    def test_reversed_interval_swaps(self):
        # parseSimpleExp:1352 swaps, it does not reject
        r = LuceneRegexp("<9-1>")
        assert r.matches("5") and not r.matches("0")

    def test_interval_brute_force(self):
        rng = random.Random(7)
        for _ in range(40):
            a, b = rng.randint(0, 300), rng.randint(0, 300)
            lo, hi = min(a, b), max(a, b)
            smin, smax = str(lo), str(hi)
            r = LuceneRegexp(f"<{smin}-{smax}>")
            digits = len(smin) if len(smin) == len(smax) else 0
            probes = [str(v) for v in range(0, 320, 3)]
            probes += ["0" + str(v) for v in range(0, 320, 17)]
            got = r.match_batch(probes)
            for t, g in zip(probes, got):
                v = int(t)
                if digits > 0:
                    want = lo <= v <= hi and len(t) == digits
                else:
                    want = lo <= v <= hi
                assert bool(g) == want, (smin, smax, t)


class TestOperatorAlgebra:
    STRINGS = [""] + ["".join(t) for L in range(1, 5)
                      for t in itertools.product("abc", repeat=L)]

    @staticmethod
    def _gen(rng, depth):
        r = rng.random()
        if depth == 0:
            c = rng.random()
            if c < .5:
                return rng.choice("abc")
            if c < .65:
                return "."
            if c < .8:
                return "[" + "".join(sorted(set(rng.choices("abc", k=2)))) + "]"
            return "[^" + rng.choice("abc") + "]"
        a = TestOperatorAlgebra._gen(rng, depth - 1)
        b = TestOperatorAlgebra._gen(rng, depth - 1)
        if r < .25:
            return "(" + a + "|" + b + ")"
        if r < .5:
            return a + b
        if r < .65:
            return "(" + a + ")*"
        if r < .8:
            return "(" + a + ")?"
        if r < .9:
            return "(" + a + ")+"
        n = rng.randint(0, 2)
        return "(" + a + "){" + str(n) + "," + str(n + rng.randint(0, 2)) + "}"

    def test_python_re_equivalence_on_shared_subset(self):
        rng = random.Random(42)
        for _ in range(120):
            pat = self._gen(rng, rng.randint(1, 3))
            rx = LuceneRegexp(pat)
            pyre = re.compile("(?:" + pat + ")", re.S)
            got = rx.match_batch(self.STRINGS)
            want = np.array(
                [pyre.fullmatch(s) is not None for s in self.STRINGS])
            assert (got == want).all(), pat

    def test_complement_and_intersection_identities(self):
        rng = random.Random(1337)
        for _ in range(60):
            pat = self._gen(rng, rng.randint(1, 3))
            a = LuceneRegexp(pat).match_batch(self.STRINGS)
            nota = LuceneRegexp(f"~({pat})").match_batch(self.STRINGS)
            dbl = LuceneRegexp(f"~(~({pat}))").match_batch(self.STRINGS)
            self_and = LuceneRegexp(f"({pat})&({pat})").match_batch(
                self.STRINGS)
            assert (a ^ nota).all(), pat           # L ∪ ~L = Σ*, disjoint
            assert (a == dbl).all(), pat           # ~~L = L
            assert (a == self_and).all(), pat      # L ∩ L = L
        # De Morgan on two random languages
        for _ in range(30):
            p1 = self._gen(rng, 2)
            p2 = self._gen(rng, 2)
            lhs = LuceneRegexp(f"~(({p1})|({p2}))").match_batch(self.STRINGS)
            rhs = LuceneRegexp(f"~({p1})&~({p2})").match_batch(self.STRINGS)
            assert (lhs == rhs).all(), (p1, p2)


class TestRewriteHelpers:
    def test_finite_language_enumeration(self):
        assert LuceneRegexp("ab(c|d)e").finite_strings() == ["abce", "abde"]
        assert LuceneRegexp("foo").finite_strings() == ["foo"]
        assert LuceneRegexp("a{1,3}").finite_strings() == ["a", "aa", "aaa"]
        assert LuceneRegexp("test.*").finite_strings() is None
        assert LuceneRegexp("#").finite_strings() == []
        # wide classes refuse enumeration instead of exploding
        assert LuceneRegexp(".").finite_strings(limit=64) is None

    def test_prefix_and_length_bounds(self):
        rx = LuceneRegexp("test.*ing")
        assert rx.common_prefix() == "test"
        assert rx.min_len() == 7
        assert rx.max_len() is None
        assert LuceneRegexp("test.{1,3}").max_len() == 7
        assert LuceneRegexp("(ab|ac)x").common_prefix() == "a"

    def test_java_regex_fast_path(self):
        # faithful rendering for the shared subset, refusal otherwise
        for pat in ["te.t", "a(b|c)*d", "x?y+z", "[a-c]{1,3}", "q.[aeiou]c.*"]:
            jr = LuceneRegexp(pat).java_regex()
            assert jr is not None and jr.startswith("(?s)^(?:")
        for pat in ["a&b", "~a", "<1-10>", "#", "a~b", "x<2-99>"]:
            assert LuceneRegexp(pat).java_regex() is None, pat

    def test_quoted_string_and_empty_group(self):
        # "..." quotes operators verbatim; () is the empty string
        assert LuceneRegexp('"a|b"').matches("a|b")
        assert not LuceneRegexp('"a|b"').matches("a")
        assert LuceneRegexp("a()b").matches("ab")
        assert LuceneRegexp("()").matches("")

    def test_named_automaton_rejected_like_default_provider(self):
        with pytest.raises(ValueError, match="not found"):
            LuceneRegexp("<myauto>")

    def test_end_of_string_expected(self):
        with pytest.raises(ValueError, match="end-of-string|expected"):
            LuceneRegexp("a)b")

    def test_match_batch_handles_none_and_empty(self):
        rx = LuceneRegexp("a*")
        got = rx.match_batch(["", "a", None, "b", "aaa"])
        assert got.tolist() == [True, True, False, False, True]

    def test_unicode_terms(self):
        rx = LuceneRegexp("日本.*")
        assert rx.matches("日本語")
        assert not rx.matches("日语")
        assert LuceneRegexp("[あ-ん]+").matches("かな")


class TestSuffixPushdown:
    def test_common_suffix(self):
        assert LuceneRegexp(".*ing").common_suffix() == "ing"
        assert LuceneRegexp("(test|blest)ing").common_suffix() == "esting"
        assert LuceneRegexp("test.*").common_suffix() == ""
        assert LuceneRegexp("a.*b|c.*b").common_suffix() == "b"
        assert LuceneRegexp(r"\w*tion").common_suffix() == "tion"
        assert LuceneRegexp("#").common_suffix() == ""
        assert LuceneRegexp("abc").common_suffix() == "abc"

    def test_suffix_pattern_prunes_via_reversed_sidecar(self, spark, tmp_path):
        # '.*ing' has no common prefix; the reversed-term sidecar turns the
        # common SUFFIX into a StringStartsWith(rterm) pushdown, like the
        # leading-wildcard LIKE fast path
        from lucene_spark.index import build_index, write_index, read_index
        from lucene_spark.search import expand_terms

        pages = spark.createDataFrame(
            [("u1", "testing racing raced tester ring contest")],
            "url string, text string")
        idx = build_index(spark, pages)
        assert expand_terms(idx, rlike=".*ing") == [
            "racing", "ring", "testing"]
        # against a written index the prefilter must reach the parquet scan
        out = str(tmp_path / "idx")
        write_index(idx, out)
        ridx = read_index(spark, out)
        if ridx.rterms is not None:
            plan = ridx.rterms.filter(
                ridx.rterms["rterm"].startswith("gni"))._jdf.queryExecution(
                ).executedPlan().toString()
            assert "StringStartsWith(rterm" in plan
            assert expand_terms(ridx, rlike=".*ing") == [
                "racing", "ring", "testing"]
