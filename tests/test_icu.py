"""ICU folding/normalization subset — every golden vector from the
reference's TestICUFoldingFilter.testDefaults and
TestICUNormalizer2Filter.testDefaults (analysis/icu/src/test/.../icu/)."""

from lucene_spark.icu import icu_fold, icu_normalize


def test_icu_folding_reference_vectors():
    # TestICUFoldingFilter.java:49-88
    vectors = [
        ("This", "this"), ("is", "is"), ("a", "a"), ("test", "test"),
        ("Ruß", "russ"),
        ("ΜΆΪΟΣ", "μαιοσ"), ("Μάϊος", "μαιοσ"),
        ("\U00010416", "\U0001043e"),          # supplementary case folding
        ("ﴳﴺﰧ", "طمطمطم"),      # NFKC of presentation forms
        ("क्‍ष", "कष"),              # default ignorable + virama
        ("résumé", "resume"),
        ("résumé", "resume"),
        ("৭০৬", "706"),                        # native digits
        ("đis", "dis"), ("cræzy", "craezy"),   # stroke + multigraph
        ("ELİF", "elif"),                      # Turkish dotted capital I
        ("eli̇f", "elif"),
        ("", ""),                              # testEmptyTerm
    ]
    for src, want in vectors:
        assert icu_fold(src) == want, (src, want, icu_fold(src))


def test_icu_fold_idempotent():
    for s in ["Ruß", "ΜΆΪΟΣ", "cræzy", "ELİF", "৭০৬", "क्‍ष"]:
        once = icu_fold(s)
        assert icu_fold(once) == once


def test_icu_normalizer2_reference_vectors():
    # TestICUNormalizer2Filter.java:49-67 (nfkc_cf: accents KEPT,
    # default ignorables removed, virama kept)
    vectors = [
        ("This", "this"), ("Ruß", "russ"),
        ("ΜΆΪΟΣ", "μάϊοσ"), ("Μάϊος", "μάϊοσ"),
        ("\U00010416", "\U0001043e"),
        ("ﴳﴺﰧ", "طمطمطم"),
        ("क्‍ष", "क्ष"),
    ]
    for src, want in vectors:
        assert icu_normalize(src) == want, (src, want, icu_normalize(src))


def test_icu_fold_space_and_dash_folding():
    assert icu_fold("a b") == "a b"      # no-break space
    assert icu_fold("a—b") == "a-b"      # em dash
    assert icu_fold("a‑b") == "a-b"      # non-breaking hyphen


def test_collation_key_levels():
    # ICUCollationKeyAnalyzer contract (untailored root order): primary
    # ignores case+accents, secondary breaks accent ties, tertiary case
    from lucene_spark.icu import collation_key

    prim = lambda t: collation_key(t).split(b"\x01")[0]
    assert prim("résumé") == prim("RESUME") == prim("resume")
    # level separators sort below text: 'resume…' < 'resumes'
    order = sorted(["resumes", "résumé", "RESUME", "resume"],
                   key=collation_key)
    assert order == ["resume", "RESUME", "résumé", "resumes"]
    # range semantics: accented term falls inside the unaccented range
    lo, hi = collation_key("coast"), collation_key("couch")
    assert lo < collation_key("côte") < hi
    assert collation_key("") == b"\x01\x02"


def test_collation_key_udf_orderby(spark):
    from pyspark.sql import functions as F

    from lucene_spark.icu import collation_key_udf

    df = spark.createDataFrame(
        [("résumé",), ("resumes",), ("RESUME",), ("resume",)], "w string")
    got = [r.w for r in
           df.orderBy(collation_key_udf()(F.col("w"))).collect()]
    assert got == ["resume", "RESUME", "résumé", "resumes"]


def test_icu_tokenize_script_composite():
    from lucene_spark.icu import icu_tokenize

    # Thai: dictionary segmentation; Lao/Myanmar/Khmer: one token per run;
    # the rest: UAX#29
    assert icu_tokenize("Hello การที่ได้ world") == \
        ["Hello", "การ", "ที่", "ได้", "world"]
    assert icu_tokenize("ພາສາລາວ text") == ["ພາສາລາວ", "text"]
    assert icu_tokenize("မြန်မာ and ខ្មែរ") == ["မြန်မာ", "and", "ខ្មែរ"]
    assert icu_tokenize("") == []
