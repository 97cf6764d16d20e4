"""BM25 float32 golden tests.

Expected values were computed with *Java* float arithmetic: the reference's
own SmallFloat.java compiled as-is plus the exact BM25Similarity.java:104-258
expression sequence (idf double→float cast, float avgdl, float32 cache,
weight - weight/(1 + tf*cache)), printed as Float.floatToIntBits.  Asserting
bit equality proves the numpy float32 reimplementation is bit-faithful.
"""

import math
import struct

import numpy as np
import pytest

from lucene_spark.similarity import BM25Scorer, CollectionStats, combine_scores, idf

# (df, docCount, sumTtf, tf, dl) -> Float.floatToIntBits(score) from Java
GOLDEN = [
    (1, 1, 10, 1, 10, 1040574246),
    (1, 2, 25, 1, 10, 1051701332),
    (5, 100, 5000, 3, 50, 1074072492),
    (50, 100, 5000, 7, 200, 1055123825),
    (1, 1000000, 50000000, 2, 40, 1091442652),
    (999999, 1000000, 50000000, 1, 39, 893984795),
    (3, 7, 133, 4, 23, 1058869670),
    (100, 50000, 2500000, 10, 1999, 1068465588),
    (1, 3, 12, 1, 5, 1053759008),
]

# intToByte4 spot values from the reference SmallFloat (unsigned)
GOLDEN_BYTES = {0: 0, 1: 1, 23: 23, 24: 24, 25: 25, 39: 39, 40: 40, 41: 40,
                100: 57, 255: 70, 1000: 87, 65535: 135, 2**31 - 1: 255}


def bits(f: np.float32) -> int:
    return struct.unpack("<i", struct.pack("<f", float(f)))[0]


@pytest.mark.parametrize("df,n,sttf,tf,dl,expected_bits", GOLDEN)
def test_score_bit_identical_to_java(df, n, sttf, tf, dl, expected_bits):
    scorer = BM25Scorer(df, CollectionStats(n, sttf), precision="lucene")
    s = scorer.score_from_dl(np.array([tf]), np.array([dl]))[0]
    assert bits(np.float32(s)) == expected_bits


def test_intToByte4_spot_values():
    from lucene_spark.smallfloat import int_to_byte4

    for dl, b in GOLDEN_BYTES.items():
        assert int_to_byte4(dl) == b


def test_idf_formula():
    v = idf(5, 100)
    assert v == np.float32(math.log(1 + (100 - 5 + 0.5) / (5 + 0.5)))
    assert v.dtype == np.float32


def test_combine_scores_float32_cast():
    a = np.array([1.5], dtype=np.float32)
    b = np.array([2.25], dtype=np.float32)
    out = combine_scores([a, b], precision="lucene")
    assert out.dtype == np.float32
    assert out[0] == np.float32(3.75)


def test_float64_precision_mode():
    scorer = BM25Scorer(5, CollectionStats(100, 5000), precision="float64")
    s = scorer.score_from_dl(np.array([3]), np.array([50]))[0]
    # plain double BM25 with exact dl (SQL-replicable)
    avgdl = 5000 / 100.0
    w = math.log(1 + (100 - 5 + 0.5) / (5 + 0.5))
    inv = 1.0 / (1.2 * ((1 - 0.75) + 0.75 * 50 / avgdl))
    assert s == w - w / (1.0 + 3 * inv)


def test_score_monotonic_in_tf_and_dl():
    scorer = BM25Scorer(10, CollectionStats(1000, 100000), precision="lucene")
    tfs = np.arange(1, 50)
    s = scorer.score_from_dl(tfs, np.full(len(tfs), 100))
    assert (np.diff(s) >= 0).all()
    dls = np.arange(5, 500)
    s2 = scorer.score_from_dl(np.full(len(dls), 3), dls)
    assert (np.diff(s2) <= 0).all()
