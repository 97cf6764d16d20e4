"""SmallFloat golden + property tests (reference: util/SmallFloat.java,
test model: core/src/test/.../util/TestSmallFloat.java)."""

import numpy as np
import pytest

from lucene_spark.smallfloat import (
    LENGTH_TABLE,
    MAX_INT4,
    NUM_FREE_VALUES,
    byte4_to_int,
    int4_to_long,
    int_to_byte4,
    int_to_byte4_np,
    long_to_int4,
)


def test_constants():
    # longToInt4(Integer.MAX_VALUE) == 231 → 24 free values (SmallFloat.java:140-143)
    assert MAX_INT4 == 231
    assert NUM_FREE_VALUES == 24


def test_small_values_exact():
    for i in range(24):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


@pytest.mark.parametrize("i", [24, 25, 39, 40, 41, 100, 255, 1000, 65535, 2**31 - 1])
def test_roundtrip_is_floor(i):
    b = int_to_byte4(i)
    dec = byte4_to_int(b)
    assert dec <= i
    # next representable value is > i
    if b < 255:
        assert byte4_to_int(b + 1) > i


def test_long_int4_roundtrip():
    for v in [0, 1, 7, 8, 15, 16, 17, 100, 2**20, 2**31 - 1]:
        enc = long_to_int4(v)
        dec = int4_to_long(enc)
        assert dec <= v
        assert int4_to_long(enc + 1) > v or enc == long_to_int4(2**62)


def test_monotone():
    prev = -1
    for b in range(256):
        v = byte4_to_int(b)
        assert v > prev
        prev = v


def test_vectorized_matches_scalar():
    vals = np.concatenate(
        [np.arange(0, 5000), np.array([2**20, 2**25, 2**31 - 1])]
    )
    enc = int_to_byte4_np(vals)
    for v, e in zip(vals.tolist(), enc.tolist()):
        assert e == int_to_byte4(v), v


def test_length_table_float32():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[0] == 0.0
    assert LENGTH_TABLE[39] == byte4_to_int(39)
