"""Lucene SmallFloat norm encoding, reimplemented for numpy.

Reproduces the exact integer quantization Lucene applies to field lengths
before BM25 scoring (reference: lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:103-167 — longToInt4 / int4ToLong / intToByte4 / byte4ToInt).

Values 0..23 are encoded exactly (NUM_FREE_VALUES = 255 - longToInt4(2^31-1)
= 255 - 231 = 24); larger values keep 4 significant bits.  The decoded table
(LENGTH_TABLE, 256 entries) is what BM25Similarity uses for its per-norm
cache (reference: search/similarities/BM25Similarity.java:127-135).
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """Order-preserving 4-significant-bit encoding for non-negative ints.

    Mirrors SmallFloat.longToInt4 (SmallFloat.java:103-122).
    """
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    """Inverse of :func:`long_to_int4` (SmallFloat.java:124-138)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)  # == 231
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Encode a field length into one unsigned byte (SmallFloat.java:146-156).

    Returns the *unsigned* value 0..255 (Java returns a signed byte; BM25
    masks it back with ``& 0xFF`` so unsigned is the useful representation).
    """
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return (NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)) & 0xFF


def byte4_to_int(b: int) -> int:
    """Decode :func:`int_to_byte4` (SmallFloat.java:158-166). b is 0..255."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# 256-entry decode table, float32 — BM25Similarity.LENGTH_TABLE.
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.float32)

# Encode table for lengths 0..2^31-1 via searchsorted on bucket boundaries:
# boundary[k] = smallest length encoded as byte k.
_BOUNDARIES = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)


def int_to_byte4_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array → uint8 array.

    byte4_to_int is strictly increasing, and int_to_byte4 rounds *down* to
    the nearest representable value (truncation of low bits), so encoding is
    searchsorted(right)-1 over the decode table.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    if (lengths < 0).any():
        raise ValueError("Only supports positive values")
    return (np.searchsorted(_BOUNDARIES, lengths, side="right") - 1).astype(np.uint8)
