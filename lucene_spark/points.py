"""Sandbox numeric point types — BigIntegerPoint and HalfFloatPoint.

Reference: lucene/sandbox
- BigIntegerPoint.java:36-90: 128-bit signed integer point field with
  exact range queries.  Spark analog: DECIMAL(38,0) columns (~126 bits,
  covering +-(10^38-1) — the documented subset; the two missing high
  bits would need a two-column encoding) with plain Catalyst range
  predicates, fully sargable.
- sandbox/document/HalfFloatPoint.java:35-190: fp16 point field —
  halfFloatToShortBits (:114-155) is IEEE-754 binary16 conversion with
  round-to-nearest-even (roundShift, :158-164), which is EXACTLY
  numpy's float16 cast; nextUp/nextDown (:67-99) step one representable
  half-float in sortable-short space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIG_INTEGER_MAX = 10**38 - 1  # DECIMAL(38,0) bound (vs the reference's 2^127-1)


def big_integer_range_query(
    docs: DataFrame, col: str, lo, hi, id_col: str = "doc_id"
) -> DataFrame:
    """BigIntegerPoint.newRangeQuery analog (BigIntegerPoint.java:36-90):
    inclusive 128-bit-class integer range over a DECIMAL(38,0) column —
    one sargable Catalyst predicate, parquet min/max pruned."""
    lo_c = F.lit(str(lo)).cast("decimal(38,0)")
    hi_c = F.lit(str(hi)).cast("decimal(38,0)")
    c = F.col(col).cast("decimal(38,0)")
    return docs.filter((c >= lo_c) & (c <= hi_c)).select(id_col)


def half_float_quantize(v: float) -> float:
    """float -> nearest representable half-float (round-to-even), the
    value HalfFloatPoint indexes (halfFloatToShortBits + back)."""
    return float(np.float16(v))


def half_float_next_up(v: float) -> float:
    """HalfFloatPoint.nextUp (:67-79): next representable half-float."""
    h = np.float16(v)
    return float(np.nextafter(h, np.float16(np.inf)))


def half_float_next_down(v: float) -> float:
    """HalfFloatPoint.nextDown (:86-99)."""
    h = np.float16(v)
    return float(np.nextafter(h, np.float16(-np.inf)))


def half_float_range_query(
    docs: DataFrame, col: str, lo: float, hi: float, id_col: str = "doc_id"
) -> DataFrame:
    """HalfFloatPoint.newRangeQuery analog: match docs whose QUANTIZED
    (fp16 round-to-even) value lies in [lo, hi] — the indexed value is
    the half-float, exactly as the reference stores shortBits.  The
    quantization runs as one Arrow-batched numpy float16 cast."""
    @F.pandas_udf("double")
    def q16(v: pd.Series) -> pd.Series:
        return pd.Series(
            v.to_numpy(dtype=np.float64).astype(np.float16).astype(np.float64))

    qv = q16(F.col(col).cast("double"))
    return docs.filter(
        (qv >= F.lit(float(lo))) & (qv <= F.lit(float(hi)))
    ).select(id_col)


def point_in_set_query(docs: DataFrame, col: str, values,
                       id_col: str = "doc_id") -> DataFrame:
    """PointInSetQuery analog (core/search/PointInSetQuery.java:56-80 —
    "a set of point value(s) ... computes which documents match, in a
    single pass"): numeric set membership as one Catalyst isin predicate —
    pushed to the parquet scan as `In(col, ...)`, the same one-pass
    BKD-intersect shape the reference gets, constant score."""
    return docs.filter(F.col(col).isin(list(values))).select(id_col)
