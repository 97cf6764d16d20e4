"""Sandbox doc-values queries — set-membership, multi-range, and
index-sort-accelerated range filtering over doc-values columns.

Reference semantics (sandbox/src/java/org/apache/lucene/sandbox/search):

- ``DocValuesTermsQuery.java:49-84`` — "documents whose value ... is
  contained in the provided set of allowed terms"; a SORTED_SET doc-values
  membership check (docs may carry several values), constant score.
- ``DocValuesNumbersQuery.java:52-69`` — same over a LongHashSet of
  numeric values.
- ``MultiRangeQuery.java:42-60`` — "All ranges are logically ORed
  together"; the class javadoc leaves "handling overlapping ranges at
  rewrite time" as a TODO — we DO the rewrite-time merge here (sort by
  lower bound, coalesce overlapping/adjacent clauses) so the scan
  evaluates a minimal disjunction.
- ``IndexSortSortedNumericDocValuesRangeQuery.java:42-71`` — "If the
  index is sorted on the same field as the query, it performs binary
  search on the field's doc values to find the documents at the lower and
  upper ends of the range."  The Spark analog of that binary search is
  storage-order pruning: ``write_sorted_values`` range-partitions and
  sorts the values channel by the field, so parquet min/max row-group
  stats let the scan skip every file/row-group outside [lower, upper] —
  the same O(log n)-ish touch pattern, expressed declaratively.

Scale shape: membership sets and range lists are query constants
(broadcast literally into the Catalyst predicate); every query here is a
single filter over a column-pruned scan — no shuffle, no Python per-row
work, and the sorted variant prunes storage exactly like the reference's
binary search prunes docids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_array(df: DataFrame, field: str) -> bool:
    return isinstance(df.schema[field].dataType, T.ArrayType)


def dv_terms_query(values: DataFrame, field: str, terms: list[str],
                   id_col: str = "docid") -> DataFrame:
    """DocValuesTermsQuery (DocValuesTermsQuery.java:84-110): docids whose
    ``field`` value (scalar, or any element of an array column — the
    SORTED_SET multi-value case) is in ``terms``.  Constant-score filter;
    returns (docid) ordered by docid."""
    if not terms:
        return values.sparkSession.createDataFrame([], f"{id_col} long")
    col = F.col(field)
    if _is_array(values, field):
        pred = F.arrays_overlap(col, F.array(*[F.lit(t) for t in set(terms)]))
    else:
        pred = col.isin(list(set(terms)))
    return values.filter(pred).select(id_col).orderBy(id_col)


def dv_numbers_query(values: DataFrame, field: str, numbers: list[int],
                     id_col: str = "docid") -> DataFrame:
    """DocValuesNumbersQuery (DocValuesNumbersQuery.java:52-69): docids
    whose numeric doc value is in the given long set."""
    if not numbers:
        return values.sparkSession.createDataFrame([], f"{id_col} long")
    col = F.col(field)
    if _is_array(values, field):
        pred = F.arrays_overlap(
            col, F.array(*[F.lit(int(n)) for n in set(numbers)]))
    else:
        pred = col.isin([int(n) for n in set(numbers)])
    return values.filter(pred).select(id_col).orderBy(id_col)


def merge_ranges(
    ranges: list[tuple[float, float, bool, bool]],
) -> list[tuple[float, float, bool, bool]]:
    """Rewrite-time merge of overlapping/adjacent (lo, hi, incl_lo, incl_hi)
    clauses — the optimization MultiRangeQuery.java:43 marks TODO.  Sorted
    by lower bound; two clauses merge when the next one's lower endpoint
    falls inside (or exactly abuts, with at least one inclusive side) the
    running clause."""
    if not ranges:
        return []
    rs = sorted(ranges, key=lambda r: (r[0], not r[2]))
    out = [rs[0]]
    for lo, hi, ilo, ihi in rs[1:]:
        clo, chi, cilo, cihi = out[-1]
        touches = lo < chi or (lo == chi and (ilo or cihi))
        if touches:
            if hi > chi or (hi == chi and ihi):
                chi, cihi = hi, ihi
            out[-1] = (clo, chi, cilo, cihi)
        else:
            out.append((lo, hi, ilo, ihi))
    return out


def multi_range_query(values: DataFrame, field: str,
                      ranges: list[tuple[float, float, bool, bool]],
                      id_col: str = "docid") -> DataFrame:
    """MultiRangeQuery (MultiRangeQuery.java:42-60): docids whose value
    falls in ANY of the ranges.  Clauses are merged at rewrite time; the
    resulting disjunction is one Catalyst predicate over one scan."""
    merged = merge_ranges(ranges)
    if not merged:
        return values.sparkSession.createDataFrame([], f"{id_col} long")
    col = F.col(field)
    array = _is_array(values, field)

    def clause(c, lo, hi, ilo, ihi):
        p = (c >= lo) if ilo else (c > lo)
        return p & ((c <= hi) if ihi else (c < hi))

    if array:
        def make(r):
            return lambda x: clause(x, *r)

        preds = [F.exists(col, make(r)) for r in merged]
    else:
        preds = [clause(col, *r) for r in merged]
    pred = preds[0]
    for p in preds[1:]:
        pred = pred | p
    return values.filter(pred).select(id_col).orderBy(id_col)


def write_sorted_values(values: DataFrame, path: str, field: str,
                        num_partitions: int = 8) -> None:
    """Persist the values channel SORTED by ``field`` — the index-sort
    precondition of IndexSortSortedNumericDocValuesRangeQuery.java:49
    ("The index is sorted, and its primary sort is on the same field as
    the query").  repartitionByRange gives disjoint per-file value ranges;
    sortWithinPartitions gives monotone row groups, so parquet min/max
    stats make any later range filter skip non-overlapping files and row
    groups — the binary-search analog."""
    (values.repartitionByRange(num_partitions, F.col(field))
     .sortWithinPartitions(field)
     .write.mode("overwrite").parquet(path))


def index_sort_range_query(spark: SparkSession, path: str, field: str,
                           lower: int | None = None,
                           upper: int | None = None,
                           include_lower: bool = True,
                           include_upper: bool = True,
                           id_col: str = "docid") -> DataFrame:
    """IndexSortSortedNumericDocValuesRangeQuery
    (IndexSortSortedNumericDocValuesRangeQuery.java:42-232): range over a
    value-sorted store.  The filter is pushed to the parquet scan
    (PushedFilters), where the sorted layout's min/max stats realize the
    reference's lower/upper binary-search bounds as file + row-group
    skipping."""
    df = spark.read.parquet(path)
    col = F.col(field)
    if lower is not None:
        df = df.filter(col >= lower if include_lower else col > lower)
    if upper is not None:
        df = df.filter(col <= upper if include_upper else col < upper)
    return df.select(id_col, field).orderBy(id_col)
