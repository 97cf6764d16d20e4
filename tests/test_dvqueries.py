"""Sandbox doc-values queries (sandbox/search/DocValuesTermsQuery.java,
DocValuesNumbersQuery.java, MultiRangeQuery.java,
IndexSortSortedNumericDocValuesRangeQuery.java)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lucene_spark.dvqueries import (
    dv_numbers_query,
    dv_terms_query,
    index_sort_range_query,
    merge_ranges,
    multi_range_query,
    write_sorted_values,
)


@pytest.fixture(scope="module")
def values(spark):
    rows = [
        (0, "en", 100, ["a", "b"], [1, 2]),
        (1, "fr", 150, ["b"], [3]),
        (2, "de", 200, ["c", "d"], [4, 5]),
        (3, "en", 250, ["d"], [6]),
        (4, "es", 300, ["e"], [7, 8]),
    ]
    return spark.createDataFrame(
        rows,
        "docid long, lang string, n long, tags array<string>, nums array<long>",
    )


def ids(df):
    return [r["docid"] for r in df.collect()]


def test_dv_terms_scalar_and_set(values):
    assert ids(dv_terms_query(values, "lang", ["en", "es"])) == [0, 3, 4]
    assert ids(dv_terms_query(values, "lang", [])) == []


def test_dv_terms_sorted_set_multivalue(values):
    # SORTED_SET semantics: ANY element matching counts (DocValuesTermsQuery
    # javadoc :49 "whose value ... is contained in the provided set")
    assert ids(dv_terms_query(values, "tags", ["b"])) == [0, 1]
    assert ids(dv_terms_query(values, "tags", ["d", "e"])) == [2, 3, 4]


def test_dv_numbers(values):
    assert ids(dv_numbers_query(values, "n", [150, 300, 999])) == [1, 4]
    assert ids(dv_numbers_query(values, "nums", [2, 6])) == [0, 3]


def test_merge_ranges_rewrite():
    # overlapping + abutting clauses coalesce; disjoint stay apart
    got = merge_ranges([
        (100, 150, True, False),
        (140, 160, True, False),   # overlaps the first
        (160, 170, True, True),    # abuts [.,160) with inclusive lower
        (300, 350, True, True),
    ])
    assert got == [(100, 170, True, True), (300, 350, True, True)]
    # exclusive-exclusive abutment does NOT merge: x<160 and x>160 leave a gap
    got = merge_ranges([(100, 160, True, False), (160, 170, False, True)])
    assert len(got) == 2


def test_multi_range_query(values):
    got = multi_range_query(
        values, "n",
        [(100, 150, True, False), (140, 260, True, False),
         (300, 300, True, True)])
    assert ids(got) == [0, 1, 2, 3, 4]
    got = multi_range_query(values, "n", [(150, 200, False, True)])
    assert ids(got) == [2]
    # multivalued: ANY element in ANY range
    got = multi_range_query(values, "nums", [(5, 6, True, True)])
    assert ids(got) == [2, 3]


def test_index_sort_range_query_prunes(spark, values):
    tmp = tempfile.mkdtemp(prefix="ls_dvsort_")
    try:
        big = spark.range(0, 2000).select(
            F.col("id").alias("docid"), (F.col("id") * 3).alias("ts"))
        write_sorted_values(big, tmp, "ts", num_partitions=8)
        got = index_sort_range_query(spark, tmp, "ts", lower=300, upper=330)
        rows = got.collect()
        assert [r["docid"] for r in rows] == list(range(100, 111))
        # the range filter must reach the scan (the binary-search analog:
        # sorted layout + min/max stats => file/row-group skipping)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "ts" in plan
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
