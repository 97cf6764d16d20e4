"""Numeric RangeFields: RangeFieldQuery relations + InetAddressRange."""

import pytest

from lucene_spark.rangefield import inet_to_int, inet_to_key, \
    range_field_query, inet_range_query


@pytest.mark.spark
def test_range_field_relations(spark):
    # doc ranges on one dimension: [0,10] [5,15] [20,30] [8,9] [0,100]
    df = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 5.0, 15.0), (2, 20.0, 30.0), (3, 8.0, 9.0),
         (4, 0.0, 100.0)], "doc_id long, lo double, hi double")

    def ids(rel, qmin, qmax):
        return sorted(r["doc_id"] for r in range_field_query(
            df, ["lo"], ["hi"], [qmin], [qmax], rel).collect())

    assert ids("intersects", 7.0, 12.0) == [0, 1, 3, 4]
    assert ids("within", 7.0, 12.0) == [3]
    assert ids("contains", 7.0, 12.0) == [1, 4]
    assert ids("crosses", 7.0, 12.0) == [0]
    # DISJOINT would be everything minus intersects
    assert ids("intersects", 200.0, 300.0) == []


@pytest.mark.spark
def test_range_field_multi_dim(spark):
    # 2-D ranges (the DoubleRange 2d case)
    df = spark.createDataFrame(
        [(0, 0.0, 10.0, 0.0, 10.0), (1, 5.0, 15.0, 20.0, 30.0)],
        "doc_id long, x_lo double, x_hi double, y_lo double, y_hi double")
    got = sorted(r["doc_id"] for r in range_field_query(
        df, ["x_lo", "y_lo"], ["x_hi", "y_hi"], [8.0, 8.0], [12.0, 12.0],
        "intersects").collect())
    assert got == [0]  # doc 1 intersects on x but not on y


def test_inet_encoding():
    # IPv4 maps into the IPv6 space (InetAddressRange 16-byte encoding)
    assert inet_to_int("1.2.3.4") < inet_to_int("1.2.3.5")
    assert inet_to_int("::ffff:1.2.3.4") == inet_to_int("1.2.3.4")
    assert inet_to_int("2001:db8::1") > inet_to_int("255.255.255.255")
    # hex keys order exactly like the integers
    assert inet_to_key("9.255.255.255") < inet_to_key("10.0.0.0")
    assert len(inet_to_key("1.2.3.4")) == 32


@pytest.mark.spark
def test_inet_range_query(spark):
    rows = [(0, "10.0.0.0", "10.0.0.255"), (1, "10.0.1.0", "10.0.1.255"),
            (2, "192.168.0.0", "192.168.255.255")]
    df = spark.createDataFrame(
        [(i, inet_to_key(a), inet_to_key(b)) for i, a, b in rows],
        "doc_id long, ip_min string, ip_max string")
    got = sorted(r["doc_id"] for r in inet_range_query(
        df, "10.0.0.128", "10.0.1.10").collect())
    assert got == [0, 1]
    got = sorted(r["doc_id"] for r in inet_range_query(
        df, "10.0.0.1", "10.0.0.2", relation="within").collect())
    assert got == []
    got = sorted(r["doc_id"] for r in inet_range_query(
        df, "10.0.0.1", "10.0.0.2", relation="contains").collect())
    assert got == [0]
