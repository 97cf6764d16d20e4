"""DateTools analog — vectors from core TestDateTools.java, plus the
Catalyst encoder duel and the InetAddressPoint bounds."""

import datetime as dt

import pytest

from lucene_spark.datetools import (
    RESOLUTIONS, date_range_predicate, date_to_string, round_time,
    string_to_time, time_to_string, time_to_string_col,
)
from lucene_spark.rangefield import inet_prefix_bounds, inet_to_key


def ms(y, mo, d, h=0, mi=0, s=0, msec=0):
    return int(dt.datetime(y, mo, d, h, mi, s, msec * 1000,
                           tzinfo=dt.timezone.utc).timestamp() * 1000)


def test_string_to_time_vectors():
    # TestDateTools.testStringtoTime (:57-71)
    assert string_to_time("197001010000") == 0
    assert string_to_time("198002021105") == ms(1980, 2, 2, 11, 5)
    with pytest.raises(ValueError):
        string_to_time("97")  # not a valid resolution length


def test_date_to_string_all_resolutions():
    # TestDateTools.testDateAndTimetoString (:84-123)
    t = ms(2004, 2, 3, 22, 8, 56, 333)
    want = {
        "year": "2004", "month": "200402", "day": "20040203",
        "hour": "2004020322", "minute": "200402032208",
        "second": "20040203220856", "millisecond": "20040203220856333",
    }
    for res, w in want.items():
        assert time_to_string(t, res) == w
    # pre-epoch (negative millis), :118-123
    t61 = ms(1961, 3, 5, 23, 9, 51, 444)
    assert t61 < 0
    assert time_to_string(t61, "millisecond") == "19610305230951444"
    assert time_to_string(t61, "hour") == "1961030523"
    assert time_to_string(0, "millisecond") == "19700101000000000"


def test_round_trips_and_round():
    t = ms(2004, 9, 21, 13, 50, 11, 275)
    # round == stringToTime(timeToString) truncation, switch fall-through
    assert round_time(t, "year") == ms(2004, 1, 1)
    assert round_time(t, "month") == ms(2004, 9, 1)
    assert round_time(t, "day") == ms(2004, 9, 21)
    assert round_time(t, "hour") == ms(2004, 9, 21, 13)
    assert round_time(t, "millisecond") == t
    for res in RESOLUTIONS:
        assert string_to_time(time_to_string(t, res)) == round_time(t, res)


def test_ordering_preserved():
    ts = [ms(1999, 12, 31, 23, 59, 59, 999), ms(2000, 1, 1),
          ms(2004, 2, 29, 12), ms(2024, 6, 1, 0, 0, 0, 1)]
    for res in RESOLUTIONS:
        enc = [time_to_string(t, res) for t in ts]
        assert enc == sorted(enc)


def test_catalyst_encoder_duel(spark):
    import random

    rng = random.Random(3)
    rows = [(i, rng.randrange(0, 2_000_000_000_000)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, ts long")
    for res in ("day", "minute", "millisecond"):
        got = {r["doc_id"]: r["enc"] for r in df.select(
            "doc_id", time_to_string_col(df.ts, res).alias("enc")).collect()}
        for i, t in rows:
            assert got[i] == time_to_string(t, res), (res, t)
    # sargable range predicate
    lo, hi = time_to_string(rows[5][1], "day"), time_to_string(rows[7][1], "day")
    if lo > hi:
        lo, hi = hi, lo
    out = df.select("doc_id",
                    time_to_string_col(df.ts, "day").alias("d"))
    n = out.filter(date_range_predicate(out.d, lo, hi)).count()
    exp = sum(1 for _, t in rows if lo <= time_to_string(t, "day") <= hi)
    assert n == exp


def test_inet_prefix_bounds():
    lo, hi = inet_prefix_bounds("192.168.5.77", 24)
    assert lo == inet_to_key("192.168.5.0")
    assert hi == inet_to_key("192.168.5.255")
    lo, hi = inet_prefix_bounds("2001:db8::ff00:42:8329", 32)
    assert lo == inet_to_key("2001:db8::")
    assert hi == inet_to_key("2001:db8:ffff:ffff:ffff:ffff:ffff:ffff")
    with pytest.raises(ValueError):
        inet_prefix_bounds("10.0.0.1", 33)


def test_date_range_pushdown(spark, tmp_path):
    """A materialized DateTools-encoded column takes range predicates to
    the parquet scan (PushedFilters) — the scale contract of the
    order-preserving encoding."""
    import random

    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 2_000_000_000_000)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, ts long")
    out = str(tmp_path / "dated")
    (df.select("doc_id", time_to_string_col(df.ts, "day").alias("day_s"))
       .write.mode("overwrite").parquet(out))
    back = spark.read.parquet(out)
    q = back.filter(date_range_predicate(back.day_s, "20050101", "20101231"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "day_s" in plan and \
        "GreaterThanOrEqual(day_s,20050101)" in plan
    exp = sum(1 for _, t in rows
              if "20050101" <= time_to_string(t, "day") <= "20101231")
    assert q.count() == exp


def test_inet_point_pushdown(spark, tmp_path):
    from lucene_spark.rangefield import inet_point_query, inet_to_key

    rows = [(i, inet_to_key(f"10.{i % 200}.{(i * 7) % 256}.{(i * 13) % 256}"))
            for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, ip_key string")
    out = str(tmp_path / "ips")
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    q = inet_point_query(back, prefix=("10.5.0.0", 16))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ip_key" in plan
    assert q.count() == sum(1 for i in range(400) if i % 200 == 5)
    # exact + range modes
    some = f"10.7.{(7 * 7) % 256}.{(7 * 13) % 256}"
    assert inet_point_query(back, exact=some).count() == \
        sum(1 for i in range(400)
            if f"10.{i % 200}.{(i * 7) % 256}.{(i * 13) % 256}" == some)
