"""QualityStats / TrecJudge analog (benchmark/quality) — hand-computed
goldens exercising each reference quirk:
  * MRR set only when the first relevant hit ranks <= 5 (addResult:86-88)
  * P@n past the list end extends as numGood/n (getPrecisionAt:113-115)
  * recall falls back to running precision when maxGood = 0 (addResult:99)
  * AvP = sum of precision at relevant ranks / maxGood (getAvp)
"""

import math

import pytest

from lucene_spark.quality import (
    LCM20, average_stats, quality_stats, trec_judgments,
)


@pytest.fixture(scope="module")
def stats(spark):
    # q1: ranked [d1 R, d2, d3 R, d4, d5] with 4 relevant total (d9 missed)
    # q2: first relevant at rank 6 of 6 -> MRR quirk fires (mrr = 0)
    # q3: no judgments at all -> maxGood = 0 recall fallback
    results = spark.createDataFrame(
        [("q1", f"d{i}", i) for i in range(1, 6)]
        + [("q2", f"e{i}", i) for i in range(1, 7)]
        + [("q3", f"f{i}", i) for i in range(1, 5)],
        "qid string, doc string, rank long",
    )
    judgments = spark.createDataFrame(
        [("q1", "d1"), ("q1", "d3"), ("q1", "d9"), ("q1", "d10"),
         ("q2", "e6"),
         ("zz", "x1")],  # judged query never run -> no output row
        "qid string, doc string",
    )
    rows = quality_stats(results, judgments).collect()
    return {r["qid"]: r for r in rows}, results, judgments


def test_counts_and_recall(stats):
    per, _, _ = stats
    q1 = per["q1"]
    assert (q1["num_points"], q1["num_good"], q1["max_good"]) == (5, 2, 4)
    assert q1["recall"] == 2 / 4
    assert "zz" not in per


def test_mrr_top5_quirk(stats):
    per, _, _ = stats
    assert per["q1"]["mrr"] == 1.0          # first relevant at rank 1
    assert per["q2"]["first_rel_rank"] == 6
    assert per["q2"]["mrr"] == 0.0          # rank 6 > 5: reference drops it


def test_avp_exact(stats):
    per, _, _ = stats
    # q1 relevant ranks: 1 (cum 1 -> p=1/1), 3 (cum 2 -> p=2/3)
    want = (1 / 1 + 2 / 3) / 4
    assert math.isclose(per["q1"]["avp"], want, rel_tol=1e-12)
    assert per["q1"]["avp_num"] == 1 * LCM20 // 1 + 2 * LCM20 // 3
    # exact-integer route reproduces the float (up to summation-order ulps)
    assert math.isclose(per["q1"]["avp_num"] / (LCM20 * 4), want, rel_tol=1e-12)


def test_p_at_extension_past_list_end(stats):
    per, _, _ = stats
    q1 = per["q1"]
    # within list: P@1 = 1, P@3 = 2/3, P@5 = 2/5
    assert q1["p_at"][0] == 1.0
    assert q1["p_at"][2] == 2 / 3
    assert q1["p_at"][4] == 2 / 5
    # past the end (numPoints=5): P@10 = numGood/10 = 2/10
    assert q1["p_at"][9] == 2 / 10
    assert q1["good_at"][9] == 2


def test_max_good_zero_fallback(stats):
    per, _, _ = stats
    q3 = per["q3"]
    assert q3["max_good"] == 0
    assert q3["avp"] == 0.0
    # reference: recall falls back to the running precision 0/numPoints
    assert q3["recall"] == 0.0


def test_average(stats):
    per, results, judgments = stats
    avg = average_stats(quality_stats(results, judgments)).collect()[0]
    assert avg["n_queries"] == 3
    assert math.isclose(avg["mrr"], (1.0 + 0.0 + 0.0) / 3, rel_tol=1e-12)
    assert avg["num_points"] == 5 + 6 + 4
    assert math.isclose(
        avg["p_at_1"], (1.0 + 0.0 + 0.0) / 3, rel_tol=1e-12
    )


def test_trec_judgments_parser(spark):
    j = trec_judgments(spark, [
        "q1 0 docA 1",
        "q1 0 docB 0",   # non-relevant: excluded
        "q2 0 docC 2",   # graded > 0 counts as relevant
    ])
    got = {(r["qid"], r["doc"]) for r in j.collect()}
    assert got == {("q1", "docA"), ("q2", "docC")}
    with pytest.raises(ValueError):
        trec_judgments(spark, ["malformed line"]).collect()
