"""Payloads channel: DelimitedPayloadTokenFilter analog + PayloadScoreQuery."""

import numpy as np
import pytest

from lucene_spark.index import build_index
from lucene_spark.payloads import (
    _delimited_analyze,
    build_payload_sidecar,
    payload_score_topk,
    strip_payloads,
)
from lucene_spark.analysis import ENGLISH_STOP_WORDS

CORPUS = [
    # url, payload-annotated text
    ("u0", "apple|2.0 banana apple|5.0 cherry|1.5"),
    ("u1", "apple banana|3.0 date"),
    ("u2", "banana apple|0.5 apple|0.25"),
    ("u3", "cherry date elderberry"),
    ("u4", "apple|4.0 banana|1.0 apple banana|2.0"),
]


def test_delimited_analyze_semantics():
    # first-delimiter split, float parse, no-delimiter -> None payload
    t, p, w = _delimited_analyze("Apple|2.5 pie the Fig|x|9", "|", ENGLISH_STOP_WORDS)
    assert t == ["apple", "pie", "fig"]
    # stopword 'the' keeps its position slot (position increments)
    assert p == [0, 1, 3]
    # "fig|x|9" splits at the FIRST '|'; "x|9" is not a float -> None
    assert w[0] == 2.5 and w[1] is None and w[2] is None


def test_strip_payloads_column(spark):
    df = spark.createDataFrame([("a|1.0 b c|2",)], "text string")
    assert df.select(strip_payloads("text").alias("t")).collect()[0]["t"] == "a b c"


@pytest.fixture(scope="module")
def setup(spark):
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(CORPUS, "url string, raw string")
    stripped = pages.select("url", strip_payloads("raw").alias("text"))
    idx = build_index(spark, stripped, text_col="text", key_col="url",
                      with_positions=True)
    with_ids = pages.join(idx.docs.select("docid", "url"), "url")
    sidecar = build_payload_sidecar(with_ids, text_col="raw").persist()
    sidecar.count()
    url_of = {r["docid"]: r["url"] for r in idx.docs.collect()}
    return idx, sidecar, url_of


def test_sidecar_shape(setup):
    idx, sidecar, url_of = setup
    rows = {(r["docid"], r["term"]): r for r in sidecar.collect()}
    d0 = next(d for d, u in url_of.items() if u == "u0")
    r = rows[(d0, "apple")]
    assert r["positions"] == [0, 2]
    assert r["payloads"] == [2.0, 5.0]
    r = rows[(d0, "banana")]
    assert r["payloads"] == [None]


def test_payload_functions_term_mode(setup):
    idx, sidecar, url_of = setup

    def scores(fn, include=False):
        td = payload_score_topk(idx, sidecar, "apple", function=fn,
                                include_span_score=include, k=10)
        return {url_of[int(d)]: float(s) for d, s in zip(td.docids, td.scores)}

    mx = scores("max")
    assert mx["u0"] == 5.0 and mx["u2"] == 0.5 and mx["u4"] == 4.0
    assert mx["u1"] == 1.0  # apple occurs but payload-less -> default 1
    mn = scores("min")
    assert mn["u0"] == 2.0 and mn["u2"] == 0.25
    sm = scores("sum")
    assert sm["u0"] == 7.0 and sm["u2"] == 0.75
    av = scores("avg")
    assert av["u0"] == 3.5 and av["u4"] == 4.0  # u4: one payload-less apple
    assert "u3" not in mx  # no 'apple' -> no span match -> absent


def test_include_span_score_multiplies(setup):
    idx, sidecar, url_of = setup
    from lucene_spark.search import score_docs
    from lucene_spark.spans import span_near

    base = {r["docid"]: r["score"] for r in
            score_docs(idx, span_near(["apple"]), precision="float64").collect()}
    td = payload_score_topk(idx, sidecar, "apple", function="max",
                            include_span_score=True, k=10, precision="float64")
    pay = {"u0": 5.0, "u1": 1.0, "u2": 0.5, "u4": 4.0}
    for d, s in zip(td.docids, td.scores):
        assert s == pytest.approx(base[int(d)] * pay[url_of[int(d)]], rel=1e-12)


def test_payload_near_phrase_mode(setup):
    idx, sidecar, url_of = setup
    # ordered adjacent "apple banana": u0 (pos0-1), u1 (0-1), u4 (0-1 and 2-3)
    td = payload_score_topk(idx, sidecar, ["apple", "banana"], function="sum",
                            include_span_score=False, k=10)
    got = {url_of[int(d)]: float(s) for d, s in zip(td.docids, td.scores)}
    assert got["u0"] == 2.0          # apple|2.0 + banana(None)
    assert got["u1"] == 3.0          # apple(None) + banana|3.0
    assert got["u4"] == 7.0          # span1: 4.0+1.0, span2: None+2.0
    assert "u2" not in got           # banana apple is wrong order


def test_no_payloads_seen_defaults_to_one(setup):
    idx, sidecar, url_of = setup
    # 'date' never carries payloads -> every matching doc scores exactly 1
    td = payload_score_topk(idx, sidecar, "date", function="sum",
                            include_span_score=False, k=10)
    assert sorted(url_of[int(d)] for d in td.docids) == ["u1", "u3"]
    assert all(s == 1.0 for s in td.scores)


def test_float32_accumulation_order(setup):
    idx, sidecar, url_of = setup
    # avg accumulates in float32 steps (currentScore += payload), then /n
    vals = np.array([2.0, 5.0], dtype=np.float32)
    acc = np.float32(np.float32(vals[0]) + vals[1])
    want = float(np.float32(acc / np.float32(2)))
    td = payload_score_topk(idx, sidecar, "apple", function="avg",
                            include_span_score=False, k=10)
    got = {url_of[int(d)]: float(s) for d, s in zip(td.docids, td.scores)}
    assert got["u0"] == want
