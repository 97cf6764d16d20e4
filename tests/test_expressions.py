"""expressions module: JS-like scoring language -> Catalyst SQL
(JavascriptCompiler.java:59-122 semantics duel via Spark evaluation)."""

import math

import pytest

from lucene_spark.expressions import compile_expression


def _eval(spark, expr, bindings=None, row=None):
    sql = compile_expression(expr, bindings or {})
    df = spark.range(1)
    if row:
        for k, v in row.items():
            df = df.selectExpr("*", f"CAST({v} AS DOUBLE) AS {k}")
    return df.selectExpr(f"({sql}) AS v").collect()[0]["v"]


def test_arithmetic_and_precedence(spark):
    assert _eval(spark, "1 + 2 * 3") == 7.0
    assert _eval(spark, "(1 + 2) * 3") == 9.0
    assert _eval(spark, "3 / 2") == 1.5  # double division, as in Java doubles
    assert _eval(spark, "10 % 3") == 1.0
    assert _eval(spark, "-2 * -3") == 6.0
    assert _eval(spark, "2 - -1") == 3.0


def test_functions_match_java_math(spark):
    assert _eval(spark, "ln(exp(1))") == pytest.approx(1.0, abs=1e-15)
    assert _eval(spark, "log10(1000)") == pytest.approx(3.0, abs=1e-12)
    assert _eval(spark, "logn(2, 8)") == pytest.approx(3.0, abs=1e-12)
    assert _eval(spark, "pow(2, 10)") == 1024.0
    assert _eval(spark, "min(3, max(1, 2))") == 2.0
    assert _eval(spark, "sqrt(abs(0 - 16))") == 4.0
    assert _eval(spark, "ceil(1.2) + floor(1.8)") == 3.0
    assert _eval(spark, "atan2(1, 1)") == pytest.approx(math.pi / 4, rel=1e-15)
    assert _eval(spark, "cosh(0) + sinh(0) + tanh(0)") == 1.0
    assert _eval(spark, "acosh(1) + asinh(0) + atanh(0)") == 0.0


def test_ternary_and_boolean_semantics(spark):
    # nonzero = true; booleans evaluate to 1.0/0.0 (D2L/IFEQ lowering)
    assert _eval(spark, "1 ? 10 : 20") == 10.0
    assert _eval(spark, "0 ? 10 : 20") == 20.0
    assert _eval(spark, "0.5 ? 1 : 2") == 1.0  # any nonzero double is true
    assert _eval(spark, "1 && 2") == 1.0
    assert _eval(spark, "1 && 0") == 0.0
    assert _eval(spark, "0 || 3") == 1.0
    assert _eval(spark, "!0") == 1.0
    assert _eval(spark, "!42") == 0.0
    assert _eval(spark, "(2 > 1) + (1 == 1) + (1 != 1)") == 2.0
    assert _eval(spark, "2 >= 2") == 1.0
    assert _eval(spark, "1 < 2 ? 5 : 6") == 5.0


def test_bitwise_on_longs(spark):
    assert _eval(spark, "6 & 3") == 2.0
    assert _eval(spark, "6 | 3") == 7.0
    assert _eval(spark, "6 ^ 3") == 5.0
    assert _eval(spark, "~0") == -1.0
    assert _eval(spark, "1 << 10") == 1024.0
    assert _eval(spark, "1024 >> 3") == 128.0
    assert _eval(spark, "0 - 8 >> 1") == -4.0  # arithmetic shift
    # >>> on -1 gives 2^64-1 as double (Java long >>> then L2D)
    assert _eval(spark, "(0 - 1) >>> 32") == float((2**64 - 1) >> 32)
    assert _eval(spark, "0x20") == 32.0


def test_haversin_km(spark):
    # Paris -> London great-circle, ~343-344 km
    got = _eval(spark, "haversin(48.8566, 2.3522, 51.5074, 0 - 0.1278)")
    assert 340 < got < 348


def test_bindings_and_validation(spark):
    b = {"_score": "score", "popularity": "pop"}
    got = _eval(spark, "_score + ln(1 + popularity)", b,
                row={"score": 2.0, "pop": "exp(1) - 1"})
    assert got == pytest.approx(3.0, rel=1e-15)
    with pytest.raises(ValueError, match="unknown variable"):
        compile_expression("boost * 2", {})
    with pytest.raises(ValueError, match="unknown function"):
        compile_expression("nosuch(1)", {})
    with pytest.raises(ValueError, match="take"):
        compile_expression("ln(1, 2)", {})
    with pytest.raises(ValueError, match="trailing|unparsable|unexpected"):
        compile_expression("1 + ", {})


def test_function_score_integration(spark):
    from lucene_spark.expressions import expression_column  # noqa: F401
    from lucene_spark.funcscore import function_score
    from lucene_spark.index import build_index
    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [("u0", "alpha beta", 10), ("u1", "alpha", 1000), ("u2", "beta gamma", 5)],
        "url string, text string, clicks long",
    )
    idx = build_index(spark, pages, text_col="text", key_col="url")
    vals = pages.join(idx.docs.select("docid", "url"), "url").select(
        "docid", F.col("clicks").cast("double").alias("clicks")
    )
    src = compile_expression(
        "_score + ln(1 + clicks)", {"_score": "score", "clicks": "clicks"}
    )
    td = function_score(idx, "alpha", src, values=vals, k=2, precision="float64")
    # u1 (clicks=1000) must outrank u0 despite similar BM25
    url_by_docid = {r["docid"]: r["url"] for r in idx.docs.collect()}
    assert url_by_docid[int(td.docids[0])] == "u1"
