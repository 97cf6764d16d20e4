"""Surround query-language parser (queryparser/surround/parser/QueryParser.jj):
precedence OR < AND < NOT < N < W, distance n → slop n-1
(surround/query/DistanceQuery.java:97), prefix + infix operator forms,
truncation expansion inside distance ops (SpanNearClauseFactory.java:64-139),
multiplicative weights."""

import numpy as np
import pytest

from lucene_spark.index import build_index
from lucene_spark.search import parse_query, search
from lucene_spark.spans import span_near
from lucene_spark.surround import parse_surround


# --- pure parser shape tests (no Spark) -----------------------------------


def test_infix_w_default_distance_is_adjacent():
    assert parse_surround("alpha w beta") == (
        "span_near", [("sterm", "alpha"), ("sterm", "beta")], 0, True
    )


def test_infix_n_with_distance():
    assert parse_surround("alpha 3n beta") == (
        "span_near", [("sterm", "alpha"), ("sterm", "beta")], 2, False
    )


def test_prefix_forms_and_flattening():
    pre = parse_surround("5W(table, hash, part)")
    assert pre == ("span_near",
                   [("sterm", "table"), ("sterm", "hash"), ("sterm", "part")],
                   4, True)
    # equal-distance infix chain flattens to the same n-ary near
    assert parse_surround("table 5w hash 5w part") == pre


def test_precedence_or_loosest_w_tightest():
    node = parse_surround("alpha w beta OR gamma")
    assert node == ("or", [
        ("span_near", [("sterm", "alpha"), ("sterm", "beta")], 0, True),
        ("term", "gamma"),
    ])
    node = parse_surround("alpha AND beta NOT gamma")
    assert node == ("andn", [
        ("term", "alpha"),
        ("notn", ("term", "beta"), [("term", "gamma")]),
    ])


def test_weights_multiplicative():
    assert parse_surround("alpha^2^3") == ("boost", ("term", "alpha"), 6.0)
    assert parse_surround("(alpha OR beta)^2") == (
        "boost", ("or", [("term", "alpha"), ("term", "beta")]), 2.0
    )


def test_truncation_nodes():
    assert parse_surround("alp*") == ("wildcard_raw", "alp%")
    assert parse_surround("al?ha") == ("wildcard_raw", "al_ha")
    assert parse_surround('"alp"*') == ("wildcard_raw", "alp%")
    assert parse_surround("alp* w beta") == (
        "span_near", [("sprefix_raw", "alp%"), ("sterm", "beta")], 0, True
    )


def test_or_inside_distance_becomes_span_or():
    assert parse_surround("(alpha OR beta) 2w gamma") == (
        "span_near", [("span_or", ["alpha", "beta"]), ("sterm", "gamma")],
        1, True,
    )


def test_field_routing():
    assert parse_surround("title:alpha w beta", fields={"title"}) == (
        "field", "title",
        ("span_near", [("sterm", "alpha"), ("sterm", "beta")], 0, True),
    )
    assert parse_surround("nosuch:alpha") == ("match_none",)


def test_errors():
    with pytest.raises(ValueError):
        parse_surround("alpha 2w beta 3w gamma")  # mixed distances
    with pytest.raises(ValueError):
        parse_surround("w alpha")  # operator in term position
    with pytest.raises(ValueError):
        parse_surround("alpha w beta^2 w gamma")  # weight inside chain
    with pytest.raises(ValueError):
        parse_surround("W(alpha)")  # prefix op needs >= 2 operands
    with pytest.raises(ValueError):
        parse_surround("alpha^0")  # non-positive weight


# --- end-to-end over a positional index ------------------------------------


@pytest.fixture(scope="module")
def sur_index(spark):
    rows = [
        ("u1", "alpha beta gamma"),
        ("u2", "beta alpha delta"),
        ("u3", "alpha x y beta"),
        ("u4", "gamma delta alphabet"),
        ("u5", "beta gamma alpha"),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    return build_index(spark, docs, seg_size=2, with_positions=True)


def _ids(td):
    return sorted(int(d) for d in td.docids)


def test_surround_matches_span_helper(sur_index):
    got = search(sur_index, parse_surround("alpha w beta"), k=10,
                 precision="float64")
    want = search(sur_index, span_near(["alpha", "beta"], slop=0), k=10,
                  precision="float64")
    assert got.docids.tolist() == want.docids.tolist()
    assert got.scores.tolist() == want.scores.tolist()
    assert _ids(got) == [0]  # only u1 has 'alpha beta' adjacent ordered


def test_surround_unordered_distance(sur_index):
    td = search(sur_index, parse_surround("alpha n beta"), k=10)
    assert _ids(td) == [0, 1]  # u2 adjacent reversed counts for N
    td4 = search(sur_index, parse_surround("alpha 4n beta"), k=10)
    assert _ids(td4) == [0, 1, 2, 4]


def test_surround_truncation_in_distance(sur_index):
    # alp* expands over the dict (alpha, alphabet); near 'delta' unordered
    td = search(sur_index, parse_surround("alp* n delta"), k=10)
    assert _ids(td) == [1, 3]
    # no matching expansion kills the near
    td = search(sur_index, parse_surround("zz* w beta"), k=10)
    assert len(td.docids) == 0


def test_surround_boolean_combo(sur_index):
    td = search(sur_index, parse_surround("alpha w beta OR gamma"), k=10,
                precision="float64")
    want = search(
        sur_index,
        ("or", [span_near(["alpha", "beta"], slop=0), ("term", "gamma")]),
        k=10, precision="float64",
    )
    assert td.docids.tolist() == want.docids.tolist()
    assert td.scores.tolist() == want.scores.tolist()


def test_surround_not(sur_index):
    td = search(sur_index, parse_surround("alpha NOT delta"), k=10)
    assert _ids(td) == [0, 2, 4]


def test_surround_weight_equals_classic_boost(sur_index):
    got = search(sur_index, parse_surround("alpha^2 OR gamma"), k=10,
                 precision="float64")
    want = search(sur_index, parse_query("alpha^2 OR gamma"), k=10,
                  precision="float64")
    assert got.docids.tolist() == want.docids.tolist()
    assert got.scores.tolist() == want.scores.tolist()
