"""Taxonomy facets: top-children / rollup / drill-down / drill-sideways."""

import pytest

from lucene_spark.facets import all_counts, drill_down, drill_sideways, top_children

ROWS = [
    # (docid, lang, source)
    (0, "en", "web"), (1, "en", "web"), (2, "en", "book"),
    (3, "de", "web"), (4, "de", "news"), (5, "fr", "news"),
    (6, "en", "news"), (7, "de", "web"),
]


@pytest.fixture(scope="module")
def matches(spark):
    return spark.createDataFrame(ROWS, "docid long, lang string, source string")


def test_top_children_root(matches):
    got = [(r["label"], r["count"]) for r in
           top_children(matches, ["lang", "source"]).collect()]
    assert got == [("en", 4), ("de", 3), ("fr", 1)]


def test_top_children_under_path_and_tiebreak(matches):
    got = [(r["label"], r["count"]) for r in
           top_children(matches, ["lang", "source"], ["en"]).collect()]
    # web=2 first; book/news tie at 1 -> label asc
    assert got == [("web", 2), ("book", 1), ("news", 1)]
    got_top1 = top_children(matches, ["lang", "source"], ["de"], topn=1).collect()
    assert (got_top1[0]["label"], got_top1[0]["count"]) == ("web", 2)


def test_all_counts_rollup(matches):
    got = {(r["depth"], tuple(r["path"])): r["count"] for r in
           all_counts(matches, ["lang", "source"]).collect()}
    assert got[(1, ("en",))] == 4
    assert got[(2, ("en", "web"))] == 2
    assert got[(2, ("de", "news"))] == 1
    # every depth-1 count equals the sum of its depth-2 children
    for lang in ("en", "de", "fr"):
        kids = sum(v for (d, p), v in got.items() if d == 2 and p[0] == lang)
        assert got[(1, (lang,))] == kids


def test_drill_down(matches):
    assert drill_down(matches, ["lang", "source"], ["en"]).count() == 4
    assert drill_down(matches, ["lang", "source"], ["en", "web"]).count() == 2
    assert drill_down(matches, ["lang", "source"], ["zz"]).count() == 0
    # FILTER semantics: original columns survive
    assert set(drill_down(matches, ["lang", "source"], ["fr"]).columns) == {
        "docid", "lang", "source"}


def test_drill_sideways(matches):
    hits, sib = drill_sideways(matches, ["lang", "source"], ["en", "web"])
    assert hits.count() == 2
    # siblings: counts at the 'source' level scoped to lang=en, web included
    got = [(r["label"], r["count"]) for r in sib.collect()]
    assert got == [("web", 2), ("book", 1), ("news", 1)]


def test_array_path_column(spark):
    df = spark.createDataFrame(
        [(0, ["a", "x"]), (1, ["a"]), (2, ["b", "y"])],
        "docid long, path array<string>",
    )
    got = [(r["label"], r["count"]) for r in top_children(df, "path").collect()]
    assert got == [("a", 2), ("b", 1)]
    # depth-2 under 'a': only doc0 has a second level
    got2 = [(r["label"], r["count"]) for r in top_children(df, "path", ["a"]).collect()]
    assert got2 == [("x", 1)]


def test_ssdv_facet_counts(spark):
    """SortedSetDocValues facet: one count per DISTINCT per-doc value,
    count desc then label asc, nulls dropped."""
    from pyspark.sql import functions as F

    from lucene_spark.facets import ssdv_facet_counts

    rows = [
        (0, ["red", "blue", "red"]),   # red counted ONCE for this doc
        (1, ["red"]),
        (2, ["blue", None]),
        (3, ["green", "blue"]),
    ]
    df = spark.createDataFrame(rows, "docid long, vals array<string>")
    out = [(r["label"], r["count"])
           for r in ssdv_facet_counts(df, "vals", topn=10).collect()]
    assert out == [("blue", 3), ("red", 2), ("green", 1)]
    assert [(r["label"], r["count"])
            for r in ssdv_facet_counts(df, "vals", topn=1).collect()] == [("blue", 3)]
