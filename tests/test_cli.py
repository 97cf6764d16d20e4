"""CLI surface: build from a parquet path and from a catalog table
(--input-table, the Iceberg/Hive/view source of the north rule — temp views
resolve through the same spark.table() path an Iceberg catalog would)."""

import json
import subprocess
import sys

import pytest

from lucene_spark.cli import main as cli_main
from lucene_spark.index import read_index
from lucene_spark.search import search


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("clisrc") / "pages.parquet")
    rows = [(f"u{i}", f"alpha beta doc{i} " + ("gamma " * (i % 3))) for i in range(40)]
    spark.createDataFrame(rows, "url string, text string").write.parquet(p)
    return p


def test_build_from_input_table(spark, pages_parquet, tmp_path):
    spark.read.parquet(pages_parquet).createOrReplaceTempView("pages_view")
    out = str(tmp_path / "idx_tbl")
    rc = cli_main(["build", "--input-table", "pages_view", "--out", out])
    assert not rc
    idx = read_index(spark, out)
    assert idx.doc_count == 40
    td = search(idx, "alpha AND gamma", k=5)
    assert len(td.docids) == 5


def test_build_rejects_both_sources(pages_parquet):
    with pytest.raises(SystemExit):
        cli_main(["build", "--input", pages_parquet,
                  "--input-table", "pages_view", "--out", "/tmp/x"])


def test_build_and_search_roundtrip_from_path(spark, pages_parquet, tmp_path):
    out = str(tmp_path / "idx_path")
    rc = cli_main(["build", "--input", pages_parquet, "--out", out])
    assert not rc
    idx = read_index(spark, out)
    td = search(idx, "beta", k=3)
    assert len(td.docids) == 3
