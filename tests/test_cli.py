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


def test_cli_search_surround_syntax(spark, tmp_path, capsys):
    # surround proximity syntax through the CLI (--syntax surround):
    # 'alpha w beta' = ordered adjacent (distance 1 -> slop 0)
    rows = [("a", "alpha beta x"), ("b", "beta alpha y"), ("c", "alpha z beta")]
    src = str(tmp_path / "sur.parquet")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out = str(tmp_path / "idx_sur")
    assert not cli_main(["build", "--input", src, "--out", out, "--positions"])
    capsys.readouterr()  # drain the build command's metrics output
    assert not cli_main(["search", "--index", out, "--query", "alpha w beta",
                         "--syntax", "surround", "-k", "5"])
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [h["url"] for h in hits] == ["a"]


def test_cli_suggest_modes(spark, pages_parquet, tmp_path, capsys):
    out = str(tmp_path / "idx_sugg")
    assert not cli_main(["build", "--input", pages_parquet, "--out", out])
    capsys.readouterr()
    # prefix completions
    assert not cli_main(["suggest", "--index", out, "--text", "ga", "-n", "3"])
    got = json.loads(capsys.readouterr().out)
    assert got and got[0]["term"] == "gamma"
    # spell correction (transposition): 'gamam' -> gamma
    assert not cli_main(["suggest", "--index", out, "--text", "gamam",
                         "--mode", "spell", "--always"])
    got = json.loads(capsys.readouterr().out)
    assert any(s["term"] == "gamma" for s in got)
    # word break: 'alphabeta' -> [alpha, beta]
    assert not cli_main(["suggest", "--index", out, "--text", "alphabeta",
                         "--mode", "wordbreak"])
    got = json.loads(capsys.readouterr().out)
    assert got and got[0]["words"] == ["alpha", "beta"]


def test_cli_search_simple_syntax(spark, tmp_path, capsys):
    # SimpleQueryParser syntax through the CLI: 'beta -alpha' under the
    # default OR operator = docs with beta plus all docs lacking alpha
    rows = [("a", "alpha beta x"), ("b", "beta only here"),
            ("c", "gamma delta"), ("d", "alpha solo")]
    src = str(tmp_path / "sqp.parquet")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out = str(tmp_path / "idx_sqp")
    assert not cli_main(["build", "--input", src, "--out", out])
    capsys.readouterr()
    assert not cli_main(["search", "--index", out, "--query", "beta -alpha",
                         "--syntax", "simple", "-k", "10",
                         "--precision", "float64"])
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    got = {h["docid"]: h["score"] for h in hits}
    # doc a: beta only (has alpha); b: beta + 1.0; c: 1.0; d: no match
    assert set(got) == {0, 1, 2}
    assert got[1] > got[0] and got[2] == 1.0


def test_cli_info(spark, pages_parquet, tmp_path, capsys):
    out = str(tmp_path / "idx_info")
    assert not cli_main(["build", "--input", pages_parquet, "--out", out,
                         "--seg-size", "16"])
    capsys.readouterr()
    assert not cli_main(["info", "--index", out, "--top-terms", "3"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["doc_count"] == 40
    assert rep["n_segments"] == 3  # 40 docs / seg_size 16
    assert rep["vocab_size"] > 3
    assert len(rep["top_terms"]) == 3
    assert rep["top_terms"][0]["term"] in ("alpha", "beta")
    assert rep["top_terms"][0]["df"] == 40
    assert sum(s["posting_rows"] for s in rep["segments"]) > 0


def test_cli_term_info_and_merge(spark, pages_parquet, tmp_path, capsys):
    a = str(tmp_path / "idx_a")
    b = str(tmp_path / "idx_b")
    assert not cli_main(["build", "--input", pages_parquet, "--out", a])
    # second index from the same source with different keys
    p2 = str(tmp_path / "pages2.parquet")
    spark.createDataFrame(
        [(f"v{i}", "alpha delta") for i in range(10)],
        "url string, text string").write.parquet(p2)
    assert not cli_main(["build", "--input", p2, "--out", b])
    capsys.readouterr()
    assert not cli_main(["term-info", "--index", a, "--term", "alpha"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["doc_freq"] == 40 and rep["total_term_freq"] == 40
    out = str(tmp_path / "idx_m")
    assert not cli_main(["merge", "--out", out, a, b])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["doc_count"] == 50
    idx = read_index(spark, out)
    assert len(search(idx, "delta", k=20).docids) == 10
