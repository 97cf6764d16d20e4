"""Driver-gate rehearsal: run every queries() entry at sf0.01 and compare
against its oracle_sql() twin via DuckDB — row count, column names, and
order-insensitive values — exactly what CORRECTNESS_r{N}.json records."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_key_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = canon(QUERIES[name](spark, SF_DIR).toPandas())
    want = canon(duck.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), f"{name} schema"
    assert len(got) == len(want), f"{name} rows: {len(got)} vs {len(want)}"
    for c in got.columns:
        # dtype-kind parity: the driver hashes rendered values, so an engine
        # long vs an oracle HUGEINT->float (71968 vs 71968.0) hash-mismatches
        # even though Python's int==float comparison below would pass.
        assert got[c].dtype.kind == want[c].dtype.kind, (
            f"{name}.{c} dtype kind {got[c].dtype} vs oracle {want[c].dtype}"
        )
        gv, wv = got[c].tolist(), want[c].tolist()
        if got[c].dtype.kind == "f":
            assert all(
                (math.isnan(a) and math.isnan(b)) or a == b for a, b in zip(gv, wv)
            ), f"{name}.{c}"
        else:
            assert gv == wv, f"{name}.{c}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["doc_id", "score_q"]
