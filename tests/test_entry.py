"""Pre-flight for the driver contract: run every queries() entry at sf0.001
and compare against its oracle_sql() via DuckDB — row count, column names,
and order-insensitive values (the driver's own gate, replayed locally)."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pandas as pd
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("ENTRY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(ROOT, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ENTRY = _load_entry()
ORACLES = ENTRY.oracle_sql()
QUERIES = ENTRY.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = ddb.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    # EXACT comparison including floats — the driver hashes values, so any
    # float drift between engines is a failure (compute both sides in the
    # same precision instead of tolerating drift here)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(e[c]):
            assert (g[c].astype(float).fillna(0) == e[c].astype(float).fillna(0)).all(), (
                f"{name}: float values differ in column {c} "
                f"(max diff {(g[c].astype(float) - e[c].astype(float)).abs().max()})"
            )
        else:
            assert g[c].astype(str).tolist() == e[c].astype(str).tolist(), (
                f"{name}: values differ in column {c}"
            )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
