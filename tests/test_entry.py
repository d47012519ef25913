"""Replicates the driver's correctness gate locally: run every
queries()[name] on Spark and its oracle_sql()[name] on DuckDB at sf0.01,
compare row count, column names, and order-insensitive rounded values."""

from __future__ import annotations

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
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        # unify ints (spark may give int32 vs duckdb int64)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entry_mod.queries()[name]
    got = qfn(spark, SF_DIR).toPandas()
    exp = ddb.execute(entry_mod.oracle_sql()[name]).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: columns"
    g, e = canon(got), canon(exp)
    pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=2e-6, rtol=0,
                                  check_exact=False, obj=name)


def test_no_rows_only_queries_remain():
    """Every registered query carries a DuckDB oracle twin — the
    rows-only escape hatch (r1-r3) is empty since the r4 promotions
    (self-verifying invariant booleans for the model/probabilistic
    queries)."""
    assert sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql())) == []


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_gorilla_roundtrip_invariant(spark):
    # compression-ratio coverage lives in test_gorilla.py; this query is
    # now a self-verifying oracle emitting integer counts only
    out = entry_mod.queries()["gorilla_roundtrip"](spark, SF_DIR).toPandas()
    assert (out["n_mismatch"] == 0).all()
    assert (out["n_docs"] > 0).all()
