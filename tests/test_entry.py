"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (the DuckDB-oracle strategy —
SURVEY.md §5, the pdata-parity analog)."""

from __future__ import annotations

import math

import duckdb
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
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if -(2**52) < v < 2**52 else v
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    df = q(spark, SF_DIR)
    spark_rows = df.collect()
    spark_set, spark_cols = _rowset(df.columns, [list(r) for r in spark_rows])
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    duck_set, duck_cols_sorted = _rowset(duck_cols, duck_rows)
    assert spark_cols == duck_cols_sorted, f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    assert spark_set == duck_set, f"{name}: values differ"


def test_every_query_is_oracled():
    """Registry invariant: every queries() entry has an oracle_sql() entry
    and vice versa — zero rows-only checks (the whole surface is value-
    hash-graded)."""
    assert set(entry_mod.queries()) == set(entry_mod.oracle_sql())


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"band", "n"}
