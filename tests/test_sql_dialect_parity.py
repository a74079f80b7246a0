"""Dialect-shared oracles run VERBATIM through Spark SQL too: three
independent evaluations (DataFrame API, Spark SQL, DuckDB — the last via
test_entry.py) of the same query must agree. Covers the SQL API surface of
the engine and pins that the oracle strings are genuinely ANSI."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# oracles written in the ANSI subset both engines parse (no duck list_* /
# arg_min / lateral unnest)
SHARED_DIALECT = [
    "band_histogram",
    "count_by_type",
    "parse_stats",
    "kv_extract",
    "enrich_broadcast",
    "set_op_joins",
    "pricing_summary",
    "topk_users",
    "dedup_exact",
    "salted_group_counts",
    "early_stop",
    "wire_band_histogram",
    "wire_record_counts",
    "wire_attr_resolution",
    "wire_field_validation",
    "dedup_rows",
]


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    for t in TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if isinstance(v, int):
        return float(v) if -(2**52) < v < 2**52 else v
    return v


@pytest.mark.parametrize("name", SHARED_DIALECT)
def test_dataframe_equals_sparksql_oracle(spark, name):
    df_api = entry_mod.queries()[name](spark, SF_DIR)
    df_sql = spark.sql(entry_mod.oracle_sql()[name])
    a_cols = sorted(df_api.columns)
    b_cols = sorted(df_sql.columns)
    assert a_cols == b_cols, name
    a = sorted(
        tuple(_norm(r[c]) for c in a_cols) for r in df_api.collect()
    )
    b = sorted(
        tuple(_norm(r[c]) for c in b_cols) for r in df_sql.collect()
    )
    assert a == b, name
