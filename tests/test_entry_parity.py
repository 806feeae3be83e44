"""Mirror of the driver's correctness gate: run every __spark_entry__
query on Spark AND its oracle SQL on DuckDB at sf0.01; compare row
count, column names, and order-insensitive exact values.  Queries with
no oracle get a rows-materialize smoke check."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", v.isoformat())
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _rows_canon(rows):
    return sorted(tuple(_canon(v) for v in r) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def test_every_oracle_has_query():
    assert not set(ORACLES) - set(QUERIES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = [c.lower() for c in sdf.columns]

    res = ddb.sql(ORACLES[name])
    ddb_cols = [c.lower() for c in res.columns]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count differs"

    # align duckdb column order to spark's before value compare
    order = [ddb_cols.index(c) for c in spark_cols]
    ddb_rows = [tuple(r[i] for i in order) for r in ddb_rows]
    a, b = _rows_canon(spark_rows), _rows_canon(ddb_rows)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatch: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0
    assert all(not math.isnan(v) for r in rows[:100] for v in r if isinstance(v, float))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "keep" in df.columns
