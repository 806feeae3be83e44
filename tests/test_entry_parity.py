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
    """TYPED canonicalization mirroring the driver's value hash: the
    driver hashes Arrow-typed values, so Decimal('97') != int 97 and
    Decimal('1.5') != Decimal('1.500000') (scale matters).  Do NOT
    normalize here — round 1 normalized Decimals and masked 20 driver
    hash failures caused by DuckDB widening sum() to HUGEINT/DECIMAL(38,x)
    while Spark emitted int64/decimal(28,6).

    Timestamps are the one tolerated divergence: Spark->Arrow stamps the
    session timezone (tz-aware) while DuckDB emits naive — r1's driver
    hash-matched tz-aware vs naive timestamps (events_asof_join), so
    normalize to naive UTC."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        return ("float", repr(v))
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return ("datetime", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if v is None:
        return ("null", None)
    return (type(v).__name__, str(v))


def _rows_canon(rows):
    return sorted(tuple(_canon(v) for v in r) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def test_every_oracle_has_query():
    assert not set(ORACLES) - set(QUERIES)


def test_mirror_sweep_is_the_overflow_gate():
    """The window-count endgame (VERDICT r6 task 8): 67 oracle-backed
    queries will never all fit the driver's 50 slots, so the contract
    is: every oracle-backed query — windowed OR overflow — is swept by
    test_query_matches_oracle against the typed-Arrow DuckDB oracle in
    THIS suite, every round.  'Overflow' therefore formally means
    'oracle-green this round via the mirror', not 'green when last
    rotated in'.  This test pins the sweep's completeness: the
    parametrized list covers every oracle, including the full overflow
    set documented in tests/test_query_order.py."""
    from tests.test_query_order import DRIVER_WINDOW, EXPECTED_OVERFLOW

    assert set(WITH_ORACLE) == set(ORACLES)
    assert len(WITH_ORACLE) == 67
    overflow = {n for n in list(QUERIES)[DRIVER_WINDOW:] if n in ORACLES}
    assert overflow == EXPECTED_OVERFLOW
    assert overflow <= set(WITH_ORACLE)


def _arrow_rows(tbl):
    """Row tuples of Arrow-native Python values — NOT driver-side casts:
    duckdb's fetchall() coerces HUGEINT sums to Python int, masking the
    exact type-widening class the driver's Arrow-based hash catches."""
    cols = [c.to_pylist() for c in tbl.columns]
    return list(zip(*cols)) if cols else []


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, ddb, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = _arrow_rows(sdf.toArrow())
    spark_cols = [c.lower() for c in sdf.columns]

    res = ddb.sql(ORACLES[name])
    ddb_cols = [c.lower() for c in res.columns]
    ddb_rows = _arrow_rows(res.arrow())

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
