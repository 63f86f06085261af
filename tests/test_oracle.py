"""Driver-t2 mirror: run every `__spark_entry__.queries()` entry and its
`oracle_sql()` twin via DuckDB over the same parquet, compare row count,
column names, and canonicalized values (floats rounded to 6 decimals —
FIXTURES.md canonicalization).

Run at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to mirror the driver exactly.
"""

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"{round(float(v), 6):.6f}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_val(r[i]) for i in order) for r in rows)


_ORACLE = entrymod.oracle_sql()
_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_match(spark, sf_dir, name):
    from test_driver_canon import check_driver_family_parity

    sdf = _QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    check_driver_family_parity(name, con, _ORACLE[name], sdf.schema)
    res = con.execute(_ORACLE[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    sc = _canon_rows(scols, srows)
    dc = _canon_rows(dcols, drows)
    if sc != dc:
        diff = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_no_rows_only_queries():
    """Every registry entry must carry a full DuckDB oracle — a rows-only
    entry would silently weaken the driver's correctness gate."""
    assert sorted(set(_QUERIES) - set(_ORACLE)) == []


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
