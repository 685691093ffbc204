"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compare row count, column names, and the
order-insensitive multiset of canonicalized row values.

Values are canonicalized strictly (exact float bits, exact decimal
string, isoformat timestamps) — stricter than any reasonable hash, so
passing here should mean passing the driver's gate.
"""

import datetime
import decimal
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from relationalize_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"D:{v.isoformat()}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    return f"s:{v}"


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        tuple(canon(row[c]) for c in cols) for row in df.collect()
    )


def _duck_rows(con, sql):
    res = con.sql(sql)
    names = list(res.columns)
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, sorted(
        tuple(canon(r[i]) for i in order) for r in res.fetchall()
    )


ALL = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(spark, SF_DIR)
    if name not in oracles:
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    s_cols, s_rows = _spark_rows(df)
    d_cols, d_rows = _duck_rows(duck, oracles[name])
    assert s_cols == d_cols, f"column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{len(mismatches)} row mismatches; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["o_orderpriority", "n_items", "revenue"]
