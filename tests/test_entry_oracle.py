"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compare row count, column names, and the
order-insensitive multiset of canonicalized row values.

Driver-faithful path (learned from round 1): results go through
pandas (``df.toPandas()`` / ``rel.df()``) and cells are compared by
their string rendering. That makes the gate TYPE-SENSITIVE in
exactly the way the driver is: DuckDB renders DECIMAL aggregates as
float64 (shortest repr, ``269039.8``) while Spark keeps
``Decimal('269039.80')`` — so a final DECIMAL output column is a
latent hash mismatch whenever a value has a trailing zero. The
repo convention is therefore: final numeric outputs are BIGINT or
DOUBLE, never DECIMAL (decimals are used *inside* the aggregation
for exactness, then cast once at the end).
"""

import datetime
import decimal
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from relationalize_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def canon(v):
    """Render a pandas cell the way a str()-based hasher would see it.

    Deliberately does NOT unify Decimal with float: the driver's gate
    distinguishes them (round-1 evidence), so we must too.
    """
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "∅"
        return f"n:{f!r}"
    if isinstance(v, decimal.Decimal):
        return f"n:{v}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"D:{v.isoformat()}"
    if isinstance(v, (int, np.integer)):
        return f"n:{int(v)}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return f"y:{v.hex()}"
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


def _pandas_rows(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    return cols, sorted(
        tuple(canon(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )


def _spark_rows(df):
    return _pandas_rows(df.toPandas())


def _duck_rows(con, sql):
    return _pandas_rows(con.sql(sql).df())


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


# -- second sweep at the DRIVER's sf (slow lane) ----------------------------
# r9's q143 hash mismatch reproduced ONLY at sf0.01 (the driver's
# gate sf); the default sweep above runs sf0.001 for speed, so the
# full suite gets a second, slow-marked sweep at sf0.01 — the gate
# itself is now sf-complete instead of relying on ad-hoc manual
# SPARK_GRAFT_ORACLE_SF_DIR runs.

SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def duck_sf01():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF01_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle_sf01(spark, duck_sf01, name):
    if SF01_DIR == SF_DIR:
        pytest.skip("default sweep already runs at sf0.01")
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(spark, SF01_DIR)
    if name not in oracles:
        assert df.count() >= 0
        return
    s_cols, s_rows = _spark_rows(df)
    d_cols, d_rows = _duck_rows(duck_sf01, oracles[name])
    assert s_cols == d_cols, f"column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[:3]}"
