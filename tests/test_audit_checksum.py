"""table_checksum and merge_partial_aggs contracts."""

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.audit import merge_partial_aggs, table_checksum


def test_checksum_partitioning_invariant(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    a = table_checksum(c, ["c_custkey", "c_name"]).first()
    b = table_checksum(c.repartition(17), ["c_custkey", "c_name"]).first()
    assert tuple(a) == tuple(b)


def test_checksum_detects_single_value_change(spark):
    base = spark.createDataFrame(
        [(i, f"name{i}") for i in range(100)], "id long, name string"
    )
    tweaked = base.withColumn(
        "name", F.when(F.col("id") == 37, "nameX").otherwise(F.col("name"))
    )
    a = table_checksum(base).first()
    b = table_checksum(tweaked).first()
    assert a.n_rows == b.n_rows
    assert a.checksum != b.checksum


def test_checksum_distinguishes_null_placement(spark):
    """concat_ws silently skips NULLs, so without a per-column NULL
    sentinel ('a', NULL, 'b') and ('a', 'b', NULL) render identically
    and two value-different tables pass as checksum-equal (ADVICE r3).
    The coalesce(cast, chr(0)) rendering makes NULL position part of
    the fingerprint."""
    a = spark.createDataFrame(
        [("a", None, "b")], "x string, y string, z string"
    )
    b = spark.createDataFrame(
        [("a", "b", None)], "x string, y string, z string"
    )
    ra, rb = table_checksum(a).first(), table_checksum(b).first()
    assert (ra.n_rows, ra.distinct_rows) == (rb.n_rows, rb.distinct_rows)
    assert ra.checksum != rb.checksum


def test_checksum_matches_duckdb_rendering(spark):
    """The docstring's DuckDB recipe (coalesce + chr(0) sentinel) must
    reproduce the Spark checksum bit for bit, NULLs included — that
    cross-engine replayability is the operator's whole point."""
    import duckdb

    rows = [(1, "a", None), (2, None, "b"), (3, "c", "d")]
    df = spark.createDataFrame(rows, "id long, u string, v string")
    got = table_checksum(df, ["id", "u", "v"]).first()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, u VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = con.sql(
        "SELECT count(*), count(DISTINCT r), "
        "bit_xor(CAST(('0x' || substr(md5(r), 1, 15)) AS BIGINT)) FROM ("
        "  SELECT concat_ws(chr(31), coalesce(CAST(id AS VARCHAR), chr(0)),"
        "    coalesce(u, chr(0)), coalesce(v, chr(0))) AS r FROM t)"
    ).fetchone()
    assert (got.n_rows, got.distinct_rows, got.checksum) == want


def test_checksum_duplicate_pair_caveat_is_visible(spark):
    # XOR cancels a duplicated row PAIR; distinct_rows exposes it.
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    doubled = base.union(spark.createDataFrame([(1, "a"), (1, "a")],
                                               "id long, v string"))
    a, d = table_checksum(base).first(), table_checksum(doubled).first()
    assert a.checksum == d.checksum  # the cancellation
    assert (a.n_rows, a.distinct_rows) != (d.n_rows, d.distinct_rows)


def test_merge_partials_equals_total(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # shard by an arbitrary hash — nothing aligned with the group key
    shard = (F.col("o_orderkey") % 7).alias("__shard__")
    partials = o.groupBy("o_orderstatus", shard).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        F.min("o_orderdate").alias("lo"),
        F.max("o_orderdate").alias("hi"),
    )
    merged = merge_partial_aggs(
        partials, ["o_orderstatus"],
        count_col="n", sum_cols=["total"], min_cols=["lo"], max_cols=["hi"],
    )
    direct = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        F.min("o_orderdate").alias("lo"),
        F.max("o_orderdate").alias("hi"),
    )
    got = {r.o_orderstatus: tuple(r)[1:] for r in merged.collect()}
    want = {r.o_orderstatus: tuple(r)[1:] for r in direct.collect()}
    assert got == want


def test_merge_is_associative(spark):
    rows = [("g", i % 3, 1, i) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, shard int, n long, x long")
    partials = df.groupBy("k", "shard").agg(
        F.sum("n").alias("n"), F.sum("x").alias("x")
    )
    once = merge_partial_aggs(partials, ["k"], count_col="n", sum_cols=["x"])
    # merge in two stages: shards {0,1} first, then fold in shard {2}
    stage1 = merge_partial_aggs(
        partials.where("shard < 2"), ["k"], count_col="n", sum_cols=["x"]
    )
    twice = merge_partial_aggs(
        stage1.unionByName(partials.where("shard = 2").select("k", "n", "x")),
        ["k"], count_col="n", sum_cols=["x"],
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
