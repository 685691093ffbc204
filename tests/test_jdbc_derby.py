"""Executed JDBC load lane against Spark's bundled embedded Derby.

The reference's flagship pipeline stage is relationalize -> DDL ->
CREATE -> load -> validate against a live Postgres (reference
examples/full_pokemon_psql_pipeline.py:116-203). No network database
exists in this sandbox, but Spark ships Derby for its Hive metastore,
so ``df.write.jdbc`` itself — driver loading, dialect mapping, CREATE
with schema-driven column types, partition-parallel batched INSERT,
and read-back — runs for REAL here, upgrading the JDBC lane from
plan-generation-only (r1-r4) to executed.
"""

import glob
import os

import pyspark
import pytest
from pyspark.sql import functions as F

from relationalize_spark.sinks.jdbc import (
    DERBY_EMBEDDED_DRIVER,
    derby_memory_url,
    jdbc_column_types,
    load_tables_jdbc,
)

_derby_jar = glob.glob(
    os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar")
)
pytestmark = pytest.mark.skipif(
    not _derby_jar, reason="no bundled Derby jar on this Spark classpath"
)

PROPS = {"driver": DERBY_EMBEDDED_DRIVER}


def test_write_jdbc_roundtrip_counts_and_values(spark):
    url = derby_memory_url("rs_t1")
    df = spark.range(500).select(
        "id",
        (F.col("id") * 1.5).alias("price"),
        F.concat(F.lit("name-"), F.col("id").cast("string")).alias("name"),
        (F.col("id") % 2 == 0).alias("flag"),
    )
    counts = load_tables_jdbc({"items": df}, url, properties=PROPS)
    assert counts == {"items": 500}
    back = spark.read.jdbc(url, "items", properties=PROPS)
    assert {f.name for f in back.schema.fields} == {"id", "price", "name", "flag"}
    a = df.agg(
        F.sum("id").alias("si"), F.sum("price").alias("sp"),
        F.sum(F.col("flag").cast("int")).alias("sf"),
        F.count(F.when(F.col("name") == "name-7", 1)).alias("n7"),
    ).first()
    b = back.agg(
        F.sum("id").alias("si"), F.sum("price").alias("sp"),
        F.sum(F.col("flag").cast("int")).alias("sf"),
        F.count(F.when(F.col("name") == "name-7", 1)).alias("n7"),
    ).first()
    assert tuple(a) == tuple(b)


def test_relationalized_pipeline_loads_via_jdbc(spark):
    """The reference's full stage on real JSON: dynamic relationalize
    (choice columns included) -> executed JDBC CREATE+load -> counts
    validated per table through the live connection."""
    import json
    import tempfile

    from relationalize_spark.sources.jsonl import relationalize_json

    objs = [
        {"k": 1, "tags": ["a", "b"], "price": 9.5},
        {"k": 2, "tags": [], "price": "call"},   # price: c-float-str
        {"k": 3},
    ]
    d = tempfile.mkdtemp()
    p = os.path.join(d, "in.jsonl")
    with open(p, "w") as f:
        for o in objs:
            f.write(json.dumps(o) + "\n")
    res = relationalize_json(p, "prod", spark=spark)

    url = derby_memory_url("rs_t2")
    counts = load_tables_jdbc(res.tables, url, properties=PROPS)
    assert counts["prod"] == 3
    assert counts["prod_tags"] == 2
    back = spark.read.jdbc(url, "prod", properties=PROPS)
    cols = {f.name for f in back.schema.fields}
    assert {"k", "price_float", "price_str", "tags"} <= cols
    got = {r.k: (r.price_float, r.price_str) for r in back.collect()}
    assert got[1] == (9.5, None)
    assert got[2] == (None, "call")
    res.unpersist()


def test_jdbc_column_types_layout(spark):
    """The createTableColumnTypes string matches generate_ddl's
    choice-split, sorted layout."""
    from relationalize_spark.schema import Schema

    s = Schema({"a": "c-int-str", "b": "float"})
    assert jdbc_column_types(s) == "`a_int` BIGINT, `a_str` VARCHAR(65535), `b` FLOAT"
