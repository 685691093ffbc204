"""Thin file-source wrappers: the scan layer of the engine.

All of these are native Spark readers (predicate pushdown, column
pruning, partition discovery over directory globs and ``s3a://``
paths come built in); the wrappers pin the options the engine relies
on and document the reference mapping (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    schema: str | None = None,
    delimiter: str = ",",
) -> DataFrame:
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", str(infer_schema).lower())
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Schema-typed JSONL (Spark's native reader: unifies mixed types).
    For reference-exact per-row type fidelity / choice inference use
    sources.jsonl.read_jsonl_variant instead."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path)
