"""Loaders for the benchmark/test tables.

``events.parquet`` is written with INT64 TIMESTAMP(NANOS) which Spark
cannot read natively (PARQUET_TYPE_ILLEGAL). We flip the session conf
``spark.sql.legacy.parquet.nanosAsLong`` at runtime (it is a session
conf, safe to set after startup) and rebuild a microsecond timestamp
column, which matches how DuckDB presents the same file (TIMESTAMP,
microsecond precision).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
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
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # Integer division: float division of ~1.7e18 nanos exceeds
            # double precision and lands 1us off after truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view so spark.sql can query them."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
