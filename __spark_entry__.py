"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real implementations live in ``relationalize_spark.queries``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on sf0.001: nest lineitems per order,
    relationalize back into parent/child tables, join the child through
    the generated rid linkage, and aggregate revenue per order
    priority. Exercises source, flatten, explode, rid linkage, join,
    and aggregation in one plan."""
    from relationalize_spark.operators.relationalize import relationalize
    from relationalize_spark.queries import _LINEITEM_COLS, _dec
    from relationalize_spark.sources.tables import load_table

    sf = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    l = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    nested = l.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct(*_LINEITEM_COLS))).alias("lineitems")
    )
    tables = relationalize(nested, "orders", key_cols=["l_orderkey"])
    parent, child = tables["orders"], tables["orders_lineitems"]
    revenue = (
        _dec("lineitems_l_extendedprice")
        * _dec(F.lit(1) - F.col("lineitems_l_discount"))
    ).cast("decimal(18,4)")
    return (
        parent.join(child, parent.lineitems == child.lineitems__rid_)
        .join(o, parent.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from relationalize_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from relationalize_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
