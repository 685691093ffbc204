"""Query registry: the engine's query surface, with DuckDB oracles.

Each entry couples a Spark DataFrame program with the ANSI-SQL oracle
the driver runs on DuckDB over the same parquet tables. Conventions
that make the value-hash comparison exact:

- Money aggregates are computed in DECIMAL (exact in both engines) —
  float sums depend on accumulation order and would differ in the
  last bits between Spark and DuckDB.
- Averages are ``CAST(exact-decimal-sum AS DOUBLE) / COUNT`` so both
  engines do one identical float division.
- Time arithmetic uses integer epoch microseconds.
- Every computed column is aliased identically in both programs, and
  top-k queries carry a deterministic tiebreak key.

Scale notes are in each query's docstring: dimension joins broadcast
(region/nation/supplier/part are small at every SF); fact-fact joins
shuffle on their keys; AQE handles skew/coalescing at runtime.
"""

from __future__ import annotations

import threading as _threading
from collections.abc import Callable
from contextlib import contextmanager as _contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.lattice import floor_lattice
from .functions.timeutil import col_epoch_micros
from .operators import text as _TXT
from .operators.relationalize import relationalize
from .plans.scale import ensure_parallelism
from .sources.tables import load_table

D2 = "decimal(18,2)"


def _dec(c) -> "F.Column":
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(D2)


# --------------------------------------------------------------------------
# TPC-H-style relational queries
# --------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate. One shuffle on the two
    low-cardinality group keys; partial aggregation makes the shuffle
    tiny regardless of input size."""
    # Spread the heavy DECIMAL arithmetic across cores when the scan
    # under-parallelizes (single-row-group local files -> ONE task; a
    # no-op at scale where the scan already has >= parallelism tasks).
    # Hash-keyed on l_orderkey: no sort-before-repartition, retry-safe.
    # All aggregates are exact DECIMAL/COUNT sums, so partial-agg
    # order cannot perturb the result. r11 A/B: 1.28 -> 0.78 s warm.
    l = ensure_parallelism(load_table(spark, sf, "lineitem"), key="l_orderkey")
    disc = _dec(F.lit(1) - F.col("l_discount"))
    tax = _dec(F.lit(1) + F.col("l_tax"))
    disc_price = (_dec("l_extendedprice") * disc).cast("decimal(18,4)")
    charge = (disc_price * tax).cast("decimal(18,6)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * CAST(1 + l_tax AS DECIMAL(18,2)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q02_hypertable_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style continuous aggregate: 15-minute downsample of
    the event stream per type, densified so every bucket in each
    type's active range exists, with the average gauge value carried
    forward (LOCF) across empty buckets and counters zero-filled.

    Scale: the rollup is one map-side-combined shuffle on
    (event_type, bucket); the spine explode generates only the
    *missing* buckets (bounded by retention window / bucket width per
    key, independent of event volume); LOCF is one window pass over
    the already-small bucket rows. Entirely codegen'd — no Python.
    """
    from .operators.timeseries import gap_fill_locf, rollup_time_buckets

    e = load_table(spark, sf, "events")
    rolled = rollup_time_buckets(
        e,
        ["event_type"],
        "ts",
        900,
        [
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_dec("value")).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
        ],
    )
    filled = gap_fill_locf(
        rolled,
        ["event_type"],
        "bucket_idx",
        900,
        ["avg_value"],
        counter_cols=["n_events"],
        ts_dtype=e.schema["ts"].dataType,
    )
    return filled.select(
        "event_type", "bucket_start", "n_events", "avg_value",
        "avg_value_locf", "filled",
    )


Q02_SQL = """
WITH agg AS (
  SELECT event_type, epoch_us(ts) // 900000000 AS b,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*) AS avg_value
  FROM events GROUP BY 1,2),
bounds AS (SELECT event_type, MIN(b) AS lo, MAX(b) AS hi FROM agg GROUP BY 1),
spine AS (SELECT event_type, UNNEST(generate_series(lo, hi)) AS b FROM bounds)
SELECT s.event_type,
  make_timestamp(s.b * 900000000) AS bucket_start,
  COALESCE(a.n_events, 0) AS n_events,
  a.avg_value AS avg_value,
  last_value(a.avg_value IGNORE NULLS) OVER (
    PARTITION BY s.event_type ORDER BY s.b
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_locf,
  (a.n_events IS NULL) AS filled
FROM spine s LEFT JOIN agg a ON s.event_type = a.event_type AND s.b = a.b
"""


def q03_top_unshipped_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + top-k. customer filter
    prunes before the join; orders-lineitem join shuffles on orderkey;
    top-k is a tiny final sort after partial aggregation."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < cutoff)
    # Keyed scan-parallelism guard (see q01): the broadcast-join probe
    # side otherwise runs on the lone single-row-group scan task.
    # r11 A/B: 1.02 -> 0.85 s warm. No-op at scale.
    l = ensure_parallelism(
        load_table(spark, sf, "lineitem"), key="l_orderkey"
    ).filter(F.col("l_shipdate") > cutoff)
    disc_price = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q03_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q05_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: star join through region/nation (broadcast) with
    the c_nationkey = s_nationkey co-location condition."""
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf, "nation")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf, "lineitem")
    disc_price = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


Q05_SQL = """
SELECT n_name,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q06_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate; predicates push
    to the parquet scan (no shuffle at all beyond the final reduce)."""
    l = load_table(spark, sf, "lineitem")
    revenue = (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(18,4)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q06_SQL = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.06
  AND l_quantity < 24
"""


def q04_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS -> left-semi join, then count by priority."""
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = load_table(spark, sf, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q04_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


def q07_global_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Global aggregate incl. COUNT(DISTINCT): partial+final aggregation."""
    o = load_table(spark, sf, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_value"),
    )


Q07_SQL = """
SELECT COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
"""


def q08_segment_top_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Window rank partitioned by segment; single shuffle on the
    partition key, rank evaluated streaming within partitions."""
    c = load_table(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rk")
    )


Q08_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
    RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer
) WHERE rk <= 3
"""


def q09_running_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative window sum per customer in exact DECIMAL (float window
    sums would depend on the engine's accumulation strategy)."""
    o = load_table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


Q09_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""


def q10_status_priority_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP grouping sets (hierarchical subtotals + grand total)."""
    o = load_table(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_value"),
        )
    )


Q10_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q11_flag_status_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets over lineitem flags."""
    l = load_table(spark, sf, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


Q11_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q12_setops(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT/INTERSECT distinct semantics: 1996 high-value customers
    also active in 1997, minus any with an open ('O') order."""
    o = load_table(spark, sf, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_totalprice") > 150000)
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_totalprice") > 150000)
    ).select("o_custkey")
    open_orders = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return y96.intersect(y97).subtract(open_orders)


Q12_SQL = """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND o_totalprice > 150000
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  AND o_totalprice > 150000
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def q13_customers_without_orders(spark: SparkSession, sf: str) -> DataFrame:
    """NOT EXISTS -> left-anti join (customers with no URGENT order)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


Q13_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


def q14_suppliers_semi(spark: SparkSession, sf: str) -> DataFrame:
    """IN-subquery -> left-semi join against a broadcastable key set."""
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer").filter(F.col("c_acctbal") > 9000)
    return s.join(
        c.select("c_nationkey"), s.s_nationkey == F.col("c_nationkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


Q14_SQL = """
SELECT s_suppkey, s_name, s_nationkey FROM supplier
WHERE s_nationkey IN (SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
"""


def q15_scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar expression battery: string/math/conditional functions,
    all whole-stage-codegen built-ins."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.length(F.col("p_name")).cast("int").alias("name_len"),
        F.substring(F.col("p_brand"), 1, 5).alias("brand5"),
        F.concat_ws("#", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_diff"),
        F.when(F.col("p_size") > 25, "L")
        .when(F.col("p_size") > 10, "M")
        .otherwise("S")
        .alias("size_class"),
    )


Q15_SQL = """
SELECT p_partkey,
  UPPER(p_name) AS name_upper,
  CAST(LENGTH(p_name) AS INT) AS name_len,
  SUBSTRING(p_brand, 1, 5) AS brand5,
  CONCAT_WS('#', p_brand, p_type) AS brand_type,
  ABS(p_retailprice - 1000.0) AS price_diff,
  CASE WHEN p_size > 25 THEN 'L' WHEN p_size > 10 THEN 'M' ELSE 'S' END AS size_class
FROM part
"""


def q16_date_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time extraction and truncation."""
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
    )


Q16_SQL = """
SELECT o_orderkey,
  CAST(YEAR(o_orderdate) AS INT) AS order_year,
  CAST(MONTH(o_orderdate) AS INT) AS order_month,
  CAST(DAY(o_orderdate) AS INT) AS order_day,
  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
  CAST(QUARTER(o_orderdate) AS INT) AS order_quarter
FROM orders
"""


def q17_events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Time-bucketed aggregation over the event stream table (the batch
    equivalent of the streaming windowed count)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
            (F.sum(_dec("value")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        )
    )


Q17_SQL = """
SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY DATE_TRUNC('hour', ts), event_type
"""


def q18_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + conditional
    sum per user, all in integer epoch-microseconds."""
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = col_epoch_micros(e, "ts")
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"))
    )


Q18_SQL = """
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions FROM (
  SELECT user_id,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) > 1800000000
         OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
    THEN 1 ELSE 0 END AS new_session
  FROM events
) GROUP BY user_id
"""


def q19_events_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured path extraction from the JSON props column."""
    e = load_table(spark, sf, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k").cast("bigint")).alias("sum_k"),
            (F.sum(F.col("k").cast("bigint")).cast("double") / F.count("k")).alias("avg_k"),
        )
    )


Q19_SQL = """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE) / COUNT(k) AS avg_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Relationalize-based queries (the engine's signature transform, checked
# against a pure-SQL oracle; generated rids are excluded — they are
# surrogate keys whose *linkage*, not value, is the contract).
# --------------------------------------------------------------------------

_LINEITEM_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)


def q20_relationalize_explode(spark: SparkSession, sf: str) -> DataFrame:
    """Round-trip: nest lineitems per order into an array, relationalize
    back out, return the child table. Verifies array split-out, element
    flattening and 0-based __index_ against a window-function oracle.
    The per-order sort uses the full column tuple so index assignment
    is multiset-stable even for duplicate rows."""
    l = load_table(spark, sf, "lineitem")
    # Hash-partition by the group key BEFORE the collect_list: the
    # single-row-group parquet scan is one task, and shipping raw rows
    # through one exchange then aggregating on all cores beats partial
    # collect_list aggregation on the lone scan task (collect_list has
    # no map-side reduction to exploit anyway).
    nested = l.repartition("l_orderkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct(*_LINEITEM_COLS))).alias("lineitems")
    )
    tables = relationalize(nested, "orders", key_cols=["l_orderkey"])
    child = tables["orders_lineitems"]
    return child.select(
        *[f"lineitems_{c}" for c in _LINEITEM_COLS], "lineitems__index_"
    )


Q20_SQL = """
SELECT
  l_orderkey AS lineitems_l_orderkey,
  l_partkey AS lineitems_l_partkey,
  l_suppkey AS lineitems_l_suppkey,
  l_linenumber AS lineitems_l_linenumber,
  l_quantity AS lineitems_l_quantity,
  l_extendedprice AS lineitems_l_extendedprice,
  l_discount AS lineitems_l_discount,
  l_tax AS lineitems_l_tax,
  l_returnflag AS lineitems_l_returnflag,
  l_linestatus AS lineitems_l_linestatus,
  l_shipdate AS lineitems_l_shipdate,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY l_orderkey
    ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  ) - 1 AS INT) AS lineitems__index_
FROM lineitem
"""


def q21_relationalize_flatten(spark: SparkSession, sf: str) -> DataFrame:
    """Struct flatten: nest customer attributes into a struct, flatten
    back to ``{parent}_{child}`` columns."""
    c = load_table(spark, sf, "customer")
    nested = c.select(
        "c_custkey",
        "c_nationkey",
        F.struct("c_name", "c_acctbal", "c_mktsegment").alias("profile"),
    )
    tables = relationalize(nested, "customer", key_cols=["c_custkey"])
    return tables["customer"]


Q21_SQL = """
SELECT c_custkey, c_nationkey,
  c_name AS profile_c_name,
  c_acctbal AS profile_c_acctbal,
  c_mktsegment AS profile_c_mktsegment
FROM customer
"""


def q22_relationalize_linkage(spark: SparkSession, sf: str) -> DataFrame:
    """Referential integrity of generated rids, checked structurally:
    join the child table back to the parent on the rid and count
    children per order — must equal the plain GROUP BY count."""
    l = load_table(spark, sf, "lineitem")
    # Hash-partition by the group key BEFORE the collect_list: the
    # single-row-group parquet scan is one task, and shipping raw rows
    # through one exchange then aggregating on all cores beats partial
    # collect_list aggregation on the lone scan task (collect_list has
    # no map-side reduction to exploit anyway).
    nested = l.repartition("l_orderkey").groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct(*_LINEITEM_COLS))).alias("lineitems")
    )
    tables = relationalize(nested, "orders", key_cols=["l_orderkey"])
    parent, child = tables["orders"], tables["orders_lineitems"]
    return (
        parent.join(child, parent.lineitems == child.lineitems__rid_)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


Q22_SQL = """
SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# Text analysis (operators/text.py)
# --------------------------------------------------------------------------

def q23_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document token/char statistics — pure scan-side expressions."""
    from .operators import text as TX

    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        TX.char_count("text").cast("int").alias("n_chars_out"),
        TX.token_count("text").cast("int").alias("n_tokens"),
        TX.avg_word_length("text").alias("avg_word_len"),
        TX.digit_ratio("text").alias("digit_ratio"),
    )


Q23_SQL = r"""
SELECT doc_id,
  CAST(LENGTH(text) AS INT) AS n_chars_out,
  CAST(LEN(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS INT) AS n_tokens,
  CAST(LENGTH(regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g')) AS DOUBLE)
    / LEN(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS avg_word_len,
  CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / LENGTH(text) AS digit_ratio
FROM documents
"""


def q24_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic n-gram language ID (stopword-profile argmax)."""
    from .operators import text as TX

    d = load_table(spark, sf, "documents")
    return d.select("doc_id", TX.lang_id("text").alias("lang_guess"))


def _q24_sql() -> str:
    from .operators.text import LANG_PROFILES, profile_pattern

    counts = ",\n  ".join(
        f"len(regexp_extract_all(text, '{profile_pattern(w)}')) AS c_{lang}"
        for lang, w in LANG_PROFILES
    )
    langs = [lang for lang, _ in LANG_PROFILES]
    cases = []
    for i, lang in enumerate(langs[:-1]):
        later = [f"c_{x}" for x in langs[i + 1:]]
        guard = f"GREATEST({', '.join(later)})" if len(later) > 1 else later[0]
        cases.append(f"WHEN c_{lang} >= {guard} THEN '{lang}'")
    case_chain = "\n    ".join(cases)
    return f"""
WITH c AS (SELECT doc_id,
  {counts}
FROM documents)
SELECT doc_id,
  CASE {case_chain}
    ELSE '{langs[-1]}' END AS lang_guess
FROM c
"""


def q25_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Composite quality scoring from stopword/digit/length signals."""
    from .operators import text as TX

    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        TX.stopword_ratio("text").alias("stopword_ratio"),
        TX.digit_ratio("text").alias("digit_ratio"),
        TX.quality_score("text").alias("quality_score"),
    )


def _q25_sql() -> str:
    from .operators.text import LANG_PROFILES

    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[0][1])
    return rf"""
SELECT doc_id, swr AS stopword_ratio, dr AS digit_ratio,
  0.4 * swr + 0.3 * (1.0 - dr) + 0.3 * len_sig AS quality_score
FROM (SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
        t -> list_contains([{words}], t))) AS DOUBLE)
    / len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS swr,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / LENGTH(text) AS dr,
  LEAST(1.0, CAST(len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS DOUBLE) / 100.0) AS len_sig
FROM documents)
"""


# --------------------------------------------------------------------------
# Deduplication (operators/dedup.py)
# --------------------------------------------------------------------------

def q26_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup keeping the lowest doc_id per distinct text."""
    from .operators.dedup import exact_dedup

    d = load_table(spark, sf, "documents")
    return exact_dedup(d, subset=["text"], tiebreak="doc_id")


Q26_SQL = """
SELECT d.* FROM documents d
JOIN (SELECT text AS t2, MIN(doc_id) AS m FROM documents GROUP BY 1) g
  ON d.text = g.t2 AND d.doc_id = g.m
"""


def q27_fingerprint_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Content-hash duplicate groups (fingerprint, survivor, size)."""
    from .operators import text as TX

    d = load_table(spark, sf, "documents")
    return d.groupBy(TX.fingerprint("text").alias("fp")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


Q27_SQL = r"""
SELECT md5(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')))) AS fp,
  MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
"""


_JACCARD_ORACLE = r"""
WITH sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '[ \t\n\x0B\f\r]+') AS toks FROM documents)
  ) GROUP BY doc_id, shingle
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT i, j, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
FROM common JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {threshold}
"""


def q28_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate pairs by 3-gram shingle Jaccard >= 0.5 via
    inverted-index self-join with a hot-shingle document-frequency
    cap (1000 is far above this corpus's max df of 25, so the result
    is exact here while the skew guard stays in the executed plan)."""
    from .operators.dedup import jaccard_pairs

    d = load_table(spark, sf, "documents")
    return jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, max_df=1000)


def q29_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate pairs by MinHash banding (32 hashes x 16 bands,
    recall > 0.9999 at j=0.8) with exact Jaccard verification — must
    reproduce the brute-force oracle exactly."""
    from .operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=32, bands=16, threshold=0.8
    )


def q30_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup candidates (hamming <= 3). No SQL oracle: the
    64-bit signature is built on xxhash64, which DuckDB lacks; checked
    rows-only by the driver plus unit tests on known near-dups."""
    from .operators.dedup import simhash_pairs

    d = load_table(spark, sf, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3, bands=4)


# --------------------------------------------------------------------------
# Similarity search (operators/similarity.py)
# --------------------------------------------------------------------------

def q31_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact brute-force cosine top-5 for query vectors vec_id < 10."""
    from .operators.similarity import brute_force_topk

    e = load_table(spark, sf, "embeddings")
    return brute_force_topk(
        e, e.filter(F.col("vec_id") < 10), k=5, round_scores=6
    )


Q31_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings)
SELECT query_id, neighbor_id, score FROM (
  SELECT query_id, neighbor_id,
    CAST(FLOOR(list_cosine_similarity(qv, cv) * 1e6) AS BIGINT) / 1e6 AS score,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY CAST(FLOOR(list_cosine_similarity(qv, cv) * 1e6) AS BIGINT) / 1e6 DESC, neighbor_id ASC) AS rn
  FROM q JOIN c ON query_id != neighbor_id
) WHERE rn <= 5
"""


def q32_embedding_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup pairs by cosine >= 0.45, via banded
    hyperplane LSH + exact verify (equi-join candidates — the oracle
    is the exact cross join, so this also pins LSH recall). 0.45 is a
    ~63-degree angle, so recall needs many narrow tables here; at the
    production threshold (>=0.9) the defaults prune far harder."""
    from .operators.dedup import embedding_dup_pairs

    e = load_table(spark, sf, "embeddings")
    return embedding_dup_pairs(e, threshold=0.45, n_planes=4, n_tables=48, dim=None)


Q32_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS i, b.vec_id AS j,
  CAST(FLOOR(list_cosine_similarity(a.v, b.v) * 1e6) AS BIGINT) / 1e6 AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE CAST(FLOOR(list_cosine_similarity(a.v, b.v) * 1e6) AS BIGINT) / 1e6 >= 0.45
"""


def q33_winnow_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints, production path — the
    r5 'fast64' Arrow-batch core (text.py:_winnow_minima_fast): one
    vectorized numpy pass per batch instead of ~13 interpreted HOF
    lambda evaluations per character. No SQL oracle (rows-only
    check — one row per document, so the count contract is
    hash-family-independent); robustness is unit-tested, and q124
    value-proves the same window/minima/md5 machinery via the md5_60
    gram hash."""
    from .operators import text as TX

    d = ensure_parallelism(load_table(spark, sf, "documents"))
    return d.select(
        "doc_id",
        TX.winnow_fingerprint("text").alias("winnow_fp"),
    )


def q34_relationalize_json_choice(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end dynamic JSON pipeline: build JSONL whose ``mixed``
    key alternates int/string per row, ingest via VARIANT, infer the
    c-int-str choice, convert to split columns — the reference's
    relationalize -> Schema -> convert flow in one plan."""
    from .sources.jsonl import relationalize_json

    e = load_table(spark, sf, "events")
    line = F.concat(
        F.lit('{"event_id": '),
        F.col("event_id").cast("string"),
        F.lit(', "mixed": '),
        F.when(
            F.col("event_id") % 2 == 0, F.get_json_object("props", "$.k")
        ).otherwise(F.concat(F.lit('"'), F.col("event_type"), F.lit('"'))),
        F.lit("}"),
    )
    # Two passes (schema inference + conversion) over parse_json output;
    # spread them across cores — the single-row-group scan is one task.
    vdf = ensure_parallelism(e.select(F.parse_json(line).alias("v")))
    return relationalize_json(vdf, "events_json")["events_json"]


Q34_SQL = """
SELECT event_id,
  CASE WHEN event_id % 2 = 0 THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS mixed_int,
  CASE WHEN event_id % 2 != 0 THEN event_type END AS mixed_str
FROM events
"""


def q35_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing: text payloads as opaque binary through the
    Arrow-batched mapInPandas feature extractor (decode stubbed
    deterministically; see operators/multimodal.py). The oracle checks
    the SQL-derivable outputs (sizes and stub geometry)."""
    from .operators.multimodal import image_features

    d = load_table(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("content")
    )
    # decoder pinned to the deterministic stub so the oracle replays
    # regardless of whether PIL happens to be importable (r5: "auto"
    # uses a real codec when present).
    feats = image_features(d, binary_col="content", id_cols=("doc_id",), decoder="stub")
    return feats.select("doc_id", "n_bytes", "width", "height")


Q35_SQL = """
SELECT doc_id,
  CAST(strlen(text) AS INT) AS n_bytes,
  CAST(strlen(text) % 512 + 16 AS INT) AS width,
  CAST((strlen(text) * 31) % 512 + 16 AS INT) AS height
FROM documents
"""


Q36_SQL = """
SELECT n_name,
  CAST(YEAR(o_orderdate) AS INT) AS order_year,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus <> 'F'
GROUP BY n_name, YEAR(o_orderdate)
"""


def q36_sql_api(spark: SparkSession, sf: str) -> DataFrame:
    """The SQL surface: the same dialect-neutral ANSI string runs
    verbatim through spark.sql over registered views AND through DuckDB
    as its own oracle."""
    from .sources.tables import register_views

    register_views(spark, sf, ("orders", "customer", "nation"))
    return spark.sql(Q36_SQL)


# --------------------------------------------------------------------------
# As-of / range / pivot / extended TPC-H coverage
# --------------------------------------------------------------------------

def q37_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time join: annotate every event with the user's most
    recent purchase at-or-before its timestamp. Spark lacks a native
    as-of join; operators/asof.py implements the union-sort-window
    formulation (one shuffle+sort per key). DuckDB's native ASOF JOIN
    is the oracle."""
    from .operators.asof import asof_join

    e = load_table(spark, sf, "events")
    left = e.select("event_id", "user_id", "ts")
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(left, right, on="user_id", ts="ts", right_cols=["value"])
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_asof").alias("last_purchase_ts"),
        F.col("value").alias("last_purchase_value"),
    )


Q37_SQL = """
WITH r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id,
  r.ts AS last_purchase_ts, r.value AS last_purchase_value
FROM events l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q38_range_bucket_join(spark: SparkSession, sf: str) -> DataFrame:
    """Range-containment join against a broadcast bucket dimension."""
    from .operators.asof import range_bucket_join

    e = load_table(spark, sf, "events")
    buckets = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1000.0, "high")],
        "lo double, hi double, label string",
    )
    return (
        range_bucket_join(e, buckets, "value")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


Q38_SQL = """
SELECT label, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
LEFT JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'), (150.0, 1000.0, 'high'))
  b(lo, hi, label) ON value >= lo AND value < hi
GROUP BY label
"""


def q39_pivot_status(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: order counts per nation x order-status as columns."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


Q39_SQL = """
SELECT n_name,
  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q40_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share of PROMO parts."""
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf, "part")
    disc_price = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_price).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(disc_price).cast("double").alias("total_revenue"),
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc_price).cast("double")
            ).alias("promo_pct"),
        )
    )


Q40_SQL = """
WITH t AS (
  SELECT CASE WHEN p_type LIKE 'PROMO%'
              THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END AS promo,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS dp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01')
SELECT CAST(SUM(promo) AS DOUBLE) AS promo_revenue,
  CAST(SUM(dp) AS DOUBLE) AS total_revenue,
  100.0 * CAST(SUM(promo) AS DOUBLE) / CAST(SUM(dp) AS DOUBLE) AS promo_pct
FROM t
"""


def q41_disjunctive_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs selective predicates across the
    join — Catalyst pushes the common parts below the join."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    disc_price = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return j.filter(clause).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(disc_price).cast("double").alias("revenue"),
    )


Q41_SQL = """
SELECT COUNT(*) AS n_items,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


def q42_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join preserving order-less
    customers, then a histogram of orders-per-customer."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q42_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q43_above_average_idle(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average balance)
    feeding a filter, plus NOT EXISTS, grouped by nation. The scalar
    aggregate joins in declaratively (broadcast of a 1-row frame), not
    via driver collect."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


Q43_SQL = """
SELECT c_nationkey, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def q44_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile``
    == DuckDB ``quantile_cont``, both linear interpolation over the
    sorted exact values). Scale note: exact percentiles require a
    per-group sort; at 100 TB switch to approx_percentile and drop
    the oracle to a tolerance check."""
    l = load_table(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("qty_p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("qty_p90"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("price_p25"),
        F.count(F.lit(1)).alias("n"),
    )


Q44_SQL = """
SELECT l_returnflag,
  quantile_cont(l_quantity, 0.5) AS qty_p50,
  quantile_cont(l_quantity, 0.9) AS qty_p90,
  quantile_cont(l_extendedprice, 0.25) AS price_p25,
  COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q45_edit_distance(spark: SparkSession, sf: str) -> DataFrame:
    """String-distance function battery (levenshtein is the classic
    DP, identical definition in both engines)."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_brand"), F.substring(F.col("p_type"), 1, 8)).cast("int").alias("lev_brand_type"),
        F.levenshtein(F.col("p_name"), F.reverse(F.col("p_name"))).cast("int").alias("lev_palindrome"),
    )


Q45_SQL = """
SELECT p_partkey,
  CAST(levenshtein(p_brand, SUBSTRING(p_type, 1, 8)) AS INT) AS lev_brand_type,
  CAST(levenshtein(p_name, REVERSE(p_name)) AS INT) AS lev_palindrome
FROM part
"""


def q46_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    """The Arrow-vectorized UDF path, validated against the same SQL
    oracle as the pure-Catalyst token counter."""
    from .functions.udfs import pandas_token_count

    d = load_table(spark, sf, "documents")
    return d.select("doc_id", pandas_token_count(F.col("text")).alias("n_tokens"))


Q46_SQL = r"""
SELECT doc_id, CAST(LEN(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS INT) AS n_tokens
FROM documents
"""


def q47_grouped_demean(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas: per-event-type mean-centering. The
    Python-side mean uses math.fsum (correctly-rounded exact sum), so
    it is bit-identical to CAST(exact DECIMAL SUM AS DOUBLE)/COUNT in
    the oracle."""
    from .functions.udfs import grouped_demean

    e = load_table(spark, sf, "events")
    return grouped_demean(e, "event_type", "value")


Q47_SQL = """
SELECT event_type, value,
  value - (CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY event_type) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY event_type)) AS demeaned
FROM events
"""


def q48_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average as a self-join
    against the aggregated side (exact decimal mean -> one identical
    float comparison per row)."""
    l = load_table(spark, sf, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        l.join(per_part, l.l_partkey == per_part.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
        )
    )


Q48_SQL = """
WITH pp AS (
  SELECT l_partkey AS pk,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey)
SELECT COUNT(*) AS n_items,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem JOIN pp ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""


def q49_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregate, joined back to the
    customer dimension."""
    l = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty")
    )


Q49_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q50_returned_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue."""
    l = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    disc_price = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q50_SQL = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q51_signup_purchase_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Event funnel: per user, did a purchase follow the first signup?
    Conditional min-timestamps per user, then a flag comparison."""
    e = load_table(spark, sf, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    converted = (
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_signup"))
    )
    return per_user.select(
        "user_id", "first_signup", "first_purchase", "n_events",
        converted.alias("converted"),
    )


Q51_SQL = """
SELECT user_id,
  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase,
  COUNT(*) AS n_events,
  COALESCE(MIN(CASE WHEN event_type = 'purchase' THEN ts END) >
           MIN(CASE WHEN event_type = 'signup' THEN ts END), FALSE) AS converted
FROM events GROUP BY user_id
"""


def q52_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish subword token accounting (whitespace words vs regex
    pre-tokens), the unit cost estimate for LLM training data."""
    from .operators import text as TX

    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        TX.token_count("text").cast("int").alias("n_words"),
        TX.bpe_token_count("text").cast("int").alias("n_bpe_tokens"),
    )


Q52_SQL = r"""
SELECT doc_id,
  CAST(LEN(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS INT) AS n_words,
  CAST(LEN(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]+')) AS INT) AS n_bpe_tokens
FROM documents
"""


def q53_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-5 by random-hyperplane LSH bucketing + exact
    re-rank, checked against the exact brute-force oracle. On this
    uniform corpus neighbor cosines sit near 0.4 (per-plane agreement
    ~0.63), so recall needs wide tables: 3 planes x 48 tables gives
    per-pair miss probability (1 - 0.63^3)^48 ~ 1e-5. At production
    similarity levels the same recall costs far fewer tables."""
    from .operators.similarity import lsh_topk

    e = load_table(spark, sf, "embeddings")
    return lsh_topk(
        e,
        e.filter(F.col("vec_id") < 10),
        k=5,
        n_planes=3,
        n_tables=48,
        dim=None,
        round_scores=6,
    )


Q53_SQL = Q31_SQL  # exact oracle: LSH must reproduce brute force here


def q54_streaming_windowed_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming driven to completion: watermarked tumbling
    1-hour windows over the events file stream, Trigger.AvailableNow,
    results via a complete-mode memory sink. Deterministic against the
    batch oracle because complete mode emits every window and the
    final watermark only evicts state after the last batch."""
    from .streaming.relationalize_stream import windowed_counts

    stream = _events_stream(spark, sf)
    agg = windowed_counts(
        stream, ts_col="ts", window="1 hour", watermark="2 hours",
        group_cols=["event_type"],
    )
    # complete-mode sink: the watermark-advance-only batch re-emits an
    # identical table -> skip it (see _stream_state_parallelism)
    with _stream_state_parallelism(
        spark,
        source_bytes=_source_backlog_bytes(f"{sf}/events.parquet"),
        skip_nodata_batch=True,
        output_mode="complete",
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("q54_windowed")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("q54_windowed")


Q54_SQL = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
  CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS window_end,
  event_type, COUNT(*) AS n_events
FROM events
GROUP BY 1, 2, 3
"""


def q55_streaming_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming gap-based sessionization via native session_window
    state, driven to completion (AvailableNow + complete-mode memory
    sink) and checked against a SQL islands oracle: a session is a
    maximal run of same-user events with gaps <= 30 min; its end is
    last_event + gap."""
    from .streaming.relationalize_stream import sessionize_stream

    stream = _events_stream(spark, sf)
    agg = sessionize_stream(
        stream, ts_col="ts", user_col="user_id", gap="30 minutes",
        watermark="2 hours",
    )
    # complete-mode sink -> the no-data batch is a pure re-emit; skip
    with _stream_state_parallelism(
        spark,
        source_bytes=_source_backlog_bytes(f"{sf}/events.parquet"),
        skip_nodata_batch=True,
        output_mode="complete",
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("q55_sessions")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("q55_sessions")


Q55_SQL = """
WITH x AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
    THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
y AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT user_id, MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM y GROUP BY user_id, sid
"""


def q56_sole_supplier_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to available columns): per supplier,
    the number of finished orders where it was the ONLY supplier.
    The NOT-EXISTS-other-supplier predicate runs as one aggregation
    (count distinct suppliers per order == 1) instead of a correlated
    self-join probe per row — same result, one shuffle on orderkey,
    and the supplier dimension broadcasts."""
    l = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf, "supplier")
    per_order = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"),
             F.min("l_suppkey").alias("the_supp"))
        .filter(F.col("n_supp") == 1)
    )
    return (
        per_order.join(F.broadcast(s), per_order.the_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_solo_orders"))
        .orderBy(F.desc("n_solo_orders"), F.asc("s_name"))
        .limit(10)
    )


Q56_SQL = """
SELECT s_name, COUNT(*) AS n_solo_orders
FROM (
  SELECT l_orderkey, MIN(l_suppkey) AS the_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) = 1
) solo JOIN supplier ON the_supp = s_suppkey
GROUP BY s_name
ORDER BY n_solo_orders DESC, s_name ASC
LIMIT 10
"""


def q57_cheapest_part_per_type(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: parts matching the per-group minimum price
    (correlated MIN subquery). The per-type minimum is a tiny
    aggregate broadcast back against the part scan — no correlated
    per-row probe, no shuffle of the fact side."""
    p = load_table(spark, sf, "part")
    mins = p.groupBy(F.col("p_type").alias("t")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_type == mins.t) & (p.p_retailprice == mins.min_price),
        )
        .select("p_type", "p_partkey", "p_brand", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


Q57_SQL = """
SELECT p_type, p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
ORDER BY p_type, p_partkey
"""


def q58_rich_idle_customers_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no RECENT orders (none since 2000-01-01), rolled up by
    nation. The global average is an exact decimal aggregate (one
    row, broadcast into the filter); lapsed customers come from a
    left-anti join against the date-pruned orders scan — the date
    predicate pushes to the parquet reader, so the anti-join's right
    side is already a fraction of the fact table."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
        )
    )
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


Q58_SQL = """
WITH ab AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ab
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS n_cust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer, ab
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2000-01-01')
GROUP BY c_nationkey
"""


def q59_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate clustering: Jaccard>=0.5 pairs become edges,
    hash-min label propagation assigns every document the minimum
    doc_id reachable through duplicate links. The iterative step is
    O(diameter) shuffle rounds over (id, label) longs with per-round
    lineage truncation — duplicate clusters are near-cliques, so it
    converges in 2-3 rounds regardless of corpus size."""
    from .operators.dedup import dedup_clusters, jaccard_pairs

    d = load_table(spark, sf, "documents")
    edges = jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, max_df=1000)
    return dedup_clusters(d, edges, id_col="doc_id", src_col="i", dst_col="j")


Q59_SQL = r"""
WITH RECURSIVE
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '[ \t\n\x0B\f\r]+') AS toks FROM documents)
  ) GROUP BY doc_id, shingle
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT i, j FROM common JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
edges AS (SELECT i AS src, j AS dst FROM pairs UNION ALL SELECT j, i FROM pairs),
reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
"""


def q60_bm25_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 top-20 for a 3-term query over the documents
    corpus. Only postings for the query terms leave the token
    explode (predicate applied before any shuffle); df/N/avgdl are
    broadcast scalars, so the whole ranking is one filtered pass
    plus a per-document aggregation."""
    from .operators.text import bm25_topk

    d = load_table(spark, sf, "documents")
    return bm25_topk(d, ["join", "hash", "filter"], k=20, id_col="doc_id")


def _q60_sql(
    k1: float = 1.2, b: float = 0.75, topk: int = 20,
    terms: tuple[str, ...] = ("join", "hash", "filter"),
) -> str:
    """Generated q60 oracle. Float constants are embedded as the
    PYTHON-side values' reprs and CAST to DOUBLE: SQL parses bare
    `2.2`/`1 - 0.85`-style literals as exact DECIMALs, which round
    differently than the IEEE doubles Spark's plan folds (python
    k1 + 1 = 2.1999999999999997 vs SQL decimal 2.2 ->
    2.2000000000000002 — r10 review), and decimal ARITHMETIC on them
    is exact rather than IEEE. Every constant and the quotient
    association below mirror operators/text.py:bm25_topk
    term-for-term."""
    r = repr
    term_list = ", ".join(f"'{t}'" for t in terms)
    ws = r"[ \t\n\x0B\f\r]+"
    return f"""
WITH tok AS (
  SELECT doc_id, lower(unnest(regexp_split_to_array(text, '{ws}'))) AS term,
         len(regexp_split_to_array(text, '{ws}')) AS dl
  FROM documents),
postings AS (
  SELECT doc_id, term, dl, COUNT(*) AS tf FROM tok
  WHERE term IN ({term_list}) GROUP BY 1, 2, 3),
dfreq AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
corpus AS (
  SELECT COUNT(*) AS n_docs,
         CAST(CAST(SUM(len(regexp_split_to_array(text, '{ws}')))
                   AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM documents)
SELECT doc_id AS id,
  CAST(CAST(SUM(CAST(FLOOR(
    (CAST(FLOOR(ln(CAST(n_docs - df + 0.5 AS DOUBLE)
                   / CAST(df + 0.5 AS DOUBLE) + 1.0) * 1e9)
          AS BIGINT) / 1e9)
    * ((tf * CAST({r(k1 + 1)} AS DOUBLE))
       / (tf + CAST({r(k1)} AS DOUBLE)
               * (CAST({r(1 - b)} AS DOUBLE)
                  + (CAST({r(b)} AS DOUBLE) * dl) / avgdl)))
    * 1e6) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e6 AS score
FROM postings JOIN dfreq USING (term) CROSS JOIN corpus
GROUP BY doc_id
ORDER BY score DESC, id ASC
LIMIT {topk}
"""



def q61_hash_split_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of the documents
    corpus by multiplicative id hash, profiled per (split, lang).
    The split label is a pure projection (no shuffle, no RNG state),
    so the assignment is stable across reruns, repartitions, and
    appends — the property randomSplit lacks."""
    from .operators.sampling import hash_split

    d = load_table(spark, sf, "documents")
    return (
        hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


Q61_SQL = """
SELECT CASE
         WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
         WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
         ELSE 'test'
       END AS split,
       lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


def q62_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-contamination scan: treat every 50th document as the
    held-out eval set and report corpus documents containing >= 30%
    of an eval doc's distinct 3-gram shingles. Inverted-index join on
    hashed n-grams (no corpus x eval cross product), corpus-side
    stop-phrase df cap in the executed plan."""
    from .operators.dedup import ngram_overlap_pairs

    d = load_table(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    eval_df = d.filter(F.col("doc_id") % 50 == 0)
    return ngram_overlap_pairs(
        corpus, eval_df, "doc_id", "text", n=3, min_overlap=0.3, max_df=1000
    )


Q62_SQL = r"""
WITH sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '[ \t\n\x0B\f\r]+') AS toks FROM documents)
  ) GROUP BY doc_id, shingle
),
ce AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
ee AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
esz AS (SELECT doc_id, COUNT(*) AS n_eval FROM ee GROUP BY 1),
com AS (
  SELECT c.doc_id AS corpus_id, e.doc_id AS eval_id, COUNT(*) AS common
  FROM ce c JOIN ee e ON c.shingle = e.shingle
  GROUP BY 1, 2)
SELECT corpus_id, eval_id, common,
       CAST(common AS DOUBLE) / n_eval AS overlap
FROM com JOIN esz ON eval_id = esz.doc_id
WHERE CAST(common AS DOUBLE) / n_eval >= 0.3
"""


def q63_boilerplate_phrases(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 most corpus-frequent word 4-grams — boilerplate
    candidates to strip before training. Map-side combine collapses
    each partition to distinct phrases before the single shuffle."""
    from .operators.text import boilerplate_phrases

    d = load_table(spark, sf, "documents")
    return boilerplate_phrases(d, "doc_id", "text", n=4, top_k=20)


Q63_SQL = r"""
WITH ph AS (
  SELECT DISTINCT doc_id, phrase FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 2),
        i -> array_to_string(toks[i:i+3], ' '))) AS phrase
    FROM (SELECT doc_id, regexp_split_to_array(text, '[ \t\n\x0B\f\r]+') AS toks FROM documents)
  )
)
SELECT phrase, COUNT(*) AS df FROM ph GROUP BY 1
ORDER BY df DESC, phrase ASC LIMIT 20
"""


def q64_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII detection + redaction as a pure scan-fused projection.

    The corpus text carries no PII, so each document gets a
    deterministic contact line derived from its doc_id (same
    construction in the oracle); the query then counts and redacts
    emails / IPv4s / SSNs / phone numbers with the shared
    ``PII_PATTERNS`` regex chain. Patterns are lookaround-free so
    Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte."""
    from .operators.text import pii_count, redact_pii

    d = load_table(spark, sf, "documents")
    did = F.col("doc_id")
    profile = F.concat(
        F.col("text"),
        F.lit(" contact doc"), did.cast("string"), F.lit("@example.org"),
        F.lit(" from 10.0."), (did % 256).cast("string"),
        F.lit("."), (did % 100).cast("string"),
        F.lit(" ssn "), F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-45-6789"),
        F.lit(" tel 55-"), F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-867-5309"),
    )
    p = d.select("doc_id", profile.alias("profile"))
    red = redact_pii(F.col("profile"))
    return p.select(
        "doc_id",
        pii_count("profile", "email").alias("n_email"),
        pii_count("profile", "ipv4").alias("n_ip"),
        pii_count("profile", "ssn").alias("n_ssn"),
        pii_count("profile", "phone").alias("n_phone"),
        F.md5(red).alias("redacted_fp"),
        F.length(red).cast("long").alias("redacted_len"),
    )


def _q64_sql() -> str:
    from .operators.text import PII_PATTERNS

    pats = {k: p for k, p, _ in PII_PATTERNS}
    red = "profile"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
WITH p AS (
  SELECT doc_id,
    text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@example.org'
      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
      || '.' || CAST(doc_id % 100 AS VARCHAR)
      || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-45-6789'
      || ' tel 55-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-867-5309'
      AS profile
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(profile, '{pats["email"]}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(profile, '{pats["ipv4"]}')) AS BIGINT) AS n_ip,
  CAST(len(regexp_extract_all(profile, '{pats["ssn"]}')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(profile, '{pats["phone"]}')) AS BIGINT) AS n_phone,
  md5({red}) AS redacted_fp,
  CAST(length({red}) AS BIGINT) AS redacted_len
FROM p
"""


def q65_supplier_cnt_by_part(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp approximated by lineitem's
    part-supplier pairs): distinct-supplier counts per part attribute
    group, excluding a NOT-IN supplier blocklist. part and the tiny
    blocklist both broadcast, so the only shuffle is the final
    distinct-count aggregation on the group keys."""
    l = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("SMALL"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q65_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'SMALL%'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q66_dominant_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 flavor: suppliers shipping > 30% of a part's total
    quantity, counted per supplier.

    The part total comes from a window sum over the already-grouped
    (partkey, suppkey) rows rather than a groupBy + self-join — the
    self-join form shuffles and scans lineitem twice (verified: no
    exchange reuse fires), while the window form is one scan and one
    shuffle on l_partkey: the per-pair aggregation, the partition
    total, and the share filter are all partition-local after it.
    The supplier dimension broadcasts."""
    l = load_table(spark, sf, "lineitem").repartition(F.col("l_partkey"))
    per = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("q")
    )
    tq = F.sum("q").over(Window.partitionBy("l_partkey"))
    s = load_table(spark, sf, "supplier")
    dominated = per.withColumn("tq", tq).filter(
        F.col("q").cast("double") > 0.3 * F.col("tq").cast("double")
    )
    return (
        dominated.join(F.broadcast(s), dominated.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("dominated_parts"))
    )


Q66_SQL = """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY 1, 2),
tot AS (SELECT l_partkey, SUM(q) AS tq FROM per GROUP BY 1)
SELECT s_suppkey, s_name, COUNT(*) AS dominated_parts
FROM per
JOIN tot USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE CAST(q AS DOUBLE) > 0.3 * CAST(tq AS DOUBLE)
GROUP BY s_suppkey, s_name
"""


def _kmeans_replay_ctes(k: int, iters: int, dim: int = 64) -> str:
    """Chained-CTE DuckDB replay of ``clustering.kmeans(replayable=
    True)`` — the PageRank-quantization trick (q121) applied to
    Lloyd's. Ends in ``asg(vec_id, label, cluster)``. Why this is a
    TRUE value oracle for an iterative float algorithm: centroid
    updates sum ``floor(x * 10^REPLAY_FP)`` BIGINTs (exact integer
    arithmetic — order-independent, so bit-identical in any engine)
    and each coordinate is the single IEEE division
    ``s / (n * 10^REPLAY_FP)``; assignment compares
    ``floor(score * 10^REPLAY_SCORE)`` BIGINTs with ties to the
    lowest cluster, so the ~1e-15 summation-order drift between
    numpy's matmul and SQL's list_inner_product only diverges when a
    true score sits within drift of a quantum boundary AND another
    centroid lands inside that same 1e-9 quantum — two independent
    coincidences (~1e-12 joint per row x centroid). ``floor`` (not
    round) dodges numpy-vs-SQL half-rounding semantics."""

    def score(ci: str) -> str:
        return (
            f"CAST(floor((0.5 * list_inner_product({ci}.c, {ci}.c)"
            f" - list_inner_product(v.e, {ci}.c)) * 1000000000.0) AS BIGINT)"
        )

    parts = [
        f"""v AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS f
  FROM embeddings
),
c0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, e AS c
  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {k})
)"""
    ]
    for i in range(iters):
        parts.append(
            f"""a{i} AS MATERIALIZED (
  SELECT vec_id, f, cluster FROM (
    SELECT v.vec_id, v.f, c{i}.cluster,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {score(f'c{i}')}, c{i}.cluster) AS rk
    FROM v CROSS JOIN c{i}
  ) WHERE rk = 1
),
s{i} AS MATERIALIZED (
  SELECT cluster, di AS dim, sum(f[di + 1]) AS s, count(*) AS n
  FROM a{i} CROSS JOIN range({dim}) t(di)
  GROUP BY cluster, di
),
c{i + 1} AS MATERIALIZED (
  SELECT c{i}.cluster, coalesce(u.c, c{i}.c) AS c
  FROM c{i} LEFT JOIN (
    SELECT cluster, list(s / (n * 1000000.0) ORDER BY dim) AS c
    FROM s{i} GROUP BY cluster
  ) u ON c{i}.cluster = u.cluster
)"""
        )
    parts.append(
        f"""asg AS MATERIALIZED (
  SELECT vec_id, label, cluster FROM (
    SELECT v.vec_id, v.label, c{iters}.cluster,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {score(f'c{iters}')}, c{iters}.cluster) AS rk
    FROM v CROSS JOIN c{iters}
  ) WHERE rk = 1
)"""
    )
    return ",\n".join(parts)


def q67_kmeans_profile(spark: SparkSession, sf: str) -> DataFrame:
    """K-means (k=10, 5 Lloyd's iterations, deterministic lowest-id
    init) over the embeddings table, profiled per cluster: size,
    majority ground-truth label, and purity (low here — the synthetic
    embeddings are near-uniform, so geometric clusters don't track
    labels; the profile reports that honestly). Runs in replayable
    mode (clustering.py REPLAY_FP/REPLAY_SCORE): integer-exact
    centroid sums + floored assignment scores make the whole fit a
    pure engine-replayable function, so as of r5 this iterative
    algorithm carries a FULL chained-CTE value oracle (the q121
    PageRank quantization trick) instead of the former rows-only
    check."""
    from .operators.clustering import kmeans

    e = load_table(spark, sf, "embeddings")
    assigned = kmeans(
        e, "embedding", k=10, max_iter=5, id_col="vec_id", replayable=True
    )
    cl = assigned.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("cluster").orderBy(F.desc("n"), F.asc("label"))
    top = (
        cl.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cluster",
            F.col("label").alias("majority_label"),
            F.col("n").alias("n_majority"),
        )
    )
    totals = cl.groupBy("cluster").agg(F.sum("n").alias("n_vecs"))
    return totals.join(top, "cluster").select(
        "cluster",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        "majority_label",
        (F.col("n_majority").cast("double") / F.col("n_vecs")).alias("purity"),
    )


Q67_SQL = (
    "WITH "
    + _kmeans_replay_ctes(10, 5)
    + """,
cl AS (SELECT cluster, label, count(*) AS n FROM asg GROUP BY cluster, label),
maj AS (
  SELECT cluster, label AS majority_label, n AS n_majority FROM (
    SELECT cluster, label, n,
      row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label ASC) AS rk
    FROM cl
  ) WHERE rk = 1
),
tot AS (SELECT cluster, CAST(sum(n) AS BIGINT) AS n_vecs FROM cl GROUP BY cluster)
SELECT t.cluster, t.n_vecs, m.majority_label,
       CAST(m.n_majority AS DOUBLE) / t.n_vecs AS purity
FROM tot t JOIN maj m ON t.cluster = m.cluster
"""
)


def q68_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end training-data curation funnel in one plan:
    quality filter -> language filter -> exact dedup (normalized
    fingerprint, keep lowest id) -> near-dup removal (drop any doc
    with a smaller-id Jaccard>=0.5 partner among survivors) ->
    deterministic 80/10/10 hash split, profiled per split.

    Scale shape: the quality/lang filters and the split label are
    scan-fused projections; exact dedup is one window over the
    fingerprint hash; near-dup candidates come from the
    inverted-index jaccard join (df-capped); the funnel never
    materializes intermediate corpora."""
    from .operators import text as TX
    from .operators.dedup import jaccard_pairs
    from .operators.sampling import hash_split

    d = load_table(spark, sf, "documents")
    kept = d.filter(TX.quality_score("text") >= 0.45).filter(
        F.col("lang") == "en"
    )
    fp_min = F.min("doc_id").over(
        Window.partitionBy(TX.fingerprint("text"))
    )
    ex = (
        kept.withColumn("__m", fp_min)
        .filter(F.col("doc_id") == F.col("__m"))
        .drop("__m")
    )
    pairs = jaccard_pairs(ex, "doc_id", "text", n=3, threshold=0.5, max_df=1000)
    dropped = pairs.select(F.col("j").alias("doc_id")).distinct()
    final = ex.join(dropped, "doc_id", "left_anti")
    return (
        hash_split(final, {"train": 0.8, "val": 0.1, "test": 0.1}, id_col="doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.token_count("text")).cast("long").alias("total_tokens"),
        )
    )


def _q68_sql() -> str:
    from .operators.text import LANG_PROFILES

    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[0][1])
    return rf"""
WITH scored AS (
  SELECT doc_id, text, lang,
    0.4 * (CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
             t -> list_contains([{words}], t))) AS DOUBLE)
           / len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')))
    + 0.3 * (1.0 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                   / LENGTH(text))
    + 0.3 * LEAST(1.0, CAST(len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS DOUBLE)
                       / 100.0) AS qs
  FROM documents),
kept AS (SELECT doc_id, text FROM scored WHERE qs >= 0.45 AND lang = 'en'),
ex AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, MIN(doc_id) OVER (PARTITION BY
        md5(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))))) AS m
    FROM kept)
  WHERE doc_id = m),
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '[ \t\n\x0B\f\r]+') AS toks FROM ex)
  ) GROUP BY doc_id, shingle),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
dropped AS (
  SELECT DISTINCT j AS doc_id
  FROM common JOIN sizes sa ON i = sa.doc_id JOIN sizes sb ON j = sb.doc_id
  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5),
final AS (
  SELECT doc_id, text FROM ex
  WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
SELECT split, COUNT(*) AS n_docs,
  CAST(SUM(len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'))) AS BIGINT) AS total_tokens
FROM (
  SELECT CASE
           WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
           WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
           ELSE 'test'
         END AS split, text
  FROM final)
GROUP BY split
"""


def q69_quantized_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 cosine neighbors against the int8-quantized corpus
    (asymmetric: float queries, dequantized int8 corpus). The oracle
    replicates quantize -> dequantize -> cosine in DuckDB list
    functions, so this pins the quantization arithmetic bit-for-bit,
    not just the ranking."""
    from .operators.similarity import quantized_topk

    e = load_table(spark, sf, "embeddings")
    return quantized_topk(
        e, e.filter(F.col("vec_id") < 10), k=5, round_scores=6
    )


Q69_SQL = """
WITH c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cs AS (SELECT vec_id, v,
         list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0 AS s
       FROM c0),
cq AS (SELECT vec_id AS neighbor_id,
         CASE WHEN s > 0 THEN list_transform(v, x -> round(x / s) * s)
              ELSE v END AS cv
       FROM cs),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10)
SELECT query_id, neighbor_id, score FROM (
  SELECT query_id, neighbor_id,
    CAST(FLOOR(list_cosine_similarity(qv, cv) * 1e6) AS BIGINT) / 1e6 AS score,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY CAST(FLOOR(list_cosine_similarity(qv, cv) * 1e6) AS BIGINT) / 1e6 DESC,
               neighbor_id ASC) AS rn
  FROM q JOIN cq ON query_id != neighbor_id
) WHERE rn <= 5
"""


def q70_incremental_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Steady-state dedup: every 10th document arrives as the new
    batch and is checked against the remaining corpus via MinHash
    banding + exact inverted-index verification — O(batch + colliding
    buckets), never corpus x corpus. The oracle is the exact
    cross-set Jaccard, so this also pins banding recall at the 0.8
    threshold."""
    from .operators.dedup import minhash_incremental_pairs

    d = load_table(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    new = d.filter(F.col("doc_id") % 10 == 0)
    return minhash_incremental_pairs(
        corpus, new, "doc_id", "text", n=3, num_hashes=32, bands=16, threshold=0.8
    )


Q70_SQL = r"""
WITH sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '[ \t\n\x0B\f\r]+') AS toks FROM documents)
  ) GROUP BY doc_id, shingle
),
cs AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
ns AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
com AS (
  SELECT c.doc_id AS corpus_id, e.doc_id AS new_id, count(*) AS cnt
  FROM cs c JOIN ns e ON c.shingle = e.shingle
  GROUP BY 1, 2)
SELECT corpus_id, new_id,
       CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt) AS jaccard
FROM com
JOIN sizes sa ON corpus_id = sa.doc_id
JOIN sizes sb ON new_id = sb.doc_id
WHERE CAST(cnt AS DOUBLE) / (sa.n + sb.n - cnt) >= 0.8
"""


def q71_nation_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join of per-nation customer and supplier rollups —
    nations can be missing from either side, so both join keys
    coalesce. Both inputs are pre-aggregated (25-ish rows), so the
    join itself is trivially broadcast; the pattern under test is
    null-safe full-outer semantics."""
    c = (
        load_table(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 6000)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.select(
        F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


Q71_SQL = """
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
                 WHERE s_acctbal > 6000 GROUP BY 1) s
  ON c.c_nationkey = s.s_nationkey
"""


def q72_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS with grouping_id disambiguation via the SQL API
    — the explicit-sets variant of rollup/cube (q10/q11), exercising
    Expand + the same single-shuffle aggregation."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


Q72_SQL = """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


def q73_relationalize_map(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic-keys JSON via MapType: events.props parsed as
    map<string,bigint>, relationalized into a (rid, index, key, val)
    child table, then profiled per key. Exercises the MapType split —
    a Spark-native extension the reference's dict model cannot
    express (it would flatten every dynamic key into its own
    column)."""
    e = load_table(spark, sf, "events").select(
        "event_id",
        F.from_json("props", "map<string,bigint>").alias("props"),
    )
    tables = relationalize(e, "events", key_cols=["event_id"])
    child = tables["events_props"]
    return child.groupBy(F.col("props__key_").alias("key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("props__val_").alias("total"),
    )


Q73_SQL = """
SELECT k AS key, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.' || k) AS BIGINT))
            AS BIGINT) AS total
FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
GROUP BY k
"""


def q74_stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static enrichment: the events file stream joins the
    static customer dimension (broadcast — no stream-side shuffle,
    no state store needed for static joins), then aggregates value
    per (segment, event_type). Driven to completion with
    Trigger.AvailableNow + complete-mode memory sink, so the result
    is deterministic against the batch oracle."""
    stream = _events_stream(spark, sf)
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        stream.join(F.broadcast(cust), stream.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )
    # complete-mode sink -> the no-data batch is a pure re-emit; skip
    with _stream_state_parallelism(
        spark,
        source_bytes=_source_backlog_bytes(f"{sf}/events.parquet"),
        skip_nodata_batch=True,
        output_mode="complete",
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("q74_stream_static")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("q74_stream_static")


Q74_SQL = """
SELECT c_mktsegment, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


def _stream_parquet(spark: SparkSession, sf: str, table: str):
    """File stream over ``{sf}/{table}.parquet``, handling both
    physical layouts the testdata has shipped: a DIRECTORY of part
    files (Spark-written — stream it directly, a name glob would
    match nothing) and a single file (stream the parent with a
    pathGlobFilter). The one streaming-read fallback, shared by
    every streaming gate query (events + documents) so a fix here
    cannot drift across copies."""
    import os

    path = f"{sf}/{table}.parquet"
    raw_schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        return spark.readStream.schema(raw_schema).parquet(path)
    return (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", f"{table}.parquet")
        .parquet(sf)
    )


def _source_backlog_bytes(*paths: str) -> int:
    """Total on-disk bytes of a bounded stream's source files — the
    backlog an AvailableNow drain will process. Accepts files or
    directories (summed recursively); missing paths count 0."""
    import os

    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        elif os.path.isfile(p):
            total += os.path.getsize(p)
    return total


#: _stream_state_parallelism mutates session-global conf; overlapping
#: uses (driver threads) would cross-contaminate or mis-restore. The
#: helper fails loudly on overlap instead of silently corrupting
#: (ADVICE r11): stateful gate streams never legitimately nest.
_STREAM_CONF_LOCK = _threading.Lock()


@_contextmanager
def _stream_state_parallelism(
    spark: SparkSession,
    source_bytes: int | None = None,
    skip_nodata_batch: bool = False,
    output_mode: str | None = None,
    emits_on_arrival: bool = False,
):
    """Scale streaming state-store parallelism to the data and the
    cluster (r11 opt rounds).

    A stateful streaming operator creates ONE state store per shuffle
    partition per micro-batch (stream-stream joins: four), and the
    partition count is frozen at query start from
    ``spark.sql.shuffle.partitions``. Under an untuned session (200
    default partitions) a single-batch AvailableNow gate query on a
    32-core box pays 200 store init/commit cycles per stateful op
    where far fewer would saturate the machine — measured on q75
    (stream-stream interval join, sf0.01): ~37-91 s at 200
    partitions vs ~12-25 s at 32 vs ~2.5-3.5 s at backlog-derived
    sizing on the same session.

    Sizing rule (the AQE coalescing heuristic, applied manually
    because AQE cannot resize stateful-stream partitions): partitions
    = clamp(source_bytes / advisoryPartitionSizeInBytes, 1,
    defaultParallelism). For a bounded AvailableNow drain the whole
    backlog is known up front, so sizing it like a batch shuffle is
    exact: tiny gate corpora get a handful of stores, a 100 TB
    backlog saturates every core (the standard state-partition
    sizing). ``source_bytes=None`` keeps the defaultParallelism pin
    (the right call for long-lived streams whose eventual volume is
    unknown). Result-neutral: every gate stream's aggregates are
    exact-typed (counts / BIGINT quanta / HLL register max / distinct
    value sets), so partition count cannot perturb values; each
    query's oracle pins this.

    ``skip_nodata_batch=True`` disables
    ``spark.sql.streaming.noDataMicroBatches.enabled`` for the
    stream's duration, dropping the watermark-advance-only batch an
    AvailableNow drain appends after the last data batch (measured:
    ~40% of q75's wall — a full state-store init/commit cycle per
    partition per stateful op, emitting zero rows). ONLY legal when
    that batch cannot emit: append-mode sinks that emit on arrival
    (dropDuplicates*, inner stream-stream joins) or complete-mode
    sinks (every batch re-emits the whole table; complete mode never
    evicts aggregation state, so the extra batch re-emits an
    identical table). An append-mode AGGREGATION emits finalized
    groups only when the watermark passes them — for those this flag
    would silently drop rows; every call site must re-check its sink
    mode before passing True — and MUST declare it here: the helper
    asserts the legal (``output_mode``, ``emits_on_arrival``)
    combinations instead of trusting call-site comments (ADVICE r11):
    ``output_mode="complete"`` (pure re-emit) or
    ``output_mode="append"`` with ``emits_on_arrival=True``
    (dropDuplicates*/inner stream-stream join). An append-mode
    watermark-gated aggregation has ``emits_on_arrival=False`` and is
    rejected.

    Not reentrant (session-global conf save/restore): overlapping
    uses raise rather than cross-contaminate; see _STREAM_CONF_LOCK."""
    if skip_nodata_batch and not (
        output_mode == "complete"
        or (output_mode == "append" and emits_on_arrival)
    ):
        raise ValueError(
            "skip_nodata_batch=True requires output_mode='complete' or "
            "output_mode='append' with emits_on_arrival=True; an "
            "append-mode watermark-gated aggregation would silently drop "
            f"its finalized rows (got output_mode={output_mode!r}, "
            f"emits_on_arrival={emits_on_arrival})"
        )
    parallelism = spark.sparkContext.defaultParallelism
    if source_bytes is not None:
        if source_bytes <= 0:
            # a path typo or a non-local source would otherwise
            # serialize the whole drain onto one state store (ADVICE
            # r11): warn and keep the defaultParallelism pin.
            import warnings

            warnings.warn(
                "_stream_state_parallelism: computed source backlog is 0 "
                "bytes (missing path, empty source, or non-local "
                "storage); falling back to defaultParallelism "
                f"({parallelism}) instead of clamping to 1",
                stacklevel=3,
            )
        else:
            advisory = _advisory_bytes(spark)
            parallelism = max(
                1, min(parallelism, -(-source_bytes // advisory))
            )
    if not _STREAM_CONF_LOCK.acquire(blocking=False):
        raise RuntimeError(
            "_stream_state_parallelism is not reentrant: another stream "
            "is already running under it in this session (session-global "
            "conf save/restore would cross-contaminate)"
        )
    try:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        prev_nodata = spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(parallelism))
        if skip_nodata_batch:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", "false"
            )
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
            )
    finally:
        _STREAM_CONF_LOCK.release()


def _advisory_bytes(spark: SparkSession) -> int:
    """``spark.sql.adaptive.advisoryPartitionSizeInBytes`` as an int
    (Spark returns it in whatever unit it was set with)."""
    raw = spark.conf.get(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"
    )
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    s = str(raw).strip().lower().removesuffix("b")
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def _events_stream(spark: SparkSession, sf: str):
    """File stream over events.parquet with the ts column normalized
    to TIMESTAMP whatever the file's physical encoding — INT64 nanos
    (divide to micros), TIMESTAMP_NTZ (wall clock taken as UTC; Spark
    watermarks reject NTZ event time), or TIMESTAMP as-is. Shared by
    the streaming gate queries."""
    from .functions.timeutil import as_instant

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _stream_parquet(spark, sf, "events")
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn(
            "ts", as_instant(F.col("ts"), stream.schema["ts"].dataType)
        )
    return stream


def q75_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval join: signup events joined to purchase
    events of the same user within the following 2 hours. Both sides
    carry watermarks so the state store can evict signups once no
    qualifying purchase can still arrive — the unbounded-state
    hazard of stream-stream joins, bounded by the interval condition.
    Driven to completion (AvailableNow, append-mode memory sink);
    inner-join output is exactly the set of matching pairs, so the
    batch oracle is a plain interval self-join."""
    s = (
        _events_stream(spark, sf)
        .filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts"))
        .withWatermark("signup_ts", "7 days")
    )
    p = (
        _events_stream(spark, sf)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "7 days")
    )
    j = s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 2 HOURS")),
    ).select(F.col("s_user").alias("user_id"), "signup_ts", "purchase_ts")
    # append-mode INNER join emits each match in the data batch that
    # completes it; the no-data batch only evicts state -> skip it.
    # Both legs scan the same file, so the backlog is 2x its bytes.
    with _stream_state_parallelism(
        spark,
        source_bytes=2 * _source_backlog_bytes(f"{sf}/events.parquet"),
        skip_nodata_batch=True,
        output_mode="append",
        emits_on_arrival=True,
    ):
        q = (
            j.writeStream.format("memory")
            .queryName("q75_pairs")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("q75_pairs")


Q75_SQL = """
SELECT s.user_id, s.ts AS signup_ts, p.ts AS purchase_ts
FROM events s JOIN events p
  ON s.user_id = p.user_id
 AND s.event_type = 'signup' AND p.event_type = 'purchase'
 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 2 HOUR
"""


def q76_setops_all(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset set-ops (INTERSECT ALL / EXCEPT ALL — bag semantics,
    unlike q12's distinct variants): per-shipment supplier multiset of
    1996H1 intersected with 1996H2 (keeping min multiplicity), minus
    one occurrence per returned H1 shipment."""
    l = load_table(spark, sf, "lineitem")

    def ships(lo: str, hi: str):
        return l.filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )

    a = ships("1996-01-01", "1996-07-01").select("l_suppkey")
    b = ships("1996-07-01", "1997-01-01").select("l_suppkey")
    r = (
        ships("1996-01-01", "1996-07-01")
        .filter(F.col("l_returnflag") == "R")
        .select("l_suppkey")
    )
    return a.intersectAll(b).exceptAll(r)


Q76_SQL = """
(SELECT l_suppkey FROM lineitem
 WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
 INTERSECT ALL
 SELECT l_suppkey FROM lineitem
 WHERE l_shipdate >= TIMESTAMP '1996-07-01' AND l_shipdate < TIMESTAMP '1997-01-01')
EXCEPT ALL
SELECT l_suppkey FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
"""


def q77_chunk_and_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Chunk every document into 16-token windows (4-token overlap)
    and greedily pack chunks into ~256-token training shards inside 8
    deterministic hash buckets, profiled per shard. Chunking fuses
    into the scan; packing is one hash partition + a per-bucket
    window — the 1000-executor formulation (a single global running
    sum would serialize on one partition)."""
    from .operators.text import chunk_documents, pack_shards

    d = load_table(spark, sf, "documents")
    chunks = chunk_documents(d, "doc_id", "text", chunk_tokens=16, overlap=4)
    packed = pack_shards(
        chunks, "id", "chunk_id", "n_tokens", target_tokens=256, n_buckets=8
    )
    return packed.groupBy("bucket", "shard_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("id").alias("first_doc"),
        F.max("id").alias("last_doc"),
    )


Q77_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, '[ \t\n\x0B\f\r]+') AS toks,
         len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS n
  FROM documents),
st AS (
  SELECT doc_id, toks,
         unnest(range(0,
             CAST(ceil(CAST(GREATEST(n - 16, 0) AS DOUBLE) / 12) AS BIGINT) * 12 + 1,
             12)) AS start
  FROM t),
ch AS (
  SELECT doc_id AS id, start / 12 AS chunk_id,
         len(toks[start + 1 : start + 16]) AS n_tokens
  FROM st
  WHERE len(toks[start + 1 : start + 16]) > 0),
packed AS (
  SELECT id, chunk_id, n_tokens,
         ((id * 2654435761) % 4294967296) % 8 AS bucket,
         CAST(floor(CAST(SUM(n_tokens) OVER (
             PARTITION BY ((id * 2654435761) % 4294967296) % 8
             ORDER BY id, chunk_id
             ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE) / 256)
           AS BIGINT) AS shard_id
  FROM ch)
SELECT bucket, shard_id, COUNT(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(id) AS first_doc, MAX(id) AS last_doc
FROM packed GROUP BY 1, 2
"""


def q78_window_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Window-function breadth on one pass: lag/lead, ntile,
    percent_rank, and first/last over an explicit unbounded ROWS
    frame (the default RANGE frame would make last_value see only
    the current row). Partition by customer, deterministic order by
    (o_orderdate, o_orderkey)."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(wfull).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
    )


Q78_SQL = """
SELECT o_custkey, o_orderkey,
  ROW_NUMBER() OVER w AS rn,
  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
  PERCENT_RANK() OVER w AS pct_rank,
  LAG(o_totalprice) OVER w AS prev_price,
  LEAD(o_totalprice) OVER w AS next_price,
  FIRST_VALUE(o_orderkey) OVER wf AS first_order,
  LAST_VALUE(o_orderkey) OVER wf AS last_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q79_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions end to end: per order, the sorted
    quantity array is transformed, filtered, and folded JVM-side
    (transform / filter / aggregate == DuckDB list_transform /
    list_filter / sequential list fold). Arrays are sorted on
    construction so element order is deterministic in both engines."""
    l = load_table(spark, sf, "lineitem")
    per = l.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("long"))).alias("qs")
    )
    doubled = F.transform("qs", lambda x: x * 2)
    big = F.filter("qs", lambda x: x > 25)
    folded = F.aggregate(
        "qs", F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return per.select(
        "l_orderkey",
        F.size("qs").cast("long").alias("n_items"),
        F.element_at(doubled, 1).alias("min_doubled"),
        F.size(big).cast("long").alias("n_big"),
        folded.alias("total_qty"),
        F.array_join(F.transform("qs", lambda x: x.cast("string")), ",").alias(
            "qty_csv"
        ),
    )


Q79_SQL = """
WITH per AS (
  SELECT l_orderkey,
         list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
  FROM lineitem GROUP BY 1)
SELECT l_orderkey,
  CAST(len(qs) AS BIGINT) AS n_items,
  list_transform(qs, x -> x * 2)[1] AS min_doubled,
  CAST(len(list_filter(qs, x -> x > 25)) AS BIGINT) AS n_big,
  CAST(list_aggregate(qs, 'sum') AS BIGINT) AS total_qty,
  array_to_string(list_transform(qs, x -> CAST(x AS VARCHAR)), ',') AS qty_csv
FROM per
"""


def q80_repetition_filters(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality filters: most-common word and
    bigram share plus type/token ratio per document, shuffle-free
    (sorted-array run-length inside codegen; see
    operators/text.py:max_multiplicity). The oracle recomputes the
    same statistics relationally (unnest + two-level GROUP BY)."""
    from .operators.text import repetition_stats

    d = load_table(spark, sf, "documents")
    return repetition_stats(d)


Q80_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
unic AS (SELECT doc_id, w, COUNT(*) AS c
         FROM (SELECT doc_id, unnest(ws) AS w FROM d) GROUP BY 1, 2),
uni AS (SELECT doc_id, MAX(c) AS max_uni, COUNT(*) AS n_distinct
        FROM unic GROUP BY 1),
bic AS (SELECT doc_id, bg, COUNT(*) AS c FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)),
                                       i -> ws[i] || ' ' || ws[i + 1])) AS bg
          FROM d) GROUP BY 1, 2),
bi AS (SELECT doc_id, MAX(c) AS max_bi FROM bic GROUP BY 1)
SELECT d.doc_id,
  CAST(len(ws) AS BIGINT) AS n_words,
  CAST(uni.n_distinct AS DOUBLE) / len(ws) AS distinct_word_ratio,
  CAST(uni.max_uni AS DOUBLE) / len(ws) AS top_unigram_frac,
  CAST(bi.max_bi AS DOUBLE) / (len(ws) - 1) AS top_bigram_frac,
  (CAST(uni.max_uni AS DOUBLE) / len(ws) > 0.20
   OR CAST(bi.max_bi AS DOUBLE) / (len(ws) - 1) > 0.18) AS repetitious
FROM d
JOIN uni USING (doc_id)
LEFT JOIN bi USING (doc_id)
"""


def q81_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of join: each event annotated with the user's NEXT
    purchase at-or-after its timestamp (union-sort-window with the
    sort reversed — same one-shuffle cost as backward). Oracle is a
    correlated LATERAL top-1 in DuckDB."""
    from .operators.asof import asof_join

    e = load_table(spark, sf, "events")
    left = e.select("event_id", "user_id", "ts")
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        left, right, on="user_id", ts="ts", right_cols=["value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_asof").alias("next_purchase_ts"),
        F.col("value").alias("next_purchase_value"),
    )


Q81_SQL = """
WITH r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id,
  rr.ts AS next_purchase_ts, rr.value AS next_purchase_value
FROM events l LEFT JOIN LATERAL (
  SELECT ts, value FROM r
  WHERE r.user_id = l.user_id AND r.ts >= l.ts
  ORDER BY r.ts LIMIT 1) rr ON true
"""


def q82_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest as-of join with tolerance: the closest purchase within
    2 hours either side (ties to the earlier row, pandas semantics).
    Both direction passes share one shuffle; the oracle ranks by
    absolute distance with the same tiebreak."""
    from .operators.asof import asof_join

    e = load_table(spark, sf, "events")
    left = e.select("event_id", "user_id", "ts")
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        left, right, on="user_id", ts="ts", right_cols=["value"],
        direction="nearest", tolerance=F.expr("INTERVAL 2 HOURS"),
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_asof").alias("near_purchase_ts"),
        F.col("value").alias("near_purchase_value"),
    )


Q82_SQL = """
WITH r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id,
  rr.ts AS near_purchase_ts, rr.value AS near_purchase_value
FROM events l LEFT JOIN LATERAL (
  SELECT ts, value FROM r
  WHERE r.user_id = l.user_id
    AND abs(epoch_us(r.ts) - epoch_us(l.ts)) <= 7200000000
  ORDER BY abs(epoch_us(r.ts) - epoch_us(l.ts)), r.ts LIMIT 1) rr ON true
"""


def q83_streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exact dedup: every event arrives twice (the stream is
    duplicated row-for-row) and ``dropDuplicatesWithinWatermark`` on
    the event key lets exactly one through, with state evicted as the
    watermark passes — the bounded-state form of streaming dedup
    (plain dropDuplicates would hold every key forever). Driven to
    completion; the oracle is the original (already-unique) table."""
    stream = _events_stream(spark, sf)
    doubled = stream.select(
        F.explode(F.array(F.lit(1), F.lit(2))).alias("__copy__"), "*"
    ).drop("__copy__")
    deduped = (
        doubled.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    # dropDuplicatesWithinWatermark emits survivors on ARRIVAL (append
    # mode); the no-data batch only evicts state -> skip it. The
    # stream doubles every row, so the backlog is 2x the file bytes.
    with _stream_state_parallelism(
        spark,
        source_bytes=2 * _source_backlog_bytes(f"{sf}/events.parquet"),
        skip_nodata_batch=True,
        output_mode="append",
        emits_on_arrival=True,
    ):
        q = (
            deduped.writeStream.format("memory")
            .queryName("q83_dedup")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("q83_dedup")


Q83_SQL = """
SELECT event_id, user_id, ts, event_type, value FROM events
"""


def q84_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (melt): wide per-lineitem measures to long
    (metric, val) rows — a pure projection+explode, no shuffle, so it
    runs at scan speed at any size. Oracle is DuckDB's UNPIVOT."""
    l = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "metric",
        "val",
    )


Q84_SQL = """
SELECT l_orderkey, l_linenumber, metric, val FROM (
  UNPIVOT (SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DOUBLE) AS quantity,
             CAST(l_extendedprice AS DOUBLE) AS extendedprice,
             CAST(l_discount AS DOUBLE) AS discount
           FROM lineitem)
  ON quantity, extendedprice, discount INTO NAME metric VALUE val)
"""


def q85_rolling_time_window(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 1-hour per-user aggregate via a RANGE window frame over
    epoch microseconds — the time-interval frame (as opposed to the
    row-count frames of q78). One shuffle on user_id, then a per-key
    sort; the frame slide is streaming within each partition, so
    memory stays bounded by the widest 1-hour burst, not the key's
    history. The sum runs in DECIMAL (order-insensitive) and casts to
    DOUBLE once at the end, per the repo parity convention."""
    e = load_table(spark, sf, "events")
    us = col_epoch_micros(e, "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w)
        .cast("double")
        .alias("roll_value"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


Q85_SQL = """
SELECT event_id,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS roll_value,
  COUNT(*) OVER w AS roll_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q86_argmax_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group argmax/argmin in a single aggregation pass:
    ``max_by``/``min_by`` with a struct ordering key carries the
    extreme row's identity through the partial/final aggregate without
    the sort a window formulation needs — at 100 TB this is one
    shuffle of 5 tiny structs per partition instead of a full per-group
    sort. The struct's second field is the deterministic tiebreak.
    Oracle uses the window formulation (DuckDB's arg_max cannot take a
    composite ordering key), proving the two shapes agree."""
    o = load_table(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "top_order"
        ),
        F.expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "bottom_order"
        ),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q86_SQL = """
SELECT o_orderpriority,
  MAX(CASE WHEN rn_hi = 1 THEN o_orderkey END) AS top_order,
  MAX(CASE WHEN rn_lo = 1 THEN o_orderkey END) AS bottom_order,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
  COUNT(*) AS n_orders
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_hi,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_lo
  FROM orders)
GROUP BY o_orderpriority
"""


def q87_source_mixing(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted source mixing for corpus re-balancing: four named
    sources keep 100%/50%/25%/10% of their documents, everything else
    5%, decided per-row by the deterministic id hash (operators/
    sampling.mix_sources). All weights <= 1 here, so the whole mix is
    a pushed-down filter — no shuffle, no RNG state, stable under
    repartitioning. The oracle replays the exact Knuth-hash
    arithmetic."""
    from .operators.sampling import mix_sources

    d = load_table(spark, sf, "documents")
    mixed = mix_sources(
        d,
        {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1},
        default=0.05,
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


Q87_SQL = """
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT *, ((doc_id * 2654435761) % 4294967296) % 100 AS bucket
  FROM documents)
WHERE bucket < CASE source
  WHEN 'src0' THEN 100 WHEN 'src1' THEN 50
  WHEN 'src2' THEN 25 WHEN 'src3' THEN 10 ELSE 5 END
GROUP BY source
"""


def q88_nullsafe_join(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing, the semantics ETL needs
    when joining on optional foreign keys. Spark compiles EqualNullSafe
    into the same hash-join machinery as a plain equi-join (broadcast
    here — the dim side is tiny), so the null-safety costs nothing at
    scale. Region key 2 is nulled on both sides to exercise the
    NULL-matches-NULL path."""
    n = load_table(spark, sf, "nation").select(
        "n_nationkey", "n_name", F.expr("nullif(n_regionkey, 2)").alias("k")
    )
    r = load_table(spark, sf, "region").select(
        "r_name", F.expr("nullif(r_regionkey, 2)").alias("rk")
    )
    return (
        n.join(F.broadcast(r), n["k"].eqNullSafe(r["rk"]))
        .select("n_nationkey", "n_name", "r_name")
    )


Q88_SQL = """
SELECT n_nationkey, n_name, r_name
FROM (SELECT n_nationkey, n_name, NULLIF(n_regionkey, 2) AS k FROM nation) n
JOIN (SELECT r_name, NULLIF(r_regionkey, 2) AS rk FROM region) r
  ON n.k IS NOT DISTINCT FROM r.rk
"""


def q89_date_battery(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-function battery: month-end, ISO week start, day of
    week, calendar-aware month addition (end-of-month clamping),
    quarter, day of year, day diff. Pure projection at scan speed;
    parity notes: DuckDB's dayofweek is 0-based (Sunday=0) vs Spark's
    1-based, and date results are presented as TIMESTAMP on both sides
    (the repo date convention)."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.date_trunc("week", d).alias("week_start"),
        F.dayofweek(d).alias("dow"),
        F.add_months(d, 3).cast("timestamp").alias("plus3mo"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
    )


Q89_SQL = """
SELECT o_orderkey,
  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
  date_trunc('week', o_orderdate) AS week_start,
  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
  CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3mo,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  CAST(dayofyear(o_orderdate) AS INT) AS doy,
  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
    AS days_since
FROM orders WHERE o_orderkey % 100 = 0
"""


def q90_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation-pair predicate is pushed INTO the broadcast
    dimension scans (each nation side is pre-filtered to the two
    names), so the big fact joins only carry rows from the two
    countries — at 100 TB that prunes ~92% of customer/supplier
    matches before the orders join. One shuffle for the final
    3-key aggregate."""
    both = ["NATION_1", "NATION_2"]
    n1 = (
        load_table(spark, sf, "nation")
        .filter(F.col("n_name").isin(both))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf, "nation")
        .filter(F.col("n_name").isin(both))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    disc_price = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


Q90_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ns.n_name IN ('NATION_1', 'NATION_2')
  AND nc.n_name IN ('NATION_1', 'NATION_2')
  AND ns.n_name <> nc.n_name
GROUP BY supp_nation, cust_nation, l_year
"""


def q91_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5 suppliers' share of PROMO-part revenue
    sold to ASIA-region customers, by order year. The share is a
    conditional-sum / total-sum ratio computed in ONE aggregation pass
    (no second scan, no self-join); both sums run in exact DECIMAL and
    cast to DOUBLE only for the final division, so the ratio is
    bit-stable regardless of partitioning. Part, supplier, nation,
    region all broadcast; the only shuffle is the year aggregate."""
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n_c = load_table(spark, sf, "nation")
    n_s = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    o = load_table(spark, sf, "orders")
    l = load_table(spark, sf, "lineitem")
    vol = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), c.c_nationkey == n_c.n_nationkey)
        .join(F.broadcast(r), n_c.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("s_nk"))
    )
    zero = F.lit(0).cast("decimal(18,4)")
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero))
        .cast("double")
        .alias("nation_vol"),
        F.sum(vol).cast("double").alias("total_vol"),
    )
    return agg.select(
        "o_year",
        (F.col("nation_vol") / F.col("total_vol")).alias("mkt_share"),
        "total_vol",
    )


Q91_SQL = """
SELECT o_year, nation_vol / total_vol AS mkt_share, total_vol
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
    CAST(SUM(CASE WHEN ns.n_name = 'NATION_5' THEN vol
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_vol,
    CAST(SUM(vol) AS DOUBLE) AS total_vol
  FROM (
    SELECT l_orderkey, l_suppkey, o_orderdate, o_custkey,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS vol
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_type = 'PROMO') li
  JOIN customer ON li.o_custkey = c_custkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  JOIN supplier ON li.l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  WHERE r_name = 'ASIA'
  GROUP BY o_year)
"""


def q92_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over
    'red' parts. The testdata has no partsupp table, so unit cost is
    proxied by p_retailprice (documented deviation from Q9's
    ps_supplycost); profit = disc revenue - retail cost, both exact
    DECIMAL with every intermediate capped at precision 18 so the
    38-digit ceiling is never hit. Part/supplier/nation broadcast;
    one shuffle for the (nation, year) aggregate."""
    n = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), "n_name"
    )
    s = load_table(spark, sf, "supplier")
    p = load_table(spark, sf, "part").filter(F.col("p_name").contains("red"))
    o = load_table(spark, sf, "orders")
    l = load_table(spark, sf, "lineitem")
    revenue = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    cost = (_dec("p_retailprice") * _dec("l_quantity")).cast("decimal(18,4)")
    amount = (revenue - cost).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("s_nk"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


Q92_SQL = """
SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(SUM(CAST(
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))
  AS DECIMAL(18,4))) AS DOUBLE) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
"""


def q93_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly
    revenue. The max is a scalar aggregate broadcast back against the
    per-supplier revenue — NOT an empty-partition window (which would
    funnel every row through one task at scale). Revenue equality is
    compared in exact DECIMAL, so ties survive identically in both
    engines; the DOUBLE cast happens after the comparison."""
    s = load_table(spark, sf, "supplier")
    l = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    disc_price = (_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    rev = l.groupBy("l_suppkey").agg(F.sum(disc_price).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


Q93_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q94_approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate-aggregate surface: HyperLogLog++ distinct counts
    (``approx_count_distinct``), Apache DataSketches HLL
    (``hll_sketch_agg`` -> estimate), and GK quantile sketches
    (``percentile_approx``) per document source, alongside their exact
    counterparts. All three sketches are partial-aggregatable — the
    map-side combine ships a fixed-size sketch per partition instead
    of the raw values, so at 100 TB the shuffle volume is O(sources x
    sketch_size), independent of row count. Rows-only in the driver
    gate (HLL register layouts are engine-specific and cannot be
    replayed in DuckDB bit-for-bit); `tests/test_sketches.py` pins the
    error-bound and mergeability contracts instead."""
    d = load_table(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.approx_count_distinct("text", 0.02).alias("hllpp_uniq_text"),
        F.hll_sketch_estimate(F.hll_sketch_agg("text", 14)).alias(
            "datasketches_uniq_text"
        ),
        F.countDistinct("text").alias("exact_uniq_text"),
        F.percentile_approx("n_chars", 0.5, 10000).alias("p50_chars"),
        F.percentile_approx("n_chars", 0.9, 10000).alias("p90_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )


Q95_SQL = """
SELECT c_custkey, l.o_orderkey, l.o_totalprice
FROM customer, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 2) l
WHERE c_custkey % 50 = 0
"""


def q95_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (the
    SQL-standard top-N-per-group shape). The same ANSI string runs
    verbatim in Spark and DuckDB. Catalyst decorrelates the lateral
    into a join + per-key window rather than re-executing the subquery
    per outer row, so the plan is one shuffle on the correlation key —
    scale-equivalent to the hand-written window formulation (q08)."""
    from .sources.tables import register_views

    register_views(spark, sf, ("customer", "orders"))
    return spark.sql(Q95_SQL)


Q96_SQL_ORACLE = """
SELECT o_orderpriority,
  string_agg(o_orderkey :: VARCHAR, ',' ORDER BY o_totalprice DESC, o_orderkey) AS top_keys,
  CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 5
GROUP BY o_orderpriority
"""


def q96_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP):
    the top-5 order keys per priority concatenated in rank order.
    The top-5 filter bounds each group BEFORE the concat, which is the
    only way listagg stays safe at 100 TB — an unbounded listagg over
    a hot group is a single-row memory bomb. DuckDB's string_agg with
    ORDER BY is the oracle."""
    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    top = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)
    return top.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(CAST(o_orderkey AS STRING), ',') "
            "WITHIN GROUP (ORDER BY o_totalprice DESC, o_orderkey)"
        ).alias("top_keys"),
        F.count(F.lit(1)).alias("n"),
    )


def q97_global_index(spark: SparkSession, sf: str) -> DataFrame:
    """Dense 0-based global index over documents in doc_id order —
    the training-loader's example-id assignment. NOT a single-task
    ``row_number() OVER (ORDER BY ...)``: operators/indexing.py range-
    partitions, prefix-sums per-partition counts (num_partitions values
    on the driver), and enumerates each partition in an Arrow batch
    stream, so the index scales with the cluster. The oracle IS the
    single-task window formulation, proving equivalence."""
    from .operators.indexing import add_global_index

    d = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    return add_global_index(d, ["doc_id"], index_col="idx")


Q97_SQL = """
SELECT doc_id, n_chars,
  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
FROM documents
"""


def q98_regression_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group OLS slope/intercept and Pearson r between quantity and
    extended price, derived from exact DECIMAL sufficient statistics
    (n, Sx, Sy, Sxy, Sxx, Syy) in one aggregation pass. Spark's
    built-in ``corr``/``regr_slope`` accumulate in DOUBLE, where the
    result depends on partition merge order — correct but not
    reproducible bit-for-bit across cluster shapes. Deriving from
    decimal sums makes the statistics deterministic AND keeps the
    map-side combine (6 fixed-width values per group).
    `tests/test_sketches.py` pins |derived - F.corr| < 1e-9."""
    l = load_table(spark, sf, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,4)")
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(28,8)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(28,8)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,8)")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov_n = F.col("sxy") - F.col("sx") * F.col("sy") / n
    var_x = F.col("sxx") - F.col("sx") * F.col("sx") / n
    var_y = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cov_n / var_x
    # inputs are bit-identical exact-decimal-derived doubles, so the
    # lattice makes the emission engine-replayable outright
    return agg.select(
        "l_returnflag",
        "n",
        floor_lattice(slope, 6).alias("slope"),
        floor_lattice((F.col("sy") - slope * F.col("sx")) / n, 6).alias(
            "intercept"
        ),
        floor_lattice(cov_n / F.sqrt(var_x * var_y), 6).alias("pearson_r"),
    )


Q98_SQL = """
SELECT l_returnflag, n_raw AS n,
  CAST(FLOOR((sxy - sx*sy/n) / (sxx - sx*sx/n) * 1e6) AS BIGINT) / 1e6
    AS slope,
  CAST(FLOOR((sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n * 1e6)
    AS BIGINT) / 1e6 AS intercept,
  CAST(FLOOR((sxy - sx*sy/n) / sqrt((sxx - sx*sx/n) * (syy - sy*sy/n)) * 1e6)
    AS BIGINT) / 1e6 AS pearson_r
FROM (
  SELECT l_returnflag,
    CAST(COUNT(*) AS BIGINT) AS n_raw,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(28,8))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag)
"""


Q99_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1996-01-01' AS TIMESTAMP) AS m
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < CAST('1996-12-01' AS TIMESTAMP)
)
SELECT m AS month_start, CAST(COALESCE(n, 0) AS BIGINT) AS n_orders
FROM months
LEFT JOIN (
  SELECT date_trunc('month', o_orderdate) AS mo, COUNT(*) AS n
  FROM orders
  WHERE o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
    AND o_orderdate < CAST('1997-01-01' AS TIMESTAMP)
  GROUP BY mo) o ON o.mo = months.m
"""


def q99_recursive_cte(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-standard WITH RECURSIVE (Spark 4's iterative CTE execution):
    a 12-month calendar spine generated recursively, left-joined to
    per-month order counts so empty months surface as zero — the
    gap-fill shape without a native generate_series. The identical
    ANSI string runs in Spark and DuckDB. Scale note: each recursive
    step is a driver-coordinated iteration — right for bounded spines
    (dates, org charts, BOM levels); unbounded fan-out belongs in
    ``F.sequence`` (q02's formulation) instead."""
    from .sources.tables import register_views

    register_views(spark, sf, ("orders",))
    return spark.sql(Q99_SQL)


def q100_column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Warehouse-style data-quality profile of the documents table:
    null count, exact distinct count, min/max per column, computed in
    one aggregation pass (operators/audit.py — the multi-DISTINCT agg
    compiles to a single Expand + shuffle, not one scan per column).
    The oracle is the per-column UNION ALL a DBA would write."""
    from .operators.audit import profile_columns

    d = load_table(spark, sf, "documents")
    return profile_columns(d, ["doc_id", "lang", "source", "n_chars"])


Q100_SQL = """
SELECT 'doc_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_null,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
  CAST(MIN(doc_id) AS VARCHAR) AS min_val, CAST(MAX(doc_id) AS VARCHAR) AS max_val
FROM documents
UNION ALL
SELECT 'lang', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(lang) AS BIGINT),
  CAST(COUNT(DISTINCT lang) AS BIGINT), MIN(lang), MAX(lang) FROM documents
UNION ALL
SELECT 'source', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(source) AS BIGINT),
  CAST(COUNT(DISTINCT source) AS BIGINT), MIN(source), MAX(source) FROM documents
UNION ALL
SELECT 'n_chars', CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
  CAST(COUNT(DISTINCT n_chars) AS BIGINT), CAST(MIN(n_chars) AS VARCHAR),
  CAST(MAX(n_chars) AS VARCHAR) FROM documents
"""


def q101_unigram_nll(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-model fluency scoring: average negative log-likelihood
    per document under a Laplace-smoothed unigram LM of the corpus
    (operators/text.py:unigram_nll_scores) — the scalable core of a
    KenLM-style quality filter. Log-probs are FLOORED onto a 1e-9
    BIGINT lattice before summation (floor, never round — r9's q143
    boundary flip), so the score is deterministic under any
    partitioning and matches DuckDB bit-for-bit."""
    from .operators.text import unigram_nll_scores

    d = load_table(spark, sf, "documents")
    return unigram_nll_scores(d)


Q101_SQL = r"""
WITH ts AS (
  SELECT id, term, dl, COUNT(*) AS tf FROM (
    SELECT doc_id AS id,
      lower(unnest(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'))) AS term,
      len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS dl
    FROM documents)
  GROUP BY id, term, dl),
vocab AS (SELECT term, SUM(tf) AS c FROM ts GROUP BY term),
tot AS (SELECT SUM(c) AS n_corpus, COUNT(*) AS v_size FROM vocab),
lp AS (
  SELECT term,
    CAST(FLOOR(ln((c + 1) / (n_corpus + v_size)) * 1e9) AS BIGINT) AS logp_q
  FROM vocab CROSS JOIN tot)
SELECT id AS doc_id, CAST(dl AS INT) AS n_tokens,
  CAST(-CAST(SUM(tf * logp_q) AS BIGINT) AS DOUBLE)
    / (CAST(dl AS DOUBLE) * 1e9) AS avg_nll
FROM ts JOIN lp USING (term)
GROUP BY id, dl
"""


def q102_session_window_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Native batch ``session_window`` aggregation (30-min gap): one
    groupBy produces per-session rows with start/end bounds — the same
    operator Structured Streaming uses for stateful sessions (q55),
    here on a static frame. Spark merges overlapping event windows
    per key inside the aggregate (one shuffle on user_id, no lag
    window pass). The oracle reconstructs sessions with the manual
    lag + cumulative-sum formulation, proving the two agree row for
    row including bounds (end = last event + gap)."""
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


Q102_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
         OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
    THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id, ts, value,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked)
SELECT user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


def q103_fuzzy_join_names(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: customer-name pairs within
    Levenshtein distance 1, via SymSpell deletion-neighborhood
    blocking (operators/fuzzy.py) — an equi-join on delete-variant
    hashes plus exact verification, never a cross product. The oracle
    IS the cross product (DuckDB levenshtein over all pairs), proving
    exact recall and precision of the blocking scheme."""
    from .operators.fuzzy import fuzzy_join

    c = load_table(spark, sf, "customer")
    return (
        fuzzy_join(c, c, "c_name", max_dist=1, left_id="c_custkey",
                   right_id="c_custkey")
        .filter(F.col("l_id") < F.col("r_id"))
        .select(
            F.col("l_id").alias("a_custkey"),
            F.col("r_id").alias("b_custkey"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


Q103_SQL = """
SELECT a.c_custkey AS a_custkey, b.c_custkey AS b_custkey,
  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def q104_segment_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style segment dedup (operators/spans.py): corpus-wide
    repeated 10-word segments removed, first occurrence kept. One
    digest-keyed shuffle; the oracle replays the identical
    keep-first-by-(doc,index) rule with window functions."""
    from .operators.spans import segment_dedup

    d = load_table(spark, sf, "documents")
    return segment_dedup(d, "doc_id", "text", seg_words=10)


Q104_SQL = r"""
WITH w AS (SELECT doc_id,
           list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS ws
           FROM documents),
seg AS (
  SELECT doc_id, i::BIGINT - 1 AS idx,
         array_to_string(ws[((i-1)*10+1):((i-1)*10+10)], ' ') AS seg
  FROM w, LATERAL unnest(range(1, CAST(ceil(len(ws)/10.0) AS BIGINT) + 1)) AS t(i)
),
marked AS (
  SELECT doc_id, idx, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) = 1 AS keep
  FROM seg
)
SELECT w.doc_id, count(m.seg) AS n_segments,
       CAST(coalesce(sum(m.keep::int), 0) AS BIGINT) AS n_kept,
       coalesce(string_agg(m.seg, ' ' ORDER BY m.idx) FILTER (WHERE m.keep), '')
         AS cleaned_text
FROM w LEFT JOIN marked m ON w.doc_id = m.doc_id
GROUP BY w.doc_id
"""


def q105_duplicate_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-substring exposure at 3-gram resolution
    (operators/spans.py, after Lee et al. 2021): per-doc duplicated
    position fraction and longest duplicated run. Inverted-index
    shape — digest-keyed df aggregation joined back to positions."""
    from .operators.spans import duplicate_span_stats

    d = load_table(spark, sf, "documents")
    return duplicate_span_stats(d, "doc_id", "text", n=3)


Q105_SQL = r"""
WITH w AS (SELECT doc_id,
           list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS ws
           FROM documents),
pos AS (
  SELECT doc_id, i::BIGINT AS idx, array_to_string(ws[i:(i+2)], ' ') AS g
  FROM w, LATERAL unnest(range(1, len(ws) - 1)) AS t(i)
),
dpg AS (SELECT g, count(DISTINCT doc_id) AS docs FROM pos GROUP BY g),
dup AS (SELECT doc_id, idx, (docs >= 2) AS is_dup FROM pos JOIN dpg USING (g)),
runs AS (
  SELECT doc_id, max(run) AS max_dup_run FROM (
    SELECT doc_id, count(*) AS run FROM (
      SELECT doc_id, idx,
             idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
      FROM dup WHERE is_dup) GROUP BY doc_id, grp) GROUP BY doc_id
)
SELECT p.doc_id, count(*) AS n_positions,
       CAST(sum(is_dup::int) AS BIGINT) AS dup_positions,
       sum(is_dup::int) / count(*) AS dup_frac,
       CAST(coalesce(any_value(r.max_dup_run), 0) AS BIGINT) AS max_dup_run
FROM dup p LEFT JOIN runs r ON p.doc_id = r.doc_id
GROUP BY p.doc_id
"""


def q106_nest_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Full relationalize -> unrelationalize round trip
    (operators/nest.py): nest lineitems per order, split out through
    rid-linked tables, fold back, and aggregate over the REBUILT
    array — including its element order (first_linenumber proves the
    __index_ ordering survived). The oracle computes the same facts
    straight off the flat lineitem table."""
    from .operators.nest import unrelationalize
    from .operators.relationalize import relationalize

    l = load_table(spark, sf, "lineitem")
    nested = l.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct(*_LINEITEM_COLS))).alias("lineitems")
    )
    tables = relationalize(nested, "orders", key_cols=["l_orderkey"])
    back = unrelationalize(tables, "orders")
    items = F.col("lineitems")
    return back.select(
        "l_orderkey",
        F.size(items).alias("n_items"),
        F.aggregate(
            items,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x.l_quantity.cast("bigint"),
        ).alias("sum_qty"),
        F.element_at(items, 1).l_linenumber.cast("int").alias("first_linenumber"),
    )


Q106_SQL = """
SELECT l_orderkey, count(*) AS n_items,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(max(CASE WHEN rn = 1 THEN l_linenumber END) AS INT) AS first_linenumber
FROM (
  SELECT l_orderkey, l_quantity, l_linenumber,
    row_number() OVER (
      PARTITION BY l_orderkey
      ORDER BY l_partkey, l_suppkey, l_linenumber
    ) AS rn
  FROM lineitem
) GROUP BY l_orderkey
"""


def q107_group_quota_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-source quota sampling (operators/sampling.py):
    min(20, |source|) docs per source, membership decided by the
    Knuth id hash so the oracle replays the identical arithmetic."""
    from .operators.sampling import group_quota_sample

    d = load_table(spark, sf, "documents")
    return group_quota_sample(d, "source", 20, id_col="doc_id").select(
        "doc_id", "source"
    )


Q107_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (
      PARTITION BY source
      ORDER BY (doc_id * 2654435761) % 4294967296 ASC, doc_id ASC
    ) AS rk
  FROM documents
) WHERE rk <= 20
"""


def q108_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (operators/dedup.py): deterministic k-means cells,
    exact within-cell cosine pairs >= 0.45 (the testdata's embeddings
    have no pairs past ~0.5, so the production-style 0.95 threshold
    returned 0 rows at gate scale and the count was a vacuous smoke
    signal; 0.45 matches q32's regime and yields real pairs at both
    sf0.001 and sf0.01). As of r5 this runs the replayable k-means
    (see q67), so the cell assignment is engine-replayable and the
    whole operator — assignment + within-cell pairs + 6-dp cosine —
    carries a FULL value oracle; tests/test_semdedup.py still pins
    the operator contracts (pair subset of brute force, threshold,
    determinism)."""
    from .operators.dedup import semdedup_pairs

    e = load_table(spark, sf, "embeddings")
    return semdedup_pairs(
        e, "vec_id", "embedding", k=16, threshold=0.45, replayable=True
    )


Q108_SQL = (
    "WITH "
    + _kmeans_replay_ctes(16, 10)
    + """,
pairs AS (
  SELECT a.vec_id AS i, b.vec_id AS j, a.cluster
  FROM asg a JOIN asg b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
)
SELECT p.i, p.j,
  CAST(FLOOR(list_inner_product(va.e, vb.e)
        / (sqrt(list_inner_product(va.e, va.e))
           * sqrt(list_inner_product(vb.e, vb.e))) * 1e6) AS BIGINT) / 1e6 AS cos_sim,
  p.cluster
FROM pairs p
JOIN v va ON p.i = va.vec_id
JOIN v vb ON p.j = vb.vec_id
WHERE CAST(FLOOR(list_inner_product(va.e, vb.e)
        / (sqrt(list_inner_product(va.e, va.e))
           * sqrt(list_inner_product(vb.e, vb.e))) * 1e6) AS BIGINT) / 1e6 >= 0.45
"""
)


def q109_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 dimension history from event snapshots
    (operators/scd2.py): per-user runs of event_type collapsed into
    validity intervals with is_current. The (user_id, ts)
    pre-aggregation makes the window order tie-free regardless of
    how the driver regenerates testdata."""
    from .operators.scd2 import scd2_from_snapshots

    e = load_table(spark, sf, "events")
    snap = e.groupBy("user_id", "ts").agg(F.min("event_type").alias("event_type"))
    hist = scd2_from_snapshots(snap, ["user_id"], ["event_type"], "ts")
    # The dimension keeps the sargable year-9999 sentinel; surface it
    # as NULL here because the gate (and pandas generally) renders
    # timestamps as datetime64[ns], which caps at year 2262.
    return hist.withColumn(
        "valid_to", F.when(~F.col("is_current"), F.col("valid_to"))
    )


Q109_SQL = """
WITH snap AS (
  SELECT user_id, ts, min(event_type) AS event_type
  FROM events GROUP BY user_id, ts
),
s AS (
  SELECT user_id, event_type, ts,
    CASE WHEN lag(ts) OVER w IS NULL
         OR event_type IS DISTINCT FROM lag(event_type) OVER w
         THEN 1 ELSE 0 END AS chg
  FROM snap WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
v AS (
  SELECT user_id, event_type, ts,
    sum(chg) OVER (PARTITION BY user_id ORDER BY ts) AS ver
  FROM s
),
runs AS (
  SELECT user_id, ver, min(event_type) AS event_type, min(ts) AS valid_from
  FROM v GROUP BY user_id, ver
)
SELECT user_id, event_type, valid_from,
  lead(valid_from) OVER w2 AS valid_to,
  (lead(valid_from) OVER w2 IS NULL) AS is_current
FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
"""


def q110_snapshot_cdc(spark: SparkSession, sf: str) -> DataFrame:
    """CDC changeset between two snapshot states of a per-customer
    order rollup (operators/scd2.py:snapshot_diff): inserts for
    customers first seen after the cutoff, updates where the rollup
    changed. Null-safe comparisons throughout."""
    from .operators.scd2 import snapshot_diff

    o = load_table(spark, sf, "orders")

    def snap(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n_orders"),
            F.max("o_orderstatus").alias("last_status"),
        )

    old = snap(o.filter(F.col("o_orderdate") < "1997-01-01"))
    new = snap(o)
    return snapshot_diff(old, new, ["o_custkey"])


Q110_SQL = """
WITH old AS (
  SELECT o_custkey, count(*) AS n_orders, max(o_orderstatus) AS last_status
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY o_custkey
),
new AS (
  SELECT o_custkey, count(*) AS n_orders, max(o_orderstatus) AS last_status
  FROM orders GROUP BY o_custkey
)
SELECT coalesce(n.o_custkey, o.o_custkey) AS o_custkey,
       n.n_orders AS n_orders, n.last_status AS last_status,
       CASE WHEN o.o_custkey IS NULL THEN 'insert'
            WHEN n.o_custkey IS NULL THEN 'delete'
            WHEN n.n_orders IS DISTINCT FROM o.n_orders
              OR n.last_status IS DISTINCT FROM o.last_status
            THEN 'update' END AS change
FROM old o FULL OUTER JOIN new n ON o.o_custkey = n.o_custkey
WHERE (CASE WHEN o.o_custkey IS NULL THEN 'insert'
            WHEN n.o_custkey IS NULL THEN 'delete'
            WHEN n.n_orders IS DISTINCT FROM o.n_orders
              OR n.last_status IS DISTINCT FROM o.last_status
            THEN 'update' END) IS NOT NULL
"""


def q111_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention triangle over events
    (operators/timeseries.py:cohort_retention): users bucketed by
    first-activity week, distinct-counted at each later week offset.
    Epoch-aligned integer week buckets — engine/timezone neutral."""
    from .operators.timeseries import cohort_retention

    e = load_table(spark, sf, "events")
    return cohort_retention(e, "user_id", "ts")


Q111_SQL = """
WITH act AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // 604800000000 AS b FROM events
),
cohorted AS (SELECT u, b, min(b) OVER (PARTITION BY u) AS cohort FROM act)
SELECT make_timestamp(cohort * 604800000000) AS cohort_start,
       b - cohort AS period_offset,
       count(DISTINCT u) AS n_users
FROM cohorted GROUP BY cohort, b - cohort
"""


def q112_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sampling without replacement
    (operators/sampling.py:weighted_quota_sample): top-15 docs per
    source by Efraimidis-Spirakis priority u^(1/w), u reproducible
    from the Knuth id hash, w = n_chars. The oracle replays the
    identical arithmetic (priority floored onto the 1e-9 lattice so cross-
    engine pow ulps cannot flip the ranking)."""
    from .operators.sampling import weighted_quota_sample

    d = load_table(spark, sf, "documents")
    return weighted_quota_sample(d, "source", 15, "n_chars").select(
        "doc_id", "source", "n_chars"
    )


Q112_SQL = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
    row_number() OVER (
      PARTITION BY source
      ORDER BY CAST(FLOOR(
        pow((((doc_id * 2654435761) % 4294967296) + 0.5) / 4294967296.0,
            1.0 / n_chars) * 1e9) AS BIGINT) DESC,
        doc_id ASC
    ) AS rk
  FROM documents
) WHERE rk <= 15
"""


def q113_table_checksum(spark: SparkSession, sf: str) -> DataFrame:
    """Order-insensitive table fingerprint
    (operators/audit.py:table_checksum) over customer identity
    columns — the strong form of the reference's post-COPY COUNT(1)
    validation. The oracle replays the identical md5-chunk XOR."""
    from .operators.audit import table_checksum

    c = load_table(spark, sf, "customer")
    return table_checksum(c, ["c_custkey", "c_name", "c_mktsegment"])


Q113_SQL = """
SELECT count(*) AS n_rows, count(DISTINCT r) AS distinct_rows,
       bit_xor(CAST(('0x' || substr(md5(r), 1, 15)) AS BIGINT)) AS checksum
FROM (
  SELECT concat_ws(chr(31),
           coalesce(CAST(c_custkey AS VARCHAR), chr(0)),
           coalesce(c_name, chr(0)),
           coalesce(c_mktsegment, chr(0))) AS r
  FROM customer
)
"""


def q114_partial_agg_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Re-aggregation of pre-aggregated shards
    (operators/audit.py:merge_partial_aggs): daily order partials
    folded into monthly totals. The oracle aggregates the RAW rows
    directly, so a green row proves merge(partial(x)) == total(x).
    Sums carry DECIMAL(18,2) through both levels and cast to DOUBLE
    once at the end (repo decimal convention)."""
    from .operators.audit import merge_partial_aggs

    o = load_table(spark, sf, "orders")
    day = F.date_trunc("day", F.col("o_orderdate"))
    month = F.date_trunc("month", F.col("o_orderdate"))
    partials = o.groupBy(
        month.alias("month"), F.col("o_orderstatus"), day.alias("__day__")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )
    merged = merge_partial_aggs(
        partials,
        ["month", "o_orderstatus"],
        count_col="n",
        sum_cols=["total"],
        min_cols=["first_order"],
        max_cols=["last_order"],
    )
    return merged.select(
        "month",
        "o_orderstatus",
        "n",
        F.col("total").cast("double").alias("total"),
        "first_order",
        "last_order",
    )


Q114_SQL = """
SELECT date_trunc('month', o_orderdate) AS month, o_orderstatus,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order
FROM orders GROUP BY 1, 2
"""


def q115_streaming_segment_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming keep-first segment dedup
    (streaming/segments.py:stream_segment_dedup): documents arrive as
    a file stream with a synthetic event time, segments dedupe on
    their digest via dropDuplicatesWithinWatermark, state evicted by
    the watermark. Which document contributes a survivor is
    arrival-order dependent, so the query projects the surviving
    segment VALUES — that set is deterministic and the oracle is the
    batch DISTINCT over the same segmentation."""
    from .streaming.segments import stream_segment_dedup

    stream = _stream_parquet(spark, sf, "documents")
    # Synthetic clock starts a day AFTER epoch 0: the initial
    # streaming watermark is epoch 0, and a row timestamped exactly
    # at the watermark is treated as late and silently dropped
    # (observed: doc_id=0's segments vanished).
    stream = stream.withColumn(
        "__ts__",
        F.timestamp_micros((F.col("doc_id") + F.lit(86_400)) * F.lit(1_000_000)),
    )
    kept = stream_segment_dedup(
        stream, "doc_id", "text", "__ts__", seg_words=10, watermark="1 hour"
    ).select("seg")
    # dropDuplicatesWithinWatermark emits survivors on ARRIVAL (append
    # mode); the no-data batch only evicts state -> skip it
    with _stream_state_parallelism(
        spark,
        source_bytes=_source_backlog_bytes(f"{sf}/documents.parquet"),
        skip_nodata_batch=True,
        output_mode="append",
        emits_on_arrival=True,
    ):
        q = (
            kept.writeStream.format("memory")
            .queryName("q115_segments")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("q115_segments")


Q115_SQL = r"""
WITH w AS (SELECT doc_id,
           list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS ws
           FROM documents),
seg AS (
  SELECT array_to_string(ws[((i-1)*10+1):((i-1)*10+10)], ' ') AS seg
  FROM w, LATERAL unnest(range(1, CAST(ceil(len(ws)/10.0) AS BIGINT) + 1)) AS t(i)
)
SELECT DISTINCT seg FROM seg
"""


def q116_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Character-entropy quality signal (operators/text.py:
    char_entropy): bits/char per document, the compression-ratio
    screen behind Gopher-style gibberish filters. Zero-shuffle
    higher-order-function expression; identical formula in the
    oracle, floored onto the 1e-9 lattice so summation-order ulps can't
    diverge."""
    from .operators.text import char_entropy

    d = load_table(spark, sf, "documents")
    return d.select("doc_id", char_entropy("text").alias("entropy"))


Q116_SQL = """
SELECT doc_id,
  CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
  ELSE CAST(greatest(
    CAST(FLOOR(log2(len(cs)) * 1e9) AS BIGINT) * len(cs)
    - CAST(list_sum(list_transform(
        list_transform(list_distinct(cs),
                       c -> CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE)),
        n -> CAST(FLOOR(n * log2(n) * 1e9) AS BIGINT))) AS BIGINT), 0)
    AS DOUBLE) / (CAST(len(cs) AS DOUBLE) * 1e9)
  END AS entropy
FROM (SELECT doc_id, text, string_split(text, '') AS cs FROM documents)
"""


def q117_funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered 4-step funnel (operators/funnel.py:funnel_steps):
    signup -> view -> click -> purchase, one HOF walk per user after
    a single shuffle. The oracle is the iterated-min-join
    formulation (k chained CTEs) — equal counts prove the
    single-pass walk implements the same semantics."""
    from .operators.funnel import funnel_steps

    e = load_table(spark, sf, "events")
    return funnel_steps(
        e, "user_id", "ts", "event_type",
        ["signup", "view", "click", "purchase"],
    )


Q117_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'view' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 1 AS step, 'signup' AS event_type, count(*) AS n_users FROM s1
UNION ALL SELECT 2, 'view', count(*) FROM s2
UNION ALL SELECT 3, 'click', count(*) FROM s3
UNION ALL SELECT 4, 'purchase', count(*) FROM s4
"""


def q118_psi_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Population-stability-index drift (operators/drift.py): order
    totals before vs since 1998, 10 equi-width bins over the
    baseline's exact [min, max] (no quantile interpolation, so every
    engine bins identically); per-bin PSI terms sum to the headline
    drift score."""
    from .operators.drift import psi_drift

    o = load_table(spark, sf, "orders")
    cut = F.lit("1998-01-01 00:00:00").cast(o.schema["o_orderdate"].dataType)
    base = o.where(F.col("o_orderdate") < cut)
    cur = o.where(F.col("o_orderdate") >= cut)
    return psi_drift(base, cur, "o_totalprice", n_bins=10)


Q118_SQL = """
WITH b AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
),
c AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice IS NOT NULL
),
s AS (SELECT min(v) AS lo, max(v) AS hi FROM b),
bins AS (SELECT CAST(i AS INT) AS bin FROM range(0, 10) t(i)),
bb AS (
  SELECT CAST(floor(least(9.0, greatest(0.0, (v - lo) / (hi - lo) * 10))) AS INT) AS bin,
         count(*) AS n
  FROM b, s GROUP BY 1
),
cc AS (
  SELECT CAST(floor(least(9.0, greatest(0.0, (v - lo) / (hi - lo) * 10))) AS INT) AS bin,
         count(*) AS n
  FROM c, s GROUP BY 1
),
j AS (
  SELECT bins.bin, coalesce(bb.n, 0) AS base_n, coalesce(cc.n, 0) AS cur_n
  FROM bins LEFT JOIN bb ON bins.bin = bb.bin LEFT JOIN cc ON bins.bin = cc.bin
)
SELECT bin, base_n, cur_n,
  CAST(FLOOR(base_n / (sum(base_n) OVER ()) * 1e9) AS BIGINT) / 1e9
    AS base_frac,
  CAST(FLOOR(cur_n / (sum(cur_n) OVER ()) * 1e9) AS BIGINT) / 1e9
    AS cur_frac,
  CAST(FLOOR(
    (greatest(cur_n / (sum(cur_n) OVER ()), 1e-6)
     - greatest(base_n / (sum(base_n) OVER ()), 1e-6))
    * ln(greatest(cur_n / (sum(cur_n) OVER ()), 1e-6)
         / greatest(base_n / (sum(base_n) OVER ()), 1e-6))
    * 1e9) AS BIGINT) / 1e9 AS psi_term
FROM j
"""


def q119_robust_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Robust median/MAD outlier screen (operators/audit.py:
    robust_outliers): per-event-type modified z-scores over event
    values; |z| > 3.5 rows survive. The oracle replays the exact
    two-level quantile_cont + Iglewicz-Hoaglin formula; the threshold
    compares the 1e-6-floor-latticed score in both engines (r10:
    floor, never round)."""
    from .operators.audit import robust_outliers

    e = load_table(spark, sf, "events")
    return robust_outliers(e, ["event_type"], "value", z_thresh=3.5).select(
        "event_id", "event_type", F.col("value").cast("double").alias("value"),
        "robust_z",
    )


Q119_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(CAST(value AS DOUBLE), 0.5) AS m
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(CAST(e.value AS DOUBLE) - med.m), 0.5) AS d
  FROM events e JOIN med ON e.event_type = med.event_type GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, CAST(e.value AS DOUBLE) AS value,
  CAST(FLOOR(0.6745 * (CAST(e.value AS DOUBLE) - med.m)
             / nullif(mad.d, 0) * 1e6) AS BIGINT) / 1e6 AS robust_z
FROM events e
JOIN med ON e.event_type = med.event_type
JOIN mad ON e.event_type = mad.event_type
WHERE abs(CAST(FLOOR(0.6745 * (CAST(e.value AS DOUBLE) - med.m)
               / nullif(mad.d, 0) * 1e6) AS BIGINT) / 1e6) > 3.5
"""


def q120_knn_label_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-quality probe (operators/similarity.py:
    knn_label_eval): do a query vector's 5 exact nearest neighbors
    vote its own label back? The oracle replays the cross-join
    cosine top-5 (1e-6-latticed scores, id tiebreak — the q31 pattern) and
    the count-desc/label-asc majority vote."""
    from .operators.similarity import knn_label_eval

    e = load_table(spark, sf, "embeddings")
    q = e.where(F.col("vec_id") % 40 == 0)
    return knn_label_eval(e, queries=q, k=5)


Q120_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS true_label
  FROM embeddings WHERE vec_id % 40 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label FROM embeddings
),
top AS (
  SELECT query_id, neighbor_id, label FROM (
    SELECT q.query_id, c.neighbor_id, c.label,
      ROW_NUMBER() OVER (PARTITION BY q.query_id
        ORDER BY CAST(FLOOR(list_cosine_similarity(qv, cv) * 1e6) AS BIGINT) / 1e6 DESC,
                 c.neighbor_id ASC) AS rn
    FROM q JOIN c ON q.query_id != c.neighbor_id
  ) WHERE rn <= 5
),
votes AS (SELECT query_id, label, count(*) AS n FROM top GROUP BY 1, 2),
pred AS (
  SELECT query_id, label AS pred_label FROM (
    SELECT query_id, label,
      row_number() OVER (PARTITION BY query_id ORDER BY n DESC, label ASC) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT p.query_id, q.true_label, p.pred_label,
       (q.true_label = p.pred_label) AS match
FROM pred p JOIN q ON p.query_id = q.query_id
"""


def q121_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.py) over the
    customer<->supplier interaction graph (reverse edges added, so no
    dangling mass and the walk is ergodic), 3 iterations, damping
    0.85. The oracle replays the identical computation as chained
    CTEs — per-iteration 12-dp quantization makes the float fixpoint
    engine-replayable. Exercises the iterative-join family with a
    true value oracle (unlike k-means/sketches, which are rows-only)."""
    from .operators.graph import pagerank

    o = load_table(spark, sf, "orders")
    l = load_table(spark, sf, "lineitem")
    pairs = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return pagerank(edges, max_iter=3)


Q121_SQL = """
WITH pairs AS (
  SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                  'S' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
params AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
bq AS (SELECT CAST(FLOOR(((1 - 0.85) / n) * 1000000000000.0) AS BIGINT) AS b
       FROM params),
r0 AS (SELECT id,
  CAST(FLOOR((1.0 / (SELECT n FROM params)) * 1000000000000.0) AS BIGINT)
    AS rq
  FROM nodes),
r1 AS (
  SELECT nodes.id,
    (SELECT b FROM bq)
    + CAST(FLOOR(CAST(0.85 AS DOUBLE) * CAST(coalesce(s.v, 0) AS DOUBLE))
           AS BIGINT) AS rq
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id,
           CAST(sum(r0.rq // deg.d) AS BIGINT) AS v
    FROM edges e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src
    GROUP BY e.dst) s ON nodes.id = s.id
),
r2 AS (
  SELECT nodes.id,
    (SELECT b FROM bq)
    + CAST(FLOOR(CAST(0.85 AS DOUBLE) * CAST(coalesce(s.v, 0) AS DOUBLE))
           AS BIGINT) AS rq
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id,
           CAST(sum(r1.rq // deg.d) AS BIGINT) AS v
    FROM edges e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.src
    GROUP BY e.dst) s ON nodes.id = s.id
),
r3 AS (
  SELECT nodes.id,
    (SELECT b FROM bq)
    + CAST(FLOOR(CAST(0.85 AS DOUBLE) * CAST(coalesce(s.v, 0) AS DOUBLE))
           AS BIGINT) AS rq
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id,
           CAST(sum(r2.rq // deg.d) AS BIGINT) AS v
    FROM edges e JOIN r2 ON e.src = r2.id JOIN deg ON e.src = deg.src
    GROUP BY e.dst) s ON nodes.id = s.id
)
SELECT id, CAST(rq AS DOUBLE) / 1000000000000.0 AS "rank" FROM r3
"""


def q122_scd2_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time (time-travel) join (operators/scd2.py:
    scd2_lookup): each purchase event gets the SCD2 state version
    that was valid at its timestamp — backward as-of on valid_from
    with a valid_to guard, one shuffle on the business key. The
    oracle rebuilds the identical dimension and replays the lookup
    with DuckDB's ASOF JOIN."""
    from .operators.scd2 import scd2_from_snapshots, scd2_lookup

    e = load_table(spark, sf, "events")
    snap = e.groupBy("user_id", "ts").agg(F.min("event_type").alias("state"))
    dim = scd2_from_snapshots(snap, ["user_id"], ["state"], "ts")
    facts = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").cast("double").alias("value")
    )
    out = scd2_lookup(facts, dim, ["user_id"], "ts", value_cols=["state"])
    return out.select("event_id", "user_id", "ts", "value", "state")


Q122_SQL = """
WITH snap AS (
  SELECT user_id, ts, min(event_type) AS state
  FROM events GROUP BY user_id, ts
),
s AS (
  SELECT user_id, state, ts,
    CASE WHEN lag(ts) OVER w IS NULL
         OR state IS DISTINCT FROM lag(state) OVER w
         THEN 1 ELSE 0 END AS chg
  FROM snap WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
v AS (
  SELECT user_id, state, ts,
    sum(chg) OVER (PARTITION BY user_id ORDER BY ts) AS ver
  FROM s
),
runs AS (
  SELECT user_id, ver, min(state) AS state, min(ts) AS valid_from
  FROM v GROUP BY user_id, ver
),
hist AS (
  SELECT user_id, state, valid_from,
    lead(valid_from) OVER w2 AS valid_to
  FROM runs WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
),
facts AS (
  SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS value
  FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.ts, f.value,
  CASE WHEN f.ts < coalesce(h.valid_to, TIMESTAMP '9999-12-31 23:59:59')
       THEN h.state END AS state
FROM facts f ASOF LEFT JOIN hist h
  ON f.user_id = h.user_id AND f.ts >= h.valid_from
"""


def q123_simhash_md5(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs with the md5_60 token hash
    (operators/dedup.py:_token_hash): same banding/pigeonhole
    machinery as q30, but the token hash is 60 bits of md5 — which
    DuckDB can compute — so this registry entry carries a FULL
    value-hash oracle replaying signature, bands, and hamming
    verbatim. q30 (xxhash64, the fast production path) stays
    rows-only; this entry proves the family's correctness at value
    level."""
    from .operators.dedup import simhash_pairs

    d = load_table(spark, sf, "documents")
    return simhash_pairs(
        d, "doc_id", "text", max_hamming=3, bands=4, sig_bits=64,
        token_hash="md5_60",
    )


Q123_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'))) AS tok
  FROM documents
),
h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS v
  FROM toks
),
bits AS (
  SELECT doc_id, j, sum(((v >> j) & 1) * 2 - 1) AS s
  FROM h, LATERAL unnest(range(0, 60)) t(j)
  GROUP BY doc_id, j
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS sig
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, bd, (sig >> (CAST(bd AS INT) * 16)) & 65535 AS bucket, sig
  FROM sig, LATERAL unnest(range(0, 4)) t(bd)
),
cand AS (
  SELECT DISTINCT a.doc_id AS i, b.doc_id AS j, a.sig AS sa, b.sig AS sb
  FROM bands a JOIN bands b
    ON a.bd = b.bd AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT i, j, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""


def q124_winnow_md5(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints with the md5_60 gram hash
    (operators/text.py:winnow_fingerprint): DuckDB replays the full
    pipeline — normalize, char 8-grams, 60-bit md5 gram hashes,
    4-wide window minima, md5 over the JSON of the sorted distinct
    minima — so this entry has a complete value oracle; q33
    (xxhash64 fast path) stays rows-only."""
    from .operators.text import winnow_fingerprint

    d = ensure_parallelism(load_table(spark, sf, "documents"))
    return d.select(
        "doc_id",
        winnow_fingerprint("text", gram_hash="md5_60").alias("winnow_fp"),
    )


Q124_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS t
  FROM documents
),
g AS (
  SELECT doc_id, t,
    list_transform(
      range(1, greatest(length(t) - 8 + 1, 1) + 1),
      i -> CAST(('0x' || substr(md5(substr(t, CAST(i AS INT), 8)), 1, 15)) AS BIGINT)
    ) AS grams
  FROM norm
),
m AS (
  SELECT doc_id,
    list_transform(
      range(1, greatest(len(grams) - 4 + 1, 1) + 1),
      i -> list_min(grams[CAST(i AS INT):CAST(i AS INT) + 3])
    ) AS minima
  FROM g
)
SELECT doc_id, md5(to_json(list_sort(list_distinct(minima)))) AS winnow_fp
FROM m
"""


def q125_relationalize_dynamic(spark: SparkSession, sf: str) -> DataFrame:
    """Per-row dynamic relationalize (r5,
    operators/relationalize.py:_expand_variants): the key ``v`` is an
    int in one row, a list in the next, an object in the third — the
    reference's row-walk semantics (reference
    relationalize/relationalize.py:48-119) on a plan-time engine.
    Scalar rows keep their value (``v_int``), list rows put the rid in
    the choice column's str lane (``v_str``) with the elements in a
    child table, object rows flatten to ``v_a``/``v_b``. The oracle
    replays EVERYTHING value-level — including the rid strings, since
    hash-mode rids are ``R_ + md5(table \\x1f path \\x1f row-key)``
    (operators/relationalize.py:_hash_rid) and DuckDB computes the
    identical md5 — plus the child-table linkage via per-rid count and
    sum re-aggregated back onto the parent."""
    from .sources.jsonl import relationalize_json

    o = load_table(spark, sf, "orders")
    line = F.concat(
        F.lit('{"k": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "v": '),
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_custkey").cast("string"))
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.concat(
                F.lit("["),
                (F.col("o_custkey") % 100).cast("string"),
                F.lit(", "),
                (F.col("o_orderkey") % 7).cast("string"),
                F.lit("]"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"a": '),
                (F.col("o_custkey") % 1000).cast("string"),
                F.lit(', "b": "'),
                F.col("o_orderpriority"),
                F.lit('"}'),
            )
        ),
        F.lit("}"),
    )
    vdf = ensure_parallelism(o.select(F.parse_json(line).alias("v")))
    res = relationalize_json(vdf, "dyn", key_cols=["k"])
    root, child = res["dyn"], res["dyn_v"]
    stats = child.groupBy(F.col("v__rid_").alias("rid")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("v__val_").alias("sum_items"),
    )
    return root.join(stats, root["v_str"] == stats["rid"], "left").select(
        "k", "v_int", "v_str", "v_a", "v_b", "n_items", "sum_items"
    )


Q125_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey, o_orderpriority,
         o_orderkey % 3 AS m
  FROM orders
)
SELECT k,
  CASE WHEN m = 0 THEN o_custkey END AS v_int,
  CASE WHEN m = 1
       THEN 'R_' || md5('dyn' || chr(31) || 'v' || chr(31) || '{"k":' || k || '}')
  END AS v_str,
  CASE WHEN m = 2 THEN CAST(o_custkey % 1000 AS BIGINT) END AS v_a,
  CASE WHEN m = 2 THEN o_orderpriority END AS v_b,
  CASE WHEN m = 1 THEN CAST(2 AS BIGINT) END AS n_items,
  CASE WHEN m = 1 THEN CAST((o_custkey % 100) + (k % 7) AS BIGINT) END AS sum_items
FROM base
"""


def q126_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """K-Minimum-Values distinct-count sketch per document source
    (operators/sketches.py) — the engine-replayable counterpart to
    q94's built-in HLL/GK sketches (whose register layouts are
    engine-specific and stay rows-only by declared necessity): the
    md5-derived 60-bit hash computes identically in DuckDB, so the
    sketch CONTENT (k minima, digested like q124's), the distinct
    floor, the estimate, and the exact count all value-match. The
    estimate lands within ~1/sqrt(k-2) of exact — both are columns
    here, so the oracle also pins the error realized on this corpus."""
    from .operators.sketches import kmv_sketch

    d = load_table(spark, sf, "documents")
    sk = kmv_sketch(d, ["source"], "text", k=64)
    exact = d.groupBy("source").agg(
        F.countDistinct("text").alias("exact_distinct")
    )
    return sk.join(exact, "source").select(
        "source",
        F.md5(F.to_json("kmv_minima")).alias("minima_md5"),
        "kmv_n_distinct",
        "kmv_estimate",
        "exact_distinct",
    )


Q126_SQL = """
WITH h AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS hv
  FROM documents WHERE text IS NOT NULL
),
rk AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
  FROM h
),
agg AS (
  SELECT source, list(hv ORDER BY hv) AS kmv_minima, count(*) AS n_min
  FROM rk WHERE rk <= 64 GROUP BY source
),
ex AS (
  SELECT source, count(DISTINCT text) AS exact_distinct
  FROM documents WHERE text IS NOT NULL GROUP BY source
)
SELECT agg.source,
  md5(to_json(kmv_minima)) AS minima_md5,
  CAST(n_min AS BIGINT) AS kmv_n_distinct,
  CASE WHEN n_min < 64 THEN CAST(n_min AS DOUBLE)
       ELSE CAST(FLOOR(63.0 * 1152921504606846976.0 / kmv_minima[64] * 1e6) AS BIGINT) / 1e6
  END AS kmv_estimate,
  CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM agg JOIN ex ON agg.source = ex.source
"""


def q127_kmv_vocab_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary overlap between document sources via KMV sketch SET
    OPERATIONS (operators/sketches.py:kmv_pairwise — Beyer et al.
    2007): per-source token sketches, then Jaccard / union /
    intersection estimates for every source pair computed from the
    bounded k-element minima arrays alone — the pairing is quadratic
    over SKETCHES, never over data. Like q126, the md5-derived hash
    makes every number (including the estimates' lattice quanta) replay
    bit-for-bit in DuckDB."""
    from .operators.sketches import kmv_pairwise, kmv_sketch

    d = load_table(spark, sf, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), _TXT.WS)).alias("token")
    )
    sk = kmv_sketch(toks, ["source"], "token", k=128)
    return kmv_pairwise(sk, "source", k=128).select(
        F.col("a").alias("source_a"),
        F.col("b").alias("source_b"),
        "jaccard_est",
        "union_est",
        "intersection_est",
    )


Q127_SQL = r"""
WITH toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+')) AS token
  FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS hv
  FROM toks
),
rk AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
  FROM h
),
sk AS (
  SELECT source, list(hv ORDER BY hv) AS m, count(*) AS n
  FROM rk WHERE rk <= 128 GROUP BY source
),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.m AS ma, a.n AS na, b.m AS mb, b.n AS nb,
         list_sort(list_distinct(a.m || b.m)) AS merged
  FROM sk a JOIN sk b ON a.source < b.source
),
st AS (
  SELECT source_a, source_b, na, nb, merged, ma, mb,
         merged[1:128] AS x
  FROM p
),
est AS (
  SELECT source_a, source_b,
    len(list_filter(x, v -> list_contains(ma, v) AND list_contains(mb, v))) AS ik,
    len(list_filter(merged, v -> list_contains(ma, v) AND list_contains(mb, v))) AS ifull,
    (na < 128 AND nb < 128) AS exact,
    len(merged) AS mn, x[128] AS kth
  FROM st
),
calc AS (
  SELECT source_a, source_b,
    CASE WHEN exact THEN
           CAST(FLOOR(CAST(ifull AS DOUBLE) / greatest(mn, 1) * 1e6)
                AS BIGINT) / 1e6
         ELSE CAST(FLOOR(CAST(ik AS DOUBLE) / 128.0 * 1e6) AS BIGINT) / 1e6
         END AS jac,
    CASE WHEN exact THEN CAST(mn AS DOUBLE)
         ELSE CAST(FLOOR(127.0 * 1152921504606846976.0 / kth * 1e6)
                   AS BIGINT) / 1e6 END AS un
  FROM est
)
SELECT source_a, source_b,
  jac AS jaccard_est,
  un AS union_est,
  CAST(FLOOR(jac * un * 1e6) AS BIGINT) / 1e6 AS intersection_est
FROM calc
"""


def q128_kmv_shard_merge(spark: SparkSession, sf: str) -> DataFrame:
    """KMV shard-merge (operators/sketches.py:kmv_merge) — the
    map-reduce half of the sketch story, the reference's Schema.merge
    pattern (reference schema.py:259-302) applied to cardinality:
    sketches built independently per shard combine, without re-reading
    data, into EXACTLY the sketch of the union (k smallest of a union
    = k smallest of the per-sketch minima union). Shards here are
    ``doc_id % 4``; the output carries both the merged sketch's digest
    and a directly-built union sketch's digest plus their equality —
    all of it md5-replayable, so the DuckDB oracle value-checks the
    merge law itself, not just row counts (the proof pattern of q114's
    partial-agg merge)."""
    from .operators.sketches import kmv_merge, kmv_sketch

    d = load_table(spark, sf, "documents")
    sharded = d.withColumn("shard", F.col("doc_id") % 4)
    per_shard = kmv_sketch(sharded, ["source", "shard"], "text", k=64)
    merged = kmv_merge(per_shard, ["source"], k=64)
    direct = kmv_sketch(d, ["source"], "text", k=64).select(
        "source", F.md5(F.to_json("kmv_minima")).alias("direct_md5")
    )
    merged_md5 = F.md5(F.to_json("kmv_minima"))
    return merged.join(direct, "source").select(
        "source",
        merged_md5.alias("merged_md5"),
        "direct_md5",
        (merged_md5 == F.col("direct_md5")).alias("merge_equals_direct"),
        "kmv_n_distinct",
        "kmv_estimate",
    )


Q128_SQL = """
WITH h AS (
  SELECT DISTINCT source, doc_id % 4 AS shard,
         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS hv
  FROM documents WHERE text IS NOT NULL
),
rk AS (
  SELECT source, shard, hv,
         row_number() OVER (PARTITION BY source, shard ORDER BY hv) AS rk
  FROM h
),
mh AS (
  SELECT DISTINCT source, hv FROM rk WHERE rk <= 64
),
mrk AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
  FROM mh
),
magg AS (
  SELECT source, list(hv ORDER BY hv) AS minima, count(*) AS n_min
  FROM mrk WHERE rk <= 64 GROUP BY source
),
dh AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS hv
  FROM documents WHERE text IS NOT NULL
),
drk AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
  FROM dh
),
dagg AS (
  SELECT source, list(hv ORDER BY hv) AS minima
  FROM drk WHERE rk <= 64 GROUP BY source
)
SELECT magg.source,
  md5(to_json(magg.minima)) AS merged_md5,
  md5(to_json(dagg.minima)) AS direct_md5,
  md5(to_json(magg.minima)) = md5(to_json(dagg.minima)) AS merge_equals_direct,
  CAST(n_min AS BIGINT) AS kmv_n_distinct,
  CASE WHEN n_min < 64 THEN CAST(n_min AS DOUBLE)
       ELSE CAST(FLOOR(63.0 * 1152921504606846976.0 / magg.minima[64] * 1e6) AS BIGINT) / 1e6
  END AS kmv_estimate
FROM magg JOIN dagg ON magg.source = dagg.source
"""


def q129_hll_merge_law(spark: SparkSession, sf: str) -> DataFrame:
    """DataSketches-HLL mergeability law, value-checked (r7; the q128
    pattern applied to the one sketch family that was still rows-only):
    q94's HLL estimates are engine-specific register layouts DuckDB
    cannot replay, but the MERGE LAW is checkable — per-shard sketches
    (``hll_sketch_agg`` over ``doc_id % 4`` shards) unioned with
    ``hll_union_agg`` must estimate exactly what one direct sketch
    over the unsharded data estimates (same lgConfigK -> identical
    register state, the same algebra as the reference's Schema.merge,
    reference schema.py:259-302). The output carries only
    DuckDB-replayable values: the law as a boolean, the EXACT distinct
    count, and the estimate's 5% error bound as a boolean (HLL lgK=12
    RSE is ~0.8%, so the bound is ~6 sigma — deterministic for a fixed
    corpus).

    Scale shape: two partial-aggregatable jobs over the corpus, each
    shuffling O(groups x sketch) bytes — sketches merge map-side, the
    whole point of the law being proved.

    The law is asserted as a TIGHT relative bound (<= 0.1%), not exact
    equality (ADVICE r7): today both lanes finish through a
    DataSketches Union over identical max-merged registers (Spark's
    partial/final agg always merges, and HIP is retained only for
    never-merged sketches), so they agree exactly — but that is an
    ENGINE estimator-path detail, and a Spark version or partitioning
    change could legitimately route the direct lane through HIP. A
    0.1% band still catches any real merge bug (lost registers shift
    estimates by far more) while surviving estimator-path changes;
    exact-equality held in CORRECTNESS_r07's green row."""
    d = load_table(spark, sf, "documents")
    per_shard = (
        d.withColumn("shard", F.col("doc_id") % 4)
        .groupBy("source", "shard")
        .agg(F.hll_sketch_agg("text").alias("sk"))
    )
    merged = per_shard.groupBy("source").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    direct = d.groupBy("source").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("text")).alias("direct_est"),
        F.countDistinct("text").alias("exact_distinct"),
    )
    return (
        merged.join(direct, "source")
        .select(
            "source",
            (
                F.abs(F.col("merged_est") - F.col("direct_est"))
                <= F.lit(0.001) * F.col("direct_est")
            ).alias("merge_equals_direct"),
            "exact_distinct",
            (
                F.abs(F.col("direct_est") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                <= F.lit(0.05)
            ).alias("within_5pct"),
        )
        .orderBy("source")
    )


Q129_SQL = """
SELECT source,
       TRUE AS merge_equals_direct,
       count(DISTINCT text) AS exact_distinct,
       TRUE AS within_5pct
FROM documents
GROUP BY source
ORDER BY source
"""


#: Per-sf work dir of the most recent q130 run — see the cleanup
#: comment inside q130_stream_demux_dynamic.
_Q130_WORK: dict[str, str] = {}


def q130_stream_demux_dynamic(spark: SparkSession, sf: str) -> DataFrame:
    """JsonStreamDemux end-to-end under the driver oracle (r8): the
    q125 dynamic corpus — key ``v`` int / list / object per row
    (reference relationalize/relationalize.py:48-119) — lands as JSONL
    files and streams through the demux in 4 REAL micro-batches
    (maxFilesPerTrigger=1, AvailableNow), each batch holding a mix of
    all three variants so the per-batch untyped append + cross-batch
    ``Schema.merge`` (reference schema.py:259-302) is what produces
    the choice columns, not any single batch. A fresh instance then
    REPLAYS batch 0 (worst-case at-least-once: retry after a crash
    that lost driver state) and ``finalize(dedup_replays=True)``
    restores exactly-once before the typed view is built. The oracle
    replays everything value-level, rid strings included (hash rids
    are ``R_ + md5(table \\x1f path \\x1f row-key)``, computed
    identically in DuckDB), with child-table linkage re-aggregated
    onto the parent — byte-for-byte the q125 projection, proving the
    streamed lane reproduces the batch lane exactly."""
    import glob
    import os
    import shutil
    import tempfile

    from .streaming.relationalize_stream import JsonStreamDemux

    o = load_table(spark, sf, "orders")
    line = F.concat(
        F.lit('{"k": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "v": '),
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_custkey").cast("string"))
        .when(
            F.col("o_orderkey") % 3 == 1,
            F.concat(
                F.lit("["),
                (F.col("o_custkey") % 100).cast("string"),
                F.lit(", "),
                (F.col("o_orderkey") % 7).cast("string"),
                F.lit("]"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"a": '),
                (F.col("o_custkey") % 1000).cast("string"),
                F.lit(', "b": "'),
                F.col("o_orderpriority"),
                F.lit('"}'),
            )
        ),
        F.lit("}"),
    )
    # the returned DataFrame READS from this directory (lazy), so the
    # dir must outlive the caller's execution. One dir per sf is kept
    # alive (backing the MOST RECENT returned frame); invoking again
    # at the same sf reclaims the previous run's corpus + checkpoint
    # copy first, so long-lived gate/bench sessions hold at most one
    # copy per sf instead of one per call (ADVICE r8). CONTRACT:
    # re-invoking at the same sf invalidates earlier returned frames
    # (their backing files are deleted) — consume each result before
    # requesting the next, which is how the gate, the oracle tests,
    # and bench loops all behave. Process exit sweeps the rest.
    import atexit

    prev = _Q130_WORK.pop(sf, None)
    if prev:
        shutil.rmtree(prev, ignore_errors=True)
    work = tempfile.mkdtemp(prefix="q130_")
    _Q130_WORK[sf] = work
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src, base, ckpt = (os.path.join(work, d) for d in ("in", "out", "ckpt"))
    os.makedirs(src)
    ldf = o.select((F.col("o_orderkey") % 4).alias("b"), line.alias("value"))
    # batch split (mod 4) is independent of the branch split (mod 3),
    # so every micro-batch carries all three shapes of ``v``. ONE
    # partitioned write lands all four batch files (r12, guide §2.4:
    # this used to be four scan+render+coalesce(1) jobs, one per
    # file); repartition by the batch key keeps exactly one part file
    # per b= directory, and within-file line order is free to vary —
    # every consumer (parse + keyed join, replay dedup on
    # byte-identical lines) is order-insensitive.
    part = os.path.join(work, "w")
    ldf.repartition(4, "b").write.mode("overwrite").partitionBy("b").text(part)
    for i in range(4):
        shutil.move(
            glob.glob(os.path.join(part, f"b={i}", "part-*"))[0],
            os.path.join(src, f"b{i}.txt"),
        )

    # flat at-least-once layout on purpose: q130 attests the replay
    # + finalize(dedup_replays) recovery lane; the exactly_once
    # batch-dir layout needs no dedup and is covered by unit tests +
    # the BASELINE.md r8 A/B
    demux = JsonStreamDemux(
        base, "dynstream", key_cols=["k"], exactly_once=False
    )
    # foreachBatch demux: stateless (no watermark -> no no-data batch
    # to skip); the backlog sizing still right-sizes each micro-batch's
    # relationalize/write jobs
    with _stream_state_parallelism(
        spark, source_bytes=_source_backlog_bytes(src)
    ):
        q = (
            demux.attach(
                spark.readStream.option("maxFilesPerTrigger", 1).text(src)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    replay = JsonStreamDemux(
        base, "dynstream", key_cols=["k"], exactly_once=False
    )  # restart
    replay.process_batch(spark.read.text(os.path.join(src, "b0.txt")), 0)
    tables = replay.finalize(spark, dedup_replays=True)
    root, child = tables["dynstream"], tables["dynstream_v"]
    stats = child.groupBy(F.col("v__rid_").alias("rid")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("v__val_").alias("sum_items"),
    )
    return root.join(stats, root["v_str"] == stats["rid"], "left").select(
        F.col("k").cast("long").alias("k"),
        F.col("v_int").cast("long").alias("v_int"),
        "v_str",
        F.col("v_a").cast("long").alias("v_a"),
        "v_b",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("sum_items").cast("long").alias("sum_items"),
    )


Q130_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_custkey, o_orderpriority,
         o_orderkey % 3 AS m
  FROM orders
)
SELECT CAST(k AS BIGINT) AS k,
  CAST(CASE WHEN m = 0 THEN o_custkey END AS BIGINT) AS v_int,
  CASE WHEN m = 1
       THEN 'R_' || md5('dynstream' || chr(31) || 'v' || chr(31) || '{"k":' || k || '}')
  END AS v_str,
  CAST(CASE WHEN m = 2 THEN o_custkey % 1000 END AS BIGINT) AS v_a,
  CASE WHEN m = 2 THEN o_orderpriority END AS v_b,
  CAST(CASE WHEN m = 1 THEN 2 END AS BIGINT) AS n_items,
  CAST(CASE WHEN m = 1 THEN (o_custkey % 100) + (k % 7) END AS BIGINT) AS sum_items
FROM base
"""


def q136_streaming_distinct_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming x sketches (the one previously unattested
    intersection): per-hour distinct users over the watermarked
    events stream via ``hll_sketch_agg`` — exact distinct aggregation
    is UNSUPPORTED in streaming (unbounded per-window state), so the
    sketch IS the streaming answer, with O(windows x 4 KiB) state
    regardless of user cardinality. Driven to completion
    (AvailableNow, complete-mode memory sink, the q54 pattern), then
    joined to the batch exact counts so the output carries only
    engine-replayable values: the exact count and the estimate's 2%
    bound as a boolean (lgConfigK=12 RSE ~0.8%, and the hourly
    cardinalities here sit in HLL's sparse/exact regime, so the bound
    is deterministic for a fixed corpus — the q129 discipline)."""
    stream = _events_stream(spark, sf)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "est",
        )
    )
    # complete-mode sink -> the no-data batch is a pure re-emit; skip
    with _stream_state_parallelism(
        spark,
        source_bytes=_source_backlog_bytes(f"{sf}/events.parquet"),
        skip_nodata_batch=True,
        output_mode="complete",
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("q136_sketch")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    streamed = spark.table("q136_sketch")
    # batch side normalized to the SAME instant encoding as the
    # stream (_events_stream): NTZ wall clock taken as UTC, so the
    # window_start join keys agree under every testdata ts encoding.
    from .functions.timeutil import as_instant

    ev = load_table(spark, sf, "events")
    ev = ev.withColumn("ts", as_instant(F.col("ts"), ev.schema["ts"].dataType))
    exact = ev.groupBy(F.date_trunc("hour", "ts").alias("window_start")).agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        streamed.join(exact, "window_start")
        .select(
            "window_start",
            "window_end",
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact")
                <= F.lit(0.02)
            ).alias("within_2pct"),
        )
        .orderBy("window_start")
    )


Q136_SQL = """
SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
  CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS window_end,
  count(DISTINCT user_id) AS n_exact,
  TRUE AS within_2pct
FROM events
GROUP BY 1, 2
ORDER BY 1
"""


def q137_pq_ann(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance search
    (operators/similarity.py: pq_train/pq_encode/pq_topk — Jegou et
    al. 2011), end to end: 4 subspace codebooks trained by REPLAYABLE
    k-means (16 centroids, 3 Lloyd's iterations each, the q67
    machinery on sliced vectors), every corpus vector encoded to 4
    small codes, and the vec_id<10 query panel searched by exact
    integer sums of floored per-subspace distance-table entries.
    Because training, encoding, and the ADC lattice are all
    engine-replayable, the oracle replays the ENTIRE quantized-ANN
    pipeline — 4 independent Lloyd's trajectories, the code
    assignment, the distance tables, and the top-5 — value-for-value:
    a full value oracle for the production billion-vector search
    path, where brute force (q31) is only the eval baseline."""
    from .operators.similarity import pq_encode, pq_topk, pq_train

    e = load_table(spark, sf, "embeddings")
    books = pq_train(e, m=4, k=16, iters=3)
    codes = pq_encode(e, books)
    q = e.filter(F.col("vec_id") < 10)
    return pq_topk(codes, q, books, k=5)


def _pq_replay_ctes(
    m: int,
    k: int,
    iters: int,
    subdim: int,
    src: str = "ve",
    emit_tq: bool = True,
) -> str:
    """Per-subspace chained-CTE replay for q137/q142:
    _kmeans_replay_ctes' quantization discipline (integer-lattice
    centroid sums, floored 1e-9 assignment scores, lowest-id init,
    empty clusters keep their centroid) applied to each of the ``m``
    vector slices, ending in ``asg{j}(vec_id, cluster)`` (the codes)
    and — when ``emit_tq`` — ``tq{j}(query_id, cluster, t)`` (the
    floored ADC distance tables for the vec_id<10 panel). ``src``
    names the CTE holding ``(vec_id, e)``; the default emits the raw
    embeddings as ``ve`` (q137), while q142 points it at its residual
    CTE and builds probe-aware tables itself."""
    parts = []
    if src == "ve":
        parts.append(
            """ve AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
)"""
        )
    for j in range(m):
        lo, hi = j * subdim + 1, (j + 1) * subdim

        def score(ci: str) -> str:
            return (
                f"CAST(floor((0.5 * list_inner_product({ci}.c, {ci}.c)"
                f" - list_inner_product(v.s, {ci}.c)) * 1000000000.0) AS BIGINT)"
            )

        parts.append(
            f"""v{j} AS MATERIALIZED (
  SELECT vec_id, e[{lo}:{hi}] AS s,
         list_transform(e[{lo}:{hi}],
                        x -> CAST(floor(x * 1000000.0) AS BIGINT)) AS f
  FROM {src}
),
c{j}x0 AS MATERIALIZED (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster, s AS c
  FROM (SELECT vec_id, s FROM v{j} ORDER BY vec_id LIMIT {k})
)"""
        )
        for i in range(iters):
            parts.append(
                f"""a{j}x{i} AS MATERIALIZED (
  SELECT vec_id, f, cluster FROM (
    SELECT v.vec_id, v.f, c{j}x{i}.cluster,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {score(f'c{j}x{i}')}, c{j}x{i}.cluster) AS rk
    FROM v{j} v CROSS JOIN c{j}x{i}
  ) WHERE rk = 1
),
s{j}x{i} AS MATERIALIZED (
  SELECT cluster, di AS dim, sum(f[di + 1]) AS su, count(*) AS n
  FROM a{j}x{i} CROSS JOIN range({subdim}) t(di)
  GROUP BY cluster, di
),
c{j}x{i + 1} AS MATERIALIZED (
  SELECT c{j}x{i}.cluster, coalesce(u.c, c{j}x{i}.c) AS c
  FROM c{j}x{i} LEFT JOIN (
    SELECT cluster, list(su / (n * 1000000.0) ORDER BY dim) AS c
    FROM s{j}x{i} GROUP BY cluster
  ) u ON c{j}x{i}.cluster = u.cluster
)"""
            )
        parts.append(
            f"""asg{j} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT v.vec_id, c{j}x{iters}.cluster,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {score(f'c{j}x{iters}')}, c{j}x{iters}.cluster) AS rk
    FROM v{j} v CROSS JOIN c{j}x{iters}
  ) WHERE rk = 1
)"""
        )
        if emit_tq:
            parts.append(
                f"""tq{j} AS MATERIALIZED (
  SELECT q.vec_id AS query_id, cc.cluster,
    CAST(floor((0.5 * list_inner_product(cc.c, cc.c)
     - list_inner_product(q.s, cc.c)) * 1000000000.0) AS BIGINT) AS t
  FROM (SELECT vec_id, s FROM v{j} WHERE vec_id < 10) q
  CROSS JOIN c{j}x{iters} cc
)"""
            )
    return ",\n".join(parts)


def _q137_sql(m: int = 4, k: int = 16, iters: int = 3, subdim: int = 16) -> str:
    joins = "\n  ".join(
        f"JOIN asg{j} a{j} USING (vec_id)" for j in range(1, m)
    )
    tjoins = "\n  ".join(
        f"JOIN tq{j} t{j} ON t{j}.query_id = t0.query_id"
        f" AND t{j}.cluster = a{j}.cluster"
        for j in range(1, m)
    )
    dsum = " + ".join(f"t{j}.t" for j in range(m))
    return (
        "WITH "
        + _pq_replay_ctes(m, k, iters, subdim)
        + f""",
dist AS (
  SELECT t0.query_id, a0.vec_id, ({dsum}) AS d
  FROM asg0 a0
  {joins}
  JOIN tq0 t0 ON t0.cluster = a0.cluster
  {tjoins}
  WHERE a0.vec_id != t0.query_id
)
SELECT query_id, vec_id AS neighbor_id, d AS pq_dist FROM (
  SELECT query_id, vec_id, d,
    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rn
  FROM dist
) WHERE rn <= 5
ORDER BY query_id, pq_dist, neighbor_id"""
    )


def q131_hashed_logreg(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed hashed-feature logistic regression
    (operators/classify.py) — the fastText-style quality-classifier
    step of training-data curation, trained by 3 full-batch GD
    iterations over the documents corpus (label: document mentions
    'spark'). Every cross-row sum rides a fixed-point BIGINT lattice
    and weights are floor-quantized each step, so the oracle replays
    the ENTIRE training trajectory as chained CTEs and the final
    weight vector hash-matches — an iterative ML fit with a TRUE
    value oracle (the q121 PageRank / q67 k-means discipline applied
    to gradient descent)."""
    from .operators.classify import hashed_logreg

    d = load_table(spark, sf, "documents")
    label = F.array_contains(
        F.split(F.col("text"), _TXT.WS), "spark"
    )
    return hashed_logreg(d, label, dim=32, lr=2.0, iters=3).orderBy("feature")


def _logreg_ctes(iters: int = 3) -> str:
    """Shared oracle prelude for q131/q135: features + one CTE block
    per GD iteration, built from the same constants the Spark side
    uses (dim=32, lr=2.0, REPLAY_DOT/GRAD/W scales), so the two can
    never drift apart."""
    from .operators.classify import REPLAY_DOT, REPLAY_GRAD, REPLAY_W

    dot = f"{10 ** REPLAY_DOT}.0"
    grad = f"{10 ** REPLAY_GRAD}.0"
    wq = f"{10 ** REPLAY_W}.0"
    head = r"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         list_contains(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), 'spark') AS has,
         list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS ws
  FROM documents
),
docs AS MATERIALIZED (
  SELECT doc_id, CAST(has AS DOUBLE) AS y, CAST(len(ws) AS DOUBLE) AS nt, ws
  FROM toks WHERE len(ws) > 0
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM docs),
tf AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 32 AS INT) AS j,
         CAST(count(*) AS DOUBLE) / any_value(nt) AS x
  FROM (SELECT doc_id, nt, unnest(ws) AS tok FROM docs)
  GROUP BY doc_id, j
),
feats AS MATERIALIZED (
  SELECT doc_id, j, x FROM tf
  UNION ALL SELECT doc_id, CAST(-1 AS INT), 1.0 FROM docs
),
w0 AS (SELECT CAST(t.j AS INT) AS j, 0.0 AS w FROM range(-1, 32) t(j))"""
    step = """,
z{i} AS (
  SELECT f.doc_id,
         sum(CAST(floor(w.w * f.x * {dot}) AS BIGINT)) AS zq
  FROM feats f JOIN w{p} w USING (j) GROUP BY f.doc_id
),
e{i} AS (
  SELECT d.doc_id,
    (floor((1.0 / (1.0 + exp(-(z{i}.zq / {dot})))) * {grad})
     - d.y * {grad}) / {grad} AS e
  FROM docs d JOIN z{i} USING (doc_id)
),
g{i} AS (
  SELECT f.j, sum(CAST(floor(e{i}.e * f.x * {grad}) AS BIGINT)) AS sq
  FROM feats f JOIN e{i} USING (doc_id) GROUP BY f.j
),
w{i} AS MATERIALIZED (
  SELECT w{p}.j,
    floor((w{p}.w - 2.0 * ((coalesce(g{i}.sq, 0) / {grad})
           / (SELECT n_docs FROM nn))) * {wq}) / {wq} AS w
  FROM w{p} LEFT JOIN g{i} USING (j)
)"""
    body = "".join(
        step.format(i=i, p=i - 1, dot=dot, grad=grad, wq=wq)
        for i in range(1, iters + 1)
    )
    return head + body


def _q131_sql(iters: int = 3) -> str:
    return (
        _logreg_ctes(iters)
        + f"\nSELECT j AS feature, w AS weight FROM w{iters} ORDER BY feature"
    )


def q135_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-classifier scoring (operators/classify.py:
    score_documents): train the q131 model, then score every
    non-empty document — the apply half of the quality-filter loop,
    a pure fused projection over the feature build (the weight
    vector is a folded map literal; no join, no broadcast).
    ``quantize=True`` floors each sigmoid onto the training lattice,
    so the oracle recomputes the weights (the q131 CTEs) AND replays
    every document's score value-for-value."""
    from .operators.classify import hashed_logreg, score_documents

    d = load_table(spark, sf, "documents")
    label = F.array_contains(
        F.split(F.col("text"), _TXT.WS), "spark"
    )
    w = {
        r.feature: r.weight
        for r in hashed_logreg(d, label, dim=32, lr=2.0, iters=3).collect()
    }
    return score_documents(d, w, dim=32, quantize=True).orderBy("doc_id")


def _q135_sql(iters: int = 3) -> str:
    from .operators.classify import REPLAY_DOT, REPLAY_GRAD

    dot = f"{10 ** REPLAY_DOT}.0"
    grad = f"{10 ** REPLAY_GRAD}.0"
    return (
        _logreg_ctes(iters)
        + f""",
zf AS (
  SELECT f.doc_id,
         sum(CAST(floor(w.w * f.x * {dot}) AS BIGINT)) AS zq
  FROM feats f JOIN w{iters} w USING (j) GROUP BY f.doc_id
)
SELECT d.doc_id,
  floor((1.0 / (1.0 + exp(-(zf.zq / {dot})))) * {grad}) / {grad} AS score
FROM docs d JOIN zf USING (doc_id)
ORDER BY d.doc_id"""
    )


def q132_span_removal(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-span EXCISION (operators/spans.py:
    remove_duplicate_spans) — Lee et al. 2021's actual dedup step at
    word resolution, complementing q105's exposure stats: maximal
    cross-document-duplicated 3-gram runs covering >= 6 words are cut
    from every document, survivors re-joined in order. The oracle
    replays coverage, islands, interval expansion, and the ordered
    re-join on the raw gram text (the semantic contract the xxhash64
    digest keys approximate)."""
    from .operators.spans import remove_duplicate_spans

    d = load_table(spark, sf, "documents")
    return remove_duplicate_spans(d, n=3, min_span=6)


Q132_SQL = r"""
WITH w AS MATERIALIZED (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS ws
  FROM documents
),
pos AS MATERIALIZED (
  SELECT doc_id, i::BIGINT - 1 AS idx, array_to_string(ws[i:(i+2)], ' ') AS g
  FROM w, LATERAL unnest(range(1, len(ws) - 1)) AS t(i)
),
dpg AS (SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
dup AS (SELECT doc_id, idx FROM pos JOIN dpg USING (g)),
runs AS (
  SELECT doc_id, min(idx) AS a, max(idx) AS b FROM (
    SELECT doc_id, idx,
           idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx) AS grp
    FROM dup) GROUP BY doc_id, grp
  HAVING max(idx) - min(idx) + 3 >= 6
),
cov AS (SELECT DISTINCT doc_id, widx FROM runs, LATERAL unnest(range(a, b + 3)) t(widx)),
words AS (
  SELECT doc_id, i::BIGINT - 1 AS widx, ws[i] AS wrd
  FROM w, LATERAL unnest(range(1, len(ws) + 1)) AS t(i)
),
kept AS (
  SELECT wo.doc_id, wo.widx, wo.wrd, cov.widx IS NOT NULL AS rm
  FROM words wo LEFT JOIN cov ON wo.doc_id = cov.doc_id AND wo.widx = cov.widx
),
agg AS (
  SELECT doc_id, count(*) AS nw, CAST(sum(CAST(rm AS INT)) AS BIGINT) AS nr,
         string_agg(CASE WHEN NOT rm THEN wrd END, ' ' ORDER BY widx) AS ct
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(a.nw, 0) AS BIGINT) AS n_words,
       coalesce(a.nr, 0) AS n_removed, coalesce(a.ct, '') AS cleaned_text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q133_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): the
    first 5 merges learned over the documents corpus via the standard
    word-frequency-vocabulary trainer (one corpus shuffle, then
    vocab-sized iterations). Pure integer/string computation —
    greedy-leftmost rewrites via per-symbol bracket framing behave
    identically in Spark and DuckDB — so the oracle replays the whole
    merge trajectory (pair counts, deterministic argmax, vocabulary
    rewrite) as chained CTEs and all 5 learned merges hash-match."""
    from .operators.bpe import bpe_train_df

    d = load_table(spark, sf, "documents")
    return bpe_train_df(d, "text", merges=5)


def _bpe_merge_ctes(merges: int = 5) -> str:
    """Shared oracle prelude for q133/q134: the word-frequency vocab,
    its framed symbolization, and one (pair-count, argmax, rewrite)
    CTE block per merge — built from the same framing constants the
    Spark side uses. ``chr(30)/chr(31)`` are the SYM_L/SYM_R frames;
    ``chr(31)||chr(30)`` is the pair-key separator, chosen so the
    framed merge pattern is literally ``chr(30) || pair || chr(31)``."""
    head = r"""
WITH vocab AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT translate(unnest(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')),
                     chr(30) || chr(31), '') AS w
    FROM documents) WHERE w <> '' GROUP BY w
),
v0 AS MATERIALIZED (
  SELECT word, freq,
         string_agg(chr(30) || substr(word, CAST(i AS INT), 1) || chr(31),
                    '' ORDER BY i) AS sym
  FROM vocab, LATERAL unnest(range(1, len(word) + 1)) t(i)
  GROUP BY word, freq
)"""
    step = """,
p{i} AS (
  SELECT s[k] || chr(31) || chr(30) || s[k+1] AS p, sum(freq) AS f
  FROM (SELECT freq, string_split(substr(sym, 2, len(sym) - 2),
                                  chr(31) || chr(30)) AS s FROM v{prev}),
       LATERAL unnest(range(1, len(s))) t(k)
  GROUP BY p
),
b{i} AS (SELECT p, f FROM p{i} ORDER BY f DESC, p ASC LIMIT 1),
v{i} AS MATERIALIZED (
  SELECT word, freq,
    replace(sym, chr(30) || b.p || chr(31),
            chr(30) || replace(b.p, chr(31) || chr(30), '') || chr(31)) AS sym
  FROM v{prev}, b{i} b
)"""
    return head + "".join(
        step.format(i=i, prev=i - 1) for i in range(1, merges + 1)
    )


def _q133_sql(merges: int = 5) -> str:
    union = "\nUNION ALL ".join(
        f"SELECT {i} AS step, p, f FROM b{i}" for i in range(1, merges + 1)
    )
    return (
        _bpe_merge_ctes(merges)
        + f"""
SELECT step,
  string_split(p, chr(31) || chr(30))[1] AS merge_left,
  string_split(p, chr(31) || chr(30))[2] AS merge_right,
  replace(p, chr(31) || chr(30), '') AS merged,
  CAST(f AS BIGINT) AS pair_freq
FROM ({union})
ORDER BY step"""
    )


def q134_tokenizer_eval(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-coverage evaluation (operators/bpe.py): learn the
    q133 merges, apply them to the corpus vocabulary, and report
    per-source fertility — word count, subword-token count, and
    tokens-per-word. Closes the train -> apply -> eval loop with one
    extra corpus shuffle (the per-(source, word) count); token counts
    come from the learned vocabulary, never by re-tokenizing the
    corpus. Integer-only sums + one exact final division, so the
    oracle replays training AND evaluation value-for-value."""
    from .operators.bpe import bpe_eval, bpe_train

    d = load_table(spark, sf, "documents")
    rules = [(l, r) for _, l, r, _, _ in bpe_train(d, "text", merges=5)]
    if len(rules) != 5:
        # the generated oracle's v5 CTE is empty when fewer than 5
        # merges are learnable (its per-step rewrite cross-joins the
        # 1-row argmax), so a degenerate corpus must fail LOUDLY here
        # rather than hand the driver a silent Spark-vs-oracle
        # divergence. Never fires on the gate corpora (each learns
        # >= 5 merges); a corpus that can't should use q133's shape.
        raise ValueError(
            f"q134 needs a corpus with >= 5 learnable BPE merges, got {len(rules)}"
        )
    return bpe_eval(d, rules, text_col="text", group_col="source").orderBy("source")


def _q134_sql(merges: int = 5) -> str:
    """q133's merge CTEs + the evaluation block: per-word token counts
    off the final rewritten vocab, joined to per-(source, word)
    corpus counts."""
    return (
        _bpe_merge_ctes(merges)
        + f""",
vtok AS (
  SELECT word,
    CAST(len(string_split(substr(sym, 2, len(sym) - 2),
                          chr(31) || chr(30))) AS BIGINT) AS n_tok
  FROM v{merges}
),
src_words AS (
  SELECT source, w AS word, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT source,
           translate(unnest(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+')),
                     chr(30) || chr(31), '') AS w
    FROM documents) WHERE w <> '' GROUP BY source, w
),
per AS (
  SELECT source, sum(c) AS n_words, sum(c * n_tok) AS n_tokens
  FROM src_words JOIN vtok USING (word) GROUP BY source
)
SELECT source, CAST(n_words AS BIGINT) AS n_words,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS tokens_per_word
FROM per
ORDER BY source"""
    )


def q138_dsir_selection(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance resampling (operators/dsir.py) — Xie et al.
    2023's data-selection step, the third leg of the curation stack
    beside the heuristic filters and the q131/q135 quality
    classifier. Target distribution = the src0/src1 documents; every
    other document is weighted by its hashed-unigram importance
    log-ratio (one dim-key shuffle fits BOTH LMs; scoring is a
    zero-shuffle scan fold over a constant-folded map literal) and
    the top 25 Gumbel-perturbed keys are selected (TakeOrdered — no
    global sort). Every transcendental is floored onto the 1e-9
    lattice immediately and every cross-row sum is a BIGINT, so the
    oracle replays LM counts, smoothing, log-ratios, per-doc weights,
    Gumbel keys, and the final top-k value-for-value."""
    from .operators.dsir import dsir_select

    d = load_table(spark, sf, "documents")
    target = F.col("source").isin("src0", "src1")
    return dsir_select(d, target, dim=64, k=25)


def _q138_sql(dim: int = 64, k: int = 25) -> str:
    """Chained-CTE replay of the full DSIR pipeline. Exact-int token
    counts convert to DOUBLE exactly (gate corpora are far below
    2^53 tokens), so each smoothing ratio is the identical IEEE
    division Python's int true-division performs; ln / Gumbel values
    floor onto the shared lattice (operators/dsir.py REPLAY_LNR)."""
    from .operators.dsir import REPLAY_LNR

    fp = f"{10 ** REPLAY_LNR}.0"
    # 2^60 + 256, NOT + 1: the ulp at 2^60 is 128, so "+ 1" rounds to
    # exactly 2^60 = the max rounded numerator, letting u hit 1.0 and
    # DuckDB abort on ln(0) (see operators/dsir.py:_U_DEN)
    u_den = f"CAST({2 ** 60 + 256} AS DOUBLE)"
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, (source IN ('src0', 'src1')) AS tgt,
         list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '') AS ws
  FROM documents
),
ne AS MATERIALIZED (SELECT * FROM d WHERE len(ws) > 0),
tok AS MATERIALIZED (
  SELECT doc_id, tgt,
         CAST(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {dim} AS INT) AS j
  FROM (SELECT doc_id, tgt, unnest(ws) AS tok FROM ne)
),
cnt AS (
  SELECT j, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
         sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
  FROM tok GROUP BY j
),
tot AS (SELECT sum(ct) AS tt, sum(cr) AS rt FROM cnt),
lr AS MATERIALIZED (
  SELECT CAST(r.j AS INT) AS j,
    CAST(floor((ln(CAST(coalesce(c.ct, 0) + 1 AS DOUBLE)
                   / CAST((SELECT tt FROM tot) + {dim} AS DOUBLE))
              - ln(CAST(coalesce(c.cr, 0) + 1 AS DOUBLE)
                   / CAST((SELECT rt FROM tot) + {dim} AS DOUBLE)))
             * {fp}) AS BIGINT) AS lrq
  FROM range(0, {dim}) r(j) LEFT JOIN cnt c ON c.j = r.j
),
wq AS (
  SELECT t.doc_id, CAST(sum(lr.lrq) AS BIGINT) AS weight_q
  FROM tok t JOIN lr USING (j)
  WHERE NOT t.tgt
  GROUP BY t.doc_id
),
keyed AS (
  SELECT doc_id, weight_q,
    weight_q + CAST(floor(-ln(-ln(
        (CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS DOUBLE) + 1.0) / {u_den}))
      * {fp}) AS BIGINT) AS key_q
  FROM wq
)
SELECT doc_id, weight_q, key_q FROM keyed
ORDER BY key_q DESC, doc_id
LIMIT {k}"""


def q139_zorder_key(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order layout key (plans/zorder.py:add_zorder_key) — the
    Delta/Iceberg OPTIMIZE ZORDER primitive as pure Catalyst
    shift/mask/or expressions: min/max-normalize (user_id, value) to
    10-bit ranks (one tiny broadcastable agg, literals folded into
    the plan) and bit-interleave them into the Morton key every file
    range would be laid out along. First driver row for the plans/
    100 TB layout toolkit (previously plan-asserted only): the oracle
    replays the min/max stats, the rank arithmetic (same IEEE op
    order), and all 20 interleaved bits value-for-value."""
    from .plans.zorder import add_zorder_key

    e = load_table(spark, sf, "events")
    keyed = add_zorder_key(e, ["user_id", "value"], bits=10)
    return keyed.select("event_id", "zkey").orderBy("event_id")


def _q139_sql(bits: int = 10) -> str:
    """Mirror of plans/zorder.py: rank = least(top, floor(((c - mn) /
    span) * top)) with span = (mx - mn) or 1.0, then bit b of column
    i lands at position b*n + i."""
    top = (1 << bits) - 1
    n = 2
    parts = []
    for i in range(n):
        for b in range(bits):
            parts.append(f"(((r{i} >> {b}) & 1) << {b * n + i})")
    inter = " | ".join(parts)
    return f"""
WITH st AS (
  SELECT CAST(min(user_id) AS DOUBLE) AS mn0, CAST(max(user_id) AS DOUBLE) AS mx0,
         CAST(min(value) AS DOUBLE) AS mn1, CAST(max(value) AS DOUBLE) AS mx1
  FROM events
),
rk AS (
  SELECT event_id,
    CAST(least({top}, CAST(floor((CAST(user_id AS DOUBLE) - mn0)
      / (CASE WHEN mx0 = mn0 THEN 1.0 ELSE mx0 - mn0 END) * {top}) AS BIGINT)) AS BIGINT) AS r0,
    CAST(least({top}, CAST(floor((value - mn1)
      / (CASE WHEN mx1 = mn1 THEN 1.0 ELSE mx1 - mn1 END) * {top}) AS BIGINT)) AS BIGINT) AS r1
  FROM events, st
)
SELECT event_id, CAST({inter} AS BIGINT) AS zkey FROM rk
ORDER BY event_id"""


def q140_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    """Replicated skew join (plans/scale.py:replicated_skew_join) —
    the salting transform for hot-key joins where the right side is
    above broadcast size: each left row routes to one of 8 replicas
    by a hash of its full content, the right side is replicated to
    all 8, and a hot key's rows land on 8 reducers instead of one.
    The attested contract is that the transform is CORRECTNESS-
    PRESERVING: the oracle is the PLAIN join (events x per-user
    profile), which the salted plan must reproduce row-for-row. The
    profile's float sum rides the 1e-6 BIGINT lattice so the joined
    values replay exactly."""
    from .plans.scale import replicated_skew_join

    e = load_table(spark, sf, "events")
    prof = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_n"),
        F.sum(F.floor(F.col("value") * F.lit(1000000.0)))
        .cast("long")
        .alias("user_value_q"),
    )
    j = replicated_skew_join(
        e.select("event_id", "user_id"), prof, on="user_id", replicas=8
    )
    return j.select("event_id", "user_id", "user_n", "user_value_q").orderBy(
        "event_id"
    )


Q140_SQL = """
WITH prof AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS user_n,
         CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS user_value_q
  FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id, p.user_n, p.user_value_q
FROM events e JOIN prof p USING (user_id)
ORDER BY e.event_id"""


def q141_streaming_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming x ML (the q136 pattern applied to the classifier):
    train the q131 hashed-feature logistic regression in batch, then
    score a STREAM of documents with the stateless per-token lattice
    fold (operators/classify.py:stateless_score_col — the feature
    build's chained aggregations are unsupported in streaming, so the
    scoring must be a pure projection, and here it provably is) and
    aggregate per-source document counts + BIGINT score sums in one
    streaming aggregation (complete mode, AvailableNow). Every term
    rides the replay lattices, so unlike q136's bound check the
    oracle replays the training trajectory AND every streamed
    document's score into exact per-source sums — a full value oracle
    for the streaming model-apply path."""
    from .operators.classify import hashed_logreg, stateless_score_col

    d = load_table(spark, sf, "documents")
    label = F.array_contains(
        F.split(F.col("text"), _TXT.WS), "spark"
    )
    w = {
        r.feature: r.weight
        for r in hashed_logreg(d, label, dim=32, lr=2.0, iters=3).collect()
    }
    stream = _stream_parquet(spark, sf, "documents")
    sq = stateless_score_col(w, "text", dim=32, as_quanta=True)
    scored = stream.select("source", sq.alias("sq")).where(
        F.col("sq").isNotNull()
    )
    agg = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("sq").alias("score_q_sum"),
    )
    # complete-mode sink -> the no-data batch is a pure re-emit; skip
    with _stream_state_parallelism(
        spark,
        source_bytes=_source_backlog_bytes(f"{sf}/documents.parquet"),
        skip_nodata_batch=True,
        output_mode="complete",
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("q141_scores")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table("q141_scores").orderBy("source")


def _q141_sql(iters: int = 3) -> str:
    """q131's training prelude + the stateless-score replay: per-token
    BIGINT quanta folded per document, one division by the token
    count OUTSIDE the fold, sigmoid floored onto the 1e-9 lattice,
    then per-source sums (the exact contract of
    operators/classify.py:stateless_score_col)."""
    from .operators.classify import REPLAY_DOT, REPLAY_GRAD

    dot = f"{10 ** REPLAY_DOT}.0"
    grad = f"{10 ** REPLAY_GRAD}.0"
    return (
        _logreg_ctes(iters)
        + f""",
tokr AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 32 AS INT) AS j
  FROM (SELECT doc_id, unnest(ws) AS tok FROM docs)
),
sq AS (
  SELECT t.doc_id, sum(CAST(floor(w.w * {dot}) AS BIGINT)) AS s
  FROM tokr t JOIN w{iters} w USING (j) GROUP BY t.doc_id
),
sc AS (
  SELECT d.doc_id,
    CAST(floor((1.0 / (1.0 + exp(-((
        CAST(floor((SELECT w FROM w{iters} WHERE j = -1) * {dot}) AS DOUBLE)
        + CAST(s AS DOUBLE) / d.nt) / {dot})))) * {grad}) AS BIGINT) AS score_q
  FROM docs d JOIN sq USING (doc_id)
)
SELECT doc.source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(sc.score_q) AS BIGINT) AS score_q_sum
FROM sc JOIN documents doc USING (doc_id)
GROUP BY doc.source
ORDER BY doc.source"""
    )


def q142_ivfpq_ann(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ ANN (operators/similarity.py: ivfpq_index/ivfpq_topk —
    Jegou et al. 2011 §V, the FAISS IVFADC shape and the production
    billion-vector index): a replayable coarse quantizer (8 cells, 2
    Lloyd's iterations) partitions the corpus into inverted lists,
    PQ codebooks train on the RESIDUALS against the cell centroids
    (4 subspaces x 16 codes, 2 iterations — residuals quantize far
    tighter than raw vectors), and the vec_id<10 panel searches only
    its nprobe=2 nearest cells with exact-BIGINT ADC sums. The
    oracle replays the COMPOSED pipeline end to end: the coarse
    trajectory, every residual, all 4 sub-trajectories on residuals,
    the codes, the probe choice, the per-(query, cell) tables, and
    the probe-bounded top-5 — value-for-value. q137 attests flat PQ;
    this attests the composition that actually ships at scale."""
    from .operators.similarity import ivfpq_index, ivfpq_topk

    e = load_table(spark, sf, "embeddings")
    coarse, books, codes = ivfpq_index(
        e, cells=8, coarse_iters=2, m=4, k=16, pq_iters=2
    )
    q = e.filter(F.col("vec_id") < 10)
    return ivfpq_topk(codes, q, coarse, books, nprobe=2, k=5).orderBy(
        "query_id", "adc_dist", "neighbor_id"
    )


def _q142_sql(
    cells: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 16,
    pq_iters: int = 2,
    nprobe: int = 2,
    topk: int = 5,
    dim: int = 64,
) -> str:
    """The composed replay: _kmeans_replay_ctes (coarse, over the
    embeddings' full width) -> residual CTE (elementwise IEEE double
    subtract of the assigned centroid) -> _pq_replay_ctes sourced
    from the residuals -> probe selection (floored coarse scores,
    nprobe lowest) -> per-(query, probed cell) residual tables ->
    probe-bounded ADC top-k."""
    subdim = dim // m
    score_v = (
        "CAST(floor((0.5 * list_inner_product(cc.c, cc.c)"
        " - list_inner_product(v.e, cc.c)) * 1000000000.0) AS BIGINT)"
    )
    # subspace 0 carries the per-(query, cell) constant
    # floor(0.5 * |qres|^2 * 1e9) exactly once, so distances compare
    # across probed cells (see similarity.ivfpq_topk's docstring)
    qc0 = (
        "\n     + CAST(floor(0.5 * list_inner_product(q.e, q.e)"
        " * 1000000000.0) AS BIGINT)"
    )
    pt = "\n".join(
        f""",
pt{j} AS MATERIALIZED (
  SELECT q.query_id, q.cluster AS pcell, cc.cluster AS code,
    CAST(floor((0.5 * list_inner_product(cc.c, cc.c)
     - list_inner_product(q.e[{j * subdim + 1}:{(j + 1) * subdim}], cc.c))
     * 1000000000.0) AS BIGINT){qc0 if j == 0 else ""} AS t
  FROM qres q CROSS JOIN c{j}x{pq_iters} cc
)"""
        for j in range(m)
    )
    cjoins = "\n  ".join(
        f"JOIN asg{j} a{j} ON a{j}.vec_id = ca.vec_id" for j in range(1, m)
    )
    tjoins = "\n  ".join(
        f"JOIN pt{j} t{j} ON t{j}.query_id = p.query_id"
        f" AND t{j}.pcell = ca.cluster AND t{j}.code = a{j}.cluster"
        for j in range(1, m)
    )
    dsum = " + ".join(f"t{j}.t" for j in range(m))
    return (
        "WITH "
        + _kmeans_replay_ctes(cells, coarse_iters)
        + f""",
rsd AS MATERIALIZED (
  SELECT v.vec_id,
         list_transform(range(1, {dim + 1}), i -> v.e[i] - cc.c[i]) AS e
  FROM v JOIN asg USING (vec_id) JOIN c{coarse_iters} cc USING (cluster)
),
"""
        + _pq_replay_ctes(m, k, pq_iters, subdim, src="rsd", emit_tq=False)
        + f""",
probe AS MATERIALIZED (
  SELECT query_id, cluster FROM (
    SELECT v.vec_id AS query_id, cc.cluster,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {score_v}, cc.cluster) AS rk
    FROM v CROSS JOIN c{coarse_iters} cc WHERE v.vec_id < 10
  ) WHERE rk <= {nprobe}
),
qres AS MATERIALIZED (
  SELECT p.query_id, p.cluster,
         list_transform(range(1, {dim + 1}), i -> v.e[i] - cc.c[i]) AS e
  FROM probe p
  JOIN v ON v.vec_id = p.query_id
  JOIN c{coarse_iters} cc ON cc.cluster = p.cluster
){pt},
dist AS (
  SELECT p.query_id, ca.vec_id, ({dsum}) AS d
  FROM asg ca
  JOIN probe p ON p.cluster = ca.cluster
  JOIN asg0 a0 ON a0.vec_id = ca.vec_id
  {cjoins}
  JOIN pt0 t0 ON t0.query_id = p.query_id
   AND t0.pcell = ca.cluster AND t0.code = a0.cluster
  {tjoins}
  WHERE ca.vec_id != p.query_id
)
SELECT query_id, vec_id AS neighbor_id, d AS adc_dist FROM (
  SELECT query_id, vec_id, d,
    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rn
  FROM dist
) WHERE rn <= {topk}
ORDER BY query_id, adc_dist, neighbor_id"""
    )


def q143_bigram_nll(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated-bigram fluency scoring (operators/text.py:
    bigram_nll_scores): average NLL per document under a
    Laplace-smoothed bigram LM interpolated (lam=0.75) with the
    Laplace unigram, fit on the corpus itself — unigram q101 one
    order up, the scalable core of a KenLM/CCNet-style perplexity
    filter. Per-bigram log-probs FLOOR onto a 1e-9 BIGINT lattice
    before the per-doc sum (the r10 fix for r9's one-row boundary
    flip: round-on-ln was unstable across Spark's own evaluation
    paths; floor is bit-stable), so the score is deterministic under
    any partitioning and the DuckDB oracle replays it bit-for-bit."""
    from .operators.text import bigram_nll_scores

    d = load_table(spark, sf, "documents")
    return bigram_nll_scores(d)


Q143_SQL = r"""
WITH toks AS (
  SELECT doc_id AS id,
         regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+') AS tk,
         len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS dl
  FROM documents),
bs0 AS (
  SELECT id, dl,
         unnest(list_transform(range(1, dl),
                i -> struct_pack(v := tk[i], w := tk[i + 1]))) AS bg
  FROM toks WHERE dl >= 2),
bs AS (
  SELECT id, bg.v AS v, bg.w AS w, dl, count(*) AS tf
  FROM bs0 GROUP BY id, bg.v, bg.w, dl),
uni AS (
  SELECT term, count(*) AS cu FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+')) AS term
    FROM documents)
  GROUP BY term),
tot AS (SELECT sum(cu) AS n_corpus, count(*) AS v_size FROM uni),
bgc AS (SELECT v, w, sum(tf) AS cb FROM bs GROUP BY v, w),
ctx AS (SELECT v, sum(cb) AS cv FROM bgc GROUP BY v),
lp AS (
  SELECT v, w,
    CAST(FLOOR(ln(0.75 * ((cb + 1) / (cv + v_size))
               + 0.25 * ((cu + 1) / (n_corpus + v_size))) * 1e9)
         AS BIGINT) AS logp_q
  FROM bgc JOIN ctx USING (v) JOIN uni ON w = term CROSS JOIN tot)
SELECT id AS doc_id, CAST(dl AS INT) AS n_tokens,
       CAST(-CAST(SUM(tf * logp_q) AS BIGINT) AS DOUBLE)
         / (CAST(dl - 1 AS DOUBLE) * 1e9) AS avg_nll
FROM bs JOIN lp USING (v, w)
GROUP BY id, dl
"""


def q144_tfidf_allpairs(spark: SparkSession, sf: str) -> DataFrame:
    """Sparse all-pairs similarity join (operators/dedup.py:
    tfidf_pairs): every document pair with TF-IDF cosine >= 0.8 over
    the df-filtered vocabulary — Bayardo et al.'s APSS, the lexical
    complement of the embedding dup lanes (q32/q108). Every cross-row
    sum rides an exact lattice (idf floored to 1e-6, norms as
    DECIMAL(38,0), normalized weights floored to 1e-6, dot products
    as BIGINT), so the DuckDB oracle replays pair-for-pair,
    value-for-value, and the threshold compares integers."""
    from .operators.dedup import tfidf_pairs

    d = load_table(spark, sf, "documents")
    return tfidf_pairs(d, threshold=0.8, max_df=1000)


Q144_SQL = r"""
WITH ts AS (
  SELECT id, term, count(*) AS tf FROM (
    SELECT doc_id AS id,
           unnest(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+')) AS term
    FROM documents)
  GROUP BY id, term),
dfreq AS (SELECT term, count(*) AS dft FROM ts GROUP BY term),
tot AS (SELECT count(*) AS n_docs FROM documents),
w AS (
  SELECT id, term, dft,
    tf * CAST(FLOOR((ln((1 + n_docs) / (1 + dft)) + 1) * 1e6) AS BIGINT) AS wq
  FROM ts JOIN dfreq USING (term) CROSS JOIN tot
  WHERE dft <= 1000),
norm2 AS (SELECT id, sum(CAST(wq AS HUGEINT) * wq) AS n2 FROM w GROUP BY id),
nw AS (
  SELECT id, term,
    CAST(FLOOR(CAST(wq AS DOUBLE) * 1e6 / sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)
      AS nwq
  FROM w JOIN norm2 USING (id)
  WHERE dft >= 2)
SELECT a.id AS i, b.id AS j,
  count(*) AS shared_terms,
  CAST(sum(a.nwq * b.nwq) AS DOUBLE) / 1e12 AS cos_sim
FROM nw a JOIN nw b ON a.term = b.term AND a.id < b.id
GROUP BY a.id, b.id
HAVING sum(a.nwq * b.nwq) >= CAST(FLOOR(0.8 * 1e12) AS BIGINT)
"""


def q145_relative_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language relative quality thresholding (operators/
    sampling.py:group_relative_filter): keep each language's own top
    40% by the q25 composite quality score — the curation step that
    drops every domain's tail WITHOUT biasing the language mixture
    the way an absolute cutoff does. percent_rank over (lang) ordered
    by (score desc, doc_id); one shuffle, no joins; ties and
    singletons engine-replayable by construction."""
    from .operators import text as TX
    from .operators.sampling import group_relative_filter

    d = load_table(spark, sf, "documents").select("doc_id", "lang", "text")
    out = group_relative_filter(
        d, TX.quality_score("text"), ["lang"], keep_frac=0.4
    )
    return out.select("doc_id", "lang", "pct_rank")


def _q145_sql() -> str:
    from .operators.text import LANG_PROFILES

    words = ", ".join(f"'{w}'" for w in LANG_PROFILES[0][1])
    return rf"""
WITH scored AS (
  SELECT doc_id, lang,
    0.4 * swr + 0.3 * (1.0 - dr) + 0.3 * len_sig AS s
  FROM (SELECT doc_id, lang,
    CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
          t -> list_contains([{words}], t))) AS DOUBLE)
      / len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS swr,
    CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
      / LENGTH(text) AS dr,
    LEAST(1.0, CAST(len(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')) AS DOUBLE)
      / 100.0) AS len_sig
  FROM documents))
SELECT doc_id, lang, pct_rank FROM (
  SELECT doc_id, lang,
    percent_rank() OVER (PARTITION BY lang ORDER BY s DESC, doc_id)
      AS pct_rank
  FROM scored)
WHERE pct_rank <= 0.4
"""


def q146_canonical_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Normalization-robust exact dedup (operators/text.py:
    canonicalize_text + canonical_dedup): the corpus is unioned with
    case-flipped, punctuation-jittered copies of every third document
    (the q130 corpus-construction pattern — raw exact dedup q26 sees
    them as distinct), then grouped by the canonical form's md5.
    Every mutated copy collapses onto its original's group with the
    original as survivor; the shuffle carries (fingerprint, id)
    pairs, never text. The oracle replays the canonicalization
    byte-for-byte (the regex class and \\s are ASCII-identical under
    Java regex and RE2) including the md5 group keys."""
    from .operators.text import canonical_dedup

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    # offset 10^15: disjoint from any real doc_id until a 10^15-row
    # documents table (r9 review: 10^6 collides at large SF, silently
    # — both engines would construct the same corrupted corpus)
    noisy = d.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + F.lit(10**15)).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit(" !!  ")).alias("text"),
    )
    return canonical_dedup(d.unionByName(noisy))


Q146_SQL = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000000000, upper(text) || ' !!  ' FROM documents
  WHERE doc_id % 3 = 0),
canon AS (
  SELECT doc_id,
    md5(trim(regexp_replace(
      regexp_replace(lower(text), '[^a-z0-9 \t\n\x0B\f\r]', '', 'g'),
      '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS canon_fp
  FROM corpus)
SELECT canon_fp, min(doc_id) AS survivor_id, count(*) AS n_variants
FROM canon GROUP BY canon_fp
"""


def q147_jl_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Johnson-Lindenstrauss projection quality (operators/
    similarity.py:jl_project / jl_recall_eval): recall@10 of
    brute-force kNN in the 16-dim Rademacher-projected space against
    exact kNN in the full 64-dim space, both on the 1e-6 fixed-point
    lattice so every distance is an exact BIGINT and the oracle
    replays the ENTIRE eval — projection matrix (shipped as literals
    to both engines), projections, both rankings, the overlap counts
    — value-for-value. The measurement that justifies shipping 4x
    narrower vectors into a 100 TB distance scan."""
    from .operators.similarity import jl_recall_eval

    e = load_table(spark, sf, "embeddings")
    return jl_recall_eval(e, n_queries=10, k=10, out_dim=16, seed=0)


def _q147_sql(
    in_dim: int = 64, out_dim: int = 16, seed: int = 0,
    n_queries: int = 10, k: int = 10,
) -> str:
    """Generated oracle for q147. ``in_dim`` must match the actual
    embedding width of the testdata (64 today): the SQL is generated
    at import time so it cannot read the parquet — but the Spark side
    derives the width from the data (``jl_project``/``vector_dim``),
    so a testdata width change surfaces as a loud oracle mismatch,
    never a silent wrong answer. The query panel is the ``n_queries``
    smallest vec_ids (no dense-0-based-id assumption — r9 ADVICE)."""
    from .operators.similarity import jl_signs

    signs = jl_signs(in_dim, out_dim, seed)
    vals = ",".join(
        f"({k},{j},{v})"
        for k, row in enumerate(signs)
        for j, v in enumerate(row)
    )
    return f"""
WITH signs(k, j, s) AS (VALUES {vals}),
panel AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_queries}),
vq AS MATERIALIZED (
  SELECT vec_id, jj.j AS j,
    CAST(FLOOR(CAST(embedding[jj.j] AS DOUBLE) * 1e6) AS BIGINT) AS v
  FROM embeddings, (SELECT unnest(range(1, {in_dim + 1})) AS j) jj),
proj AS MATERIALIZED (
  SELECT vec_id, k, sum(s * v) AS p
  FROM vq JOIN signs ON signs.j = vq.j - 1
  GROUP BY vec_id, k),
ad AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum((q.p - c.p) * (q.p - c.p)) AS d2
  FROM proj q JOIN proj c USING (k)
  WHERE q.vec_id IN (SELECT vec_id FROM panel) AND c.vec_id != q.vec_id
  GROUP BY 1, 2),
at AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn
  FROM ad) WHERE rn <= {k}),
ed AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum((q.v - c.v) * (q.v - c.v)) AS d2
  FROM vq q JOIN vq c USING (j)
  WHERE q.vec_id IN (SELECT vec_id FROM panel) AND c.vec_id != q.vec_id
  GROUP BY 1, 2),
et AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn
  FROM ed) WHERE rn <= {k})
SELECT et.query_id,
  CAST(count(at.neighbor_id) AS BIGINT) AS n_overlap,
  count(at.neighbor_id) / {float(k)} AS recall_at_k
FROM et LEFT JOIN at USING (query_id, neighbor_id)
GROUP BY et.query_id
"""


def q148_gapfill_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series regularization (operators/timeseries.py:
    gapfill_interpolate): per-user purchase values onto a 6-hour grid
    with linear interpolation across the holes — the gauge companion
    to the LOCF lane the hypertable rollup (q02) uses. Values ride
    the 1e-6 BIGINT lattice through the bucket mean, the
    interpolation weights are integer bucket distances, and the final
    floor lands back on the lattice, so every synthesized cell is
    engine-replayable and the oracle checks each one."""
    from .operators.timeseries import gapfill_interpolate

    e = load_table(spark, sf, "events").where(
        F.col("event_type") == "purchase"
    )
    return gapfill_interpolate(e, "user_id", "ts", "value", step_s=21600)


Q148_SQL = """
WITH obs AS (
  SELECT user_id,
    CAST(FLOOR(epoch_us(ts) / 21600000000.0) AS BIGINT) * 21600
      AS bucket_start,
    count(*) AS n_obs,
    sum(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS sq
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
  GROUP BY 1, 2),
obs2 AS (
  SELECT user_id, bucket_start, n_obs, CAST(sq AS DOUBLE) / n_obs AS oq
  FROM obs),
grid AS (
  SELECT user_id, unnest(range(lo, hi + 21600, 21600)) AS bucket_start
  FROM (SELECT user_id, min(bucket_start) AS lo, max(bucket_start) AS hi
        FROM obs2 GROUP BY user_id)),
g AS (
  SELECT grid.user_id, grid.bucket_start, obs2.n_obs, obs2.oq
  FROM grid LEFT JOIN obs2 USING (user_id, bucket_start)),
f AS (
  SELECT user_id, bucket_start, n_obs, oq,
    last_value(CASE WHEN oq IS NOT NULL THEN bucket_start END IGNORE NULLS)
      OVER pw AS pb,
    last_value(oq IGNORE NULLS) OVER pw AS pv,
    first_value(CASE WHEN oq IS NOT NULL THEN bucket_start END IGNORE NULLS)
      OVER nw AS nb,
    first_value(oq IGNORE NULLS) OVER nw AS nv
  FROM g
  WINDOW
    pw AS (PARTITION BY user_id ORDER BY bucket_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    nw AS (PARTITION BY user_id ORDER BY bucket_start
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
SELECT user_id, bucket_start,
  COALESCE(n_obs, 0) AS n_obs,
  CAST(FLOOR(CASE
    WHEN oq IS NOT NULL THEN oq
    ELSE pv + (nv - pv) * (CAST(bucket_start - pb AS DOUBLE)
                           / CAST(nb - pb AS DOUBLE)) END)
    AS DOUBLE) / 1e6 AS value,
  CASE
    WHEN oq IS NOT NULL THEN 'observed'
    ELSE 'interp' END AS src
FROM f
"""


def q149_class_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source keyword extraction (operators/text.py:
    class_tfidf_keywords — BERTopic's c-TF-IDF): each source's top-5
    terms by in-class frequency times inverse class frequency, the
    "what is this domain about" report beside the mixture stats. The
    idf factor floors onto the 1e-6 lattice so scores are exact
    integer products; ranking ties break on the term; the oracle
    replays counts, idf, scores, and ranks."""
    from .operators.text import class_tfidf_keywords

    d = load_table(spark, sf, "documents")
    return class_tfidf_keywords(d, "source", top_k=5)


Q149_SQL = r"""
WITH ts AS (
  SELECT id, cls, term, count(*) AS tf FROM (
    SELECT doc_id AS id, source AS cls,
           unnest(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+')) AS term
    FROM documents)
  GROUP BY id, cls, term),
ct AS (SELECT cls, term, sum(tf) AS ctf FROM ts GROUP BY cls, term),
cdf AS (SELECT term, count(*) AS cdf FROM ct GROUP BY term),
nc AS (SELECT count(DISTINCT source) AS n_classes FROM documents),
scored AS (
  SELECT cls, term,
    ctf * CAST(FLOOR((ln((1 + n_classes) / (1 + cdf)) + 1) * 1e6) AS BIGINT)
      AS score_q
  FROM ct JOIN cdf USING (term) CROSS JOIN nc)
SELECT cls AS source, term, rank, CAST(score_q AS DOUBLE) / 1e6 AS score
FROM (SELECT cls, term, score_q,
        row_number() OVER (PARTITION BY cls ORDER BY score_q DESC, term)
          AS rank
      FROM scored)
WHERE rank <= 5
"""


def q150_ivfpq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@5 vs nprobe for the IVF-PQ index (operators/
    similarity.py:ivfpq_recall_eval) — the tuning table a
    practitioner reads to set ``nprobe`` on the production ANN
    search (q142): each setting runs the PRODUCTION ivfpq_topk
    verbatim on one shared index against exact brute-force top-5 on
    the 1e-6 lattice. The oracle replays the COMPOSED pipeline once
    (coarse trajectory, residual codebooks, codes, probe ranking up
    to max nprobe) and derives every nprobe's candidate set from the
    probe ranks — provably the same set ivfpq_topk scans — plus the
    exact side and the per-(nprobe, query) overlap, value-for-value.
    r8 verdict item 4 / r9 item 4 (carried): q147 answers "are JL
    vectors good enough"; this answers "what nprobe do I set"."""
    from .operators.similarity import ivfpq_recall_eval

    e = load_table(spark, sf, "embeddings")
    return ivfpq_recall_eval(
        e, nprobes=(1, 2, 4), n_queries=10, k=5,
        cells=8, coarse_iters=2, m=4, pq_k=16, pq_iters=2,
    )


def _q150_sql(
    cells: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 16,
    pq_iters: int = 2,
    nprobes: tuple[int, ...] = (1, 2, 4),
    topk: int = 5,
    n_queries: int = 10,
    dim: int = 64,
) -> str:
    """q150's generated oracle: the q142 composed replay, widened to
    a probe RANKING (rk <= max(nprobes)) so one ``dist`` pass carries
    each candidate's probe rank — a candidate in the query's
    rank-``r`` cell is visible at every ``nprobe >= r``, which is
    exactly the inverted-list bound ivfpq_topk applies per setting —
    then per-nprobe top-k, the exact lattice top-k, and the overlap
    counts. ``dim`` matches the testdata width (the _q147_sql
    precondition: the Spark side derives it from data, so a width
    change fails loudly)."""
    np_max = max(nprobes)
    np_vals = ",".join(f"({int(v)})" for v in nprobes)
    subdim = dim // m
    score_v = (
        "CAST(floor((0.5 * list_inner_product(cc.c, cc.c)"
        " - list_inner_product(v.e, cc.c)) * 1000000000.0) AS BIGINT)"
    )
    qc0 = (
        "\n     + CAST(floor(0.5 * list_inner_product(q.e, q.e)"
        " * 1000000000.0) AS BIGINT)"
    )
    pt = "\n".join(
        f""",
pt{j} AS MATERIALIZED (
  SELECT q.query_id, q.cluster AS pcell, cc.cluster AS code,
    CAST(floor((0.5 * list_inner_product(cc.c, cc.c)
     - list_inner_product(q.e[{j * subdim + 1}:{(j + 1) * subdim}], cc.c))
     * 1000000000.0) AS BIGINT){qc0 if j == 0 else ""} AS t
  FROM qres q CROSS JOIN c{j}x{pq_iters} cc
)"""
        for j in range(m)
    )
    cjoins = "\n  ".join(
        f"JOIN asg{j} a{j} ON a{j}.vec_id = ca.vec_id" for j in range(1, m)
    )
    tjoins = "\n  ".join(
        f"JOIN pt{j} t{j} ON t{j}.query_id = p.query_id"
        f" AND t{j}.pcell = ca.cluster AND t{j}.code = a{j}.cluster"
        for j in range(1, m)
    )
    dsum = " + ".join(f"t{j}.t" for j in range(m))
    return (
        "WITH "
        + _kmeans_replay_ctes(cells, coarse_iters)
        + f""",
panel AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_queries}),
nps(np) AS (VALUES {np_vals}),
rsd AS MATERIALIZED (
  SELECT v.vec_id,
         list_transform(range(1, {dim + 1}), i -> v.e[i] - cc.c[i]) AS e
  FROM v JOIN asg USING (vec_id) JOIN c{coarse_iters} cc USING (cluster)
),
"""
        + _pq_replay_ctes(m, k, pq_iters, subdim, src="rsd", emit_tq=False)
        + f""",
probe AS MATERIALIZED (
  SELECT query_id, cluster, rk FROM (
    SELECT v.vec_id AS query_id, cc.cluster,
      row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY {score_v}, cc.cluster) AS rk
    FROM v CROSS JOIN c{coarse_iters} cc
    WHERE v.vec_id IN (SELECT vec_id FROM panel)
  ) WHERE rk <= {np_max}
),
qres AS MATERIALIZED (
  SELECT p.query_id, p.cluster,
         list_transform(range(1, {dim + 1}), i -> v.e[i] - cc.c[i]) AS e
  FROM probe p
  JOIN v ON v.vec_id = p.query_id
  JOIN c{coarse_iters} cc ON cc.cluster = p.cluster
){pt},
dist AS MATERIALIZED (
  SELECT p.query_id, ca.vec_id, p.rk, ({dsum}) AS d
  FROM asg ca
  JOIN probe p ON p.cluster = ca.cluster
  JOIN asg0 a0 ON a0.vec_id = ca.vec_id
  {cjoins}
  JOIN pt0 t0 ON t0.query_id = p.query_id
   AND t0.pcell = ca.cluster AND t0.code = a0.cluster
  {tjoins}
  WHERE ca.vec_id != p.query_id
),
at AS (
  SELECT np, query_id, vec_id AS neighbor_id FROM (
    SELECT nps.np, dist.query_id, dist.vec_id, dist.d,
      row_number() OVER (PARTITION BY nps.np, dist.query_id
                         ORDER BY dist.d, dist.vec_id) AS rn
    FROM dist JOIN nps ON dist.rk <= nps.np
  ) WHERE rn <= {topk}
),
vq AS MATERIALIZED (
  SELECT vec_id, jj.j AS j,
    CAST(FLOOR(CAST(embedding[jj.j] AS DOUBLE) * 1e6) AS BIGINT) AS v
  FROM embeddings, (SELECT unnest(range(1, {dim + 1})) AS j) jj),
ed AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         sum((q.v - c.v) * (q.v - c.v)) AS d2
  FROM vq q JOIN vq c USING (j)
  WHERE q.vec_id IN (SELECT vec_id FROM panel) AND c.vec_id != q.vec_id
  GROUP BY 1, 2),
et AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
    row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn
  FROM ed) WHERE rn <= {topk})
SELECT nps.np AS nprobe, et.query_id,
  CAST(count(at.neighbor_id) AS BIGINT) AS n_overlap,
  count(at.neighbor_id) / {float(topk)} AS recall_at_k
FROM et CROSS JOIN nps
LEFT JOIN at ON at.np = nps.np AND at.query_id = et.query_id
            AND at.neighbor_id = et.neighbor_id
GROUP BY nps.np, et.query_id
"""
    )


def q151_ivfpq_append(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ANN ingest (operators/similarity.py:ivfpq_append —
    FAISS ``add`` after ``train``): freeze the q142 index's coarse
    centroids + residual codebooks, then encode a DERIVED batch of
    new vectors (every 7th embedding, reversed, ids offset by 10^6 —
    deterministic, disjoint ids, different cells than the originals)
    against them. Returns the appended codes rows ``(vec_id, code_0..
    code_3, cell)`` — the oracle replays the coarse fit, the residual
    codebook training, the new vectors' cell assignment, residuals,
    and all four sub-code assignments value-for-value, attesting the
    no-retrain ingest path end to end."""
    from .operators.similarity import ivfpq_append, ivfpq_index

    e = load_table(spark, sf, "embeddings")
    coarse, books, _codes = ivfpq_index(
        e, cells=8, coarse_iters=2, m=4, k=16, pq_iters=2
    )
    new = e.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    return ivfpq_append(new, coarse, books)


def _q151_sql(
    cells: int = 8,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 16,
    pq_iters: int = 2,
    dim: int = 64,
) -> str:
    """q151's generated oracle: _kmeans_replay_ctes (coarse) + the
    residual-sourced _pq_replay_ctes (frozen codebooks c{j}x{iters}),
    then the append path on the derived new vectors — coarse
    assignment (floored 1e-9 scores, ties to lowest cell), residual
    subtract, and per-subspace code assignment against the FINAL
    codebooks. ``dim`` pins the testdata width (the _q147_sql
    precondition)."""
    subdim = dim // m
    score_new = (
        "CAST(floor((0.5 * list_inner_product(cc.c, cc.c)"
        " - list_inner_product(n.e, cc.c)) * 1000000000.0) AS BIGINT)"
    )
    sub_assigns = []
    code_cols = []
    for j in range(m):
        lo, hi = j * subdim + 1, (j + 1) * subdim
        score_j = (
            "CAST(floor((0.5 * list_inner_product(cc.c, cc.c)"
            f" - list_inner_product(r.e[{lo}:{hi}], cc.c))"
            " * 1000000000.0) AS BIGINT)"
        )
        sub_assigns.append(
            f""",
n{j} AS (
  SELECT vec_id, cluster AS code_{j} FROM (
    SELECT r.vec_id, cc.cluster,
      row_number() OVER (PARTITION BY r.vec_id
                         ORDER BY {score_j}, cc.cluster) AS rk
    FROM nres r CROSS JOIN c{j}x{pq_iters} cc
  ) WHERE rk = 1
)"""
        )
        code_cols.append(f"n{j}.code_{j}")
    njoins = "\n  ".join(
        f"JOIN n{j} ON n{j}.vec_id = nasg.vec_id" for j in range(m)
    )
    return (
        "WITH "
        + _kmeans_replay_ctes(cells, coarse_iters)
        + f""",
rsd AS MATERIALIZED (
  SELECT v.vec_id,
         list_transform(range(1, {dim + 1}), i -> v.e[i] - cc.c[i]) AS e
  FROM v JOIN asg USING (vec_id) JOIN c{coarse_iters} cc USING (cluster)
),
"""
        + _pq_replay_ctes(m, k, pq_iters, subdim, src="rsd", emit_tq=False)
        + f""",
newv AS MATERIALIZED (
  SELECT vec_id + 1000000 AS vec_id,
         list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS e
  FROM embeddings WHERE vec_id % 7 = 0
),
nasg AS MATERIALIZED (
  SELECT vec_id, cluster AS cell FROM (
    SELECT n.vec_id, cc.cluster,
      row_number() OVER (PARTITION BY n.vec_id
                         ORDER BY {score_new}, cc.cluster) AS rk
    FROM newv n CROSS JOIN c{coarse_iters} cc
  ) WHERE rk = 1
),
nres AS MATERIALIZED (
  SELECT n.vec_id,
         list_transform(range(1, {dim + 1}), i -> n.e[i] - cc.c[i]) AS e
  FROM newv n JOIN nasg USING (vec_id)
  JOIN c{coarse_iters} cc ON cc.cluster = nasg.cell
){"".join(sub_assigns)}
SELECT nasg.vec_id, {", ".join(code_cols)}, nasg.cell
FROM nasg
  {njoins}
"""
    )


def q152_image_dup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image near-dup (r11 — operators/multimodal.py:
    image_signatures dHash + operators/dedup.py:hamming_dup_pairs,
    the SimHash banding machinery factored out): each document
    renders a deterministic 9x8 grayscale netpbm image (pixel i =
    md5_60(token_i) % 256 over its first 72 whitespace tokens — the
    q123 md5_60 lane, so near-identical texts yield near-identical
    images AND DuckDB can replay every pixel; short documents repeat
    their tokens cyclically — constant padding degenerated into LSH
    mega-buckets at 100x, see the inline comment), assembled
    JVM-side as hex -> unhex binary. The signatures then run the
    REAL lane:
    netpbm decode -> integer luma -> nearest resize -> dHash bits ->
    banded Hamming self-join (radius 6, 8 bands; pigeonhole recall 1
    at >= 7). The oracle replays pixels, the 64 gradient compares,
    the signed-bit packing (bit 63 as the -2^63 addend — DuckDB's
    << refuses the sign bit), and brute-forces the Hamming ball
    (result-identical to the banded join by the pigeonhole bound,
    which tests/test_image_dedup.py proves exhaustively)."""
    from .operators.dedup import hamming_dup_pairs
    from .operators.multimodal import image_signatures

    imgs = q152_token_images(load_table(spark, sf, "documents"))
    sigs = image_signatures(
        imgs, binary_col="content", id_cols=("doc_id",), kind="dhash"
    ).where(F.col("sig").isNotNull())
    return hamming_dup_pairs(
        sigs, id_col="doc_id", sig_col="sig", max_hamming=6, bands=8
    )


def q152_token_images(d: DataFrame) -> DataFrame:
    """(doc_id, content) — each document rendered as a deterministic
    9x8 grayscale netpbm payload, the q152 pixel recipe shared with
    examples/scale_spotcheck.py so the 100x measurements measure the
    registered query (r11 review).

    pixel i = md5_60(token_{i mod n}) % 256 — documents SHORTER than
    72 tokens repeat their own tokens CYCLICALLY rather than padding
    with a constant. A constant pad is an LSH disaster at corpus
    scale: 70% of this corpus is under 72 tokens, so every short
    document shared identical all-zero tail bits, the tail band
    buckets degenerated into one mega-bucket per band, and the
    candidate join melted at 100x (~6e10 rows — measured r11,
    killed; BASELINE.md). Cyclic self-padding keeps near-identical
    same-length texts near-identical (the pair structure dedup
    wants) while unrelated documents' tails stay uncorrelated.
    The split is MATERIALIZED in a projection before the transform:
    Catalyst does no CSE inside HOF lambdas, so a captured split
    would re-tokenize the document once per pixel (the r3 simhash
    defect class)."""
    base = d.select(
        "doc_id",
        F.slice(F.split(F.trim(F.col("text")), _TXT.WS), 1, 72).alias(
            "__toks__"
        ),
    )
    px = F.transform(
        F.sequence(F.lit(0), F.lit(71)),
        lambda i: F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.element_at(
                            F.col("__toks__"),
                            (
                                F.pmod(i, F.size(F.col("__toks__"))) + 1
                            ).cast("int"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(256),
        ),
    )
    hexstr = F.concat_ws(
        "", F.transform(px, lambda v: F.lpad(F.hex(v), 2, "0"))
    )
    header_hex = b"P5 9 8 255\n".hex().upper()
    return base.select(
        "doc_id",
        F.unhex(F.concat(F.lit(header_hex), hexstr)).alias("content"),
    )


Q152_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_slice(regexp_split_to_array(trim(text),
                                          '[ \t\n\x0B\f\r]+'), 1, 72) AS ts
  FROM documents
  -- NULL text mirrors the Spark lane's dropped NULL signature (the
  -- decode of a header-only payload fails there); without this
  -- guard the CASE below would collapse an all-NULL pixel list to
  -- sig = 0 and pair the doc with every legitimate sig-0 doc
  WHERE text IS NOT NULL
),
pxl AS (
  SELECT doc_id,
    [CAST(('0x' || substr(md5(ts[CAST((j - 1) % len(ts) AS INT) + 1]),
                          1, 15)) AS BIGINT) % 256
     FOR j IN range(1, 73)] AS px
  FROM tk
),
sig AS (
  SELECT doc_id,
    CAST(list_sum(
      [CASE WHEN px[CAST((j // 8) * 9 + (j % 8) AS INT) + 1]
                 > px[CAST((j // 8) * 9 + (j % 8) AS INT) + 2]
            THEN CASE WHEN j = 63
                      THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                      ELSE (CAST(1 AS BIGINT) << CAST(j AS INT)) END
            ELSE CAST(0 AS BIGINT) END
       FOR j IN range(0, 64)]) AS BIGINT) AS sig
  FROM pxl
)
SELECT a.doc_id AS i, b.doc_id AS j,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 6
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark query, duckdb oracle SQL or None)
#:
#: ORDER IS LOAD-BEARING: the driver's correctness gate checks only
#: the FIRST 50 entries (each CORRECTNESS_r0N contains exactly 50
#: rows, cut in registry order), and the registry rotates each round.
#: The LITERAL below still lists the r11 window first; the EFFECTIVE
#: r12 order is applied by the ``_R12_WINDOW`` reorder after the
#: generated-oracle reassignments (see its comment for the window's
#: composition: the six VERDICT-named entries, every r11/r12-touched
#: path, q152, then r9-attested fills). Verify the cut by IMPORTING
#: REGISTRY — not by reading this literal. q30/q33/q94 stay behind
#: the cap: their rows are permanently rows-only by declared design
#: (engine-hash values; md5 twins q123/q124/q129 carry the
#: value-level record) and fronting them would spend window slots
#: re-recording a weaker check. Every entry, either side of the cap,
#: runs against its oracle in tests/test_entry_oracle.py on every
#: pytest run.
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {
    # --- r11 window (first 50 = the driver's correctness gate) -------
    # the 50 r8-attested entries whose newest driver rows turn 3
    # rounds old this round (VERDICT r10 item 1 — exactly
    # window-sized, zero free slots):
    "q130_stream_demux_dynamic": (q130_stream_demux_dynamic, Q130_SQL),
    "q34_relationalize_json_choice": (q34_relationalize_json_choice, Q34_SQL),
    "q125_relationalize_dynamic": (q125_relationalize_dynamic, Q125_SQL),
    "q131_hashed_logreg": (q131_hashed_logreg, None),
    "q132_span_removal": (q132_span_removal, Q132_SQL),
    "q133_bpe_train": (q133_bpe_train, None),
    "q134_tokenizer_eval": (q134_tokenizer_eval, None),
    "q135_quality_scores": (q135_quality_scores, None),
    "q136_streaming_distinct_sketch": (q136_streaming_distinct_sketch, Q136_SQL),
    "q137_pq_ann": (q137_pq_ann, None),
    "q138_dsir_selection": (q138_dsir_selection, None),
    "q139_zorder_key": (q139_zorder_key, None),
    "q140_skew_join": (q140_skew_join, Q140_SQL),
    "q141_streaming_quality_scores": (q141_streaming_quality_scores, None),
    "q142_ivfpq_ann": (q142_ivfpq_ann, None),
    "q47_grouped_demean": (q47_grouped_demean, Q47_SQL),
    "q48_small_quantity_revenue": (q48_small_quantity_revenue, Q48_SQL),
    "q49_large_orders": (q49_large_orders, Q49_SQL),
    "q50_returned_revenue": (q50_returned_revenue, Q50_SQL),
    "q51_signup_purchase_funnel": (q51_signup_purchase_funnel, Q51_SQL),
    "q52_bpe_token_count": (q52_bpe_token_count, Q52_SQL),
    "q53_ann_lsh_topk": (q53_ann_lsh_topk, Q53_SQL),
    "q54_streaming_windowed_counts": (q54_streaming_windowed_counts, Q54_SQL),
    "q55_streaming_sessionize": (q55_streaming_sessionize, Q55_SQL),
    "q56_sole_supplier_orders": (q56_sole_supplier_orders, Q56_SQL),
    "q57_cheapest_part_per_type": (q57_cheapest_part_per_type, Q57_SQL),
    "q58_rich_idle_customers_by_nation": (q58_rich_idle_customers_by_nation, Q58_SQL),
    "q59_dedup_clusters": (q59_dedup_clusters, Q59_SQL),
    "q60_bm25_rank": (q60_bm25_rank, None),  # oracle generated below
    "q61_hash_split_profile": (q61_hash_split_profile, Q61_SQL),
    "q62_contamination": (q62_contamination, Q62_SQL),
    "q63_boilerplate_phrases": (q63_boilerplate_phrases, Q63_SQL),
    "q64_pii_redaction": (q64_pii_redaction, None),
    "q65_supplier_cnt_by_part": (q65_supplier_cnt_by_part, Q65_SQL),
    "q66_dominant_suppliers": (q66_dominant_suppliers, Q66_SQL),
    "q68_curation_funnel": (q68_curation_funnel, None),
    "q69_quantized_ann": (q69_quantized_ann, Q69_SQL),
    "q70_incremental_dedup": (q70_incremental_dedup, Q70_SQL),
    "q71_nation_full_outer": (q71_nation_full_outer, Q71_SQL),
    "q72_grouping_sets": (q72_grouping_sets, Q72_SQL),
    "q73_relationalize_map": (q73_relationalize_map, Q73_SQL),
    "q126_kmv_distinct": (q126_kmv_distinct, Q126_SQL),
    "q127_kmv_vocab_overlap": (q127_kmv_vocab_overlap, Q127_SQL),
    "q128_kmv_shard_merge": (q128_kmv_shard_merge, Q128_SQL),
    "q67_kmeans_profile": (q67_kmeans_profile, Q67_SQL),
    "q108_semdedup": (q108_semdedup, Q108_SQL),
    "q74_stream_static_join": (q74_stream_static_join, Q74_SQL),
    "q75_stream_stream_join": (q75_stream_stream_join, Q75_SQL),
    "q76_setops_all": (q76_setops_all, Q76_SQL),
    "q77_chunk_and_pack": (q77_chunk_and_pack, Q77_SQL),
    # --- behind the cap: newest rows r9/r10 (all full hash-green),
    # plus the three permanently rows-only entries (q30/q33/q94 —
    # engine-hash values; md5 twins q123/q124/q129 carry the
    # value-level record). Every entry still runs value-level in
    # tests/test_entry_oracle.py on every pytest run. -----------------
    # the r10 window block (newest rows r10; fronts in r13):
    # re-attestations: q143 + q101 carry the r10 floor-lattice
    # quantization fix (q143 failed r9's gate on the old round-based
    # quantizer; q101 had the identical latent pattern):
    "q143_bigram_nll": (q143_bigram_nll, Q143_SQL),
    "q101_unigram_nll": (q101_unigram_nll, Q101_SQL),
    # new this round — IVF-PQ recall-vs-nprobe tuning eval and the
    # frozen-index incremental append path:
    "q150_ivfpq_recall": (q150_ivfpq_recall, None),  # oracle generated below
    "q151_ivfpq_append": (q151_ivfpq_append, None),  # oracle generated below
    # the 46 entries re-attested in r10 (r7-aged block fronted then):
    "q129_hll_merge_law": (q129_hll_merge_law, Q129_SQL),
    "q22_relationalize_linkage": (q22_relationalize_linkage, Q22_SQL),
    "q23_text_stats": (q23_text_stats, Q23_SQL),
    "q24_lang_id": (q24_lang_id, None),
    "q25_quality_score": (q25_quality_score, None),
    "q26_exact_dedup": (q26_exact_dedup, Q26_SQL),
    "q81_asof_forward": (q81_asof_forward, Q81_SQL),
    "q82_asof_nearest": (q82_asof_nearest, Q82_SQL),
    "q103_fuzzy_join_names": (q103_fuzzy_join_names, Q103_SQL),
    "q106_nest_roundtrip": (q106_nest_roundtrip, Q106_SQL),
    "q107_group_quota_sample": (q107_group_quota_sample, Q107_SQL),
    "q109_scd2_history": (q109_scd2_history, Q109_SQL),
    "q110_snapshot_cdc": (q110_snapshot_cdc, Q110_SQL),
    "q111_cohort_retention": (q111_cohort_retention, Q111_SQL),
    "q112_weighted_sample": (q112_weighted_sample, Q112_SQL),
    "q113_table_checksum": (q113_table_checksum, Q113_SQL),
    "q114_partial_agg_merge": (q114_partial_agg_merge, Q114_SQL),
    "q115_streaming_segment_dedup": (q115_streaming_segment_dedup, Q115_SQL),
    "q116_char_entropy": (q116_char_entropy, Q116_SQL),
    "q117_funnel_steps": (q117_funnel_steps, Q117_SQL),
    "q118_psi_drift": (q118_psi_drift, Q118_SQL),
    "q119_robust_outliers": (q119_robust_outliers, Q119_SQL),
    "q120_knn_label_eval": (q120_knn_label_eval, Q120_SQL),
    "q121_pagerank": (q121_pagerank, Q121_SQL),
    "q122_scd2_lookup": (q122_scd2_lookup, Q122_SQL),
    "q123_simhash_md5": (q123_simhash_md5, Q123_SQL),
    "q124_winnow_md5": (q124_winnow_md5, Q124_SQL),
    "q02_hypertable_rollup": (q02_hypertable_rollup, Q02_SQL),
    "q18_sessionization": (q18_sessionization, Q18_SQL),
    "q27_fingerprint_groups": (q27_fingerprint_groups, Q27_SQL),
    "q28_jaccard_pairs": (q28_jaccard_pairs, _JACCARD_ORACLE.format(threshold=0.5)),
    "q29_minhash_lsh_pairs": (q29_minhash_lsh_pairs, _JACCARD_ORACLE.format(threshold=0.8)),
    "q31_ann_topk": (q31_ann_topk, Q31_SQL),
    "q32_embedding_dup_pairs": (q32_embedding_dup_pairs, Q32_SQL),
    "q35_multimodal_features": (q35_multimodal_features, Q35_SQL),
    "q36_sql_api": (q36_sql_api, Q36_SQL),
    "q37_asof_join": (q37_asof_join, Q37_SQL),
    "q38_range_bucket_join": (q38_range_bucket_join, Q38_SQL),
    "q39_pivot_status": (q39_pivot_status, Q39_SQL),
    "q40_promo_revenue": (q40_promo_revenue, Q40_SQL),
    "q41_disjunctive_predicates": (q41_disjunctive_predicates, Q41_SQL),
    "q42_customer_distribution": (q42_customer_distribution, Q42_SQL),
    "q43_above_average_idle": (q43_above_average_idle, Q43_SQL),
    "q44_percentiles": (q44_percentiles, Q44_SQL),
    "q45_edit_distance": (q45_edit_distance, Q45_SQL),
    "q46_pandas_udf": (q46_pandas_udf, Q46_SQL),
    # the r9-attested block (newest rows r9; fronts in r12):
    "q144_tfidf_allpairs": (q144_tfidf_allpairs, Q144_SQL),
    "q145_relative_quality_filter": (q145_relative_quality_filter, None),
    "q146_canonical_dedup": (q146_canonical_dedup, Q146_SQL),
    "q147_jl_recall": (q147_jl_recall, None),
    "q148_gapfill_interpolate": (q148_gapfill_interpolate, Q148_SQL),
    "q149_class_tfidf": (q149_class_tfidf, Q149_SQL),
    "q105_duplicate_spans": (q105_duplicate_spans, Q105_SQL),
    "q104_segment_dedup": (q104_segment_dedup, Q104_SQL),
    "q78_window_functions": (q78_window_functions, Q78_SQL),
    "q79_array_functions": (q79_array_functions, Q79_SQL),
    "q80_repetition_filters": (q80_repetition_filters, Q80_SQL),
    "q83_streaming_dedup": (q83_streaming_dedup, Q83_SQL),
    "q84_unpivot": (q84_unpivot, Q84_SQL),
    "q85_rolling_time_window": (q85_rolling_time_window, Q85_SQL),
    "q86_argmax_groups": (q86_argmax_groups, Q86_SQL),
    "q87_source_mixing": (q87_source_mixing, Q87_SQL),
    "q88_nullsafe_join": (q88_nullsafe_join, Q88_SQL),
    "q89_date_battery": (q89_date_battery, Q89_SQL),
    "q90_volume_shipping": (q90_volume_shipping, Q90_SQL),
    "q91_market_share": (q91_market_share, Q91_SQL),
    "q92_product_profit": (q92_product_profit, Q92_SQL),
    "q93_top_supplier": (q93_top_supplier, Q93_SQL),
    "q95_lateral_topn": (q95_lateral_topn, Q95_SQL),
    "q96_string_agg": (q96_string_agg, Q96_SQL_ORACLE),
    "q97_global_index": (q97_global_index, Q97_SQL),
    "q98_regression_stats": (q98_regression_stats, Q98_SQL),
    "q99_recursive_cte": (q99_recursive_cte, Q99_SQL),
    "q100_column_profile": (q100_column_profile, Q100_SQL),
    "q102_session_window_batch": (q102_session_window_batch, Q102_SQL),
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q03_top_unshipped_orders": (q03_top_unshipped_orders, Q03_SQL),
    "q04_order_priority": (q04_order_priority, Q04_SQL),
    "q05_local_supplier_volume": (q05_local_supplier_volume, Q05_SQL),
    "q06_revenue_delta": (q06_revenue_delta, Q06_SQL),
    "q07_global_stats": (q07_global_stats, Q07_SQL),
    "q08_segment_top_customers": (q08_segment_top_customers, Q08_SQL),
    "q09_running_revenue": (q09_running_revenue, Q09_SQL),
    "q10_status_priority_rollup": (q10_status_priority_rollup, Q10_SQL),
    "q11_flag_status_cube": (q11_flag_status_cube, Q11_SQL),
    "q12_setops": (q12_setops, Q12_SQL),
    "q13_customers_without_orders": (q13_customers_without_orders, Q13_SQL),
    "q14_suppliers_semi": (q14_suppliers_semi, Q14_SQL),
    "q15_scalar_functions": (q15_scalar_functions, Q15_SQL),
    "q16_date_functions": (q16_date_functions, Q16_SQL),
    "q17_events_hourly": (q17_events_hourly, Q17_SQL),
    "q19_events_json_extract": (q19_events_json_extract, Q19_SQL),
    "q20_relationalize_explode": (q20_relationalize_explode, Q20_SQL),
    "q21_relationalize_flatten": (q21_relationalize_flatten, Q21_SQL),
    # new in r11 (behind the cap per the zero-free-slot arithmetic;
    # fronts with the r9 block in r12):
    "q152_image_dup_pairs": (q152_image_dup_pairs, Q152_SQL),
    # permanently rows-only (engine-hash values by declared design):
    "q30_simhash_pairs": (q30_simhash_pairs, None),
    "q33_winnow_fingerprint": (q33_winnow_fingerprint, None),
    "q94_approx_sketches": (q94_approx_sketches, None),
}

# Generated oracles (built from the same profile constants the Spark
# side uses, so the two can never drift apart).
REGISTRY["q131_hashed_logreg"] = (q131_hashed_logreg, _q131_sql())
REGISTRY["q133_bpe_train"] = (q133_bpe_train, _q133_sql())
REGISTRY["q134_tokenizer_eval"] = (q134_tokenizer_eval, _q134_sql())
REGISTRY["q135_quality_scores"] = (q135_quality_scores, _q135_sql())
REGISTRY["q137_pq_ann"] = (q137_pq_ann, _q137_sql())
REGISTRY["q138_dsir_selection"] = (q138_dsir_selection, _q138_sql())
REGISTRY["q139_zorder_key"] = (q139_zorder_key, _q139_sql())
REGISTRY["q141_streaming_quality_scores"] = (
    q141_streaming_quality_scores,
    _q141_sql(),
)
REGISTRY["q142_ivfpq_ann"] = (q142_ivfpq_ann, _q142_sql())
REGISTRY["q24_lang_id"] = (q24_lang_id, _q24_sql())
REGISTRY["q25_quality_score"] = (q25_quality_score, _q25_sql())
REGISTRY["q64_pii_redaction"] = (q64_pii_redaction, _q64_sql())
REGISTRY["q68_curation_funnel"] = (q68_curation_funnel, _q68_sql())

REGISTRY["q145_relative_quality_filter"] = (q145_relative_quality_filter, _q145_sql())
REGISTRY["q147_jl_recall"] = (q147_jl_recall, _q147_sql())
REGISTRY["q150_ivfpq_recall"] = (q150_ivfpq_recall, _q150_sql())
REGISTRY["q151_ivfpq_append"] = (q151_ivfpq_append, _q151_sql())
REGISTRY["q60_bm25_rank"] = (q60_bm25_rank, _q60_sql())

#: r12 window rotation (VERDICT r11 item 3; applied AFTER the
#: generated-oracle reassignments, which do not move dict positions).
#: The first 50 = the driver's correctness gate, composed of:
#: 1. the six entries VERDICT r11 names (q01/q03/q83/q115/q150/q151 —
#:    r11-optimized paths that missed both the r10 and r11 windows),
#: 2. every r11/r12-TOUCHED query path so the driver ground-truths
#:    this round's optimizations: the dynamic-relationalize fused
#:    analysis (q34/q125/q130), the minhash bucket precompute (q29),
#:    the tfidf maxweight prefix bound (q144), the fused replayable
#:    Lloyd's kernel and its consumers (q67/q108/q137/q142, plus
#:    q150/q151 above), the q59 convergence null-safety, and the
#:    streaming-conf declaration sites (q54/q55/q74/q75/q136/q141,
#:    plus q83/q115 above),
#: 3. q152 (new in r11, never driver-checked),
#: 4. the remaining slots filled from the r9-attested block — the
#:    oldest driver rows in the registry.
#: Everything else keeps its relative order behind the cap; all 152
#: still run value-level in tests/test_entry_oracle.py every run.
_R12_WINDOW = [
    "q01_pricing_summary",
    "q03_top_unshipped_orders",
    "q83_streaming_dedup",
    "q115_streaming_segment_dedup",
    "q150_ivfpq_recall",
    "q151_ivfpq_append",
    "q34_relationalize_json_choice",
    "q125_relationalize_dynamic",
    "q130_stream_demux_dynamic",
    "q29_minhash_lsh_pairs",
    "q144_tfidf_allpairs",
    "q67_kmeans_profile",
    "q108_semdedup",
    "q137_pq_ann",
    "q142_ivfpq_ann",
    "q59_dedup_clusters",
    "q54_streaming_windowed_counts",
    "q55_streaming_sessionize",
    "q74_stream_static_join",
    "q75_stream_stream_join",
    "q136_streaming_distinct_sketch",
    "q141_streaming_quality_scores",
    "q152_image_dup_pairs",
    "q145_relative_quality_filter",
    "q146_canonical_dedup",
    "q147_jl_recall",
    "q148_gapfill_interpolate",
    "q149_class_tfidf",
    "q105_duplicate_spans",
    "q104_segment_dedup",
    "q78_window_functions",
    "q79_array_functions",
    "q80_repetition_filters",
    "q84_unpivot",
    "q85_rolling_time_window",
    "q86_argmax_groups",
    "q87_source_mixing",
    "q88_nullsafe_join",
    "q89_date_battery",
    "q90_volume_shipping",
    "q91_market_share",
    "q92_product_profit",
    "q93_top_supplier",
    "q95_lateral_topn",
    "q96_string_agg",
    "q97_global_index",
    "q98_regression_stats",
    "q99_recursive_cte",
    "q100_column_profile",
    "q102_session_window_batch",
]
assert len(_R12_WINDOW) == 50 and len(set(_R12_WINDOW)) == 50
assert all(n in REGISTRY for n in _R12_WINDOW)
REGISTRY = {n: REGISTRY[n] for n in _R12_WINDOW} | {
    n: v for n, v in REGISTRY.items() if n not in set(_R12_WINDOW)
}


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql.strip() for name, (_, sql) in REGISTRY.items() if sql}
