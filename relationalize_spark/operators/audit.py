"""Data-quality auditing: one-pass column profiles and referential
integrity checks.

The reference's pipelines trust their input shape (schema inference
handles drift, reference schema.py:36-64, but nothing validates
*values*). A 100 TB ingest needs the audit primitives warehouses run
before load: per-column null/distinct/min/max profiles and FK
violation counts. Both are expressed as ordinary aggregations so
Catalyst fuses them with the scan.

``profile_columns`` computes every column's stats in ONE aggregation
pass (multiple DISTINCT aggregates become a single Expand + shuffle),
then unpivots the 1-row result with ``stack`` — no per-column scan,
no driver loop over data. With ``exact=False`` the distinct counts
switch to HyperLogLog++ (``approx_count_distinct``), the right default
at 100 TB where exact distinct of a high-cardinality column is its own
shuffle of every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """One row per column: (col, n_rows, n_null, n_distinct, min_val,
    max_val), min/max presented as strings so heterogeneous column
    types share one schema."""
    distinct = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.selectExpr(
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as "
        "(col, n_null, n_distinct, min_val, max_val)",
    ).select("col", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def fk_violations(
    child: DataFrame, parent: DataFrame, child_keys: list[str], parent_keys: list[str]
) -> DataFrame:
    """Child rows whose key has no match in parent (NULL keys are
    violations too, matching warehouse NOT-ENFORCED-FK audit queries).
    An anti-join — one shuffle, broadcast when the parent is small."""
    on = [child[c].eqNullSafe(parent[p]) for c, p in zip(child_keys, parent_keys)]
    cond = on[0]
    for expr in on[1:]:
        cond = cond & expr
    return child.join(parent, cond, "left_anti")
