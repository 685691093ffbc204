"""As-of (point-in-time) and range joins.

Spark has no native as-of join; the scalable formulation used here is
the union-sort-window technique: tag both inputs, union them, and let
one window pass per key carry the latest right-side values forward
onto left rows. Cost = one shuffle on the key + one sort — the same
shape as a regular SortMergeJoin, with none of the per-row Python or
O(N*M) candidate pairs a naive inequality join would create. This is
the standard distributed design for point-in-time correctness joins
(feature stores, market data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str,
    right_cols: list[str] | None = None,
    *,
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.ts <= left.ts`` within the same key group ("backward"
    as-of semantics, matching DuckDB's ASOF JOIN).

    Parameters
    ----------
    on: equality key column(s) shared by both sides.
    ts: ordering column name, present in both sides.
    right_cols: right-side value columns to carry (default: all except
        key/ts). They appear on the output with ``suffix`` appended if
        the name collides with a left column.
    tolerance: optional max age, e.g. ``F.expr("INTERVAL 1 HOUR")``;
        matches older than ``left.ts - tolerance`` become null.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*keys, ts}]

    carried = {c: c + suffix if c in left.columns else c for c in right_cols}
    # The whole matched right row travels as ONE struct so the output
    # never mixes values from different right rows: last(ignorenulls)
    # over independent columns would back-fill a NULL value column
    # from an older right row (DuckDB ASOF carries the row atomically).
    payload = "__asof_payload__"
    r = right.select(
        *keys,
        F.col(ts).alias(ts),
        F.struct(
            F.col(ts).alias("__ts__"),
            *[F.col(c).alias(carried[c]) for c in right_cols],
        ).alias(payload),
        F.lit(1).alias(_SIDE),
    )
    l = left.select(
        "*",
        F.lit(None).cast(r.schema[payload].dataType).alias(payload),
        F.lit(0).alias(_SIDE),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts so ties match
    # (<= semantics). One running last-non-null struct per key.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(ts), F.desc(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last(payload, ignorenulls=True).over(w).alias("__f__")
    )
    out = filled.filter(F.col(_SIDE) == 0)

    in_tolerance = F.lit(True)
    if tolerance is not None:
        in_tolerance = F.col("__f__.__ts__") >= (F.col(ts) - tolerance)
    result_cols = [F.col(c) for c in left.columns]
    result_cols.append(
        F.when(in_tolerance, F.col("__f__.__ts__")).alias(f"{ts}{suffix}")
    )
    for c in right_cols:
        result_cols.append(
            F.when(in_tolerance, F.col(f"__f__.{carried[c]}")).alias(carried[c])
        )
    return out.select(*result_cols)


def range_bucket_join(
    fact: DataFrame,
    buckets: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Attach a bucket dimension by half-open range containment
    ``lo <= value < hi``. The bucket table is broadcast, so the
    inequality join is a single pass over the fact side (broadcast
    nested-loop) — the right plan when buckets are few; for huge
    range tables, bin both sides to a common grid first and equi-join
    on the bin."""
    return fact.join(
        F.broadcast(buckets),
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)),
        "left",
    )
