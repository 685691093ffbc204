"""Ordered k-step funnel analysis.

Generalizes the two-step signup->purchase query (q51) to arbitrary
ordered step lists: a user completes step ``i`` at the FIRST event of
type ``steps[i]`` strictly after their step ``i-1`` completion time.
The standard product-analytics funnel, and the shape ClickHouse ships
as ``windowFunnel``.

Spark-first formulation: ONE shuffle (groupBy user), then a
higher-order ``aggregate`` walks each user's time-sorted event array
once, carrying the k completion timestamps as the accumulator — no
per-step join, no per-step shuffle, no Python. Equivalent to the
iterated-min-join formulation (each fold step takes the first
qualifying event in time order), which is exactly what the DuckDB
oracle replays with k chained CTEs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Per-step completion counts for an ordered funnel.

    Returns ``(step, event_type, n_users)`` — one row per step,
    ``n_users`` = users who completed steps ``1..step`` in order.
    Step types must be distinct.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    k = len(steps)
    step_lits = F.array(*[F.lit(s) for s in steps])

    ev = df.select(
        F.col(user_col).alias("__u__"),
        F.col(ts_col).alias("__t__"),
        F.col(type_col).alias("__e__"),
    ).where(F.col(type_col).isin(list(steps)))
    per_user = ev.groupBy("__u__").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__t__").alias("t"), F.col("__e__").alias("e")))
        ).alias("__evs__")
    )

    ts_type = df.schema[ts_col].dataType.simpleString()
    init = F.array(*[F.lit(None).cast(ts_type) for _ in range(k)])

    def fold(acc, e):
        # For each step slot: keep a completion once set; otherwise
        # set it when this event matches the slot's type AND the
        # previous slot was completed strictly earlier.
        def slot(i):
            prev_ok = (
                F.lit(True)
                if i == 0
                else (
                    F.element_at(acc, i).isNotNull()
                    & (e.t > F.element_at(acc, i))
                )
            )
            return F.coalesce(
                F.element_at(acc, i + 1),
                F.when((e.e == F.element_at(step_lits, i + 1)) & prev_ok, e.t),
            )

        return F.array(*[slot(i) for i in range(k)])

    walked = per_user.select(F.aggregate("__evs__", init, fold).alias("__done__"))
    exploded = walked.select(
        F.posexplode("__done__").alias("__i__", "__ts__")
    )
    return (
        exploded.groupBy("__i__")
        .agg(F.count("__ts__").alias("n_users"))  # count() skips nulls
        .select(
            (F.col("__i__") + 1).alias("step"),
            F.element_at(step_lits, F.col("__i__") + 1).alias("event_type"),
            "n_users",
        )
    )
