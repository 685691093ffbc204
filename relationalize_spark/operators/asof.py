"""As-of (point-in-time) and range joins.

Spark has no native as-of join; the scalable formulation used here is
the union-sort-window technique: tag both inputs, union them, and let
one window pass per key carry the latest right-side values forward
onto left rows. Cost = one shuffle on the key + one sort — the same
shape as a regular SortMergeJoin, with none of the per-row Python or
O(N*M) candidate pairs a naive inequality join would create. This is
the standard distributed design for point-in-time correctness joins
(feature stores, market data).

Directions mirror pandas ``merge_asof``: backward (last right row at
or before, DuckDB's ASOF JOIN), forward (first right row at or
after), nearest (the closer of the two, ties to the backward match).
Forward reuses the same single window pass with the sort reversed;
nearest runs both passes over the one union+shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIDE = "__asof_side__"


def _micros(col: Column, dtype: T.DataType) -> Column:
    from ..functions.timeutil import epoch_micros

    return epoch_micros(col, dtype)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts: str,
    right_cols: list[str] | None = None,
    *,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach one right row within the same key
    group: the greatest ``right.ts <= left.ts`` (``backward``, the
    default — matches DuckDB's ASOF JOIN), the least
    ``right.ts >= left.ts`` (``forward``), or whichever of those two
    is closer in time (``nearest``; ties prefer the backward match,
    as pandas does). Determinism requires (key, ts) unique on the
    right — the same precondition every as-of engine imposes.

    Parameters
    ----------
    on: equality key column(s) shared by both sides.
    ts: ordering column name, present in both sides.
    right_cols: right-side value columns to carry (default: all except
        key/ts). They appear on the output with ``suffix`` appended if
        the name collides with a left column.
    tolerance: optional max distance, e.g. ``F.expr("INTERVAL 1
        HOUR")``; matches farther than that from ``left.ts`` become
        null.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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

    # Right rows sort before left rows at equal ts so ties match in
    # both directions (<= / >= semantics). One running last-non-null
    # struct per key per direction; nearest shares the single shuffle.
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(ts), F.desc(_SIDE))
        .rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.desc(ts), F.desc(_SIDE))
        .rowsBetween(*frame)
    )
    fills: list[Column] = []
    if direction in ("backward", "nearest"):
        fills.append(F.last(payload, ignorenulls=True).over(w_back).alias("__b__"))
    if direction in ("forward", "nearest"):
        fills.append(F.last(payload, ignorenulls=True).over(w_fwd).alias("__f__"))
    out = unioned.select("*", *fills).filter(F.col(_SIDE) == 0)

    ts_type = right.schema[ts].dataType
    lm = _micros(F.col(ts), ts_type)

    def _valid(side: str) -> Column:
        cand = F.col(f"{side}.__ts__")
        ok = cand.isNotNull()
        if tolerance is not None:
            if side == "__b__":
                ok = ok & (cand >= (F.col(ts) - tolerance))
            else:
                ok = ok & (cand <= (F.col(ts) + tolerance))
        return ok

    if direction == "backward":
        chosen = F.when(_valid("__b__"), F.col("__b__"))
    elif direction == "forward":
        chosen = F.when(_valid("__f__"), F.col("__f__"))
    else:
        b_ok, f_ok = _valid("__b__"), _valid("__f__")
        d_b = lm - _micros(F.col("__b__.__ts__"), ts_type)
        d_f = _micros(F.col("__f__.__ts__"), ts_type) - lm
        chosen = (
            F.when(b_ok & (~f_ok | (d_b <= d_f)), F.col("__b__"))
            .when(f_ok, F.col("__f__"))
        )

    result_cols = [F.col(c) for c in left.columns]
    result_cols.append(chosen["__ts__"].alias(f"{ts}{suffix}"))
    for c in right_cols:
        result_cols.append(chosen[carried[c]].alias(carried[c]))
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
