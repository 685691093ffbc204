"""Distribution-drift monitoring between two samples of a table.

The reference's load pipeline assumes each batch looks like the last
(schema inference absorbs *shape* drift, reference schema.py:36-64,
but nothing watches *value* drift). A production 100 TB ingest wants
the standard monitoring primitive: Population Stability Index between
a baseline sample (yesterday's load, the training corpus) and the
current batch, per numeric column — the number every feature-store /
data-quality stack alarms on (PSI > 0.1 "drifting", > 0.25 "shifted").

Engine-replayable by construction: bins are equi-width over the
baseline's exact [min, max] (two exact aggregates — no quantile
interpolation whose last-ulp could land a boundary value in different
bins across engines), and the bin index is pure IEEE-double
arithmetic (``floor((x-lo)/(hi-lo)*n)`` clamped), identical in any
SQL engine. Scale shape: one scan + partial-agg per side for the
stats, one scan + partial-agg per side for the counts — nothing
shuffles more than ``n_bins`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.lattice import floor_lattice

#: Substituted for an empty bin's fraction so ln() stays finite — the
#: standard PSI practice; keeps a bin that empties out contributing a
#: large-but-bounded term instead of infinity.
EPS = 1e-6


def _bin_index(x: Column, lo: Column, hi: Column, n_bins: int) -> Column:
    # Clamp in the double domain BEFORE floor/narrowing: a current-batch
    # value far outside the baseline [lo, hi] (corrupt sentinel like
    # 1e300) would otherwise overflow the int (or even bigint) cast and
    # throw under ANSI mode — crashing the monitor on exactly the drift
    # it exists to report. Clamping the scaled double to
    # [0, n_bins - 1] yields the identical bin for every in-range value
    # (floor∘clamp == clamp∘floor on that interval) and saturates the
    # edge bins for outliers.
    scaled = (x - lo) / (hi - lo) * F.lit(float(n_bins))
    clamped = F.least(
        F.lit(float(n_bins - 1)), F.greatest(F.lit(0.0), scaled)
    )
    return F.floor(clamped).cast("int")


def psi_drift(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    n_bins: int = 10,
    round_to: int = 9,
) -> DataFrame:
    """Per-bin PSI decomposition of ``value_col`` drift.

    Returns one row per bin:
    ``(bin, base_n, cur_n, base_frac, cur_frac, psi_term)`` — the
    table's total PSI is ``sum(psi_term)``; per-bin terms are kept so
    the *where* of the drift is visible, not just the scalar.
    NULL values are excluded on both sides (count them separately if
    null-rate drift matters); a degenerate baseline (min == max) puts
    every value in bin 0.

    Fractions and terms FLOOR onto a ``10^-round_to`` lattice
    (default 1e-9; floor, never round — round semantics diverge
    between engines and were unstable across Spark's own evaluation
    paths, r9 q143) so cross-engine ``ln`` ulps cannot flip a
    comparison except on a lattice boundary (~1e-7/eval, the
    documented residual band).
    """
    v = F.col(value_col).cast("double")
    b = baseline.select(v.alias("__v__")).where(F.col("__v__").isNotNull())
    c = current.select(v.alias("__v__")).where(F.col("__v__").isNotNull())

    stats = b.agg(
        F.min("__v__").alias("__lo__"), F.max("__v__").alias("__hi__")
    )
    lo, hi = F.col("__lo__"), F.col("__hi__")

    def binned(df: DataFrame, out: str) -> DataFrame:
        # stats is one row — a literal-sized cross join both engines
        # plan as a broadcast.
        return (
            df.crossJoin(F.broadcast(stats))
            .select(
                F.when(hi == lo, F.lit(0))
                .otherwise(_bin_index(F.col("__v__"), lo, hi, n_bins))
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count("*").alias(out))
        )

    spark = baseline.sparkSession
    spine = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    counts = (
        spine.join(binned(b, "base_n"), "bin", "left")
        .join(binned(c, "cur_n"), "bin", "left")
        .na.fill({"base_n": 0, "cur_n": 0})
    )
    # n_bins rows total: a single-partition window over them is free.
    tot_b = F.sum("base_n").over(Window.partitionBy())
    tot_c = F.sum("cur_n").over(Window.partitionBy())
    pb = F.greatest(F.col("base_n") / tot_b, F.lit(EPS))
    pc = F.greatest(F.col("cur_n") / tot_c, F.lit(EPS))
    return counts.select(
        "bin",
        "base_n",
        "cur_n",
        floor_lattice(F.col("base_n") / tot_b, round_to).alias("base_frac"),
        floor_lattice(F.col("cur_n") / tot_c, round_to).alias("cur_frac"),
        floor_lattice((pc - pb) * F.log(pc / pb), round_to).alias(
            "psi_term"
        ),
    )
