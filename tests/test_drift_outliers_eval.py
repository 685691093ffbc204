"""PSI drift, robust median/MAD outliers, and kNN label-agreement
eval — the round-4 data-quality/eval additions."""

import math

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.audit import robust_outliers
from relationalize_spark.operators.drift import psi_drift
from relationalize_spark.operators.similarity import knn_label_eval


# -- psi_drift --------------------------------------------------------------

def test_psi_zero_for_identical_samples(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    out = psi_drift(df, df, "x", n_bins=5).collect()
    assert len(out) == 5
    assert all(abs(r.psi_term) < 1e-12 for r in out)
    assert abs(sum(r.base_frac for r in out) - 1.0) < 1e-9


def test_psi_detects_shift(spark):
    base = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    # shifted hard right: mass leaves the low bins, lands in the top one
    cur = spark.createDataFrame([(float(i),) for i in range(80, 180)], "x double")
    out = {r.bin: r for r in psi_drift(base, cur, "x", n_bins=5).collect()}
    total = sum(r.psi_term for r in out.values())
    assert total > 0.25  # "significant shift" on the standard scale
    # out-of-range values clamp to the last bin, not a phantom bin
    assert sum(r.cur_n for r in out.values()) == 100
    assert out[4].cur_n > out[4].base_n


def test_psi_extreme_outlier_does_not_overflow(spark):
    """A corrupt sentinel far outside the baseline range (ratio beyond
    2^31/n_bins) must clamp into the edge bin, not throw an ANSI
    CAST_OVERFLOW — the monitor has to survive exactly the drift it
    exists to report. Regression for the r4 advisory: the bin index
    was narrowed to int BEFORE the clamp."""
    base = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    cur = spark.createDataFrame([(1e300,), (-1e300,), (50.0,)], "x double")
    out = {r.bin: r for r in psi_drift(base, cur, "x", n_bins=10).collect()}
    assert sum(r.cur_n for r in out.values()) == 3
    assert out[9].cur_n == 1 and out[0].cur_n == 1  # saturate the edges


def test_psi_handles_empty_bins_and_nulls(spark):
    base = spark.createDataFrame(
        [(float(i),) for i in range(50)] + [(None,)], "x double"
    )
    cur = spark.createDataFrame([(0.0,), (1.0,), (None,)], "x double")
    out = psi_drift(base, cur, "x", n_bins=10).collect()
    assert len(out) == 10
    assert all(math.isfinite(r.psi_term) for r in out)
    assert sum(r.cur_n for r in out) == 2  # nulls excluded


def test_psi_degenerate_baseline_single_value(spark):
    base = spark.createDataFrame([(1.0,)] * 10, "x double")
    cur = spark.createDataFrame([(1.0,)] * 7, "x double")
    out = psi_drift(base, cur, "x", n_bins=4).collect()
    assert sum(r.base_n for r in out) == 10
    assert next(r for r in out if r.bin == 0).cur_n == 7


def test_psi_terms_never_negative(spark):
    """Each PSI term (pc-pb)*ln(pc/pb) is sign-definite (both factors
    share a sign), and the EPS clamp preserves that — so per-bin terms
    are >= 0 and the total is a valid divergence. Checked over several
    seeded random shift/scale/degenerate sample pairs."""
    import numpy as np

    rng = np.random.RandomState(21)
    cases = [
        (rng.standard_normal(400), rng.standard_normal(300) + 2.0),
        (rng.exponential(1.0, 500), rng.exponential(3.0, 500)),
        (rng.uniform(0, 1, 200), np.full(150, 0.5)),  # current collapses
    ]
    for base_v, cur_v in cases:
        base = spark.createDataFrame([(float(x),) for x in base_v], "x double")
        cur = spark.createDataFrame([(float(x),) for x in cur_v], "x double")
        out = psi_drift(base, cur, "x", n_bins=8).collect()
        assert all(r.psi_term >= 0 for r in out), [r.psi_term for r in out]
        assert abs(sum(r.base_frac for r in out) - 1.0) < 1e-8
        assert abs(sum(r.cur_frac for r in out) - 1.0) < 1e-8


# -- robust_outliers --------------------------------------------------------

def test_robust_outliers_finds_planted_spike(spark):
    rows = [("g", float(v)) for v in range(1, 22)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "k string, x double")
    out = robust_outliers(df, ["k"], "x", z_thresh=3.5).collect()
    assert [r.x for r in out] == [1000.0]
    assert out[0].robust_z > 100


def test_robust_outliers_resists_masking(spark):
    """The signature property vs mean/stddev z-scores: several extreme
    values must not inflate the scale estimate enough to hide each
    other."""
    rows = [("g", float(v)) for v in range(1, 30)] + [
        ("g", 5000.0), ("g", 6000.0), ("g", 7000.0)
    ]
    df = spark.createDataFrame(rows, "k string, x double")
    got = {r.x for r in robust_outliers(df, ["k"], "x", z_thresh=3.5).collect()}
    assert {5000.0, 6000.0, 7000.0} <= got


def test_robust_outliers_zero_mad_group_is_silent(spark):
    rows = [("a", 5.0)] * 10 + [("a", 9.0)]
    df = spark.createDataFrame(rows, "k string, x double")
    # median 5, MAD 0 -> no robust deviation is measurable; documented
    assert robust_outliers(df, ["k"], "x").count() == 0


def test_robust_outliers_grouped_independently(spark):
    rows = (
        [("a", float(v)) for v in range(10)] + [("a", 500.0)]
        + [("b", float(v)) for v in range(5000, 5010)]
    )
    df = spark.createDataFrame(rows, "k string, x double")
    out = robust_outliers(df, ["k"], "x", z_thresh=3.5).collect()
    # b's values are huge in absolute terms but typical for b
    assert [(r.k, r.x) for r in out] == [("a", 500.0)]


# -- knn_label_eval ---------------------------------------------------------

def test_knn_label_eval_clustered_space(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((3, 8)) * 5
    rows = []
    i = 0
    for lbl, c in enumerate(centers):
        for v in c + rng.standard_normal((30, 8)) * 0.3:
            rows.append((i, [float(x) for x in v], lbl))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_label_eval(df, k=5)
    res = out.collect()
    assert len(res) == 90
    acc = sum(r.match for r in res) / len(res)
    assert acc >= 0.95  # tight clusters: neighbors share the label
    assert all(r.pred_label == r.true_label for r in res if r.match)


def test_knn_label_eval_tiebreak_deterministic(spark):
    # 1 query, k=2, two neighbors with different labels: vote ties at
    # 1-1 and must resolve to the SMALLEST label.
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [0.9, 0.1], 7),
        (2, [0.8, 0.2], 3),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = df.filter(F.col("vec_id") == 0)
    out = knn_label_eval(df, queries=q, k=2).collect()
    assert len(out) == 1 and out[0].pred_label == 3 and not out[0].match
