"""Gap fill + linear interpolation onto a fixed grid
(operators/timeseries.py)."""

import datetime as dt
import math

from relationalize_spark.operators.timeseries import TS_FP, gapfill_interpolate


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gapfill_interpolates_between_observed_buckets(spark):
    rows = [
        (1, _ts(0, 10), 10.0),
        (1, _ts(0, 50), 20.0),   # same bucket as above -> mean 15
        (1, _ts(3, 5), 45.0),    # buckets 1,2 missing -> interpolated
        (2, _ts(5, 0), 7.5),     # singleton key: one observed bucket
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {
        (r.user_id, r.bucket_start): (r.n_obs, r.value, r.src)
        for r in gapfill_interpolate(
            df, "user_id", "ts", "value", step_s=3600
        ).collect()
    }
    b0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert out[(1, b0)] == (2, 15.0, "observed")
    # linear ramp 15 -> 45 over 3 steps: 25 at +1h, 35 at +2h
    assert out[(1, b0 + 3600)] == (0, 25.0, "interp")
    assert out[(1, b0 + 7200)] == (0, 35.0, "interp")
    assert out[(1, b0 + 10800)] == (1, 45.0, "observed")
    assert out[(2, b0 + 5 * 3600)] == (1, 7.5, "observed")
    assert len(out) == 5


def test_gapfill_holes_interpolate_on_lattice(spark):
    # one-sided holes cannot occur (grid spans each key's observed
    # [lo, hi], so every hole has neighbors on both sides — the dead
    # locf/nocb branches were trimmed per r9 ADVICE); verify every
    # in-range hole interpolates and the quantization floors onto
    # the lattice.
    rows = [(1, _ts(0), 1.0), (1, _ts(2), 2.0)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, value double")
    got = {r.bucket_start: r for r in gapfill_interpolate(df, "k", "ts", "value").collect()}
    mid = sorted(got)[1]
    r = got[mid]
    assert r.src == "interp" and r.n_obs == 0
    assert r.value == math.floor(1.5 * TS_FP) / TS_FP


def test_gapfill_null_values_do_not_anchor_grid(spark):
    # r10 review: a bucket whose only rows carry NULL values must not
    # count as "observed" — pre-filter, it anchored the grid edge
    # with oq=NULL and produced value=NULL/src='interp' (a one-sided
    # hole the trimmed locf/nocb branches no longer cover). With the
    # filter, NULL-valued rows are invisible: the grid spans only
    # VALUED buckets and every hole interpolates.
    rows = [
        (1, _ts(0), None),    # all-NULL leading bucket: dropped
        (1, _ts(2), 2.0),
        (1, _ts(3), None),    # NULL inside a valued stream: dropped
        (1, _ts(4), 4.0),
        (1, _ts(6), None),    # all-NULL trailing bucket: dropped
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, value double")
    got = {r.bucket_start: r for r in
           gapfill_interpolate(df, "k", "ts", "value").collect()}
    b2 = int(_ts(2).replace(tzinfo=dt.timezone.utc).timestamp())
    assert sorted(got) == [b2, b2 + 3600, b2 + 7200]  # 2h..4h only
    assert got[b2].value == 2.0 and got[b2].src == "observed"
    mid = got[b2 + 3600]
    assert mid.src == "interp" and mid.n_obs == 0 and mid.value == 3.0
    assert got[b2 + 7200].value == 4.0
    assert all(r.value is not None for r in got.values())


def test_gapfill_deterministic_under_repartition(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i % 5, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randrange(0, 5000)), rng.uniform(-10, 10))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, value double")
    a = sorted(map(tuple, gapfill_interpolate(df, "k", "ts", "value").collect()))
    b = sorted(map(tuple, gapfill_interpolate(df.repartition(13), "k", "ts", "value").collect()))
    assert a == b
