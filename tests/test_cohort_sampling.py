"""cohort_retention and weighted_quota_sample contracts."""

import datetime

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.sampling import weighted_quota_sample
from relationalize_spark.operators.timeseries import cohort_retention

WEEK = 7 * 86400


def _ts(epoch_weeks, extra_s=0):
    return datetime.datetime.utcfromtimestamp(epoch_weeks * WEEK + extra_s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # cohort week 2700: users 1,2. user 1 returns weeks +1,+3;
        # user 2 returns week +1 (twice in the same week: one count).
        (1, _ts(2700, 10)),
        (2, _ts(2700, 20)),
        (1, _ts(2701)),
        (2, _ts(2701, 5)),
        (2, _ts(2701, 6)),
        (1, _ts(2703)),
        # cohort week 2702: user 3 only, never returns.
        (3, _ts(2702)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_cohort_matrix(spark, events):
    out = {
        (r.cohort_start, r.period_offset): r.n_users
        for r in cohort_retention(events, "user_id", "ts").collect()
    }
    c0 = _ts(2700)
    c2 = _ts(2702)
    assert out[(c0, 0)] == 2
    assert out[(c0, 1)] == 2  # same-week repeat visits count once
    assert out[(c0, 3)] == 1
    assert (c0, 2) not in out  # nobody active that week
    assert out[(c2, 0)] == 1
    assert len(out) == 4


def test_cohort_offsets_nonnegative(spark, events):
    rows = cohort_retention(events, "user_id", "ts").collect()
    assert all(r.period_offset >= 0 for r in rows)
    assert all(r.n_users >= 1 for r in rows)


def test_weighted_sample_exact_k_and_no_replacement(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = weighted_quota_sample(d, "source", 5, "n_chars")
    counts = out.groupBy("source").count().collect()
    sizes = {r.source: r.n for r in
             d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for r in counts:
        assert r["count"] == min(5, sizes[r.source])
    assert out.select("doc_id").distinct().count() == out.count()


def test_weighted_sample_prefers_heavy_rows(spark):
    # One row with weight 1000 vs 49 rows with weight 1: across many
    # seeds the heavy row must be selected far more often than any
    # light row would be (k=1 => P(heavy) ~ 1000/1049).
    rows = [(i, "g", 1000.0 if i == 0 else 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    hits = 0
    for seed in range(20):
        got = weighted_quota_sample(df, "g", 1, "w", seed=seed).collect()
        hits += got[0].doc_id == 0
    assert hits >= 15


def test_weighted_sample_zero_weight_excluded(spark):
    rows = [(1, "g", 0.0), (2, "g", 1.0), (3, "g", 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    kept = {r.doc_id for r in weighted_quota_sample(df, "g", 2, "w").collect()}
    assert kept == {2, 3}


def test_weighted_sample_deterministic_under_repartition(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id for r in weighted_quota_sample(d, "source", 7, "n_chars").collect()}
    b = {r.doc_id for r in
         weighted_quota_sample(d.repartition(11), "source", 7, "n_chars").collect()}
    assert a == b
