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


def test_weighted_quota_sample_large_weight_saturation(spark):
    """r11 ADVICE (characterization, not aspiration): once w >~ 1e9/n
    the 1e-9 priority lattice saturates (u^(1/w) -> 1 for every row)
    and ranking degrades to ascending-id order — the docstring's
    documented regime, with the prescribed rescale as the fix."""
    # weights ASCEND in id, all >> 23e9 (|ln u| <= ~23.1 for the
    # smallest representable u, so u^(1/w) > 1 - 1e-9 for EVERY row):
    # all priorities floor to exactly 999999999, ties everywhere, and
    # the id tiebreak picks the LOWEST ids — the OPPOSITE of weight
    # order, which would prefer ids 45..49.
    rows = [(i, "g", 1e12 * (i + 1)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    kept = sorted(
        r.doc_id for r in weighted_quota_sample(df, "g", 5, "w").collect()
    )
    assert kept == [0, 1, 2, 3, 4]  # id order, NOT weight order
    # the scale-free rescale (divide the group by max(w)) restores
    # weight-proportional behavior on the SAME relative weights: the
    # heaviest rows win most draws again.
    rescaled = df.withColumn("w", F.col("w") / F.lit(1e12 * 50))
    hits = 0
    for seed in range(10):
        got = weighted_quota_sample(rescaled, "g", 1, "w", seed=seed).collect()
        hits += got[0].doc_id >= 25  # heavy half holds ~75% of mass
    assert hits >= 6


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


def test_group_relative_filter_keeps_top_frac_per_group(spark):
    # Two groups with opposite score regimes: an absolute cutoff would
    # wipe out group b entirely; the relative filter keeps each
    # group's own top half.
    import pyspark.sql.functions as F

    from relationalize_spark.operators.sampling import group_relative_filter

    rows = [(i, "a", float(100 + i)) for i in range(10)] + [
        (100 + i, "b", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id int, grp string, s double")
    out = group_relative_filter(
        df, F.col("s"), ["grp"], keep_frac=0.5, id_col="doc_id"
    )
    got = {(r.grp, r.doc_id) for r in out.collect()}
    # top half by score desc = the 5 highest ids in a, 104..109 in b;
    # percent_rank = (rank-1)/9 <= 0.5 keeps ranks 1..5 plus rank 5.5
    # boundary: ranks with (rank-1)/9 <= 0.5 → rank <= 5.5 → 5 rows,
    # plus the 6th row has (6-1)/9 = 0.555 > 0.5 → excluded.
    want_a = {("a", i) for i in range(5, 10)}
    want_b = {("b", 100 + i) for i in range(5, 10)}
    assert got == want_a | want_b
    # singleton group survives (percent_rank 0)
    one = spark.createDataFrame([(1, "x", 0.0)], "doc_id int, grp string, s double")
    assert group_relative_filter(one, F.col("s"), ["grp"], 0.3).count() == 1
    # deterministic under ties: equal scores break by id
    ties = spark.createDataFrame(
        [(i, "t", 1.0) for i in range(4)], "doc_id int, grp string, s double"
    )
    kept = {
        r.doc_id
        for r in group_relative_filter(ties, F.col("s"), ["grp"], 0.5).collect()
    }
    assert kept == {0, 1}  # percent_rank 0, 1/3 <= 0.5; 2/3, 1 excluded


def test_group_relative_filter_collision_guards(spark):
    import pyspark.sql.functions as F
    import pytest as _pt

    from relationalize_spark.operators.sampling import group_relative_filter

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(4)], "doc_id int, grp string, s double"
    )
    # re-filtering a filtered frame regenerates pct_rank (no collision)
    once = group_relative_filter(df, F.col("s"), ["grp"], 0.75)
    twice = group_relative_filter(once, F.col("s"), ["grp"], 0.5)
    assert {r.doc_id for r in twice.collect()} == {3, 2}
    # the reserved internal name raises instead of misbehaving
    bad = df.withColumn("__score__", F.lit(1.0))
    with _pt.raises(ValueError, match="__score__"):
        group_relative_filter(bad, F.col("s"), ["grp"], 0.5)
    # a caller-owned pct_rank data column raises instead of being
    # silently destroyed (only the operator's own tagged pct_rank
    # takes the re-threshold path) — r9 ADVICE
    foreign = df.withColumn("pct_rank", F.lit(0.123))
    with _pt.raises(ValueError, match="pct_rank"):
        group_relative_filter(foreign, F.col("s"), ["grp"], 0.5)
