"""As-of and range join operator semantics."""

import datetime

import pyspark.sql.functions as F

from relationalize_spark.operators.asof import asof_join, range_bucket_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def make(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01 10:00:00")),
            (2, "u1", ts("2024-01-01 12:00:00")),
            (3, "u1", ts("2024-01-01 09:00:00")),  # before any right row
            (4, "u2", ts("2024-01-01 10:30:00")),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01 10:00:00"), 100.0),  # exact tie with event 1
            ("u1", ts("2024-01-01 11:00:00"), 200.0),
            ("u2", ts("2024-01-01 08:00:00"), 50.0),
        ],
        "user_id string, ts timestamp, price double",
    )
    return left, right


def test_asof_backward_with_ties(spark):
    left, right = make(spark)
    out = {
        r.event_id: (r.price, r.ts_asof)
        for r in asof_join(left, right, on="user_id", ts="ts").collect()
    }
    assert out[1] == (100.0, ts("2024-01-01 10:00:00"))  # <= includes ties
    assert out[2] == (200.0, ts("2024-01-01 11:00:00"))  # latest wins
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (50.0, ts("2024-01-01 08:00:00"))


def test_asof_tolerance(spark):
    left, right = make(spark)
    out = {
        r.event_id: r.price
        for r in asof_join(
            left,
            right,
            on="user_id",
            ts="ts",
            tolerance=F.expr("INTERVAL 90 MINUTES"),
        ).collect()
    }
    assert out[1] == 100.0  # 0 min old
    assert out[2] == 200.0  # 60 min old
    assert out[4] is None  # 150 min old: outside tolerance


def test_asof_name_collision_suffix(spark):
    left, right = make(spark)
    left2 = left.withColumn("price", F.lit(-1.0))
    row = (
        asof_join(left2, right, on="user_id", ts="ts")
        .filter(F.col("event_id") == 2)
        .collect()[0]
    )
    assert row.price == -1.0  # left column untouched
    assert row.price_asof == 200.0


def test_asof_null_value_column_is_row_atomic(spark):
    """The matched right row is carried atomically: a NULL value
    column on the matching row must NOT be back-filled from an older
    right row (the exact scenario from round-1 ADVICE)."""
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01 08:00:00"), 100.0, "old"),
            ("u1", ts("2024-01-01 09:00:00"), None, "new"),
        ],
        "user_id string, ts timestamp, price double, src string",
    )
    row = asof_join(left, right, on="user_id", ts="ts").collect()[0]
    assert row.ts_asof == ts("2024-01-01 09:00:00")
    assert row.src == "new"
    assert row.price is None  # from the matched row, not back-filled


def test_asof_forward(spark):
    left, right = make(spark)
    out = {
        r.event_id: (r.price, r.ts_asof)
        for r in asof_join(
            left, right, on="user_id", ts="ts", direction="forward"
        ).collect()
    }
    assert out[1] == (100.0, ts("2024-01-01 10:00:00"))  # >= includes ties
    assert out[2] == (None, None)  # nothing at-or-after
    assert out[3] == (100.0, ts("2024-01-01 10:00:00"))  # first ahead
    assert out[4] == (None, None)  # u2's only row is behind


def test_asof_forward_tolerance(spark):
    left, right = make(spark)
    out = {
        r.event_id: r.price
        for r in asof_join(
            left,
            right,
            on="user_id",
            ts="ts",
            direction="forward",
            tolerance=F.expr("INTERVAL 30 MINUTES"),
        ).collect()
    }
    assert out[1] == 100.0  # 0 min ahead
    assert out[3] is None  # 60 min ahead: outside tolerance


def test_asof_nearest_prefers_backward_on_tie(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts("2024-01-01 09:00:00"), 1.0),  # 60 min before
            ("u1", ts("2024-01-01 11:00:00"), 2.0),  # 60 min after: tie
        ],
        "user_id string, ts timestamp, price double",
    )
    row = asof_join(
        left, right, on="user_id", ts="ts", direction="nearest"
    ).collect()[0]
    assert row.price == 1.0  # pandas merge_asof tie rule: backward


def test_asof_nearest_picks_closer_side(spark):
    left, right = make(spark)
    out = {
        r.event_id: r.price
        for r in asof_join(
            left, right, on="user_id", ts="ts", direction="nearest"
        ).collect()
    }
    assert out[2] == 200.0  # 11:00 behind by 60m beats nothing ahead
    assert out[3] == 100.0  # 10:00 ahead by 60m beats nothing behind
    assert out[4] == 50.0


def test_range_bucket_join(spark):
    fact = spark.createDataFrame(
        [(1, 10.0), (2, 75.0), (3, 999.0)], "id long, value double"
    )
    buckets = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 100.0, "mid")], "lo double, hi double, label string"
    )
    out = {r.id: r.label for r in range_bucket_join(fact, buckets, "value").collect()}
    assert out == {1: "low", 2: "mid", 3: None}
