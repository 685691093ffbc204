"""SCD2 history building, snapshot CDC, and incremental merge."""

import datetime

import pyspark.sql.functions as F
import pytest

from relationalize_spark.operators.scd2 import (
    scd2_from_snapshots,
    scd2_lookup,
    scd2_merge,
    snapshot_diff,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def snapshots(spark):
    rows = [
        # key 1: A, A, B, B, A  -> three versions
        (1, "A", _ts("2024-01-01")),
        (1, "A", _ts("2024-02-01")),
        (1, "B", _ts("2024-03-01")),
        (1, "B", _ts("2024-04-01")),
        (1, "A", _ts("2024-05-01")),
        # key 2: NULL -> X (a change), X
        (2, None, _ts("2024-01-15")),
        (2, "X", _ts("2024-02-15")),
        (2, "X", _ts("2024-03-15")),
        # key 3: single snapshot
        (3, "Z", _ts("2024-06-01")),
    ]
    return spark.createDataFrame(rows, "k int, attr string, ts timestamp")


def test_scd2_runs_collapse(spark, snapshots):
    hist = scd2_from_snapshots(snapshots, ["k"], ["attr"], "ts").collect()
    k1 = sorted([r for r in hist if r.k == 1], key=lambda r: r.valid_from)
    assert [r.attr for r in k1] == ["A", "B", "A"]
    assert k1[0].valid_from == _ts("2024-01-01")
    assert k1[0].valid_to == _ts("2024-03-01")  # next run start
    assert not k1[0].is_current and not k1[1].is_current and k1[2].is_current
    assert k1[2].valid_to.year == 9999


def test_scd2_null_to_value_is_a_change(spark, snapshots):
    hist = [r for r in scd2_from_snapshots(
        snapshots, ["k"], ["attr"], "ts").collect() if r.k == 2]
    assert len(hist) == 2
    assert {r.attr for r in hist} == {None, "X"}
    cur = [r for r in hist if r.is_current]
    assert len(cur) == 1 and cur[0].attr == "X"


def test_scd2_single_snapshot_is_current(spark, snapshots):
    hist = [r for r in scd2_from_snapshots(
        snapshots, ["k"], ["attr"], "ts").collect() if r.k == 3]
    assert len(hist) == 1 and hist[0].is_current


def test_scd2_duplicate_ts_is_deterministic(spark):
    """Duplicate (key, ts) snapshots: lag/row_number peers are ordered
    by the tracked-column tiebreak and the running sum uses a ROWS
    frame, so the history is a pure function of the input set —
    identical across repartitions/reruns (pre-fix the RANGE frame let
    ts-peers share run numbers nondeterministically; ADVICE r3)."""
    rows = [
        (1, "B", _ts("2024-01-01")),
        (1, "A", _ts("2024-01-01")),  # same instant, different state
        (1, "A", _ts("2024-02-01")),
        (1, "C", _ts("2024-02-01")),
        (1, "C", _ts("2024-03-01")),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp")
    a = sorted(map(tuple, scd2_from_snapshots(df, ["k"], ["attr"], "ts").collect()))
    for n in (1, 3, 5):
        b = sorted(map(tuple, scd2_from_snapshots(
            df.repartition(n), ["k"], ["attr"], "ts").collect()))
        assert a == b
    # lexical tiebreak orders same-instant states ascending, so the
    # snapshot sequence is A,B @01-01; A,C @02-01; C @03-01 -> four
    # runs (same-instant conflicts become zero-length intervals):
    hist = sorted(
        ((r.attr, r.valid_from, r.valid_to, r.is_current) for r in
         scd2_from_snapshots(df, ["k"], ["attr"], "ts").collect()),
        key=lambda t: (t[1], t[0]),
    )
    assert [h[0] for h in hist] == ["A", "B", "A", "C"]
    assert hist[3][3] and not any(h[3] for h in hist[:3])


def test_scd2_lookup_point_in_time(spark):
    """Facts get the version valid AT their timestamp: before the
    first version -> NULL; inside a version -> its value; at a
    boundary -> the newly-opened version (valid_from inclusive,
    valid_to exclusive); unknown keys -> NULL. A gapped history
    (valid_to before the next valid_from) yields NULL in the gap."""
    dim = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01"), _ts("2024-02-01"), False),
            # gap: nothing valid in [02-01, 03-01)
            (1, "B", _ts("2024-03-01"), _ts("9999-12-31"), True),
        ],
        "k int, state string, valid_from timestamp, valid_to timestamp,"
        " is_current boolean",
    )
    facts = spark.createDataFrame(
        [
            (10, 1, _ts("2023-12-25")),  # before first version
            (11, 1, _ts("2024-01-15")),  # inside A
            (12, 1, _ts("2024-02-01")),  # boundary: A closed, gap begins
            (13, 1, _ts("2024-02-15")),  # in the gap
            (14, 1, _ts("2024-03-01")),  # boundary: B opens (inclusive)
            (15, 2, _ts("2024-01-15")),  # unknown key
        ],
        "fid int, k int, ts timestamp",
    )
    out = {r.fid: r.state for r in scd2_lookup(
        facts, dim, ["k"], "ts", value_cols=["state"]
    ).collect()}
    assert out == {10: None, 11: "A", 12: None, 13: None, 14: "B", 15: None}


def test_snapshot_diff_null_key_row_not_misclassified(spark):
    """A row whose key column is legitimately NULL matches across
    snapshots via eqNullSafe; presence must come from explicit
    side markers, not key nullness (pre-fix an unchanged NULL-key
    row came out as 'insert'; ADVICE r3)."""
    old = spark.createDataFrame(
        [(None, "a", 1), (2, "b", 2)], "k int, v string, n int"
    )
    new_same = spark.createDataFrame(
        [(None, "a", 1), (2, "b", 2)], "k int, v string, n int"
    )
    assert snapshot_diff(old, new_same, ["k"]).count() == 0
    new_changed = spark.createDataFrame(
        [(None, "A", 1), (2, "b", 2)], "k int, v string, n int"
    )
    out = snapshot_diff(old, new_changed, ["k"]).collect()
    assert len(out) == 1 and out[0].change == "update" and out[0].k is None


def test_snapshot_diff_kinds(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, v string, n int"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)], "k int, v string, n int"
    )
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(out) == {2, 3, 4}
    assert out[2].change == "update" and out[2].v == "B"
    assert out[3].change == "delete" and out[3].v is None
    assert out[4].change == "insert" and out[4].n == 40


def test_snapshot_diff_null_value_transitions(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "k int, v string")
    out = {r.k: r.change for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "update", 2: "update"}


def test_merge_equals_batch_history(spark, snapshots):
    """Applying snapshots incrementally through diff+merge reproduces
    the all-at-once history exactly — the operator family's core
    contract."""
    ts_list = sorted(r.ts for r in snapshots.select("ts").distinct().collect())
    first = snapshots.where(F.col("ts") == ts_list[0])
    dim = scd2_from_snapshots(first, ["k"], ["attr"], "ts")
    prev = first.select("k", "attr")
    for t in ts_list[1:]:
        # snapshot state as of t: latest attr per key up to t
        upto = snapshots.where(F.col("ts") <= t)
        latest = upto.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("k").orderBy(
                    F.col("ts").desc()
                )
            ),
        ).where("rn = 1").select("k", "attr")
        changes = snapshot_diff(prev, latest, ["k"])
        dim = scd2_merge(dim, changes, ["k"], ["attr"], F.lit(t))
        # materialize per step: the union-of-joins plan would
        # otherwise nest once per snapshot and blow up analysis
        dim = spark.createDataFrame(dim.collect(), dim.schema)
        prev = latest
    batch = scd2_from_snapshots(snapshots, ["k"], ["attr"], "ts")
    got = sorted(dim.collect(), key=lambda r: (r.k, r.valid_from))
    want = sorted(batch.collect(), key=lambda r: (r.k, r.valid_from))
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_merge_delete_closes_without_reopening(spark):
    dim = scd2_from_snapshots(
        spark.createDataFrame([(1, "a", _ts("2024-01-01"))], "k int, v string, ts timestamp"),
        ["k"], ["v"], "ts",
    )
    changes = spark.createDataFrame([(1, None, "delete")], "k int, v string, change string")
    merged = scd2_merge(dim, changes, ["k"], ["v"], F.lit(_ts("2024-02-01"))).collect()
    assert len(merged) == 1
    assert not merged[0].is_current and merged[0].valid_to == _ts("2024-02-01")


def test_merge_leaves_history_untouched(spark):
    snaps = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01")), (1, "b", _ts("2024-02-01"))],
        "k int, v string, ts timestamp",
    )
    dim = scd2_from_snapshots(snaps, ["k"], ["v"], "ts")
    changes = spark.createDataFrame([(1, "c", "update")], "k int, v string, change string")
    merged = scd2_merge(dim, changes, ["k"], ["v"], F.lit(_ts("2024-03-01")))
    rows = sorted(merged.collect(), key=lambda r: r.valid_from)
    assert [r.v for r in rows] == ["a", "b", "c"]
    assert rows[0].valid_to == _ts("2024-02-01")  # unchanged history row
    assert rows[1].valid_to == _ts("2024-03-01")  # closed by merge
    assert rows[2].is_current
