"""funnel_steps: ordered completion semantics on hand-built sequences."""

import datetime

import pytest

from relationalize_spark.operators.funnel import funnel_steps


def _t(m):
    return datetime.datetime(2024, 1, 1, 12, m, 0)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: full ordered funnel A -> B -> C
        (1, _t(0), "A"), (1, _t(1), "B"), (1, _t(2), "C"),
        # user 2: B arrives BEFORE A — only A counts
        (2, _t(0), "B"), (2, _t(1), "A"),
        # user 3: A then C (skips B) — C must NOT count
        (3, _t(0), "A"), (3, _t(5), "C"),
        # user 4: never starts (only C events)
        (4, _t(0), "C"), (4, _t(1), "C"),
        # user 5: A, then B at the SAME timestamp as A — strict
        # "after" means B does not count
        (5, _t(0), "A"), (5, _t(0), "B"),
        # user 6: A, B, then a later second B, then C — completes
        (6, _t(0), "A"), (6, _t(1), "B"), (6, _t(2), "B"), (6, _t(3), "C"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, et string")


def test_ordered_funnel_counts(spark, events):
    out = {r.step: (r.event_type, r.n_users) for r in funnel_steps(
        events, "user_id", "ts", "et", ["A", "B", "C"]).collect()}
    assert out[1] == ("A", 5)  # users 1,2,3,5,6
    assert out[2] == ("B", 2)  # users 1,6 (user 2 out-of-order, 5 tied)
    assert out[3] == ("C", 2)  # users 1,6 (user 3 skipped B)


def test_two_step_matches_q51_shape(spark, events):
    out = {r.step: r.n_users for r in funnel_steps(
        events, "user_id", "ts", "et", ["A", "C"]).collect()}
    assert out[1] == 5
    assert out[2] == 3  # users 1, 3, 6 (A then any later C)


def test_duplicate_steps_rejected(spark, events):
    with pytest.raises(ValueError):
        funnel_steps(events, "user_id", "ts", "et", ["A", "A"])


def test_single_shuffle_plan(spark, events):
    plan = funnel_steps(events, "user_id", "ts", "et", ["A", "B", "C"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # one exchange for the per-user fold + one for the k-row step agg
    assert plan.count("Exchange hashpartitioning") <= 2
