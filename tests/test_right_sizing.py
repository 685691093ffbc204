"""Focused tests for the r11-opt sizing helpers: the iteration-fanout
right-sizer (plans.scale.right_size_partitions) and the streaming
backlog sizing inputs (queries._source_backlog_bytes /
queries._advisory_bytes / the _stream_state_parallelism clamp)."""

import os

import pytest

from relationalize_spark.plans.scale import right_size_partitions
from relationalize_spark.queries import (
    _advisory_bytes,
    _source_backlog_bytes,
    _stream_state_parallelism,
)


def test_right_size_coalesces_tiny_frames(spark):
    df = spark.range(100).repartition(8)
    sized = right_size_partitions(df, 100)
    assert sized.rdd.getNumPartitions() == 1


def test_right_size_fans_out_underparallel_frames(spark):
    df = spark.range(10).coalesce(1)
    # pretend the frame is huge: clamp lands on defaultParallelism
    sized = right_size_partitions(df, 10**9)
    assert (
        sized.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_right_size_noop_when_already_right(spark):
    df = spark.range(10).repartition(2)
    sized = right_size_partitions(df, 2 * 65_536)
    # already exactly ceil(n / rows_per_task): same frame, no node added
    assert sized is df


def test_right_size_intermediate_target(spark):
    df = spark.range(10).coalesce(1)
    sized = right_size_partitions(df, 3 * 65_536 + 1)
    assert sized.rdd.getNumPartitions() == 4


def test_backlog_bytes_files_and_dirs(tmp_path):
    f = tmp_path / "a.bin"
    f.write_bytes(b"x" * 1000)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"y" * 500)
    assert _source_backlog_bytes(str(f)) == 1000
    assert _source_backlog_bytes(str(tmp_path)) == 1500
    assert _source_backlog_bytes(str(tmp_path / "missing")) == 0
    assert _source_backlog_bytes(str(f), str(sub)) == 1500


def test_advisory_bytes_parses_units(spark):
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    try:
        for raw, want in [("64m", 64 * 1024**2), ("1g", 1024**3), ("131072k", 128 * 1024**2), ("1048576b", 1024**2)]:
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", raw)
            assert _advisory_bytes(spark) == want, raw
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)


def test_stream_state_parallelism_clamps_and_restores(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    adv = _advisory_bytes(spark)
    # tiny backlog -> 1 partition; huge -> defaultParallelism
    with _stream_state_parallelism(spark, source_bytes=10):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
        assert (
            spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
            == prev_nodata
        )
    with _stream_state_parallelism(
        spark,
        source_bytes=adv * spark.sparkContext.defaultParallelism * 10,
        skip_nodata_batch=True,
        output_mode="complete",
    ):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            spark.sparkContext.defaultParallelism
        )
        assert (
            spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
            == "false"
        )
    # both confs restored on exit
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert (
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
        == prev_nodata
    )


def test_stream_state_parallelism_guardrails(spark):
    """r12 (ADVICE r11): the skip-no-data-batch legality is asserted
    from declared sink semantics instead of call-site comments; a
    zero backlog warns and keeps defaultParallelism instead of
    silently serializing onto one state store; overlapping use fails
    loudly instead of cross-contaminating session conf."""
    import warnings

    import pytest

    # illegal: skip without declaration / append without on-arrival
    with pytest.raises(ValueError, match="skip_nodata_batch"):
        with _stream_state_parallelism(spark, skip_nodata_batch=True):
            pass
    with pytest.raises(ValueError, match="skip_nodata_batch"):
        with _stream_state_parallelism(
            spark, skip_nodata_batch=True, output_mode="append"
        ):
            pass
    # zero backlog (path typo / non-local source): warn, keep default
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        with _stream_state_parallelism(spark, source_bytes=0):
            assert spark.conf.get("spark.sql.shuffle.partitions") == str(
                spark.sparkContext.defaultParallelism
            )
    assert any("backlog is 0" in str(w.message) for w in caught)
    # non-reentrant: overlapping use raises rather than mis-restores
    with _stream_state_parallelism(spark, source_bytes=10):
        with pytest.raises(RuntimeError, match="not reentrant"):
            with _stream_state_parallelism(spark, source_bytes=10):
                pass
    # and the lock is released after a clean exit
    with _stream_state_parallelism(spark, source_bytes=10):
        pass


def test_stream_state_parallelism_none_keeps_default(spark):
    with _stream_state_parallelism(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            spark.sparkContext.defaultParallelism
        )
