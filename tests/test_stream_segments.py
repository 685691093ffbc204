"""stream_segment_dedup: keep-first across micro-batches, state eviction."""

import datetime
import os

import pyspark.sql.functions as F
import pytest

from relationalize_spark.streaming.segments import stream_segment_dedup


#: slow lane (r10, r8 verdict item 7): exclude with -m "not slow" for
#: the fast mid-round loop; the full suite stays the end-of-round gate.
pytestmark = pytest.mark.slow


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, name, **kw):
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    kept = stream_segment_dedup(stream, "doc_id", "text", "ts", **kw)
    q = (
        kept.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).collect()


def test_keep_first_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    p1, p2 = "alpha beta gamma", "delta epsilon zeta"
    # batch 1: doc 1 carries both segments; batch 2: doc 2 repeats p1
    # (duplicate, must be dropped) and introduces p2... then a fresh p3
    _write_batch(spark, src, [(1, t0, f"{p1}\n\n{p2}")])
    _write_batch(
        spark, src,
        [(2, t0 + datetime.timedelta(minutes=5), f"{p1}\n\neta theta iota")],
    )
    rows = _run(spark, src, "segs_keepfirst", delimiter=r"\n\n",
                watermark="1 hour")
    segs = sorted(r.seg for r in rows)
    assert segs == sorted([p1, p2, "eta theta iota"])
    # the duplicate p1 arrival from doc 2 was suppressed
    assert {r.id for r in rows if r.seg == p1} == {1}


def test_watermark_bounded_state_contract(spark, tmp_path):
    # dropDuplicatesWithinWatermark GUARANTEES dedup only within the
    # watermark horizon; a far-later re-arrival MAY be re-admitted
    # (state evicted) or still suppressed (batching happened to keep
    # it) — both are within contract. What must hold: the first
    # arrival survives, and nothing else is lost.
    src = str(tmp_path / "docs2")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    _write_batch(spark, src, [(1, t0, "alpha beta gamma")])
    _write_batch(
        spark, src,
        [(2, t0 + datetime.timedelta(hours=10), "late stuff here")],
    )
    _write_batch(
        spark, src,
        [(3, t0 + datetime.timedelta(hours=10, minutes=1), "alpha beta gamma")],
    )
    rows = _run(spark, src, "segs_evict", delimiter=r"\n\n",
                watermark="1 hour")
    dup_ids = {r.id for r in rows if r.seg == "alpha beta gamma"}
    assert 1 in dup_ids and dup_ids <= {1, 3}
    assert {r.seg for r in rows} == {"alpha beta gamma", "late stuff here"}
