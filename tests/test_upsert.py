"""Partition-upsert sink: dynamic overwrite touches only the batch's
partitions; key-level merge replaces collisions within them."""

import pyspark.sql.functions as F

from relationalize_spark.sinks.upsert import (
    overwrite_partitions,
    recover_staged_upsert,
    staged_upsert_pending,
    upsert_keys,
    write_partitioned,
)


def _rows(spark, path):
    return {
        (r.k, r.day): r.v
        for r in spark.read.parquet(path).select("k", "day", "v").collect()
    }


def _base(spark):
    return spark.createDataFrame(
        [(i, f"d{i % 3}", i * 10) for i in range(30)], "k int, day string, v int"
    )


def test_overwrite_partitions_leaves_others_untouched(spark, tmp_path):
    path = str(tmp_path / "t")
    write_partitioned(_base(spark), path, ["day"])
    before = _rows(spark, path)

    patch = spark.createDataFrame([(999, "d1", -1)], "k int, day string, v int")
    overwrite_partitions(patch, path, ["day"])

    after = _rows(spark, path)
    # d1 replaced wholesale by the single patch row
    assert {kd for kd in after if kd[1] == "d1"} == {(999, "d1")}
    # d0/d2 byte-identical row sets
    for day in ("d0", "d2"):
        assert {kd: v for kd, v in after.items() if kd[1] == day} == {
            kd: v for kd, v in before.items() if kd[1] == day
        }


def test_upsert_keys_merges_within_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    write_partitioned(_base(spark), path, ["day"])

    batch = spark.createDataFrame(
        [(3, "d0", 777), (100, "d0", 888)], "k int, day string, v int"
    )
    upsert_keys(batch, path, "day", ["k", "day"])

    after = _rows(spark, path)
    assert after[(3, "d0")] == 777          # collision replaced
    assert after[(100, "d0")] == 888        # new key appended
    assert after[(6, "d0")] == 60           # same-partition survivor kept
    assert after[(1, "d1")] == 10           # untouched partition intact
    assert len(after) == 31


def test_upsert_staging_cleaned_after_success(spark, tmp_path):
    path = str(tmp_path / "t")
    write_partitioned(_base(spark), path, ["day"])
    batch = spark.createDataFrame([(3, "d0", 777)], "k int, day string, v int")
    upsert_keys(batch, path, "day", ["k", "day"])
    assert not staged_upsert_pending(spark, path)
    assert not (tmp_path / "t.__staging__").exists()


def test_upsert_recovers_from_failed_final_write(spark, tmp_path):
    """Simulate executor/job loss mid-overwrite: the staging copy is
    durable, so replaying the final write from it converges to the
    exact merged result even when a touched partition was left
    half-destroyed (the failure the pre-r4 localCheckpoint approach
    could not survive — its materialized rows die with the executors)."""
    import shutil

    path = str(tmp_path / "t")
    write_partitioned(_base(spark), path, ["day"])
    batch = spark.createDataFrame(
        [(3, "d0", 777), (100, "d0", 888)], "k int, day string, v int"
    )
    # Phase 1 only: write the staging copy (what upsert_keys stages).
    existing = spark.read.parquet(path).filter(F.col("day").isin(["d0"]))
    keep = existing.join(
        batch.select("k", "day").distinct(), on=["k", "day"], how="left_anti"
    )
    merged = keep.select(*batch.columns).unionByName(batch)
    merged.write.mode("overwrite").partitionBy("day").parquet(path + ".__staging__")
    # Simulate dying mid-overwrite: the d0 partition dir is truncated.
    shutil.rmtree(tmp_path / "t" / "day=d0")

    assert staged_upsert_pending(spark, path)
    recover_staged_upsert(spark, path, "day")
    after = _rows(spark, path)
    assert after[(3, "d0")] == 777
    assert after[(100, "d0")] == 888
    assert after[(6, "d0")] == 60
    assert after[(1, "d1")] == 10
    assert len(after) == 31
    assert not staged_upsert_pending(spark, path)


def test_upsert_preserves_noncanonical_partition_values(spark, tmp_path):
    """String partition values that LOOK numeric ('01', '1.10') must
    round-trip the staging read verbatim: partition-column type
    inference would normalize them ('01'->1), making the final
    overwrite write a differently-named partition directory and leave
    the old rows in place as duplicates. Regression for the r4
    advisory — upsert_keys now reads staging with an explicit schema,
    and crash recovery disables inference."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "01", 10), (2, "01", 20), (3, "1.10", 30)],
        "k int, day string, v int",
    )
    write_partitioned(base, path, ["day"])
    assert (tmp_path / "t" / "day=01").exists()

    batch = spark.createDataFrame([(1, "01", 111)], "k int, day string, v int")
    upsert_keys(batch, path, "day", ["k", "day"])

    # No normalized twin directory, and no duplicate key rows. (The
    # verification read pins the schema too — this test is about what
    # the SINK wrote, not about read-time inference.)
    def rows_pinned():
        return {
            (r.k, r.day): r.v
            for r in spark.read.schema("k int, v int, day string")
            .parquet(path)
            .collect()
        }

    assert (tmp_path / "t" / "day=01").exists()
    assert not (tmp_path / "t" / "day=1").exists()
    assert rows_pinned() == {(1, "01"): 111, (2, "01"): 20, (3, "1.10"): 30}

    # Crash-recovery lane: stage a merged copy by hand, then recover
    # WITHOUT a schema in hand — inference must stay disabled.
    batch2 = spark.createDataFrame([(2, "01", 222)], "k int, day string, v int")
    existing = (
        spark.read.schema("k int, v int, day string")
        .parquet(path)
        .filter(F.col("day").isin(["01"]))
    )
    keep = existing.join(
        batch2.select("k", "day").distinct(), on=["k", "day"], how="left_anti"
    )
    merged = keep.select(*batch2.columns).unionByName(batch2)
    merged.write.mode("overwrite").partitionBy("day").parquet(path + ".__staging__")
    recover_staged_upsert(spark, path, "day")
    assert not (tmp_path / "t" / "day=1").exists()
    assert rows_pinned() == {(1, "01"): 111, (2, "01"): 222, (3, "1.10"): 30}


def test_upsert_read_back_is_partition_pruned(spark, tmp_path):
    path = str(tmp_path / "t")
    write_partitioned(_base(spark), path, ["day"])
    pruned = spark.read.parquet(path).filter(F.col("day").isin(["d1"]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "d1" in plan, plan
    assert pruned.count() == 10


def test_streaming_foreachbatch_upsert(spark, tmp_path):
    """Incremental pipeline: a file stream upserts each micro-batch into
    a partitioned parquet table via foreachBatch — late re-sends of a
    key replace the old row instead of duplicating it, and only the
    batch's partitions are rewritten. This is the stock-Spark substitute
    for MERGE INTO on an ACID table."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    path = str(tmp_path / "table")

    base = spark.createDataFrame(
        [(1, "d0", 10), (2, "d0", 20), (3, "d1", 30)], "k int, day string, v int"
    )
    write_partitioned(base, path, ["day"])

    # batch 1: update k=1, add k=4 (both in d0); d1 untouched
    rows = [
        {"k": 1, "day": "d0", "v": 111},
        {"k": 4, "day": "d0", "v": 444},
    ]
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows))

    stream = spark.readStream.schema("k int, day string, v int").json(str(src))
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _bid: upsert_keys(batch, path, "day", ["k", "day"])
            if batch.count()
            else None
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    after = _rows(spark, path)
    assert after == {
        (1, "d0"): 111,
        (2, "d0"): 20,
        (4, "d0"): 444,
        (3, "d1"): 30,
    }
