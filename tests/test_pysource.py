"""Python DataSource surface: the reference's Iterable[dict] contract
as a parallel batch source, and paginated REST listing as a
Structured Streaming source with checkpointed cursors."""

import json

import pyspark.sql.functions as F
import pytest

from relationalize_spark.sources.pysource import register
from relationalize_spark.sources.pysource_demo import (
    N_PAGES,
    N_USERS,
    PAGE_SIZE,
)

FACTORY = "relationalize_spark.sources.pysource_demo:make_users"
FETCH = "relationalize_spark.sources.pysource_demo:fetch_page"


def test_object_iterable_reads_all_shards(spark):
    register(spark)
    df = (
        spark.read.format("object_iterable")
        .option("factory", FACTORY)
        .option("numPartitions", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = [json.loads(r.value) for r in df.collect()]
    assert sorted(r["id"] for r in rows) == list(range(N_USERS))


def test_object_iterable_feeds_relationalize(spark):
    """The point of the source: it drops straight into the engine's
    VARIANT/relationalize pipeline with no file staging."""
    from relationalize_spark.operators.relationalize import relationalize

    register(spark)
    raw = (
        spark.read.format("object_iterable")
        .option("factory", FACTORY)
        .load()
    )
    typed = raw.select(
        F.from_json(
            "value", "id long, name string, tags array<string>, active boolean"
        ).alias("o")
    ).select("o.*")
    tables = relationalize(typed, "users", key_cols=["id"])
    assert tables["users"].count() == N_USERS
    assert tables["users_tags"].count() == N_USERS  # one tag per user


def test_rest_pages_stream_drains_all_pages(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("rest_pages")
        .option("fetch", FETCH)
        .option("maxPagesPerBatch", "2")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_pages_sink")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    # drain until the cursor stops advancing (Python micro-batch
    # streams don't support Trigger.AvailableNow)
    q.processAllAvailable()
    q.stop()
    rows = [json.loads(r.value) for r in spark.sql(
        "SELECT value FROM rest_pages_sink"
    ).collect()]
    assert sorted(r["seq"] for r in rows) == list(range(N_PAGES * PAGE_SIZE))
    # cursor advanced in 2-page micro-batches
    assert {r["page"] for r in rows} == set(range(N_PAGES))


def test_rest_pages_restart_is_exactly_once(spark, tmp_path):
    """Restarting against the same checkpoint must not re-emit
    consumed pages: the cursor offset lives in the checkpoint."""
    register(spark)
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out")

    def run():
        s = (
            spark.readStream.format("rest_pages")
            .option("fetch", FETCH)
            .load()
        )
        # file sink: the only built-in sink that supports checkpoint
        # recovery (memory sink refuses to restart from one)
        q = (
            s.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.read.json(out).count()

    assert run() == N_PAGES * PAGE_SIZE
    assert run() == N_PAGES * PAGE_SIZE  # restart re-emits nothing
