"""The benchmark parquet has shipped ``events.ts`` as INT64
TIMESTAMP(NANOS), TIMESTAMP adjusted-to-UTC, and TIMESTAMP_NTZ across
regenerations (round 2's driver run broke on the NTZ flip). Every
timestamp-sensitive operator must read all three encodings
identically — wall clock taken as the UTC instant, matching how
DuckDB evaluates ``epoch_us`` over the same files.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from relationalize_spark.functions.timeutil import (
    as_instant,
    col_epoch_micros,
    epoch_micros,
    micros_to_timestamp,
)
from relationalize_spark.queries import (
    q02_hypertable_rollup,
    q17_events_hourly,
    q18_sessionization,
    q54_streaming_windowed_counts,
    q85_rolling_time_window,
)

ENCODINGS = ("ntz", "ltz", "nanos")


@pytest.fixture(scope="module")
def encoded_dirs(spark, sf_dir, tmp_path_factory):
    """The same 2000 events written under each physical ts encoding,
    as single parquet FILES named events.parquet (the driver's layout
    — the streaming reader's pathGlobFilter depends on it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).limit(2000)
    if not isinstance(base.schema["ts"].dataType, T.TimestampNTZType):
        base = base.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    pdf = base.toPandas()  # ts: naive datetime64[ns]
    variants = {
        "ntz": pdf,
        "ltz": pdf.assign(ts=pdf["ts"].dt.tz_localize("UTC")),
        "nanos": pdf.assign(ts=pdf["ts"].astype("int64")),
    }
    dirs = {}
    for name, frame in variants.items():
        d = tmp_path_factory.mktemp(f"enc_{name}")
        pq.write_table(
            pa.Table.from_pandas(frame, preserve_index=False),
            str(d / "events.parquet"),
            coerce_timestamps="us",
        )
        dirs[name] = str(d)
    return dirs


def _rows(df):
    return sorted(map(str, df.collect()))


@pytest.mark.parametrize(
    "query",
    [q02_hypertable_rollup, q17_events_hourly, q18_sessionization,
     q85_rolling_time_window],
    ids=lambda q: q.__name__,
)
def test_batch_queries_agree_across_encodings(spark, encoded_dirs, query):
    results = {}
    for name, d in encoded_dirs.items():
        df = query(spark, d)
        # Timestamp outputs differ only in flavor (NTZ wall vs UTC
        # instant); normalize to instants before comparing values.
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampNTZType):
                df = df.withColumn(f.name, as_instant(F.col(f.name), f.dataType))
        results[name] = _rows(df)
    assert results["ntz"] == results["ltz"] == results["nanos"]


def test_streaming_watermark_runs_on_every_encoding(spark, encoded_dirs):
    for d in encoded_dirs.values():
        n = q54_streaming_windowed_counts(spark, d).count()
        assert n > 0


def test_epoch_micros_round_trip(spark):
    df = spark.range(3).select(
        F.timestamp_micros(F.col("id") * 987_654_321_000).alias("ltz")
    ).withColumn("ntz", F.col("ltz").cast("timestamp_ntz"))
    out = df.select(
        epoch_micros(F.col("ltz"), T.TimestampType()).alias("a"),
        epoch_micros(F.col("ntz"), T.TimestampNTZType()).alias("b"),
        micros_to_timestamp(
            epoch_micros(F.col("ntz"), T.TimestampNTZType()), T.TimestampNTZType()
        ).alias("rt_ntz"),
        micros_to_timestamp(
            epoch_micros(F.col("ltz"), T.TimestampType())
        ).alias("rt_ltz"),
    ).collect()
    for r in out:
        assert r.a == r.b
    rt = df.select(
        (F.col("ntz") == micros_to_timestamp(
            epoch_micros(F.col("ntz"), T.TimestampNTZType()), T.TimestampNTZType()
        )).alias("ok_ntz"),
        (F.col("ltz") == micros_to_timestamp(
            epoch_micros(F.col("ltz"), T.TimestampType())
        )).alias("ok_ltz"),
    ).collect()
    assert all(r.ok_ntz and r.ok_ltz for r in rt)


def test_col_epoch_micros_resolves_schema(spark, sf_dir):
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    assert e.select(col_epoch_micros(e, "ts").alias("us")).first().us > 0


def test_epoch_round_trip_randomized_batch(spark):
    """2000 random epoch-microsecond instants (1900-2100, including
    negative epochs and odd microsecond remainders) through both
    flavors: epoch_micros(micros_to_timestamp(us)) == us, and the NTZ
    wall clock equals the LTZ UTC instant reading."""
    lo, hi = -2_208_988_800_000_000, 4_102_444_800_000_000  # 1900..2100
    df = (
        spark.range(2000)
        .select(
            (
                (F.xxhash64(F.col("id")) % F.lit(hi - lo) + F.lit(hi - lo))
                % F.lit(hi - lo) + F.lit(lo)
            ).alias("us")
        )
        .select(
            "us",
            micros_to_timestamp(F.col("us")).alias("ltz"),
            micros_to_timestamp(F.col("us"), T.TimestampNTZType()).alias("ntz"),
        )
        .select(
            "us",
            epoch_micros(F.col("ltz"), T.TimestampType()).alias("us_ltz"),
            epoch_micros(F.col("ntz"), T.TimestampNTZType()).alias("us_ntz"),
        )
    )
    bad = df.filter(
        (F.col("us_ltz") != F.col("us")) | (F.col("us_ntz") != F.col("us"))
    ).count()
    assert bad == 0
