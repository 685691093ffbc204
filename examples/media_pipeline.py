"""Media curation pipeline: binaryFile scan -> real decode -> quality
filter -> resize -> feature parquet, all Arrow-batched.

The multimodal counterpart of training_data_pipeline.py: images
(netpbm/BMP, decoded for real in pure numpy) and audio (PCM WAV via
the stdlib codec) arrive as opaque binary rows from the binaryFile
source, get decoded/validated/featurized through mapInPandas, and
land as typed parquet a downstream trainer can scan without touching
the payload bytes again.

Scale notes: the scan parallelizes by file (compact tiny-file corpora
upstream); the length guard prunes oversized payloads on the listing
column before any bytes move; ids + payload are pruned to the Python
boundary; every decode failure becomes a NULL-featured row in the
rejects output rather than a job failure.

Usage:
    python examples/media_pipeline.py <media_dir> <out_dir>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, media_dir: str, out_dir: str,
        target_hw: tuple[int, int] = (32, 32), max_bytes: int = 50_000_000) -> dict:
    from relationalize_spark.operators.multimodal import (
        audio_features,
        decode_images,
        resize_images,
    )
    from relationalize_spark.sources.readers import read_binary_files

    images = read_binary_files(spark, media_dir, glob="*.{ppm,pgm,bmp}",
                               max_bytes=max_bytes)
    audio = read_binary_files(spark, media_dir, glob="*.wav",
                              max_bytes=max_bytes)

    img_meta = decode_images(
        images.select(F.col("path").alias("doc_id"), "content"),
        "content", ("doc_id",),
    )
    ok = img_meta.filter(F.col("format").isNotNull())
    rejects = img_meta.filter(F.col("format").isNull())
    resized = resize_images(
        images.join(ok.select("doc_id"), images.path == F.col("doc_id"), "left_semi")
        .select(F.col("path").alias("doc_id"), "content"),
        *target_hw, "content", ("doc_id",),
    )
    wav_feats = audio_features(
        audio.select(F.col("path").alias("doc_id"), "content"),
        "content", ("doc_id",),
    )

    ok.write.mode("overwrite").parquet(f"{out_dir}/image_meta")
    rejects.write.mode("overwrite").parquet(f"{out_dir}/image_rejects")
    resized.write.mode("overwrite").parquet(f"{out_dir}/image_rasters")
    wav_feats.write.mode("overwrite").parquet(f"{out_dir}/audio_features")
    return {
        "images_ok": ok.count(),
        "images_rejected": rejects.count(),
        "rasters": resized.count(),
        "audio": wav_feats.count(),
    }


if __name__ == "__main__":
    from relationalize_spark.plans.session import get_spark

    media_dir, out_dir = sys.argv[1], sys.argv[2]
    spark = get_spark(app="media-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    print(run(spark, media_dir, out_dir))
    spark.stop()
