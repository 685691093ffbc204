"""Media curation pipeline: binaryFile scan -> real decode -> quality
filter -> resize -> perceptual dedup -> feature parquet, all
Arrow-batched.

The multimodal counterpart of training_data_pipeline.py: images
(netpbm/BMP/baseline-JPEG, decoded for real in pure numpy), audio
(PCM WAV via the stdlib codec), and video (MJPEG-in-AVI keyframes
via the codec-free RIFF walk, r10/r11) arrive as opaque binary rows
from the binaryFile source, get decoded/validated/featurized through
mapInPandas, and land as typed parquet a downstream trainer can scan
without touching the payload bytes again. The r11 dedup lanes run
inline: dHash near-dup pairs over the decoded images, and
keyframe-evidence near-dup pairs over the videos.

Scale notes: the scan parallelizes by file (compact tiny-file corpora
upstream); the length guard prunes oversized payloads on the listing
column before any bytes move; ids + payload are pruned to the Python
boundary; every decode failure becomes a NULL-featured row in the
rejects output rather than a job failure; the near-dup joins are
band-bucket-bounded (see operators/dedup.py:hamming_dup_pairs for
the degenerate-bucket guidance — solid-color scans/intros are the
classic mega-bucket).

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

    images = read_binary_files(spark, media_dir,
                               glob="*.{ppm,pgm,bmp,jpg,jpeg}",
                               max_bytes=max_bytes)
    audio = read_binary_files(spark, media_dir, glob="*.wav",
                              max_bytes=max_bytes)
    videos = read_binary_files(spark, media_dir, glob="*.avi",
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

    # r11 dedup lanes: perceptual near-dup over the decoded images
    # (re-encodes/requantizations collapse), and keyframe-evidence
    # near-dup over the videos (real RIFF walk + in-container JPEG
    # decode feed the same dHash machinery)
    from relationalize_spark.operators.multimodal import (
        audio_dup_pairs,
        image_dup_pairs,
        video_dup_pairs,
    )

    img_dups = image_dup_pairs(
        images.select(F.col("path").alias("doc_id"), "content"),
        id_col="doc_id",
    )
    vid_dups = video_dup_pairs(
        videos.select(F.col("path").alias("doc_id"), "content"),
        id_col="doc_id",
    )
    aud_dups = audio_dup_pairs(
        audio.select(F.col("path").alias("doc_id"), "content"),
        id_col="doc_id",
    )

    outputs = {
        "images_ok": ("image_meta", ok),
        "images_rejected": ("image_rejects", rejects),
        "rasters": ("image_rasters", resized),
        "audio": ("audio_features", wav_feats),
        "image_dup_pairs": ("image_dups", img_dups),
        "video_dup_pairs": ("video_dups", vid_dups),
        "audio_dup_pairs": ("audio_dups", aud_dups),
    }
    counts = {}
    for key, (name, frame) in outputs.items():
        frame.write.mode("overwrite").parquet(f"{out_dir}/{name}")
        # count the WRITTEN parquet, not the lineage: every lane here
        # is a full decode (+ a banded self-join for the dup outputs)
        # and a lineage count would execute each twice (r11 review)
        counts[key] = spark.read.parquet(f"{out_dir}/{name}").count()
    return counts


if __name__ == "__main__":
    from relationalize_spark.plans.session import get_spark

    media_dir, out_dir = sys.argv[1], sys.argv[2]
    spark = get_spark(app="media-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    print(run(spark, media_dir, out_dir))
    spark.stop()
