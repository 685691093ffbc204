"""Incremental partition upsert over a plain parquet directory.

The batch-pipeline pattern the reference's load step implies (drop +
reload a warehouse table per run, reference examples
full_pokemon_psql_pipeline.py:118-135) does not survive 100 TB: a full
rewrite of a petabyte table to update one day of data is a non-starter.
The scalable form is *dynamic partition overwrite*: write only the
partitions present in the incoming batch, atomically replacing those
directories and leaving every other partition untouched. No Delta/
Iceberg dependency — this is stock Spark
(``spark.sql.sources.partitionOverwriteMode=dynamic``) over a
Hive-layout parquet directory, which is exactly what an incremental
backfill or a late-arriving-day correction needs.

``upsert_keys`` adds merge semantics on top for within-partition key
collisions: the touched partitions are read back, old rows whose keys
appear in the batch are dropped, and the union is rewritten — still
only for the touched partitions. The read-back is partition-pruned
(the ``isin`` filter on the partition column reaches the scan), so
cost scales with the batch's partitions, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Initial full write in Hive partition layout (dir-per-value)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Replace ONLY the partitions present in ``df``; all other
    partitions of ``path`` are left byte-identical (dynamic mode —
    static mode would truncate the whole table)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def upsert_keys(
    batch: DataFrame,
    path: str,
    partition_col: str,
    key_cols: list[str],
) -> None:
    """Merge ``batch`` into the partitioned table at ``path``: within
    each touched partition, rows whose ``key_cols`` match a batch row
    are replaced; untouched partitions are not read or written.

    The anti-join runs only over the touched partitions (partition
    pruning via the ``isin`` filter), and the rewrite is the dynamic
    partition overwrite of exactly those partitions.
    """
    spark = batch.sparkSession
    parts = [r[0] for r in batch.select(partition_col).distinct().collect()]
    existing = spark.read.parquet(path).filter(F.col(partition_col).isin(parts))
    keep = existing.join(
        batch.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    merged = keep.select(*batch.columns).unionByName(batch)
    # localCheckpoint materializes the merged rows BEFORE the overwrite
    # truncates the very partitions the plan reads (self-overwrite trap).
    overwrite_partitions(
        merged.localCheckpoint(eager=True), path, [partition_col]
    )
