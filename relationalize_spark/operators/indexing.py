"""Contiguous global row indexing without a global sort bottleneck.

The naive ``row_number() OVER (ORDER BY ...)`` (empty window partition)
funnels every row through ONE task — a non-starter at 100 TB. The
scalable formulation here:

1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order
   columns — one range shuffle, the same work a global sort does, but
   the data stays distributed.
2. A tiny per-partition count aggregate (``spark_partition_id``) —
   num_partitions rows to the driver, prefix-summed into offsets.
3. An Arrow-batched ``mapInPandas`` that enumerates each partition's
   rows and adds its offset — a streaming pass, no per-row Python.

The result is the same 0-based dense index ``ROW_NUMBER() OVER
(ORDER BY ...) - 1`` produces, verified against that oracle in the
driver gate (q97). The order columns must be a total order (include a
unique tiebreak column) for the index to be deterministic.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F


def add_global_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "idx",
    num_partitions: int | None = None,
) -> DataFrame:
    import pandas as pd

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)

    counts = (
        ranged.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["count"]

    # copy — StructType.add mutates in place, and DataFrame.schema is a
    # cached object shared with the DataFrame itself
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(ranged.schema.fields) + [StructField(index_col, LongType())]
    )

    def number(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = offsets.get(pid, 0)
        for b in batches:
            b[index_col] = range(seen, seen + len(b))
            seen += len(b)
            yield b

    return ranged.mapInPandas(number, out_schema)
