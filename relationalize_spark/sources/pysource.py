"""Spark-4 Python DataSources for the reference's input contracts.

The reference consumes exactly one input abstraction — an
``Iterable[dict]`` of JSON objects (reference relationalize.py:48-55)
— and its external examples walk paginated REST listings and Mongo
exports into that shape (``sources/external.py`` wraps those as
driver-side exports). This module lifts both contracts to first-class
Spark sources via the Python DataSource API (``pyspark.sql.
datasource``, Spark 4), so they compose with everything
``spark.read`` / ``readStream`` can do instead of staging through
files:

- ``ObjectIterableDataSource`` (format ``"object_iterable"``): a
  PARALLEL batch source over any importable generator factory.
  ``factory`` is a ``module:function`` path resolved on the
  executors; Spark plans ``numPartitions`` partitions and each
  executor-side reader calls ``factory(partition_id, num_partitions)``
  and streams its dicts — the reference's iterable contract, sharded.
  Rows surface as one ``value STRING`` JSON column, feeding the same
  VARIANT pipeline as the JSONL reader (type-faithful inference
  happens there, not here).

- ``RestPagesDataSource`` (format ``"rest_pages"``): a Structured
  Streaming source over a paginated listing API. The page cursor IS
  the streaming offset (``SimpleDataSourceStreamReader`` — pagination
  is inherently sequential, which is exactly the lightweight
  driver-side regime that API targets); each micro-batch drains the
  pages available since the last checkpointed cursor, giving
  exactly-once page consumption across restarts for free from the
  checkpoint. ``fetch`` is a ``module:function`` path:
  ``fetch(cursor: int) -> (rows: list[dict], next_cursor: int | None)``.

Both factories must be importable where they run (a real deployment
ships them in the job's wheel) — the same injectable-callable
discipline ``sources/external.py`` uses, made serialization-safe.
"""

from __future__ import annotations

import importlib
import json
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType


def _resolve(path: str):
    mod, _, fn = path.partition(":")
    if not fn:
        raise ValueError(
            f"factory {path!r} must be 'module:function' (importable on executors)"
        )
    return getattr(importlib.import_module(mod), fn)


_VALUE_SCHEMA = StructType([StructField("value", StringType())])


class _ObjectIterableReader(DataSourceReader):
    def __init__(self, options):
        self.factory_path = options["factory"]
        self.num_partitions = int(options.get("numpartitions", "4"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition) -> Iterator[Tuple]:
        factory = _resolve(self.factory_path)
        for obj in factory(partition.value, self.num_partitions):
            yield (json.dumps(obj, default=str),)


class ObjectIterableDataSource(DataSource):
    """``spark.read.format("object_iterable")
    .option("factory", "pkg.mod:make_objects")
    .option("numPartitions", "8").load()``"""

    @classmethod
    def name(cls) -> str:
        return "object_iterable"

    def schema(self):
        return _VALUE_SCHEMA

    def reader(self, schema):
        return _ObjectIterableReader(self.options)


class _RestPagesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.fetch_path = options["fetch"]
        self.max_pages = int(options.get("maxpagesperbatch", "10"))

    def initialOffset(self) -> dict:
        return {"cursor": 0}

    @staticmethod
    def _advance(cursor: int, nxt: int | None) -> int:
        # The streaming contract requires a non-empty batch's end
        # offset to land PAST its last record — including the final
        # page (nxt is None) and a misbehaving API that repeats a
        # cursor.
        return nxt if nxt is not None and nxt > cursor else cursor + 1

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        fetch = _resolve(self.fetch_path)
        cursor = start["cursor"]
        rows: list[Tuple] = []
        for _ in range(self.max_pages):
            page, nxt = fetch(cursor)
            if not page and nxt is None:
                break  # listing exhausted: empty batch, offset unchanged
            rows.extend((json.dumps(obj, default=str),) for obj in page)
            cursor = self._advance(cursor, nxt)
            if nxt is None:
                break
        return iter(rows), {"cursor": cursor}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # Deterministic replay for recovery: a cursor API serves the
        # same pages for the same cursors.
        fetch = _resolve(self.fetch_path)
        cursor = start["cursor"]
        while cursor < end["cursor"]:
            page, nxt = fetch(cursor)
            if not page and nxt is None:
                break
            for obj in page:
                yield (json.dumps(obj, default=str),)
            cursor = self._advance(cursor, nxt)
            if nxt is None:
                break

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge; checkpoint is the record


class RestPagesDataSource(DataSource):
    """``spark.readStream.format("rest_pages")
    .option("fetch", "pkg.mod:fetch_page").load()``"""

    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self):
        return _VALUE_SCHEMA

    def simpleStreamReader(self, schema):
        return _RestPagesStreamReader(self.options)


def register(spark) -> None:
    """Register both formats on a session (idempotent)."""
    spark.dataSource.register(ObjectIterableDataSource)
    spark.dataSource.register(RestPagesDataSource)
