"""Timestamp-type-agnostic epoch arithmetic.

The benchmark parquet has shipped its timestamp columns in different
physical encodings across regenerations: INT64 TIMESTAMP(NANOS),
TIMESTAMP adjusted-to-UTC, and TIMESTAMP(isAdjustedToUTC=false) which
Spark 4 reads as TIMESTAMP_NTZ. DuckDB reads the naive variants as
plain TIMESTAMP and `epoch_us` treats the wall-clock value as the
instant. These helpers give Spark the identical reading for every
variant without depending on ``spark.sql.session.timeZone``:

- TIMESTAMP_NTZ: pure wall-clock micros since 1970-01-01 00:00:00
  via ``timestamp_diff`` — no timezone is ever consulted, matching
  DuckDB's ``epoch_us`` on the same file bit for bit.
- TIMESTAMP (an instant): ``unix_micros``.
- numeric: already epoch micros; passed through.

Everything here is a pure Catalyst expression (whole-stage codegen,
no Python), so the dispatch costs nothing at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ntz_epoch() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_micros(col: Column, dtype: T.DataType | None) -> Column:
    """Microseconds since the epoch for ``col`` of the given type.

    For TIMESTAMP_NTZ the wall-clock value is taken as the instant
    (DuckDB-naive semantics); for TIMESTAMP the UTC instant is used;
    numeric columns are assumed to already hold epoch micros.
    """
    if isinstance(dtype, T.TimestampNTZType):
        return F.timestamp_diff("MICROSECOND", _ntz_epoch(), col)
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col)
    return col


def col_epoch_micros(df: DataFrame, name: str) -> Column:
    """``epoch_micros`` with the type resolved from ``df``'s schema."""
    return epoch_micros(F.col(name), df.schema[name].dataType)


def as_instant(col: Column, dtype: T.DataType) -> Column:
    """Coerce a timestamp of either flavor to TIMESTAMP (an instant),
    taking an NTZ wall clock as UTC — required where Spark insists on
    TIMESTAMP, e.g. streaming event-time watermarks
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Unlike a plain cast, this
    never consults the session timezone."""
    if isinstance(dtype, T.TimestampNTZType):
        return F.timestamp_micros(epoch_micros(col, dtype))
    return col


def micros_to_timestamp(us: Column, like_dtype: T.DataType | None = None) -> Column:
    """Inverse of :func:`epoch_micros`: rebuild a timestamp of the
    same flavor the micros came from, so round trips preserve type."""
    if isinstance(like_dtype, T.TimestampNTZType):
        return F.timestamp_add("MICROSECOND", us, _ntz_epoch())
    return F.timestamp_micros(us)
