"""Epoch-microsecond normalization for event-time columns.

The testdata's `events.ts` physical type has varied across driver
generations: TIMESTAMP(NANOS) parquet surfaces as a nanos-since-epoch
BIGINT under ``spark.sql.legacy.parquet.nanosAsLong``, while
TIMESTAMP(MICROS) surfaces as TIMESTAMP_NTZ. Every time-bucketing
operator in this engine works in epoch MICROSECONDS — the finest
granularity Spark and DuckDB agree on (DuckDB's TIMESTAMP is µs) —
and goes through this one dispatch point so a regenerated dataset
can't silently skew half the queries.

The TIMESTAMP_NTZ branch uses ``to_utc_timestamp(col, 'UTC')`` to
reinterpret the naive value as UTC *independently of the session
timezone*, which makes ``unix_micros`` return exactly DuckDB's
``epoch_us(ts)`` on the same parquet bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICROS_PER_HOUR = 3_600 * 1_000_000
MICROS_PER_DAY = 24 * MICROS_PER_HOUR


def event_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds BIGINT column for `col`, whatever physical
    shape the reader surfaced it in. Pure expression — stays inside
    whole-stage codegen, no shuffle, no UDF."""
    dtype = dict(df.dtypes)[col]
    if dtype == "bigint":  # nanos-long convention (nanosAsLong)
        return F.expr(f"{col} div 1000")
    if dtype == "timestamp_ntz":  # naive µs: reinterpret as UTC
        return F.expr(f"unix_micros(to_utc_timestamp({col}, 'UTC'))")
    if dtype == "timestamp":  # absolute instant
        return F.unix_micros(F.col(col))
    raise TypeError(f"column {col!r} has unsupported event-time dtype {dtype}")
