"""Epoch-microsecond normalization for event-time columns.

The testdata's `events.ts` physical type has varied across driver
generations: TIMESTAMP(NANOS) parquet surfaces as a nanos-since-epoch
BIGINT under ``spark.sql.legacy.parquet.nanosAsLong``, while
TIMESTAMP(MICROS) surfaces as TIMESTAMP_NTZ. Every time-bucketing
operator in this engine works in epoch MICROSECONDS — the finest
granularity Spark and DuckDB agree on (DuckDB's TIMESTAMP is µs) —
and goes through this one dispatch point so a regenerated dataset
can't silently skew half the queries.

The TIMESTAMP_NTZ branch converts via *field arithmetic* —
``unix_date(date) · 86400e6 + hour·3600e6 + minute·60e6 +
second-with-fraction · 1e6`` — because every field extraction on an NTZ
value is a pure wall-clock operation with no timezone in play. The
superficially-simpler ``unix_micros(to_utc_timestamp(col, 'UTC'))`` is
NOT session-timezone independent (the NTZ→LTZ step inside it uses the
session zone, shifting results by the zone's UTC offset); the tz-sweep
test in ``tests/test_corpusstats_asof.py`` pins this. The result equals
DuckDB's ``epoch_us(ts)`` on the same parquet bytes under any session
timezone.
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
    if dtype == "timestamp_ntz":  # naive µs: pure wall-clock field math
        # every field is cast to BIGINT before the scale multiply — the
        # minute term would otherwise be int×int (60000000 fits in int)
        # and overflow int32 under ANSI for minute ≥ 36
        return F.expr(
            f"cast(unix_date(cast({col} as date)) as bigint) * 86400000000"
            f" + cast(hour({col}) as bigint) * 3600000000"
            f" + cast(minute({col}) as bigint) * 60000000"
            f" + cast(extract(second from {col}) * 1000000 as bigint)"
        )
    if dtype == "timestamp":  # absolute instant
        return F.unix_micros(F.col(col))
    raise TypeError(f"column {col!r} has unsupported event-time dtype {dtype}")
