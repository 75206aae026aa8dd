"""Structured Streaming extension (SURVEY.md §2.10).

The reference is strictly batch — no streaming exists to replicate.
This module is the north-star extension over the `events` table: the
same tumbling-window rollup as the batch `events_rollup` query, as a
stream, plus a custom stateful operator via `applyInPandasWithState`
(the Spark-idiomatic home for reference-style sequential per-key
logic, were walks ever fed from a live event stream).

Semantics: `windowed_event_counts(stream) ≡ events_rollup(batch)` on
the same data — asserted in tests by running the stream with an
`availableNow` trigger into a memory sink and comparing against the
batch plan. Watermarking bounds state: late events beyond the
watermark are dropped instead of growing window state forever — the
knob that keeps a 100 TB/day stream's state finite.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.eventtime import event_micros

def read_events_stream(spark, path: str) -> DataFrame:
    """File-source stream over events parquet. The (mandatory) stream
    schema is taken from one batch footer read of the same directory —
    a single driver-side metadata pass at setup, so the stream always
    matches the files' physical types (ts has been both
    TIMESTAMP(NANOS)→long and TIMESTAMP(MICROS)→timestamp_ntz across
    testdata generations)."""
    return spark.readStream.schema(spark.read.parquet(path).schema).parquet(path)


def with_event_time(events: DataFrame) -> DataFrame:
    """Attach an absolute µs-precision timestamp column from `ts`,
    whichever way the session surfaced it — one normalization point
    (functions/eventtime) shared with the batch operators."""
    return events.withColumn(
        "event_time", F.timestamp_micros(event_micros(events))
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling — or, with `slide`, hopping — window counts + value
    sums per event type. A sliding window assigns each event to
    size/slide overlapping windows (Spark expands this in the plan; no
    self-join), so state grows by that factor — the watermark still
    bounds it.

    Works on both batch and streaming DataFrames (the streaming twin of
    the batch `events_rollup` / `events_sliding` oracle queries). With
    a stream, the watermark lets Spark finalize windows and evict their
    state.
    """
    ev = with_event_time(events)
    if ev.isStreaming:
        ev = ev.withWatermark("event_time", watermark)
    win = (
        F.window("event_time", window, slide)
        if slide is not None
        else F.window("event_time", window)
    )
    return ev.groupBy(win.alias("win"), F.col("event_type")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


_STATE_SCHEMA = "n LONG, total DOUBLE"
_OUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event count and value
    total across micro-batches (`applyInPandasWithState`).

    The per-key state is a (count, total) pair; each micro-batch folds
    its rows into the state and emits the updated running totals. This
    is the streaming shape for any reference-style sequential per-key
    kernel (state ≡ the partition-local `visitedNodesList` of the walk
    loop, `Main.scala:92-101`)."""

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": pd.Series([n], dtype="int64"),
                "total_value": [round(total, 6)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    table_name: str,
    output_mode: str = "complete",
    drop_table: bool = False,
) -> None:
    """Drain a stream into an in-memory table with availableNow (test /
    backfill harness: process everything currently available, then
    stop).

    ``drop_table=True`` drops the sink's temp view after the drain —
    for callers that only measure the drain (bench): a complete-mode
    memory sink holds the FULL result on the driver heap per query
    name, and repeated drains in one session accumulate until GC churn
    (measured at the 100× probe: the 4th same-session drain crept
    17→40s with the tables kept; flat with them dropped)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if drop_table:
        stream_df.sparkSession.catalog.dropTempView(table_name)
