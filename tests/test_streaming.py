"""Streaming extension tests: the stream twin must equal the batch
oracle on the same data; the stateful operator must fold correctly."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.streaming import walk_rates
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # file-source streams want a directory of parquet files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF0001}/events.parquet", d / "events.parquet")
    return str(d)


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    stream = walk_rates.read_events_stream(spark, events_dir)
    agg = walk_rates.windowed_event_counts(stream)
    walk_rates.run_to_memory_sink(agg, "win_counts", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("win_counts").collect()
    }

    batch = spark.read.parquet(f"{SF0001}/events.parquet")
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in walk_rates.windowed_event_counts(batch).collect()
    }
    assert got == want
    assert len(got) > 0


def test_running_user_totals_state(spark, events_dir):
    stream = walk_rates.read_events_stream(spark, events_dir)
    totals = walk_rates.running_user_totals(stream)
    walk_rates.run_to_memory_sink(totals, "user_totals", "update")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("user_totals").collect()
    }

    batch = spark.read.parquet(f"{SF0001}/events.parquet")
    want = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, _total) in want.items():
        assert got[uid][0] == n
        # float fold order differs batch vs pandas; totals agree loosely
        assert abs(got[uid][1] - _total) < 1e-6


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(f"{SF0001}/documents.parquet", d / "documents.parquet")
    return str(d)


def test_streaming_exact_dedup_equals_batch(spark, docs_dir):
    """Streaming first-copy-wins dedup must keep exactly the distinct
    text hashes the batch operator keeps (which doc_id survives is
    arrival-order-defined, so the comparison is on hashes + count)."""
    from big_data_graph_analysis_with_spark_spark.operators import dedup
    from big_data_graph_analysis_with_spark_spark.streaming import doc_dedup

    stream = doc_dedup.read_docs_stream(spark, docs_dir)
    deduped = doc_dedup.streaming_exact_dedup(stream)
    walk_rates.run_to_memory_sink(deduped, "doc_dedup_stream", "append")
    got = spark.table("doc_dedup_stream").collect()

    batch = spark.read.parquet(f"{SF0001}/documents.parquet")
    want_hashes = {
        r["h"] for r in batch.select(F.md5("text").alias("h")).distinct().collect()
    }
    assert {r["h"] for r in got} == want_hashes
    assert len(got) == len(want_hashes)  # exactly one survivor per hash
    # survivor ids must be real doc ids of a doc with that hash
    pairs = {
        (r["doc_id"], r["h"])
        for r in batch.select("doc_id", F.md5("text").alias("h")).collect()
    }
    assert {(r["doc_id"], r["h"]) for r in got} <= pairs
    # consistency link to the batch operator's group count
    assert len(got) == dedup.exact_dedup(batch).count()


def test_session_window_stream_equals_batch(spark, events_dir):
    """Streaming session windows must produce the same session
    partition (per-user event grouping) as the batch operator."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions
    from big_data_graph_analysis_with_spark_spark.streaming import (
        sessions as ssessions,
    )

    stream = ssessions.read_events_stream(spark, events_dir)
    # complete mode so sessions within the final watermark horizon are
    # still emitted once the file source is exhausted
    agg = ssessions.session_window_counts(
        stream, gap="30 minutes", watermark=None
    )
    walk_rates.run_to_memory_sink(agg, "session_counts", "complete")
    got = {
        (r["user_id"], int(r["session_start"].timestamp() * 1_000_000)): (
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.table("session_counts").collect()
    }

    batch = spark.read.parquet(f"{SF0001}/events.parquet")
    want = {
        (r["user_id"], r["start_us"]): (r["n_events"], r["sum_value"])
        for r in sessions.sessionize_events(batch).collect()
    }
    assert got == want
    assert len(got) > 0


def test_session_window_batch_mode(spark):
    """The same plan runs on a batch DataFrame (watermark=None)."""
    from big_data_graph_analysis_with_spark_spark.streaming import (
        sessions as ssessions,
    )

    ev = spark.createDataFrame(
        [(1, 1, 0, 1.0), (2, 1, 60, 2.0), (3, 1, 7200, 1.0), (4, 2, 0, 1.0)],
        "event_id LONG, user_id LONG, secs LONG, value DOUBLE",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds("secs").alias("ts"),
        "value",
    )
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in ssessions.session_window_counts(
            ev, gap="30 minutes", watermark=None
        ).collect()
    }
    assert len(got) == 3  # user 1 splits at the 2h silence; user 2 single
    assert sorted(got.values()) == [1, 1, 2]


def test_stream_static_enrichment_equals_batch(spark, events_dir):
    """Stream-static broadcast join: enriching the event stream with a
    batch-derived user profile gives exactly the batch join's rows."""
    from big_data_graph_analysis_with_spark_spark.streaming import enrich

    batch = spark.read.parquet(f"{SF0001}/events.parquet")
    # profile from the first half of users; the rest exercise tier='new'
    profiles = enrich.user_profiles(batch.filter(F.col("user_id") % 2 == 0))

    stream = walk_rates.read_events_stream(spark, events_dir)
    walk_rates.run_to_memory_sink(
        enrich.enrich_events(stream, profiles), "enriched", "append"
    )
    got = {
        (r["event_id"], r["hist_events"], r["hist_value"], r["tier"])
        for r in spark.table("enriched").collect()
    }
    want = {
        (r["event_id"], r["hist_events"], r["hist_value"], r["tier"])
        for r in enrich.enrich_events(batch, profiles).collect()
    }
    assert got == want and len(got) > 0
    tiers = {r[3] for r in got}
    assert "new" in tiers and len(tiers) > 1


def test_sliding_counts_stream_equals_batch(spark, events_dir):
    stream = walk_rates.read_events_stream(spark, events_dir)
    agg = walk_rates.windowed_event_counts(stream, slide="15 minutes")
    walk_rates.run_to_memory_sink(agg, "slide_counts", "complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("slide_counts").collect()
    }
    batch = spark.read.parquet(f"{SF0001}/events.parquet")
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in walk_rates.windowed_event_counts(
            batch, slide="15 minutes"
        ).collect()
    }
    assert got == want and len(got) > len(
        walk_rates.windowed_event_counts(batch).collect()
    )  # overlap factor: strictly more hopping windows than tumbling


def test_windowed_value_hist_stream_equals_batch(spark, events_dir):
    from big_data_graph_analysis_with_spark_spark.streaming import drift as sdrift

    stream = sdrift.read_events_stream(spark, events_dir)
    agg = sdrift.windowed_value_hist(
        stream, lo_cents=0, hi_cents=5_000, n_buckets=10, window="1 day"
    )
    walk_rates.run_to_memory_sink(agg, "value_hist", "complete")
    got = {
        (r["window_start"], r["bucket"]): r["n_events"]
        for r in spark.table("value_hist").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        (r["window_start"], r["bucket"]): r["n_events"]
        for r in sdrift.windowed_value_hist(
            batch, lo_cents=0, hi_cents=5_000, n_buckets=10,
            window="1 day", watermark=None,
        ).collect()
    }
    assert got == want
    assert sum(got.values()) == batch.filter("value is not null").count()


def test_windowed_value_hist_clamps_out_of_range(spark):
    import datetime

    rows = [
        (1, datetime.datetime(2024, 1, 1, 1), -5.0),   # below lo → bucket 0
        (2, datetime.datetime(2024, 1, 1, 2), 999.0),  # above hi → top bucket
        (3, datetime.datetime(2024, 1, 1, 3), 5.0),    # 500 cents of 1000
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    from big_data_graph_analysis_with_spark_spark.streaming import drift as sdrift

    got = {
        r["bucket"]: r["n_events"]
        for r in sdrift.windowed_value_hist(
            ev, lo_cents=0, hi_cents=1_000, n_buckets=4,
            window="1 day", watermark=None,
        ).collect()
    }
    assert got == {0: 1, 3: 1, 2: 1}


def test_stream_stream_attribution_equals_batch(spark, events_dir):
    from big_data_graph_analysis_with_spark_spark.streaming import correlate

    stream = correlate.read_events_stream(spark, events_dir)
    joined = correlate.attributed_purchases(stream, horizon="1 hour")
    walk_rates.run_to_memory_sink(joined, "attrib", "append")
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.table("attrib").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        (r["purchase_id"], r["click_id"])
        for r in correlate.attributed_purchases(
            batch, horizon="1 hour", watermark=None
        ).collect()
    }
    assert got == want
    assert len(want) > 0
    # every pair's click is really within the hour before its purchase
    for r in spark.table("attrib").collect():
        dt = (r["purchase_time"] - r["click_time"]).total_seconds()
        assert 0 <= dt <= 3600


def test_windowed_user_activity_stream_equals_batch(spark, events_dir):
    from big_data_graph_analysis_with_spark_spark.streaming import drift as sdrift

    stream = sdrift.read_events_stream(spark, events_dir)
    agg = sdrift.windowed_user_activity(stream, window="7 days")
    walk_rates.run_to_memory_sink(agg, "wau_activity", "complete")
    # sink-side rollup (the foreachBatch step in production)
    got = {
        r["window_start"]: (r["n_events"], r["n_users"])
        for r in sdrift.wau_rollup(spark.table("wau_activity")).collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        r["window_start"]: (r["n_events"], r["n_users"])
        for r in sdrift.wau_rollup(
            sdrift.windowed_user_activity(
                batch, window="7 days", watermark=None
            )
        ).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == batch.count()
    global_users = batch.select("user_id").distinct().count()
    assert all(v[1] <= global_users for v in got.values())


def test_streaming_value_locf_equals_batch(spark, events_dir):
    from big_data_graph_analysis_with_spark_spark.operators import drift as batch_drift
    from big_data_graph_analysis_with_spark_spark.streaming import (
        drift as streaming_drift,
    )

    stream = walk_rates.read_events_stream(spark, events_dir)
    walk_rates.run_to_memory_sink(
        streaming_drift.streaming_value_locf(stream), "locf_stream", "update"
    )
    got = {
        r["event_id"]: (r["user_id"], r["filled_value"])
        for r in spark.table("locf_stream").collect()
    }

    batch = spark.read.parquet(f"{SF0001}/events.parquet")
    want = {
        r["event_id"]: (r["user_id"], r["filled_value"])
        for r in batch_drift.value_locf(batch).collect()
    }
    # availableNow drains everything in ONE micro-batch, so the sorted
    # per-batch fold must reproduce the batch window exactly
    assert got == want
    assert len(got) == 1000


def test_streaming_value_locf_timed_late_drop_and_expiry(spark, tmp_path):
    """Timer-state LOCF (round-9): a straggler older than its user's
    high-water minus the lateness bound is dropped, and an idle user's
    state is flushed as an event_id=-1 tombstone when the watermark
    passes its idle timer — exercised over four single-file
    micro-batches (maxFilesPerTrigger=1 under availableNow)."""
    import datetime as dt

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_graph_analysis_with_spark_spark.streaming import (
        drift as streaming_drift,
    )

    def t(minute):
        return dt.datetime(2026, 1, 1, 10 + minute // 60, minute % 60)

    batches = [
        # batch 1: u1 carry chain starts; u2 baseline
        [(1, t(0), 1, "ok", 5.0), (2, t(5), 1, "error", None),
         (3, t(20), 1, "ok", 7.0), (10, t(0), 2, "ok", 1.0)],
        # batch 2: event 4 is LATE for u1 (10:05 < high-water 10:20 - 10m)
        [(4, t(5), 1, "ok", 99.0), (5, t(25), 1, "error", None),
         (11, t(26), 2, "ok", 2.0)],
        # batch 3: u2 jumps ahead -> post-batch watermark 11:20 passes
        # u1's idle timer (10:25 + 30m = 10:55)
        [(12, t(90), 2, "ok", 3.0)],
        # batch 4: any row; u1's timer fires during this batch
        [(13, t(100), 2, "ok", 4.0)],
    ]
    d = tmp_path / "ev"
    d.mkdir()
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        table = pa.Table.from_pandas(pdf).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                ]
            )
        )
        path = d / f"{i}.parquet"
        pq.write_table(table, path)
        os.utime(path, (1000 + 100 * i, 1000 + 100 * i))

    stream = (
        spark.readStream.schema(spark.read.parquet(str(d)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        streaming_drift.streaming_value_locf_timed(stream)
        .writeStream.format("memory")
        .queryName("locf_timed")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["user_id"]): r["filled_value"]
        for r in spark.table("locf_timed").collect()
    }
    assert got == {
        (1, 1): 5.0, (2, 1): 5.0, (3, 1): 7.0, (5, 1): 7.0,
        (-1, 1): 7.0,                      # idle-expiry tombstone
        (10, 2): 1.0, (11, 2): 2.0, (12, 2): 3.0, (13, 2): 4.0,
    }  # event 4 (the straggler) must be absent


def test_windowed_ks_vs_reference_stream_equals_batch(spark, events_dir):
    """The KS drift gate over the STREAMED histograms equals the gate
    over the batch-twin histograms — and a self-reference window scores
    D = 0."""
    from big_data_graph_analysis_with_spark_spark.streaming import drift as sdrift

    batch = spark.read.parquet(events_dir)
    # reference = the whole corpus bucketed once with the same params
    reference = (
        sdrift.windowed_value_hist(
            batch, lo_cents=0, hi_cents=5_000, n_buckets=10,
            window="3650 days", watermark=None,
        )
        .groupBy("bucket")
        .agg(F.sum("n_events").alias("n_ref"))
    )

    stream = sdrift.read_events_stream(spark, events_dir)
    agg = sdrift.windowed_value_hist(
        stream, lo_cents=0, hi_cents=5_000, n_buckets=10, window="1 day"
    )
    walk_rates.run_to_memory_sink(agg, "ks_hist", "complete")
    got = {
        r["window_start"]: (r["n_window"], r["n_ref"], int(r["d_num"]), r["at_bucket"])
        for r in sdrift.windowed_ks_vs_reference(
            spark.table("ks_hist"), reference, n_buckets=10
        ).collect()
    }
    want_hist = sdrift.windowed_value_hist(
        batch, lo_cents=0, hi_cents=5_000, n_buckets=10,
        window="1 day", watermark=None,
    )
    want = {
        r["window_start"]: (r["n_window"], r["n_ref"], int(r["d_num"]), r["at_bucket"])
        for r in sdrift.windowed_ks_vs_reference(
            want_hist, reference, n_buckets=10
        ).collect()
    }
    assert got == want and got

    # a window whose histogram IS the reference scores exactly zero
    self_ref = sdrift.windowed_ks_vs_reference(
        reference.select(
            F.lit("2024-01-01").cast("timestamp").alias("window_start"),
            "bucket",
            F.col("n_ref").alias("n_events"),
        ),
        reference,
        n_buckets=10,
    ).collect()[0]
    assert int(self_ref["d_num"]) == 0


def test_streaming_bootstrap_stream_equals_batch(spark, events_dir):
    """Per-window bootstrap resample totals from the stream equal the
    batch twin's, and each window's b=… rows agree with the one-pass
    batch bootstrap operator on that window's slice."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling
    from big_data_graph_analysis_with_spark_spark.streaming import drift as sdrift

    stream = sdrift.read_events_stream(spark, events_dir)
    agg = sdrift.streaming_bootstrap_sums(stream, n_resamples=4)
    walk_rates.run_to_memory_sink(agg, "boot_sums", "complete")
    got = {
        (r["window_start"], r["b"]): (r["n_rows"], r["n_eff"], r["boot_cents"])
        for r in spark.table("boot_sums").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        (r["window_start"], r["b"]): (r["n_rows"], r["n_eff"], r["boot_cents"])
        for r in sdrift.streaming_bootstrap_sums(
            batch, n_resamples=4, watermark=None
        ).collect()
    }
    assert got == want and got

    # one window's rows must equal the standalone batch bootstrap on
    # exactly that window's event slice
    some_window = next(iter(got))[0]
    sliced = batch.filter(
        (F.col("ts") >= F.lit(some_window))
        & (F.col("ts") < F.lit(some_window) + F.expr("INTERVAL 1 DAY"))
    )
    solo = {
        r["b"]: (r["n_rows"], r["n_eff"], r["boot_cents"])
        for r in sampling.poisson_bootstrap_sums(
            sliced, n_resamples=4
        ).collect()
    }
    for b in range(4):
        assert got[(some_window, b)] == solo[b]
