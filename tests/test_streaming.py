"""Streaming extension tests: the stream twin must equal the batch
oracle on the same data; the stateful operator must fold correctly."""

from __future__ import annotations

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
