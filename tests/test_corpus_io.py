"""JSONL corpus ingest/egress round-trip and corruption handling."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.sources import corpus_io

SF0001 = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet")


def _sorted_rows(df):
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_jsonl_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "docs_jsonl")
    corpus_io.write_jsonl_docs(docs, out, files=2)
    back = corpus_io.read_jsonl_docs(spark, out)
    assert corpus_io.corrupt_line_count(back) == 0
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_jsonl_corrupt_lines_are_counted_not_dropped(spark, tmp_path):
    p = tmp_path / "corrupt.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}\n'
    )
    back = corpus_io.read_jsonl_docs(spark, str(p))
    assert corpus_io.corrupt_line_count(back) == 1
    good = back.filter(F.col("_corrupt_record").isNull())
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]


def test_jsonl_fail_fast_raises(spark, tmp_path):
    p = tmp_path / "corrupt2.jsonl"
    p.write_text('{"doc_id": 1}\nnot json either\n')
    with pytest.raises(Exception):
        corpus_io.read_jsonl_docs(spark, str(p), fail_fast=True).collect()


def test_partitioned_parquet_layout_and_roundtrip(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "corpus_pq")
    corpus_io.write_corpus_parquet(docs, out, partition_by="lang",
                                   buckets_per_partition=2)
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {os.path.basename(d) for d in glob.glob(f"{out}/lang=*")}
    assert dirs == {f"lang={lang}" for lang in langs}
    # compaction: at most buckets_per_partition data files per partition
    for d in glob.glob(f"{out}/lang=*"):
        n_files = len(glob.glob(f"{d}/*.parquet"))
        assert 1 <= n_files <= 2, d
    back = spark.read.parquet(out)
    assert _sorted_rows(back) == _sorted_rows(docs)


def test_partition_pruning_on_lang(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "corpus_pq2")
    corpus_io.write_corpus_parquet(docs, out)
    plan = (
        spark.read.parquet(out)
        .filter(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partition filter reaches the scan: no lang dirs other than en read
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]


def test_write_training_shards_roundtrip(spark, tmp_path):
    from big_data_graph_analysis_with_spark_spark.operators.sampling import (
        shard_assignments,
    )
    from big_data_graph_analysis_with_spark_spark.sources.corpus_io import (
        write_training_shards,
    )
    from tests.conftest import SF0001

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, seed=3)

    back = spark.read.parquet(out)
    want = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shard_assignments(docs, n_shards=4, seed=3).collect()
    }
    got = {(r["doc_id"], r["shard"], r["pos"]) for r in back.collect()}
    assert got == want
    # partition pruning: reading one shard touches one directory
    one = spark.read.parquet(out).filter(F.col("shard") == 2)
    assert one.count() == len([t for t in want if t[1] == 2])
    # within a shard file, rows are laid out in pos order
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(f"{out}/shard=2/*.parquet")
    assert files
    pos = pq.read_table(files[0], columns=["pos"])["pos"].to_pylist()
    assert pos == sorted(pos)


def test_events_day_partitioning_prunes(spark, tmp_path):
    from big_data_graph_analysis_with_spark_spark.sources import corpus_io

    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    path = str(tmp_path / "events_by_day")
    corpus_io.write_events_by_day(ev, path)
    # layout: day=YYYY-MM-DD dirs, one file each
    days = sorted(
        p.name for p in (tmp_path / "events_by_day").iterdir()
        if p.name.startswith("day=")
    )
    assert len(days) >= 2
    day = days[0].split("=", 1)[1]
    got = corpus_io.read_events_by_day(spark, path, day)
    # the day filter must be a PARTITION filter (pruned listing), not a
    # post-scan data filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert f"day = {day}" in plan or "isnotnull(day" in plan
    # row counts: partitioned day equals filtering the source by date
    from big_data_graph_analysis_with_spark_spark.functions.eventtime import (
        event_micros,
    )
    from pyspark.sql import functions as F

    want = ev.filter(
        F.date_format(F.timestamp_micros(event_micros(ev)), "yyyy-MM-dd")
        == day
    ).count()
    assert got.count() == want
    # within-file time ordering held
    import pyarrow.parquet as pq

    f = next((tmp_path / "events_by_day" / days[0]).glob("*.parquet"))
    ts = pq.read_table(str(f), columns=["ts"]).column("ts").to_pylist()
    assert ts == sorted(ts)
