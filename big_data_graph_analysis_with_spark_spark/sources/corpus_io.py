"""Corpus ingest/egress: JSONL document reading with enforced schema,
JSONL export, and compacted partitioned-parquet layout.

JSONL is the lingua franca of LLM corpora; reading it wrong is the
canonical 100 TB footgun. Two rules this module enforces:

1. **Never infer the schema.** `spark.read.json` without a schema runs
   a full extra pass over the data just to guess types (and guesses
   differently per day's data). The schema here is explicit, so the
   scan is single-pass and the output contract is stable.
2. **Never drop bad lines silently.** PERMISSIVE mode routes corrupt
   records into a `_corrupt_record` column; callers either count them
   (monitoring) or fail fast. A 0.001% corrupt-line rate at 100 TB is
   a gigabyte of silently-vanishing data per day if unmonitored.

The parquet writer addresses the other classic sink failure: small
files. Naive `partitionBy` writes |tasks|×|partitions| files; the
repartition-on-partition-columns before the write gives exactly one
task's output per (partition value, bucket) and `sortWithinPartitions`
on doc_id improves both parquet encoding and downstream merge locality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the documents-table contract (TESTDATA.md), plus the corrupt-record
#: channel appended by the PERMISSIVE reader.
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl_docs(
    spark: SparkSession, path: str, fail_fast: bool = False
) -> DataFrame:
    """Read a JSONL corpus with the enforced document schema.

    `fail_fast=False` (default) keeps corrupt lines in a
    `_corrupt_record` column (all data columns null for those rows) so
    callers can count/quarantine them; `fail_fast=True` aborts the job
    on the first corrupt line instead.
    """
    schema = T.StructType(
        DOC_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    reader = (
        spark.read.schema(schema)
        .option("mode", "FAILFAST" if fail_fast else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    return reader.json(path)


def corrupt_line_count(docs: DataFrame) -> int:
    """Number of corrupt JSONL lines in a `read_jsonl_docs` frame —
    the monitoring hook for ingest health.

    Spark disallows plans whose only referenced column from a raw JSON
    scan is `_corrupt_record` (it is populated during parsing, not
    stored), so the aggregate deliberately references a data column
    too — one pass, no cache side effect.
    """
    if "_corrupt_record" not in docs.columns:
        return 0
    row = docs.agg(
        F.sum(F.col("_corrupt_record").isNotNull().cast("long")).alias("bad"),
        F.count("doc_id").alias("__touch"),
    ).first()
    return int(row["bad"] or 0)


def write_jsonl_docs(docs: DataFrame, path: str, files: int = 1) -> None:
    """Export documents as JSONL (interchange format). `files` bounds
    the output file count — JSONL egress is usually feeding a
    single-consumer tool, not another Spark job."""
    cols = [f.name for f in DOC_SCHEMA.fields if f.name in docs.columns]
    docs.select(*cols).coalesce(files).write.mode("overwrite").json(path)


def write_corpus_parquet(
    docs: DataFrame,
    path: str,
    partition_by: str = "lang",
    buckets_per_partition: int = 1,
) -> None:
    """Compacted partitioned-parquet sink: `buckets_per_partition`
    files per partition value (repartition on the partition column +
    a doc_id-derived bucket), rows sorted by doc_id within each file."""
    cols = [f.name for f in DOC_SCHEMA.fields if f.name in docs.columns]
    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(buckets_per_partition))
    (
        docs.select(*cols)
        .repartition(F.col(partition_by), bucket)
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy(partition_by)
        .parquet(path)
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 8,
    seed: int = 0,
    payload: tuple[str, ...] = ("text",),
) -> None:
    """Materialize the deterministic training shuffle
    (operators/sampling.shard_assignments) as one parquet directory per
    shard, rows in shuffled (pos) order within each file. The trainer
    streams shard=K/part-*.parquet sequentially and gets the seeded
    global permutation without any reader-side shuffle. One hash
    shuffle + per-shard local sort — never a global orderBy, identical
    output for any input partitioning."""
    from ..operators.sampling import shard_assignments

    assigned = shard_assignments(
        docs, n_shards=n_shards, seed=seed, keep=payload
    )
    (
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def write_events_by_day(events: DataFrame, path: str) -> None:
    """Day-partitioned event sink: `day=YYYY-MM-DD/part-*.parquet`,
    one compacted file per day (repartition on the partition column),
    rows sorted by event time within each file.

    This is the layout that makes time-ranged event queries PARTITION-
    PRUNED: a filter on `day` never opens other days' files — at
    100 TB/year the difference between scanning a day and scanning a
    year. `read_events_by_day` pins the pruning in its test by
    asserting the filter lands in the scan's PartitionFilters.
    Within-file time order additionally gives min/max row-group
    statistics their best selectivity for intra-day ranges.
    """
    from ..functions.eventtime import event_micros

    tus = event_micros(events)
    with_day = events.withColumn(
        "day", F.date_format(F.timestamp_micros(tus), "yyyy-MM-dd")
    ).withColumn("_tus", tus)
    (
        with_day.repartition(F.col("day"))
        .sortWithinPartitions("_tus")
        .drop("_tus")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def read_events_by_day(spark, path: str, day: str) -> DataFrame:
    """One day's events from a `write_events_by_day` layout — the
    filter is a partition predicate, so only that day's files are
    listed and read."""
    return spark.read.parquet(path).filter(F.col("day") == day)
