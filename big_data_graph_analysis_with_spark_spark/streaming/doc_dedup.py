"""Streaming exact deduplication for document pipelines.

The batch `dedup.exact_dedup` shape, restated for a live ingest
stream: keep the first-arriving copy of each distinct text, keyed on
md5(text) so streaming state holds a 32-byte hash per distinct
document — never the text (the same shuffle-key discipline as the
batch operator).

State sizing: plain `dropDuplicates` keeps one state row per distinct
hash forever — O(distinct docs), the correct semantics for corpus
dedup where a re-crawled duplicate must stay suppressed no matter how
late it arrives. When the pipeline has an ingest-time column and only
within-horizon duplicates matter, `within_watermark` bounds state to
the horizon via `dropDuplicatesWithinWatermark` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def read_docs_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of documents parquet."""
    return spark.readStream.schema(DOCS_SCHEMA).parquet(path)


def streaming_exact_dedup(
    docs: DataFrame,
    within_watermark: str | None = None,
    event_time_col: str = "ingest_time",
) -> DataFrame:
    """First-copy-wins exact dedup over a document stream.

    Returns (doc_id, h) of surviving documents — one row per distinct
    text, emitted in append mode as each first copy arrives. Works on
    batch DataFrames too (same plan, Catalyst's Deduplicate), which is
    what the stream ≡ batch test asserts.

    `within_watermark="1 hour"` switches to
    `dropDuplicatesWithinWatermark` over `event_time_col`: duplicates
    are only suppressed within the watermark horizon and state is
    evicted past it — the bounded-state variant for time-windowed
    ingest feeds.
    """
    keyed = docs.select("doc_id", F.md5("text").alias("h"), "*").drop("text")
    if within_watermark is not None:
        keyed = keyed.withWatermark(
            event_time_col, within_watermark
        ).dropDuplicatesWithinWatermark(["h"])
    else:
        keyed = keyed.dropDuplicates(["h"])
    return keyed.select("doc_id", "h")
