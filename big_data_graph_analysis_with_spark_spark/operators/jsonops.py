"""Semi-structured (JSON) property extraction and analytics.

Event streams carry per-event JSON payloads (`events.props`); training
pipelines need to filter and aggregate on fields inside them without a
pre-flattening ETL pass. These operators extract typed values with
Spark's JVM-side JSON path evaluation (`get_json_object` — runs inside
whole-stage codegen, no Python) and aggregate with exact integer
arithmetic so a DuckDB `json_extract_string` oracle hash-matches.

Scale notes: extraction is a narrow projection fused into the scan —
zero shuffle; at 100 TB the only cost is the one groupBy on the
(low-cardinality) event_type key, with map-side partial aggregation.
For hot paths at scale, parse ONCE with `from_json` into a struct
column and let Catalyst prune unused fields, rather than evaluating
one JSON path per field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_prop(events: DataFrame, field: str = "k") -> DataFrame:
    """(event_id, event_type, k): typed bigint extraction of one JSON
    field. Narrow map — fused into the parquet scan."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object(F.col("props"), f"$.{field}").cast("long").alias(field),
    )


def props_stats(events: DataFrame, field: str = "k") -> DataFrame:
    """Per-event-type stats of a JSON property: row count, non-null
    count, sum / min / max, distinct values. All-integer aggregates —
    exact at any scale, no float drift, map-side combinable."""
    k = F.get_json_object(F.col("props"), f"$.{field}").cast("long")
    return (
        events.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("_k").alias("n_with_prop"),
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
            F.countDistinct("_k").alias("n_distinct_k"),
        )
    )


def props_histogram(
    events: DataFrame, field: str = "k", bucket_width: int = 10
) -> DataFrame:
    """Per-event-type histogram of a JSON property in fixed-width
    buckets (`k DIV bucket_width`). The shape-inspection step before
    choosing filter thresholds on a payload field. One groupBy on a
    bounded (type × bucket) key space."""
    k = F.get_json_object(F.col("props"), f"$.{field}").cast("long")
    return (
        events.select("event_type", k.alias("_k"))
        .filter(F.col("_k").isNotNull())
        .withColumn("bucket", F.expr(f"_k DIV {int(bucket_width)}"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
    )
