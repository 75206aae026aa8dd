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


def user_type_map_census(events: DataFrame) -> DataFrame:
    """(user_id, n_types, n_events, n_above_mean): per user, the
    event-type histogram materialized as a Spark MAP column and reduced
    entirely with map/array higher-order functions — `map_from_entries`
    builds type→count, `map_values` + `aggregate` folds the total, and
    `map_filter` keeps the types whose count exceeds the user's mean
    (`cnt·n_types > n_events`, the exact cross-multiplied integer test).
    The map column never leaves the operator: the output is three plain
    integers per user, so a map-free DuckDB twin hash-matches while the
    Spark plan exercises the full map-HOF surface (all JVM-side
    expressions inside codegen — no Python, no explode of the map).

    Scale shape: one map-side-combinable count on (user, type), one
    shuffle to assemble the per-user entry list; per-user state is
    bounded by the type vocabulary, not event count.
    """
    per_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("cnt")
    )
    m = F.map_from_entries(F.collect_list(F.struct("event_type", "cnt")))
    return (
        per_type.groupBy("user_id")
        .agg(m.alias("tmap"))
        .select(
            "user_id",
            F.size("tmap").cast("long").alias("n_types"),
            F.aggregate(
                F.map_values("tmap"), F.lit(0).cast("long"), lambda a, v: a + v
            ).alias("n_events"),
            F.size(
                F.map_filter(
                    "tmap",
                    lambda k, v: v * F.size("tmap")
                    > F.aggregate(
                        F.map_values("tmap"),
                        F.lit(0).cast("long"),
                        lambda a, x: a + x,
                    ),
                )
            )
            .cast("long")
            .alias("n_above_mean"),
        )
    )


def props_variant_stats(events: DataFrame, field: str = "k") -> DataFrame:
    """The `props_stats` census — identical output schema — re-expressed
    through Spark 4's VARIANT path — `parse_json`
    once into a variant column, then `try_variant_get` per field. For a
    payload read MANY fields deep, variant parses the JSON text a
    single time where repeated `get_json_object` calls re-parse per
    field; for this one-field census the two plans are equivalent, and
    the equivalence test (vs `props_stats`) is exactly the point: same
    answers, newer scan path, zero Python. `try_parse_json` (NOT
    `parse_json`, which is FAILFAST and aborts the scan on the first
    malformed payload) turns bad records into NULL variants, and
    `try_variant_get` passes the NULL through — counted out of n_k.
    """
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, f"$.{field}", "long")
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
