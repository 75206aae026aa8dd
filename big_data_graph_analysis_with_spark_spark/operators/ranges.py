"""Keyed interval (range) join — match point rows to the interval rows
that contain them, without a nested-loop plan.

Spark has no native range join: `ON key = key AND ts BETWEEN lo AND hi`
plans the range predicate as a post-join filter, and with selective
keys that is fine, but with hot keys (or no key) it degenerates into a
BroadcastNestedLoopJoin. The standard fix is *bucketization*: chop time
into fixed-width buckets, explode each interval into the buckets it
overlaps, tag each point with its single bucket, and equi-join on
(key, bucket) before the exact containment filter. Every candidate
pair is generated exactly once (a point lives in exactly one bucket),
so no dedup pass is needed, and the join is a plain hash join that
AQE/skew-salting can handle like any other.

Cost: |intervals| × (span/width + 1) exploded rows. Pick `bucket_width`
near the typical interval span — width ≫ span wastes candidates per
bucket, width ≪ span explodes the build side. At 100 TB both sides
shuffle once on (key, bucket); a hot (key, bucket) pair salts like any
equi-join key (functions/skew).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: Sequence[str],
    point_ts: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join each point row to every interval row on the same key
    with start <= point_ts <= end (closed interval, integer units).

    Returns all point columns plus all interval columns (names must not
    collide apart from the key). One hash shuffle per side, no
    nested-loop fallback.
    """
    key = list(key)
    w = bucket_width
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start} div {w}"), F.expr(f"{end} div {w}")
            )
        ),
    )
    tagged = points.withColumn("__bucket", F.expr(f"{point_ts} div {w}"))
    joined = tagged.join(exploded, on=key + ["__bucket"]).filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    )
    return joined.drop("__bucket")
