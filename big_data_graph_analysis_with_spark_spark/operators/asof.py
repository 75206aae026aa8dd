"""As-of (point-in-time) join — attach to each left row the most recent
right row at-or-before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do), and the naive
formulations both die at scale: a range-condition join explodes into a
BroadcastNestedLoopJoin, and a correlated argmax re-shuffles per probe.
The scalable composition is the *union-and-carry* trick:

  1. tag right rows side=0, left rows side=1, union by name;
  2. one window per key ordered by (ts, side, tie) carries the latest
     non-null right payload forward with last(..., ignoreNulls=True);
  3. keep only left rows.

That is exactly ONE hash shuffle on the key plus a per-key local sort —
the same cost as the sessionization window — and no pair blow-up, so it
survives 100 TB as long as single keys fit a partition (salt or
date-split pathological keys first, as in operators/sessions.py).

Tie semantics: at equal timestamps the right row sorts before the left
row (side 0 < 1), so "at-or-before" includes same-instant rows —
matching DuckDB's `ON l.ts >= r.ts` ASOF semantics, which the oracle
uses as an independent implementation. Determinism requires the right
side be unique per (key, ts); callers reduce duplicates first (the
query wrapper keeps max event_id per instant).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    left_tie: str,
) -> DataFrame:
    """For each left row, the most recent right row with
    right_ts <= left_ts on the same key (null payload if none).

    Returns all left columns plus `right_payload` columns and `right_ts`.
    `left_tie` orders same-instant left rows deterministically in the
    carry window (output content does not depend on it, but a total
    order keeps the plan stable).
    """
    key = list(key)
    left_cols = [c for c in left.columns]
    tagged_r = right.select(
        *key,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in right_payload], F.col(right_ts).alias("__rts"))
        .alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in key],
    )
    payload_type = tagged_r.schema["__payload"].dataType
    tagged_l = left.select(
        *key,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(left_tie).cast("long").alias("__tie"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[F.col(c) for c in left_cols if c not in key],
    )
    unioned = tagged_r.unionByName(tagged_l)
    carry = Window.partitionBy(*key).orderBy("__ts", "__side", "__tie").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = unioned.withColumn(
        "__carried", F.last("__payload", ignorenulls=True).over(carry)
    )
    out = carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col("__carried")[c].alias(c) for c in right_payload],
        F.col("__carried")["__rts"].alias(right_ts),
    )
    return out
