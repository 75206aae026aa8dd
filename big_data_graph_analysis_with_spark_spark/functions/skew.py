"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains necessary when one side must
aggregate BEFORE joining (AQE can't split a skewed aggregation) or on
engines/paths where AQE is off. The MitM workload hits this exactly
where the reference broadcast the whole graph to dodge it: hub nodes in
the edge table (a nation key touching every supplier) skew any
src-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the large side salted `salt` ways.

    The large side gets a seeded pseudo-random salt per row; the small
    side is exploded ×`salt` so every (key, salt) bucket finds its
    match. Hot keys spread over `salt` reducers instead of one. Use
    when a handful of keys dominate and the small side is too big to
    broadcast but cheap to replicate ×salt.
    """
    salted_large = large.withColumn(
        "__salt", (F.rand(seed) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return (
        salted_large.join(salted_small, on=[on, "__salt"], how=how)
        .drop("__salt")
    )


def salted_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase count for skewed keys: partial count per (key, salt),
    then final sum per key — the manual form of the map-side partial
    aggregation Catalyst already does for simple counts, useful as the
    template for aggregations Catalyst can't split (e.g. collect_list
    of bounded samples per hot key)."""
    partial = (
        df.withColumn("__salt", (F.crc32(F.col(key).cast("string")) % salt))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__c"))
    )
    return partial.groupBy(key).agg(F.sum("__c").cast("long").alias("n"))
