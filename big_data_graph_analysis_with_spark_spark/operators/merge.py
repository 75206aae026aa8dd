"""Batch CDC merge (upsert) — last-writer-wins reconciliation.

The table-maintenance primitive every lakehouse engine ships (Delta
MERGE, Iceberg upsert): fold a change batch into a base snapshot,
keeping the highest-version row per key and honoring delete markers.
Expressed as union + one windowed argmax per key — ONE hash shuffle on
the key, no join at all (a full-outer-join formulation shuffles both
sides the same amount and then pays the join). Ties on version resolve
to the change side (is_change DESC), the conventional
"updates win over base at equal version" rule, then deterministically
by nothing else — (key, version, side) is unique by contract.

At 100 TB: base and changes are both key-hashed once; if the base is
bucketed on the key (sources/parquet_graph bucketing), the exchange
for the base side disappears entirely and only the (small) change
batch shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    changes: DataFrame,
    key: Sequence[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Merged snapshot: per key, the row with the highest
    `version_col` (change batch wins version ties); rows whose winner
    has `delete_col` true are dropped. Schemas must match (plus the
    optional delete marker on the change side)."""
    key = list(key)
    if delete_col is None:
        delete_col = "_deleted"
        changes = changes.withColumn(delete_col, F.lit(False))
    base = base.withColumn(delete_col, F.lit(False))
    tagged = base.withColumn("_chg", F.lit(0)).unionByName(
        changes.withColumn("_chg", F.lit(1))
    )
    w = Window.partitionBy(*key).orderBy(
        F.desc(version_col), F.desc("_chg")
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & ~F.col(delete_col))
        .drop("_rn", "_chg", delete_col)
    )


def scd2_history(
    changes: DataFrame,
    key: Sequence[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: every change row
    becomes a versioned validity interval — columns `valid_from` (its
    own version), `valid_to` (the NEXT version for the key, null while
    open), and `is_current` (open AND not a delete). The other half of
    the lakehouse merge story: :func:`upsert` keeps only the latest
    snapshot, SCD2 keeps the full auditable history that time-travel /
    point-in-time joins read (pair it with `operators/asof` to query
    "the row as of version v").

    Same cost shape as `upsert`: ONE hash shuffle on the key, one
    window (lead) over the per-key version order — no join. Delete
    markers stay in the history as closed, non-current rows (the
    delete row itself records that the key ended). (key, version) must
    be unique, as in `upsert`."""
    key = list(key)
    if delete_col is None:
        delete_col = "_deleted"
        changes = changes.withColumn(delete_col, F.lit(False))
    w = Window.partitionBy(*key).orderBy(F.asc(version_col))
    nxt = F.lead(version_col).over(w)
    return (
        changes.withColumn("valid_from", F.col(version_col).cast("long"))
        .withColumn("valid_to", nxt.cast("long"))
        .withColumn(
            "is_current", F.col("valid_to").isNull() & ~F.col(delete_col)
        )
        .drop(delete_col)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """(key columns..., change) with change ∈ {'added', 'removed',
    'changed'}: the row-level diff between two snapshots of a keyed
    table — the dataset-versioning primitive behind "what moved
    between corpus v1 and v2" reports and incremental downstream
    refreshes. Unchanged rows are omitted (they are the bulk; a diff
    that shuffles them back out is not a diff).

    One full outer join on the key; change detection compares the
    `compare` columns null-safely (`<=>`), so NULL→value and
    value→NULL transitions count as changes. At scale both sides hash
    once on the key — store snapshots bucketed on it and the exchanges
    vanish; the output is bounded by churn, not table size.
    """
    assert key and compare, "need key and compare columns"
    # presence flags must come from the join sides, not value nullness
    # (a legitimately-NULL compare column must not read as "absent")
    o2 = old.select(*key, F.lit(1).alias("_in_old"),
                    *[F.col(c).alias(f"_o_{c}") for c in compare])
    n2 = new.select(*key, F.lit(1).alias("_in_new"),
                    *[F.col(c).alias(f"_n_{c}") for c in compare])
    j2 = o2.join(n2, on=list(key), how="full_outer")
    same = None
    for c in compare:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j2.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key, "change")
    )
