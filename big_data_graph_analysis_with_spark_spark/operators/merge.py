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


def maintain_group_aggregate(
    state: DataFrame, cdc: DataFrame, key_col: str = "key"
) -> DataFrame:
    """Incremental view maintenance for a grouped COUNT/SUM aggregate:
    fold a row-level CDC batch into the MATERIALIZED aggregate state
    without touching the base table — the standard IVM delta algebra.

    `state` is (key, n, sum_cents) — the materialized
    ``GROUP BY key: COUNT(*), SUM(cents)``. `cdc` is one row per base-
    table row change: (op, key, old_cents, new_cents) with op ∈
    {'I','U','D'}: I inserts a row worth new_cents, D deletes a row
    worth old_cents, U rewrites old_cents → new_cents in place.

    Per key the delta is Δn = #I − #D and Δsum = Σnew(I) + Σ(new−old)(U)
    − Σold(D); keys whose maintained n reaches 0 leave the state (an
    aggregate over zero rows has no row, matching recomputation).
    COUNT and SUM are SELF-MAINTAINABLE under deletes; MIN/MAX are not
    (a deleted minimum forces a rescan) and are deliberately absent —
    callers needing them re-aggregate, and the docstring says so
    instead of shipping a wrong fold.

    Scale shape: the change batch aggregates map-side to per-key
    deltas, then ONE key-hash shuffle merges state and deltas via
    union+sum — no join; with key-bucketed state the state side's
    exchange disappears (same note as `upsert`).

    Equivalence contract (property-tested): for any base and any CDC
    batch, ``maintain(aggregate(base), cdc) ≡ aggregate(apply(base,
    cdc))``.
    """
    deltas = cdc.groupBy(F.col(key_col)).agg(
        F.sum(
            F.when(F.col("op") == "I", 1)
            .when(F.col("op") == "D", -1)
            .otherwise(0)
        ).alias("n"),
        F.sum(
            F.when(F.col("op") == "I", F.col("new_cents"))
            .when(F.col("op") == "D", -F.col("old_cents"))
            .when(
                F.col("op") == "U", F.col("new_cents") - F.col("old_cents")
            )
            .otherwise(0)
        ).alias("sum_cents"),
    )
    merged = state.select(key_col, "n", "sum_cents").unionByName(deltas)
    return (
        merged.groupBy(key_col)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
        .filter(F.col("n") > 0)
    )


def maintain_distinct_count(
    aux: DataFrame, cdc: DataFrame, key_col: str = "key"
) -> tuple[DataFrame, DataFrame]:
    """Incremental view maintenance for ``COUNT(DISTINCT v) GROUP BY
    key`` — the canonical NON-self-maintainable aggregate made
    maintainable with AUXILIARY state: `aux` is (key, v, m) holding the
    multiplicity of every live (key, value) pair in the base table. A
    distinct value dies only when its multiplicity reaches zero, which
    the count alone cannot see — hence the aux relation (textbook IVM;
    the same reason MIN/MAX needs one).

    `cdc` rows are (op, key, old_v, new_v) with op ∈ {'I','U','D'}
    over base-table rows. Returns ``(aux', view)``: the maintained
    auxiliary state and the derived (key, n_distinct) view. Both sides
    of an update touch the aux (old_v loses a copy, new_v gains one).

    Scale shape: delta aggregation map-side, ONE (key, v) hash shuffle
    for the aux merge (union+sum, no join), then one key shuffle for
    the view. Aux size is bounded by live distinct pairs — the same
    footprint a recompute would shuffle every time; maintenance pays it
    only on changed keys' values.
    """
    gains = cdc.filter(F.col("op").isin("I", "U")).select(
        F.col(key_col), F.col("new_v").alias("v"), F.lit(1).alias("m")
    )
    losses = cdc.filter(F.col("op").isin("D", "U")).select(
        F.col(key_col), F.col("old_v").alias("v"), F.lit(-1).alias("m")
    )
    merged = (
        aux.select(key_col, "v", "m")
        .unionByName(gains)
        .unionByName(losses)
        .groupBy(key_col, "v")
        .agg(F.sum("m").cast("long").alias("m"))
        .filter(F.col("m") > 0)
    )
    view = merged.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_distinct")
    )
    return merged, view


def maintain_value_histogram(
    hist: DataFrame, cdc: DataFrame, key_col: str = "key"
) -> DataFrame:
    """IVM for the per-key VALUE HISTOGRAM (key, cents, w) — the state
    from which every exact-quantile operator in this engine derives its
    answer. Counts are self-maintainable (I adds a copy of new_cents,
    D removes one of old_cents, U does both), so maintaining the
    histogram under CDC gives INCREMENTAL EXACT QUANTILES: fold the
    batch here, then run `quantile_from_histogram` — no base-table
    rescan. Zero-weight cells leave the state.

    Scale shape: same union+sum merge as the other IVM folds — ONE
    (key, cents) hash shuffle, no join. The state is the same
    distinct-value histogram the batch quantile path builds per query;
    maintenance amortizes it across queries.
    """
    gains = cdc.filter(F.col("op").isin("I", "U")).select(
        F.col(key_col), F.col("new_cents").alias("cents"), F.lit(1).alias("w")
    )
    losses = cdc.filter(F.col("op").isin("D", "U")).select(
        F.col(key_col), F.col("old_cents").alias("cents"), F.lit(-1).alias("w")
    )
    return (
        hist.select(key_col, "cents", "w")
        .unionByName(gains)
        .unionByName(losses)
        .groupBy(key_col, "cents")
        .agg(F.sum("w").cast("long").alias("w"))
        .filter(F.col("w") > 0)
    )


def quantile_from_histogram(
    hist: DataFrame, q_tenths: int, key_col: str = "key"
) -> DataFrame:
    """(key, n, q_cents): the exact present-value quantile (type-1 lo
    convention, 0-indexed rank ((n−1)·q_tenths) div 10) read off a
    (key, cents, w) histogram — the consumer of
    `maintain_value_histogram`, sharing the covering-row pick with
    every other exact-quantile operator here. `q_tenths` ∈ 1..10."""
    w = Window.partitionBy(key_col).orderBy("cents")
    cum = hist.select(
        key_col,
        "cents",
        "w",
        F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("w")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("n"),
    )
    want = F.expr(f"((n - 1) * {q_tenths}) div 10")
    return (
        cum.filter((F.col("cum") - F.col("w") <= want) & (want < F.col("cum")))
        .select(
            key_col,
            F.col("n").cast("long").alias("n"),
            F.col("cents").cast("long").alias("q_cents"),
        )
    )
