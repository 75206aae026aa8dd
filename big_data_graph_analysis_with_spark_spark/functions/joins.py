"""Join-side sizing helpers.

``maybe_broadcast`` exists because an explicit ``F.broadcast()`` hint
OVERRIDES AQE's size check: Spark attempts the broadcast even when the
frame is executor-memory-sized, so a hint placed on an sf-proportional
table is a latent OOM at large scale factors. In TPC-H-shaped data
customer/supplier/part all scale LINEARLY with SF — at the 100 TB
target (sf ≈ 100k) a two-column customer projection is ~15 B rows —
and only nation/region (and frames grouped BY them) are constant-sized.

The helper consults Catalyst's compile-time size estimate (free: no
job runs; for parquet scans it derives from file size × column
pruning) and attaches the hint only when the frame fits the broadcast
budget. Otherwise the frame is returned UNHINTED and AQE decides from
observed sizes at runtime — broadcast at small SF, shuffle at large —
which is the safe direction in both cases: Catalyst overestimates
derived frames (aggregate output is estimated at child size), and an
overestimate merely defers the decision to AQE rather than forcing a
fatal broadcast.

Usage rule of thumb (round-8 verdict): keep bare ``F.broadcast`` for
nation/region projections, 1-row scalar aggregates, and per-nation
grouped frames; route every customer/supplier/part-proportional frame
through ``maybe_broadcast``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mirrors the session factory's autoBroadcastJoinThreshold
# (session.py: 64 MiB — safe for multi-GB executors). Kept as a module
# constant so the gate is deterministic even under a bare driver
# session whose threshold string ("10485760b") varies by Spark version.
BROADCAST_BUDGET_BYTES = 64 * 1024 * 1024


def maybe_broadcast(df: DataFrame) -> DataFrame:
    """Size-gated broadcast hint.

    Returns ``F.broadcast(df)`` when Catalyst's optimized-plan size
    estimate fits :data:`BROADCAST_BUDGET_BYTES`; otherwise ``df``
    unchanged, leaving the join strategy to AQE's runtime size check.
    Any introspection failure falls through to the unhinted frame —
    at scale, *not* broadcasting is always recoverable.
    """
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # pragma: no cover - py4j/analysis edge
        return df
    if 0 <= size <= BROADCAST_BUDGET_BYTES:
        return F.broadcast(df)
    return df


def shuffle_width(df: DataFrame) -> int:
    """The session's shuffle width as an int, with a safe fallback.

    ``spark.sql.shuffle.partitions`` may be non-numeric on managed
    deployments (e.g. ``"auto"`` under Databricks AQE); parse failure
    falls back to the cluster's default parallelism rather than
    raising (round-10 advice on ``cosine_topk``).
    """
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return df.sparkSession.sparkContext.defaultParallelism


def spread_before_explode(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session shuffle width, applied to
    a frame about to be fanned out ≥~10× (shingle/component ``explode``,
    or a broadcast join INTO its scan stage).

    Why this is a named rule and not an ad-hoc tweak: compressed input
    bytes under-represent post-fan-out work by up to two orders of
    magnitude, so a corpus that fits in few input splits runs its whole
    fan-out on few map tasks regardless of cluster size. Two round-10
    100× probes hit exactly this — a 60 MB single-file corpus put a
    75M-shingle explode on ONE task for ~25 min
    (`curation.ngram_novelty_profile`), and a 100-query broadcast into
    a few-split corpus scan ran 1.3e9 decimal ops in ~4 tasks
    (`similarity.cosine_topk`). One raw-row shuffle (tiny next to the
    fan-out volume) decouples map parallelism from file layout; on a
    many-file production corpus it is near-free insurance.
    """
    return df.repartition(shuffle_width(df))
