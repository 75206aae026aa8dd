"""Similarity search over embedding columns (`array<float>`).

Two paths, per the standard ANN recipe:

* :func:`cosine_topk` — exact brute-force top-k, the correctness
  baseline. Decimal-arithmetic dot products (see dedup.py) so the
  DuckDB oracle reproduces scores bit-for-bit; ranking ties broken by
  neighbor id.
* :func:`ann_lsh_topk` — sign-random-projection LSH: P deterministic
  hyperplanes (components derived from hash56(p,j), so both engines —
  and every executor — materialize the same planes without shipping
  state), bucket on the P-bit signature, search only in-bucket. Linear
  candidate generation; recall measured against the exact baseline in
  tests rather than oracle-checked (approximation ≠ SQL identity).

Scale notes: brute force is O(Q·N·d) — fine for reranking small Q,
dead for corpus×corpus. LSH buckets shrink the candidate set by ~2^P;
multi-probe (flipping low-margin bits) trades recall for probes without
re-bucketing. Both paths are pure DataFrame algebra; the dot product
stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash56
from .dedup import _decimal_components

#: OR-construction: L tables × r planes each. A pair is a candidate if
#: it collides in ANY table: P = 1 − (1 − p^r)^L for per-plane
#: agreement p = 1 − θ/π. r controls precision, L recall.
NUM_TABLES = 8
PLANES_PER_TABLE = 6


def cosine_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `emb`: (vec_id, embedding); `queries`: same schema (usually a small
    filtered subset — it broadcasts). Self-matches excluded.
    Returns (query_id, neighbor_id, rank, cosine).
    """
    comp = _decimal_components(emb)
    qcomp = _decimal_components(queries).select(
        F.col("vec_id").alias("query_id"), "j", F.col("x").alias("qx")
    )
    norms = comp.groupBy("vec_id").agg(F.sum(F.col("x") * F.col("x")).alias("nsq"))
    qnorms = qcomp.groupBy("query_id").agg(
        F.sum(F.col("qx") * F.col("qx")).alias("qnsq")
    )
    dots = (
        qcomp.join(comp.select(F.col("vec_id").alias("neighbor_id"), "j", "x"), on="j")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("qx") * F.col("x")).alias("dot"))
    )
    scored = (
        dots.join(qnorms, on="query_id")
        .join(norms.select(F.col("vec_id").alias("neighbor_id"), "nsq"), on="neighbor_id")
        .withColumn(
            # round(9) absorbs the 1-ulp slack in DuckDB's
            # decimal→double cast; ranking and output both use it
            "cosine",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("qnsq").cast("double") * F.col("nsq").cast("double")),
                9,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cosine")
    )


def _plane_component(table: int, p: int) -> F.Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from hash56 of (table, plane, dim) — every executor (and
    the test oracle) materializes identical planes with zero state."""
    h = hash56(F.concat_ws(":", F.lit(table), F.lit(p), F.col("j")))
    return (h % 2_000_001 - 1_000_000) / F.lit(1_000_000.0)


def lsh_signatures(
    emb: DataFrame,
    num_tables: int = NUM_TABLES,
    planes_per_table: int = PLANES_PER_TABLE,
) -> DataFrame:
    """(vec_id, table, sig): sign-random-projection bucket per table.

    All L·r projections come out of ONE groupBy (L·r aggregate columns,
    map-side combined) — not L passes over the data."""
    comp = emb.select("vec_id", F.posexplode("embedding").alias("j", "x"))
    proj = comp.groupBy("vec_id").agg(
        *[
            F.sum(F.col("x").cast("double") * _plane_component(t, p)).alias(
                f"p_{t}_{p}"
            )
            for t in range(num_tables)
            for p in range(planes_per_table)
        ]
    )
    tables = []
    for t in range(num_tables):
        sig = None
        for p in range(planes_per_table):
            term = F.when(
                F.col(f"p_{t}_{p}") > 0, F.lit(1 << p).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            sig = term if sig is None else sig + term
        tables.append(
            proj.select("vec_id", F.lit(t).alias("table"), sig.alias("sig"))
        )
    out = tables[0]
    for t_df in tables[1:]:
        out = out.unionAll(t_df)
    return out


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_tables: int = NUM_TABLES,
    planes_per_table: int = PLANES_PER_TABLE,
) -> DataFrame:
    """Approximate top-k: candidates collide with the query in ≥1 LSH
    table, then exact cosine rerank (double arithmetic — the fast
    path). Returns (query_id, neighbor_id, rank, cosine)."""
    sigs = lsh_signatures(emb, num_tables, planes_per_table)
    qsigs = lsh_signatures(queries, num_tables, planes_per_table).select(
        F.col("vec_id").alias("query_id"), "table", "sig"
    )
    cands = (
        qsigs.join(sigs, on=["table", "sig"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    pairs = (
        cands.join(
            queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")),
            on="query_id",
        )
        .join(emb.select("vec_id", F.col("embedding").alias("ne")), on="vec_id")
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with("qe", "ne", lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn(
            "qn",
            F.aggregate(
                F.transform("qe", lambda a: a.cast("double") * a),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn(
            "nn",
            F.aggregate(
                F.transform("ne", lambda a: a.cast("double") * a),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .withColumn("cosine", F.col("dot") / F.sqrt(F.col("qn") * F.col("nn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long"),
            "cosine",
        )
    )
