"""Per-walk SimRank: the reference's inner loop, batched across all
walks of a round as one DataFrame plan (SURVEY.md §3.1 restatement).

Reference (`Main.scala:104-108`): for every walk subgraph it calls
``SimRankv_2(subgraph.nodes, generateParentMap(subgraph),
og.nodes, generateParentMap(og), accumulator)`` — i.e. the perturbed
side is the *walk-induced subgraph* (its own parent map), the original
side is the whole graph. Serially, one walk at a time.

Spark-first: every join/aggregate below carries ``walk_id`` in its key,
so ALL walks of a round are scored in one shot — the per-walk loop
becomes partitioning, not iteration. Group sizes are bounded by the
walk quota (coeff·|V| nodes), so keys are well distributed; the og side
(edges, in-degrees) is walk-independent and joins once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import NetGraph
from .simrank import init_scores


def walk_induced_edges(pg: NetGraph, walk_nodes: DataFrame) -> DataFrame:
    """(walk_id, src, dst): pg edges with both endpoints visited by the
    walk (J3, `HelperFunction.scala:336,355`)."""
    wn_src = walk_nodes.select("walk_id", F.col("id").alias("src"))
    wn_dst = walk_nodes.select("walk_id", F.col("id").alias("dst"))
    return (
        pg.edges.select("src", "dst")
        .join(wn_src, on="src")
        .join(wn_dst, on=["walk_id", "dst"])
        .select("walk_id", "src", "dst")
    )


def walk_simrank_round(
    pg: NetGraph,
    og: NetGraph,
    walk_nodes: DataFrame,
    matches: DataFrame | None = None,
    identity: DataFrame | None = None,
    og_indeg: DataFrame | None = None,
) -> DataFrame:
    """One Jacobi sweep per walk subgraph, all walks at once.

    `walk_nodes`: (walk_id, id) — distinct visited nodes per walk.
    Returns (walk_id, pg_id, og_id, score).

    Parent maps: pg side from the walk-induced subgraph (in-degrees per
    walk), og side global — exactly the reference's argument pair.
    `matches` plays the accumulator: fallback scores for parent pairs
    (`HelperFunction.scala:246-247`) and G6 pruning of already-matched
    nodes, pushed into the edge tables before the propagation join.

    `identity` / `og_indeg` optionally supply the ROUND-INVARIANT
    frames precomputed (and materialized) by the caller: the identity
    seed appears 3-4× in every round's plan and the og in-degree table
    once — a round loop that recomputes them pays the 10-attribute
    vertex join and the og edge aggregation num_rounds× for nothing
    (r12, guide §5 caching). Semantics are identical: both default to
    the same in-plan derivation.
    """
    if identity is None:
        identity = init_scores(pg, og)  # (pg_id, og_id, 1.0)

    # per-walk identity seed: restrict to nodes the walk visited
    walk_identity = walk_nodes.join(
        identity, on=walk_nodes.id == identity.pg_id
    ).select("walk_id", "pg_id", "og_id", "score")

    scores = walk_identity
    if matches is not None:
        # accumulator fallback for parent pairs absent from the seed
        fallback = (
            walk_nodes.join(
                matches.select("pg_id", "og_id", "score"),
                on=walk_nodes.id == matches.pg_id,
            )
            .select("walk_id", "pg_id", "og_id", "score")
            .join(
                walk_identity.select("walk_id", "pg_id", "og_id"),
                on=["walk_id", "pg_id", "og_id"],
                how="left_anti",
            )
        )
        scores = walk_identity.unionByName(fallback)

    induced = walk_induced_edges(pg, walk_nodes)
    wedges = induced
    og_fwd = og.edges.select(
        F.col("src").alias("og_id"), F.col("dst").alias("og_child")
    )
    if matches is not None:
        # G6 prune pushed into the propagation (see simrank.simrank_round)
        wedges = wedges.join(
            matches.select(F.col("pg_id").alias("dst")).distinct(),
            on="dst",
            how="left_anti",
        )
        og_fwd = og_fwd.join(
            matches.select(F.col("og_id").alias("og_child")).distinct(),
            on="og_child",
            how="left_anti",
        )

    # per-walk in-degrees of the induced subgraph = |P(p)| in the
    # reference's reciprocal coefficient (F7) — from the UNPRUNED
    # induced edges so the coefficient matches true subgraph parent
    # counts (one shared subplan with the propagation input)
    walk_indeg = induced.groupBy("walk_id", "dst").agg(
        F.count("*").alias("dp")
    )
    if og_indeg is None:
        og_indeg = og.edges.groupBy("dst").agg(F.count("*").alias("dn"))

    contrib = (
        scores.join(
            wedges.select("walk_id", F.col("src").alias("pg_id"), F.col("dst").alias("pg_child")),
            on=["walk_id", "pg_id"],
        )
        .join(og_fwd, on="og_id")
        .groupBy("walk_id", F.col("pg_child").alias("c_pg"), F.col("og_child").alias("c_og"))
        .agg(F.sum(F.col("score").cast("decimal(28,6)")).alias("s"))
    )

    computed = (
        contrib.join(
            walk_indeg.select(
                "walk_id", F.col("dst").alias("c_pg"), "dp"
            ),
            on=["walk_id", "c_pg"],
        )
        .join(og_indeg.select(F.col("dst").alias("c_og"), "dn"), on="c_og")
        .select(
            "walk_id",
            F.col("c_pg").alias("pg_id"),
            F.col("c_og").alias("og_id"),
            F.round(F.col("s").cast("double") / (F.col("dp") * F.col("dn")), 2).alias("score"),
        )
        .filter(F.col("score") != 0)
    )

    return computed.join(
        walk_identity.select("walk_id", "pg_id", "og_id"),
        on=["walk_id", "pg_id", "og_id"],
        how="left_anti",
    ).unionByName(walk_identity)
