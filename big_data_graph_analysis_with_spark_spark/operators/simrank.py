"""SimRank node-matching (SURVEY.md §2 rows G5, G6, F6, F7).

Reference semantics (`HelperFunction.scala:202-271` — SimRankv_2):

* init: score(p, n) = 1 if the perturbed node p equals original node n
  on the **full 10-field tuple** (`:219-229`), else 0;
* one sweep over pairs p ≠ n:
  ``score(p,n) = round₂( 1/(|P(p)|·|P(n)|) · Σ_{(p',n') ∈ P(p)×P(n)} score(p',n') )``
  with decay C = 1 (`:240-250`), parent-pair scores falling back to the
  accumulator's known matches when absent (`:246-247`); pairs with no
  parents on either side score 0 (`:251-255`);
* zero scores dropped from the output (`:264`).

Scale-first reformulation: the reference enumerates all |PG|·|OG|
pairs with in-place (Gauss-Seidel) updates — O(V²) memory and
file-order-dependent results (deviation §7.4.2: we run batch/Jacobi
rounds, deterministic and order-independent). Instead of enumerating
pairs, we *propagate* nonzero scores along edges:

    contrib(c_p, c_n) = Σ score(p', n')  for p'→c_p ∈ E_pg, n'→c_n ∈ E_og

i.e. scores ⋈ pg_edges ⋈ og_edges → groupBy child pair → sum. Only
pairs reachable from a nonzero seed are ever materialized — the sparse
frontier, not the V² cross product. Both joins are equi-joins on the
parent id (shuffle or broadcast chosen by AQE), and the aggregation
gets map-side partial sums. Exactly the plan you'd want at 100 TB.

Summation is done in DECIMAL(28,6): scores are 2-decimal fixed-point
values after each round's HALF_UP rounding (`F.round` matches the
reference's BigDecimal HALF_UP, `HelperFunction.scala:250`), so decimal
summation is exact and order-independent — float sums would make
results nondeterministic across partitionings (and break the DuckDB
oracle hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import NetGraph, vertex_fingerprint


def init_scores(pg: NetGraph, og: NetGraph) -> DataFrame:
    """Identity pairs: (pg_id, og_id, 1.0) where the full 10-field tuples
    are equal (`HelperFunction.scala:219-229`).

    Joining on a 64-bit fingerprint of the tuple instead of 10 columns
    keeps the shuffle key to 8 bytes; the fingerprint includes id, so
    only unperturbed survivors match (same semantics as case-class
    equality in the reference).
    """
    p = pg.vertices.select(
        F.col("id").alias("pg_id"), vertex_fingerprint().alias("fp")
    )
    n = og.vertices.select(
        F.col("id").alias("og_id"), vertex_fingerprint().alias("fp")
    )
    return p.join(n, on="fp").select(
        "pg_id", "og_id", F.lit(1.0).cast("double").alias("score")
    )


def _in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("dst").agg(F.count("*").alias("indeg"))


def simrank_round(
    scores: DataFrame,
    pg: NetGraph,
    og: NetGraph,
    matches: DataFrame | None = None,
    attr_bucket: bool = False,
    bucket_mod: int | None = None,
) -> DataFrame:
    """One Jacobi propagation round. Returns the new (pg_id, og_id, score).

    * `matches` (optional, columns pg_id/og_id/score) provides the
      accumulator-fallback for parent pairs absent from `scores`
      (`HelperFunction.scala:246-247`) and prunes already-matched nodes
      from recomputation (G6, `HelperFunction.scala:203-210`).
    * Identity pairs are not recomputed — the reference only sweeps
      p ≠ n, so exact-equality pairs keep score 1 (`:221-229`).
    * `attr_bucket=True` enables candidate pruning (SURVEY.md §7.4.1):
      only child pairs agreeing on the G7 tie-score attributes
      {children, props, max_depth, max_properties} are scored — the
      attributes the best-match resolution ranks by anyway
      (`HelperFunction.scala:286-294`). The bucket equality becomes part
      of the propagation join key, so disagreeing pairs are never
      materialized: on a graph where the reference's pair enumeration is
      O(|PG|·|OG|), this divides the frontier by the bucket count. This
      is the scale path — pruned pairs score 0, which the reference
      drops from its output anyway (`:264`).
    * `bucket_mod=m` (requires `attr_bucket`) WIDENS the bucket key
      with the child-id residue class (`pg_child % m = og_child % m`)
      — the round-9 scale-probe mitigation. The tie-attribute
      vocabulary is fixed by the value domain, so per-bucket frontiers
      grow linearly with SF and candidate pairs quadratically (the
      measured 100×-probe crossover, SCALING.md §Round 9); each
      residue class multiplies the bucket vocabulary by m and divides
      the pair term by m. In the MitM workload the perturbed graph
      keeps original ids, so true matches are id-equal and always
      share a residue class — surviving candidates keep every true
      match, and each SURVIVING pair's score is bit-identical to the
      `attr_bucket`-only variant's (the restriction drops whole child
      pairs, never individual contributions): the wide result is a
      strict row-subset, property-tested and oracle-checked.
    """
    identity = init_scores(pg, og)

    if matches is not None:
        # score-map lookup wins; accumulator matches fill the gaps
        fallback = matches.select("pg_id", "og_id", "score").join(
            scores.select("pg_id", "og_id"), on=["pg_id", "og_id"], how="left_anti"
        )
        effective = scores.unionByName(fallback)
    else:
        effective = scores

    pg_fwd = pg.edges.select(F.col("src").alias("pg_id"), F.col("dst").alias("pg_child"))
    og_fwd = og.edges.select(F.col("src").alias("og_id"), F.col("dst").alias("og_child"))

    if matches is not None:
        # G6 prune (HelperFunction.scala:203-210), pushed *into* the
        # propagation: a pair whose pg or og side is already matched is
        # dropped from the output, so edges leading to matched children
        # can be pruned before the join. Catalyst can't push a filter
        # through the child-pair aggregation on its own; doing it here
        # collapses the frontier from O(Σ outdeg²) to the unmatched
        # remainder — the difference between a dead executor and a
        # sub-second stage once most nodes are matched.
        pg_fwd = pg_fwd.join(
            matches.select(F.col("pg_id").alias("pg_child")).distinct(),
            on="pg_child",
            how="left_anti",
        )
        og_fwd = og_fwd.join(
            matches.select(F.col("og_id").alias("og_child")).distinct(),
            on="og_child",
            how="left_anti",
        )

    if attr_bucket:
        from ..model import TIE_SCORE_ATTRS

        pg_fwd = pg_fwd.join(
            pg.vertices.select(
                F.col("id").alias("pg_child"),
                *[F.col(a).alias(f"pb_{a}") for a in TIE_SCORE_ATTRS],
            ),
            on="pg_child",
        )
        og_fwd = og_fwd.join(
            og.vertices.select(
                F.col("id").alias("og_child"),
                *[F.col(a).alias(f"ob_{a}") for a in TIE_SCORE_ATTRS],
            ),
            on="og_child",
        )
        og_fwd = og_fwd.withColumnRenamed("og_id", "og_parent")
        residue = []
        if bucket_mod:
            pg_fwd = pg_fwd.withColumn(
                "pb_res", F.col("pg_child") % bucket_mod
            )
            og_fwd = og_fwd.withColumn(
                "ob_res", F.col("og_child") % bucket_mod
            )
            residue = [F.col("pb_res") == F.col("ob_res")]
        joined = effective.join(pg_fwd, on="pg_id").join(
            og_fwd,
            on=[F.col("og_id") == F.col("og_parent")]
            + [
                F.col(f"pb_{a}") == F.col(f"ob_{a}")
                for a in TIE_SCORE_ATTRS
            ]
            + residue,
        )
    else:
        joined = effective.join(pg_fwd, on="pg_id").join(og_fwd, on="og_id")

    contrib = joined.groupBy(
        F.col("pg_child").alias("c_pg_id"), F.col("og_child").alias("c_og_id")
    ).agg(
        # exact fixed-point summation (scores are 2-decimal after round 1)
        F.sum(F.col("score").cast("decimal(28,6)")).alias("s")
    )

    computed = (
        contrib.join(
            _in_degrees(pg.edges).select(
                F.col("dst").alias("c_pg_id"), F.col("indeg").alias("dp")
            ),
            on="c_pg_id",
        )
        .join(
            _in_degrees(og.edges).select(
                F.col("dst").alias("c_og_id"), F.col("indeg").alias("dn")
            ),
            on="c_og_id",
        )
        .select(
            F.col("c_pg_id").alias("pg_id"),
            F.col("c_og_id").alias("og_id"),
            # reciprocal coefficient (F7) + HALF_UP round-2 (F6)
            F.round(F.col("s").cast("double") / (F.col("dp") * F.col("dn")), 2).alias(
                "score"
            ),
        )
        .filter(F.col("score") != 0)  # zero-score prune (P4)
    )

    return computed.join(
        identity, on=["pg_id", "og_id"], how="left_anti"
    ).unionByName(identity)


def simrank(
    pg: NetGraph,
    og: NetGraph,
    rounds: int = 1,
    matches: DataFrame | None = None,
    attr_bucket: bool = False,
    bucket_mod: int | None = None,
) -> DataFrame:
    """`rounds` Jacobi sweeps from the identity seed (the reference does
    exactly one in-place sweep per walk subgraph; more rounds refine the
    fixpoint)."""
    scores = init_scores(pg, og)
    for i in range(rounds):
        if i > 0:
            # materialize between rounds: a round's plan references its
            # input 3+ times (seed, prune, anti-join, union), so lazy
            # chaining compounds the plan per round — q_simrank_round2's
            # physical plan carried 956 parquet scans before this (r12;
            # simrank_fixpoint already checkpoints per iterate). The
            # single-round call — the bench path — is untouched.
            scores = scores.localCheckpoint()
        scores = simrank_round(
            scores,
            pg,
            og,
            matches,
            attr_bucket=attr_bucket,
            bucket_mod=bucket_mod,
        )
    return scores


def simrank_fixpoint(
    pg: NetGraph,
    og: NetGraph,
    max_rounds: int = 10,
    matches: DataFrame | None = None,
    attr_bucket: bool = True,
) -> tuple[DataFrame, int]:
    """Iterate Jacobi rounds until the score table stops changing
    (SURVEY.md §7.1.5: "Jacobi iteration to fixpoint-or-k-rounds").

    Convergence test: symmetric difference of the (pg_id, og_id, score)
    sets is empty — exact, because scores are 2-decimal fixed-point
    after each round's HALF_UP rounding (float tolerance games are
    unnecessary by construction). Each iterate is localCheckpointed to
    cut lineage, same as the pipeline's match table.

    Returns (scores, rounds_run). Defaults to bucketed candidate
    pruning — the unbucketed frontier is quadratic on dense graphs and
    a fixpoint loop multiplies that cost per round.
    """
    scores = init_scores(pg, og).localCheckpoint()
    for rnd in range(1, max_rounds + 1):
        nxt = simrank_round(
            scores, pg, og, matches, attr_bucket=attr_bucket
        ).localCheckpoint()
        changed = (
            nxt.exceptAll(scores).limit(1).count()
            + scores.exceptAll(nxt).limit(1).count()
        )
        if changed == 0:
            return nxt, rnd
        scores = nxt
    return scores, max_rounds
