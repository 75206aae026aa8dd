"""Best-match resolution and global match maintenance
(SURVEY.md §2 rows G7, G8, G9-replacement, A4, P5, P6).

G7 reference semantics (`findBestNodeMatch`, `HelperFunction.scala:274-301`):
per perturbed node with candidate (og node, score) list —

1. exactly one candidate → take it (`:276-278`);
2. a candidate equal to the perturbed node on the full tuple → take it
   (`:279-284`);
3. else score each candidate +1 per equal attribute among
   {children, props, maxDepth, maxProperties} (`:286-294`) and take the
   argmax (`sortBy(-_._2).head`, `:296` — ties fall to map order).

Deviation (SURVEY.md §7.4): map-order tie-breaking is nondeterministic;
we add ascending og_id as the final sort key. Case 1 is subsumed by the
argmax (a single candidate is its own argmax); case 2 is encoded as the
leading sort key.

G9: the reference's custom AccumulatorV2 max-merges per key in `add`
but blindly overwrites in `merge` (`Main.scala:22-43`) — last-write-wins
across partitions. We replace it with a `matches` DataFrame merged by a
deterministic per-key argmax each driver round, which is the documented
*intent* ("share results after specified iterations", README.md:142).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..model import TIE_SCORE_ATTRS, NetGraph, vertex_fingerprint


def best_match(candidates: DataFrame, pg: NetGraph, og: NetGraph) -> DataFrame:
    """Resolve (pg_id, og_id, score) candidates to one match per pg node.

    Implementation: join candidate pairs to both vertex tables, compute
    the exact-equality flag (fingerprint) and the 4-attribute tie score
    as a sum of boolean indicators (A8), then one window argmax per
    pg_id ordered by (exact, tie_score, score, og_id). Both joins are
    id-keyed equi-joins; the window shuffles once on pg_id — at scale
    this is a single repartition of the (small) candidate set, never of
    the graphs.
    """
    p = pg.vertices.select(
        F.col("id").alias("pg_id"),
        vertex_fingerprint().alias("p_fp"),
        *[F.col(a).alias(f"p_{a}") for a in TIE_SCORE_ATTRS],
    )
    n = og.vertices.select(
        F.col("id").alias("og_id"),
        vertex_fingerprint().alias("n_fp"),
        *[F.col(a).alias(f"n_{a}") for a in TIE_SCORE_ATTRS],
    )
    scored = (
        candidates.join(p, on="pg_id")
        .join(n, on="og_id")
        .withColumn("exact", (F.col("p_fp") == F.col("n_fp")).cast("int"))
        .withColumn(
            "tie_score",
            sum(
                (F.col(f"p_{a}") == F.col(f"n_{a}")).cast("int")
                for a in TIE_SCORE_ATTRS
            ),
        )
    )
    w = Window.partitionBy("pg_id").orderBy(
        F.desc("exact"), F.desc("tie_score"), F.desc("score"), F.asc("og_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pg_id", "og_id", "score")
    )


def merge_matches(current: DataFrame | None, new: DataFrame) -> DataFrame:
    """Global max-merge (A4): keep the highest-scoring match per pg node.

    Ties keep the smallest og_id (deterministic). Replaces the
    reference accumulator's add/merge pair (`Main.scala:29-42`).
    """
    allm = new if current is None else current.unionByName(new)
    w = Window.partitionBy("pg_id").orderBy(F.desc("score"), F.asc("og_id"))
    return (
        allm.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("pg_id", "og_id", "score")
    )


def valuable_matches(matches: DataFrame, og: NetGraph) -> DataFrame:
    """G8 (`Main.scala:124-126`): keep matches whose matched *original*
    node holds valuable data."""
    valuable = og.vertices.filter(F.col("valuable_data")).select(
        F.col("id").alias("og_id")
    )
    return matches.join(valuable, on="og_id", how="left_semi").select(
        "pg_id", "og_id", "score"
    )


def classify_matches(matches: DataFrame, threshold: float) -> DataFrame:
    """P5+P6 (`Main.scala:180-182`): label above-threshold matches as
    true positives (pg_id == og_id — the node really is its own
    pre-perturbation self) or false positives."""
    return matches.filter(F.col("score") > threshold).withColumn(
        "is_true_positive", F.col("pg_id") == F.col("og_id")
    )


def match_class_counts(matches: DataFrame, threshold: float) -> DataFrame:
    """(n_true_positive, n_false_positive) one-row summary
    (`Main.scala:180-183`)."""
    c = classify_matches(matches, threshold)
    return c.agg(
        F.coalesce(
            F.sum(F.col("is_true_positive").cast("long")), F.lit(0)
        ).alias("n_true_positive"),
        F.coalesce(
            F.sum((~F.col("is_true_positive")).cast("long")), F.lit(0)
        ).alias("n_false_positive"),
    )


def uncovered_valuable(matches: DataFrame, og: NetGraph) -> DataFrame:
    """T1/G11 (`Main.scala:164-167`): valuable original node ids minus
    the matched *perturbed-side* ids — the reference diffs against
    ``mapaccnodeids = accumulator keys = pg ids`` (`Main.scala:164`),
    i.e. "was any walk's match keyed on this id", not "was this og node
    somebody's match target". The two differ exactly on false positives."""
    valuable = og.vertices.filter(F.col("valuable_data")).select("id")
    return valuable.join(
        matches.select(F.col("pg_id").alias("id")), on="id", how="left_anti"
    )
