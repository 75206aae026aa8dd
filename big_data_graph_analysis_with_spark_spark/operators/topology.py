"""Degree/topology operators (SURVEY.md §2 rows G1, A1, P1-P3, J2).

The reference computes these with serial Scala collection scans; here
each is one shuffle (or none) of declarative DataFrame algebra so
Catalyst gets pushdown/pruning and map-side partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import NetGraph


def start_nodes(graph: NetGraph) -> DataFrame:
    """Vertices with in-degree 0 — the walk entry points (G1).

    Reference: ``allNodes.diff(edges.map(_.toNode).distinct)`` —
    `HelperFunction.scala:181-186` (a full-tuple set difference realized
    as serial List.diff). Spark-first: LEFT ANTI join of vertices against
    distinct edge destinations. The dst side collapses via partial
    aggregation before the shuffle, and with vertices typically much
    larger than the distinct-dst set, AQE turns the anti join into a
    broadcast.
    """
    dsts = graph.edges.select(F.col("dst").alias("id")).distinct()
    return graph.vertices.join(dsts, on="id", how="left_anti")


def valuable_nodes(graph: NetGraph) -> DataFrame:
    """Vertices holding valuable data (P3, `Main.scala:165`)."""
    return graph.vertices.filter(F.col("valuable_data"))


def degrees(graph: NetGraph) -> DataFrame:
    """Per-vertex in/out degree: (id, in_degree, out_degree).

    Not a named reference operator, but the primitive behind G1 (in-degree
    0), sink detection (`HelperFunction.scala:333`, out-degree 0), and the
    SimRank reciprocal coefficient |P(p)| (F7). One aggregation over the
    union of endpoint projections — a single shuffle on id.
    """
    ends = graph.edges.select(
        F.col("src").alias("id"), F.lit(1).alias("outc"), F.lit(0).alias("inc")
    ).unionAll(
        graph.edges.select(F.col("dst").alias("id"), F.lit(0), F.lit(1))
    )
    deg = ends.groupBy("id").agg(
        F.sum("inc").alias("in_degree"), F.sum("outc").alias("out_degree")
    )
    return (
        graph.vertices.select("id")
        .join(deg, on="id", how="left")
        .select(
            "id",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        )
    )


def parent_map(graph: NetGraph) -> DataFrame:
    """Reverse adjacency: (id, parents sorted array) (A1).

    Reference: ``generateParentMap`` folds the edge list into a mutable
    child→parents multimap (`HelperFunction.scala:189-199`). Spark-first:
    one groupBy-collect_list; `sort_array` makes the result deterministic
    (collect_list order is not).
    """
    return graph.edges.groupBy(F.col("dst").alias("id")).agg(
        F.sort_array(F.collect_list("src")).alias("parents")
    )


def child_map(graph: NetGraph) -> DataFrame:
    """Forward adjacency: (id, children sorted array).

    The walk kernel's neighbor lookup (P7, `HelperFunction.scala:316-318`
    — a linear scan of the whole edge list per step in the reference)
    becomes one precomputed adjacency table, broadcast to the kernel.
    """
    return graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.sort_array(F.collect_list("dst")).alias("children")
    )
