"""Induced-subgraph operators (SURVEY.md §2 rows J3, J2+O2).

Reference: a walk's visited node set induces a subgraph —
``Edges.filter(ac => subNodes.contains(ac.fromNode) && subNodes.contains(ac.toNode))``
(`HelperFunction.scala:336,355`) — and its init node is picked as the
first node of the set-difference against edge destinations
(`HelperFunction.scala:337,356`), i.e. an in-degree-0 node *within the
subgraph*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import NetGraph


def induced_subgraph(graph: NetGraph, node_ids: DataFrame) -> NetGraph:
    """Subgraph induced by `node_ids` (a DataFrame with column ``id``).

    Double LEFT SEMI join (J3): edges survive iff both endpoints are in
    the set. The node set is usually tiny relative to the graph (a walk
    visits ≤ coeff·|V| nodes) → Catalyst broadcasts it to both semi
    joins; no shuffle of the edge table.
    """
    ids = node_ids.select("id").distinct()
    vertices = graph.vertices.join(ids, on="id", how="left_semi")
    edges = (
        graph.edges.join(ids.withColumnRenamed("id", "src"), on="src", how="left_semi")
        .join(ids.withColumnRenamed("id", "dst"), on="dst", how="left_semi")
        .select(graph.edges.columns)
    )
    return NetGraph(vertices, edges, graph.init_id)


def subgraph_init_node(sub: NetGraph) -> DataFrame:
    """Deterministic init node of a subgraph: the smallest in-degree-0 id.

    The reference takes ``.head`` of the diff in insertion order
    (`HelperFunction.scala:337`) — order-dependent and crash-prone on
    cyclic subgraphs (SURVEY.md §7.4.8). We take min(id), and fall back
    to min(id) over all subgraph nodes when no in-degree-0 node exists,
    so cycles degrade gracefully instead of throwing.
    """
    dsts = sub.edges.select(F.col("dst").alias("id")).distinct()
    roots = sub.vertices.join(dsts, on="id", how="left_anti")
    return roots.agg(F.min("id").alias("init_id")).join(
        sub.vertices.agg(F.min("id").alias("fallback_id")), how="cross"
    ).select(F.coalesce("init_id", "fallback_id").alias("init_id"))
