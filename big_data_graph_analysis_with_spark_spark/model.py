"""Graph data model: vertices/edges DataFrames replacing the reference's
object graph.

Reference model (`NetGraph/src/main/scala/NetGraphAlgebraDefs/NetGraphComponent.scala:7-11`):

* ``NodeObject`` — 10 fields (id, children, props, currentDepth,
  propValueRange, maxDepth, maxBranchingFactor, maxProperties,
  storedValue, valuableData).
* ``Action`` — directed edge embedding two full ``NodeObject``s plus
  payload (actionType, fromId, toId, resultingValue: Option[Int], cost).
* ``NetGraph(nodes, edges, initNode)`` (`src/main/scala/HelperFunction.scala:22`).

Spark-first restatement: node attributes live once in a ``vertices``
DataFrame; edges store ``src``/``dst`` foreign keys (the reference itself
re-canonicalizes embedded endpoint objects against the node list on load,
`HelperFunction.scala:145-149`, so ids are the true identity). "Node
equality" — full 10-tuple case-class equality in the reference
(`HelperFunction.scala:221`) — becomes equality of the full struct, for
which :func:`vertex_fingerprint` provides a cheap single-column stand-in.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: One row per NodeObject (NetGraphComponent.scala:7-8). id=0 is the init
#: node by NetGameSim convention (HelperFunction.scala:121).
VERTEX_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("children", T.LongType(), False),
        T.StructField("props", T.LongType(), False),
        T.StructField("current_depth", T.LongType(), False),
        T.StructField("prop_value_range", T.LongType(), False),
        T.StructField("max_depth", T.LongType(), False),
        T.StructField("max_branching_factor", T.LongType(), False),
        T.StructField("max_properties", T.LongType(), False),
        T.StructField("stored_value", T.DoubleType(), False),
        T.StructField("valuable_data", T.BooleanType(), False),
    ]
)

#: One row per Action (NetGraphComponent.scala:11). Endpoints are the
#: embedded nodes' ids (traversal uses fromNode/toNode —
#: HelperFunction.scala:190,313); from_field/to_field carry the opaque
#: fromId/toId payload, which does NOT necessarily equal src/dst.
EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("action_type", T.LongType(), False),
        T.StructField("from_field", T.LongType(), False),
        T.StructField("to_field", T.LongType(), False),
        T.StructField("resulting_value", T.LongType(), True),
        T.StructField("cost", T.DoubleType(), False),
    ]
)

#: Non-id attribute columns, in schema order. Used by fingerprints and by
#: the G7 tie-score attributes {children, props, max_depth, max_properties}
#: (HelperFunction.scala:286-294).
VERTEX_ATTRS = [f.name for f in VERTEX_SCHEMA.fields if f.name != "id"]

TIE_SCORE_ATTRS = ["children", "props", "max_depth", "max_properties"]


def vertex_fingerprint(prefix: str = "") -> F.Column:
    """64-bit fingerprint of the full 10-field node tuple.

    Stand-in for the reference's full case-class equality
    (`HelperFunction.scala:221`): two nodes are "the same node, unperturbed"
    iff all 10 fields match. Comparing one hashed long beats comparing ten
    columns in a join key — the join shuffles 8 bytes instead of the row.
    """
    cols = [F.col(prefix + "id")] + [F.col(prefix + a) for a in VERTEX_ATTRS]
    return F.xxhash64(*cols)


@dataclass(frozen=True)
class NetGraph:
    """A directed attributed graph as a pair of DataFrames + init node id.

    Mirrors ``NetGraph(nodes, edges, initNode)`` (HelperFunction.scala:22).
    """

    vertices: DataFrame
    edges: DataFrame
    init_id: int = 0

    def num_vertices(self) -> int:
        return self.vertices.count()

    def num_edges(self) -> int:
        return self.edges.count()

    def persist(self) -> "NetGraph":
        return NetGraph(self.vertices.persist(), self.edges.persist(), self.init_id)

    def unpersist(self) -> "NetGraph":
        self.vertices.unpersist()
        self.edges.unpersist()
        return self
