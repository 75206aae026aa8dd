"""NetGameSim text-graph source (SURVEY.md §2 rows S1-S3, F1-F5).

Format (writer: reference `NetGraph/src/main/scala/NGStoText.scala:81-89`):
one line —

    List(NodeObject(id,children,props,currentDepth,propValueRange,maxDepth,
                    maxBranchingFactor,maxProperties,storedValue,valuableData), ...)
    :List(Action(actionType,NodeObject(...),NodeObject(...),fromId,toId,
                 None|Some(v),cost), ...)

The reference reads the whole file into a string and regex-extracts
objects on the driver (`HelperFunction.scala:76-124`). Spark-first
restatement: `spark.read.text(wholetext)` (so local/HDFS/S3 URIs all
work — the reference's S2 branch, `HelperFunction.scala:78-93`, is free
here), then the parse itself is DataFrame algebra — regexp_extract_all →
explode → from_csv — so after the explode the per-object field parsing
is distributed and codegen'd, and the same pipeline would handle a
many-GB concatenation of graph dumps.

Numeric fields support negatives and scientific notation
(`MitMStatSimTest.scala:25-28`): `from_csv` double-casting covers both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import EDGE_SCHEMA, VERTEX_SCHEMA, NetGraph

#: interior of NodeObject(...) — 10 comma-separated scalars, no nesting
_NODE_RE = r"NodeObject\(([^)]*)\)"
#: a full Action(...) string, embedded nodes included (nesting depth 1)
_ACTION_RE = (
    r"Action\(-?\d+,NodeObject\([^)]*\),NodeObject\([^)]*\),"
    r"-?\d+,-?\d+,(?:None|Some\(-?\d+\)),[^,)]+\)"
)
_NODE_CSV_SCHEMA = (
    "id LONG, children LONG, props LONG, current_depth LONG, "
    "prop_value_range LONG, max_depth LONG, max_branching_factor LONG, "
    "max_properties LONG, stored_value DOUBLE, valuable_data BOOLEAN"
)


class GraphParseError(ValueError):
    """Raised on malformed graph text (mirrors the reference's
    IllegalArgumentException paths, README.md:151-171)."""


def _parse(spark: SparkSession, raw: DataFrame) -> NetGraph:
    # Split node-list from action-list at the `):List(` seam — the
    # reference splits on the bare ':' between the two lists
    # (HelperFunction.scala:110-113); anchoring on the full seam is
    # equivalent and robust to ':' never appearing inside either list.
    seam = F.expr("instr(value, '):List(')")
    parts = raw.select(
        F.expr("substring(value, 1, instr(value, '):List(') )").alias("nodes_part"),
        F.expr("substring(value, instr(value, '):List(') + 2)").alias("edges_part"),
        seam.alias("seam"),
    )
    if parts.filter(F.col("seam") <= 0).count() > 0:
        raise GraphParseError("malformed graph text: missing ':List(' separator")

    nodes = (
        parts.select(
            F.explode(
                F.regexp_extract_all("nodes_part", F.lit(_NODE_RE), 1)
            ).alias("csv")
        )
        .select(F.from_csv("csv", _NODE_CSV_SCHEMA).alias("n"))
        .select("n.*")
    )
    # A tuple with missing/extra fields leaves trailing nulls after
    # from_csv — reject like the reference's 10-field assertion
    # (`HelperFunction.scala:28-33`, README.md:155-156).
    null_any = None
    for c in nodes.columns:
        cond = F.col(c).isNull()
        null_any = cond if null_any is None else (null_any | cond)
    bad = nodes.filter(null_any).count()
    if bad:
        raise GraphParseError(f"{bad} node tuple(s) failed to parse (need 10 fields)")

    # Actions: extract whole Action(...) strings, then per-string field
    # extraction. Endpoint identity = the embedded nodes' first field
    # (ids) — the reference re-canonicalizes embedded objects against the
    # node list by id on load (HelperFunction.scala:145-149), so ids are
    # sufficient; the node attributes live once in `vertices`.
    acts = parts.select(
        F.explode(F.regexp_extract_all("edges_part", F.lit(_ACTION_RE), 0)).alias("a")
    )
    edges = acts.select(
        F.regexp_extract("a", r"NodeObject\((-?\d+),", 1).cast("long").alias("src"),
        F.regexp_extract(
            "a", r"NodeObject\([^)]*\),NodeObject\((-?\d+),", 1
        ).cast("long").alias("dst"),
        F.regexp_extract("a", r"Action\((-?\d+),", 1).cast("long").alias("action_type"),
        F.regexp_extract("a", r"\),(-?\d+),-?\d+,(?:None|Some)", 1)
        .cast("long").alias("from_field"),
        F.regexp_extract("a", r"\),-?\d+,(-?\d+),(?:None|Some)", 1)
        .cast("long").alias("to_field"),
        # Option parsing (F3, HelperFunction.scala:65-69): None → null
        F.nullif(F.regexp_extract("a", r"Some\((-?\d+)\)", 1), F.lit(""))
        .cast("long").alias("resulting_value"),
        F.regexp_extract("a", r",([^,)]+)\)$", 1).cast("double").alias("cost"),
    )

    return NetGraph(nodes, edges, init_id=0)


def parse_graph_text(spark: SparkSession, text: str) -> NetGraph:
    """Parse an in-memory graph dump string (test/fixture path)."""
    raw = spark.createDataFrame([(text,)], "value STRING")
    return _check_init(_parse(spark, raw))


def load_graph(spark: SparkSession, path: str) -> NetGraph:
    """Load a `.txt` / `.txt.perturbed` NetGameSim dump (S1/S2).

    `path` may be file://, hdfs:// or s3a:// — Spark's readers dispatch
    on the URI scheme, replacing the reference's manual
    `FileSystem.get(URI)` branch (`HelperFunction.scala:78-93`).
    """
    raw = spark.read.text(path, wholetext=True)
    if raw.isEmpty():
        raise GraphParseError(f"empty or missing graph file: {path}")
    return _check_init(_parse(spark, raw))


def load_graph_dumps(spark: SparkSession, path: str) -> NetGraph:
    """Concatenated multi-dump ingest (S1 at scale): a file, glob, or
    directory holding ONE dump per line — e.g. many NetGameSim exports
    appended together — loaded as a single union graph.

    Unlike :func:`load_graph` (wholetext: one dump per file), lines are
    the record boundary, so Spark splits the input across partitions
    and the per-line seam split + object extraction in `_parse` run
    distributed and codegen'd — this is the many-GB path promised in
    the module docstring. Vertices and edges are deduplicated on their
    full tuples across dumps (re-ingesting the same dump twice is a
    no-op; a node perturbed between dumps keeps both variants, exactly
    like full-tuple case-class equality in the reference).
    """
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    if raw.isEmpty():
        raise GraphParseError(f"empty or missing graph file(s): {path}")
    g = _parse(spark, raw)
    return _check_init(
        NetGraph(g.vertices.distinct(), g.edges.distinct(), init_id=g.init_id)
    )


def _check_init(g: NetGraph) -> NetGraph:
    # Init-node existence check (HelperFunction.scala:121): NetGameSim
    # graphs start at id 0; absence means a corrupt dump.
    if g.vertices.filter(F.col("id") == g.init_id).isEmpty():
        raise GraphParseError(f"graph has no init node (id={g.init_id})")
    return g


def serialize_graph(g: NetGraph) -> str:
    """Serialize a NetGraph back to the NetGameSim text format (S8,
    `NGStoText.scala:81-89` — the generator-side writer, kept as a
    fixture-generation utility).

    Edge endpoints are re-embedded as full NodeObject tuples (the
    format nests them), reconstructed from the vertices table —
    exactly the inverse of the endpoint re-canonicalization the
    reference does on load (`HelperFunction.scala:145-149`).
    """

    def fmt_store(v: float) -> str:
        return repr(v)

    def node_str(r) -> str:
        return (
            f"NodeObject({r['id']},{r['children']},{r['props']},"
            f"{r['current_depth']},{r['prop_value_range']},{r['max_depth']},"
            f"{r['max_branching_factor']},{r['max_properties']},"
            f"{fmt_store(r['stored_value'])},{str(r['valuable_data']).lower()})"
        )

    nodes = g.vertices.collect()
    by_id = {r["id"]: r for r in nodes}
    edges = g.edges.collect()

    node_part = ", ".join(node_str(r) for r in nodes)
    act_parts = []
    for e in edges:
        rv = "None" if e["resulting_value"] is None else f"Some({e['resulting_value']})"
        act_parts.append(
            f"Action({e['action_type']},{node_str(by_id[e['src']])},"
            f"{node_str(by_id[e['dst']])},{e['from_field']},{e['to_field']},"
            f"{rv},{repr(e['cost'])})"
        )
    return f"List({node_part}):List({', '.join(act_parts)})"


__all__ = [
    "GraphParseError",
    "load_graph",
    "load_graph_dumps",
    "parse_graph_text",
    "serialize_graph",
    "EDGE_SCHEMA",
    "VERTEX_SCHEMA",
]
