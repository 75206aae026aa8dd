"""Parquet graph storage (the scale-path replacement for the reference's
Java-serialized `.ngs` files — SURVEY.md §2 row S4).

At 100 TB a graph lives as columnar Parquet `vertices`/`edges` tables.
Writes sort edges by (src, dst) within partitions so src-keyed scans get
row-group min/max pruning; `bucket_by` co-locates both tables on the id
key so every id-keyed join (degree, parent-map, subgraph induction,
SimRank parent joins) is shuffle-free — PROVIDED the read goes through
the catalog table (bucketing is catalog metadata, not file metadata;
a plain `spark.read.parquet` of the same files re-shuffles).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import SparkSession

from ..model import NetGraph


def _table_names(path: str) -> tuple[str, str]:
    """Deterministic catalog names for the bucketed tables at `path`.

    md5 of the path — NOT the builtin hash(), which is salted per
    process and would register a fresh orphan table pair on every run.
    Same path → same names → `mode="overwrite"` genuinely overwrites.
    """
    digest = hashlib.md5(path.encode()).hexdigest()[:12]
    return f"g_vertices_{digest}", f"g_edges_{digest}"


def write_graph_parquet(
    graph: NetGraph,
    path: str,
    mode: str = "overwrite",
    bucket_by: int | None = None,
) -> None:
    """Write vertices/ and edges/ under `path`.

    With ``bucket_by=n``, writes as bucketed external tables keyed on
    the join column (vertices.id, edges.src), eliminating the exchange
    in id-keyed joins when read back via :func:`read_graph_parquet` in
    a session sharing the catalog.
    """
    vw = graph.vertices.write.mode(mode)
    ew = graph.edges.sortWithinPartitions("src", "dst").write.mode(mode)
    if bucket_by:
        vt, et = _table_names(path)
        vw.bucketBy(bucket_by, "id").sortBy("id").option(
            "path", f"{path}/vertices"
        ).saveAsTable(vt)
        ew.bucketBy(bucket_by, "src").sortBy("src", "dst").option(
            "path", f"{path}/edges"
        ).saveAsTable(et)
    else:
        vw.parquet(f"{path}/vertices")
        ew.parquet(f"{path}/edges")


def write_sym_edges(
    graph: NetGraph, path: str, bucket_by: int = 8, mode: str = "overwrite"
) -> None:
    """Materialize the symmetric canonical undirected edge list
    (a, b) ∪ (b, a) as a catalog table bucketed on the label-join key
    `b` — the storage layout that makes every round of
    `graphalg.connected_components(sym_edges=...)` plan without an
    edge-side Exchange. One-time storage prep, same contract as the
    src-bucketed tables for PageRank."""
    from pyspark.sql import functions as F

    e = graph.edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    und = e.filter(F.col("a") != F.col("b")).distinct()
    sym = und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    (
        sym.write.mode(mode)
        .bucketBy(bucket_by, "b")
        .sortBy("b")
        .option("path", f"{path}/sym_edges")
        .saveAsTable(f"g_sym_edges_{hashlib.md5(path.encode()).hexdigest()[:12]}")
    )


def read_sym_edges(spark: SparkSession, path: str):
    """Catalog-backed read of :func:`write_sym_edges` output (bucket
    metadata preserved); plain-parquet fallback when the catalog entry
    is absent."""
    t = f"g_sym_edges_{hashlib.md5(path.encode()).hexdigest()[:12]}"
    if spark.catalog.tableExists(t):
        return spark.table(t)
    return spark.read.parquet(f"{path}/sym_edges")


def read_graph_parquet(spark: SparkSession, path: str, init_id: int = 0) -> NetGraph:
    """Read a graph written by :func:`write_graph_parquet`.

    Prefers the bucketed catalog tables when this session's catalog has
    them — that is what lets Catalyst elide the exchange on id-keyed
    joins (`.explain` shows no Exchange on the bucketed side). Falls
    back to a plain parquet read (same data, bucket metadata lost) when
    the catalog entries are absent, e.g. a fresh session with an
    in-memory catalog.
    """
    vt, et = _table_names(path)
    if spark.catalog.tableExists(vt) and spark.catalog.tableExists(et):
        return NetGraph(spark.table(vt), spark.table(et), init_id)
    return NetGraph(
        spark.read.parquet(f"{path}/vertices"),
        spark.read.parquet(f"{path}/edges"),
        init_id,
    )
