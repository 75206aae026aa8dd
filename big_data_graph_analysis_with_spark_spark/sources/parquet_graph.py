"""Parquet graph storage (the scale-path replacement for the reference's
Java-serialized `.ngs` files — SURVEY.md §2 row S4).

At 100 TB a graph lives as columnar Parquet `vertices`/`edges` tables.
Writes sort edges by (src, dst) within partitions so src-keyed scans get
row-group min/max pruning; `bucket_by` co-locates both tables on the id
key so every id-keyed join (degree, parent-map, subgraph induction,
SimRank parent joins) is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..model import NetGraph


def write_graph_parquet(
    graph: NetGraph,
    path: str,
    mode: str = "overwrite",
    bucket_by: int | None = None,
) -> None:
    """Write vertices/ and edges/ under `path`.

    With ``bucket_by=n``, writes as bucketed managed-style tables keyed
    on the join column (vertices.id, edges.src), eliminating the shuffle
    in id-keyed joins at read time.
    """
    vw = graph.vertices.write.mode(mode)
    ew = graph.edges.sortWithinPartitions("src", "dst").write.mode(mode)
    if bucket_by:
        vw.bucketBy(bucket_by, "id").sortBy("id").option(
            "path", f"{path}/vertices"
        ).saveAsTable(f"g_vertices_{abs(hash(path)) % 10**8}")
        ew.bucketBy(bucket_by, "src").sortBy("src", "dst").option(
            "path", f"{path}/edges"
        ).saveAsTable(f"g_edges_{abs(hash(path)) % 10**8}")
    else:
        vw.parquet(f"{path}/vertices")
        ew.parquet(f"{path}/edges")


def read_graph_parquet(spark: SparkSession, path: str, init_id: int = 0) -> NetGraph:
    return NetGraph(
        spark.read.parquet(f"{path}/vertices"),
        spark.read.parquet(f"{path}/edges"),
        init_id,
    )
