"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query on sf0.001.
`queries()` — one entry per implemented operator from SURVEY.md §2.
`oracle_sql()` — DuckDB-equivalent SQL per query (same column names).

The graph queries run on a deterministic graph pair derived from the
TPC-H-ish testdata (FIXTURES.md §4); the Spark derivation
(`sources/tpch_graph.py`) and the SQL CTE preamble (`graph_sql`) are
kept in exact lockstep so every graph operator is hash-checkable.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from big_data_graph_analysis_with_spark_spark.model import NetGraph  # noqa: E402
from big_data_graph_analysis_with_spark_spark.operators import topology  # noqa: E402
from big_data_graph_analysis_with_spark_spark.sources import tpch_graph  # noqa: E402
from big_data_graph_analysis_with_spark_spark.sources.tpch_graph import graph_sql  # noqa: E402

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _graphs(spark: SparkSession, sf_dir: str) -> tuple[NetGraph, NetGraph]:
    return tpch_graph.derive_graphs(spark, sf_dir)


# ---------------------------------------------------------------------------
# queries (Spark side)
# ---------------------------------------------------------------------------


def q_start_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: in-degree-0 vertices of the original graph, full attribute rows."""
    og, _ = _graphs(spark, sf_dir)
    return topology.start_nodes(og)


def q_start_node_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7.2): G1 + P3 + A6 — start nodes with
    valuable vs non-valuable counts."""
    og, _ = _graphs(spark, sf_dir)
    return (
        topology.start_nodes(og)
        .groupBy("valuable_data")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            # Float sums are order-dependent → never hash-stable across
            # engines. Aggregate over decimal-cast values (exact,
            # associative) and cast back — same pattern in the oracle.
            F.sum(F.col("stored_value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_stored_value"),
        )
    )


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In/out degree per vertex (basis of G1 / sink detection / F7)."""
    og, _ = _graphs(spark, sf_dir)
    return topology.degrees(og)


def q_valuable_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: valuable-data filter on the original graph (Main.scala:165)."""
    og, _ = _graphs(spark, sf_dir)
    return topology.valuable_nodes(og).select("id", "stored_value", "valuable_data")


def q_graph_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|V|/|E| of both graphs — the ingest sanity check (S1-S3)."""
    og, pg = _graphs(spark, sf_dir)

    def one(name: str, g: NetGraph) -> DataFrame:
        return (
            g.vertices.agg(F.count("*").cast("long").alias("n_vertices"))
            .crossJoin(g.edges.agg(F.count("*").cast("long").alias("n_edges")))
            .select(F.lit(name).alias("graph"), "n_vertices", "n_edges")
        )

    return one("original", og).unionAll(one("perturbed", pg))


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_start_node_stats(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "start_nodes": q_start_nodes,
        "start_node_stats": q_start_node_stats,
        "degrees": q_degrees,
        "valuable_nodes": q_valuable_nodes,
        "graph_sizes": q_graph_sizes,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "start_nodes": graph_sql(
            """
            SELECT v.* FROM og_vertices v
            WHERE v.id NOT IN (SELECT dst FROM og_edges)
            """
        ),
        "start_node_stats": graph_sql(
            """
            SELECT valuable_data,
                   CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(CAST(stored_value AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_stored_value
            FROM og_vertices v
            WHERE v.id NOT IN (SELECT dst FROM og_edges)
            GROUP BY valuable_data
            """
        ),
        "degrees": graph_sql(
            """
            SELECT v.id,
                   CAST(COALESCE(i.c, 0) AS BIGINT) AS in_degree,
                   CAST(COALESCE(o.c, 0) AS BIGINT) AS out_degree
            FROM og_vertices v
            LEFT JOIN (SELECT dst, COUNT(*) AS c FROM og_edges GROUP BY dst) i
              ON v.id = i.dst
            LEFT JOIN (SELECT src, COUNT(*) AS c FROM og_edges GROUP BY src) o
              ON v.id = o.src
            """
        ),
        "valuable_nodes": graph_sql(
            """
            SELECT id, stored_value, valuable_data FROM og_vertices
            WHERE valuable_data
            """
        ),
        "graph_sizes": graph_sql(
            """
            SELECT 'original' AS graph,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM og_vertices) AS n_vertices,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM og_edges) AS n_edges
            UNION ALL
            SELECT 'perturbed',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM pg_vertices),
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM pg_edges)
            """
        ),
    }
