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
from big_data_graph_analysis_with_spark_spark.operators import (  # noqa: E402
    matching,
    simrank,
    topology,
)
from big_data_graph_analysis_with_spark_spark.config import SimConfig  # noqa: E402
from big_data_graph_analysis_with_spark_spark.operators import topology as _topo  # noqa: E402,F401
from big_data_graph_analysis_with_spark_spark.operators import walks as walks_mod  # noqa: E402
from big_data_graph_analysis_with_spark_spark.plans.pipeline import run_pipeline  # noqa: E402
from big_data_graph_analysis_with_spark_spark.sources import tpch_graph  # noqa: E402
from big_data_graph_analysis_with_spark_spark.sources.tpch_graph import graph_sql  # noqa: E402

#: small, seeded config for the rows-only pipeline/walk queries (the
#: full reference config of 20×50 walks is exercised by bench.py)
_SMALL_CFG = SimConfig(
    num_of_parallel_walks=4, num_iters_per_comp_node=4, iters_before_accum=2
)

SF0001 = "/root/testdata/sf0.001"
THRESHOLD = 0.1  # nodeMatchThreshold (application.conf:43)

# --- SQL fragments shared by the SimRank/matching oracles -----------------

_ALL10_EQ = " AND ".join(
    f"p.{c} = n.{c}"
    for c in [
        "id", "children", "props", "current_depth", "prop_value_range",
        "max_depth", "max_branching_factor", "max_properties",
        "stored_value", "valuable_data",
    ]
)

SR_BASE_CTES = f"""
sr_init AS (
  SELECT p.id AS pg_id, n.id AS og_id, CAST(1.0 AS DOUBLE) AS score
  FROM pg_vertices p JOIN og_vertices n ON {_ALL10_EQ}
),
pg_indeg AS (SELECT dst, COUNT(*) AS c FROM pg_edges GROUP BY dst),
og_indeg AS (SELECT dst, COUNT(*) AS c FROM og_edges GROUP BY dst)
"""


def _sr_round_ctes(
    k: int, prev: str, pruned: bool = False, bucketed: bool = False
) -> str:
    """One Jacobi round as CTEs: sr_{k} = propagate({prev}). With
    `pruned`, edges into already-matched nodes are excluded (G6),
    mirroring the pushed-down prune in `simrank_round`. With `bucketed`,
    only child pairs agreeing on the G7 tie attributes are scored
    (candidate pruning, SURVEY.md §7.4.1)."""
    pg_prune = (
        " AND pe.dst NOT IN (SELECT pg_id FROM matched)" if pruned else ""
    )
    og_prune = (
        " AND oe.dst NOT IN (SELECT og_id FROM matched)" if pruned else ""
    )
    bucket_join = ""
    if bucketed:
        eq = " AND ".join(
            f"pv.{a} = ov.{a}"
            for a in ["children", "props", "max_depth", "max_properties"]
        )
        bucket_join = f"""
  JOIN pg_vertices pv ON pv.id = pe.dst
  JOIN og_vertices ov ON ov.id = oe.dst AND {eq}"""
    return f"""
contrib_{k} AS (
  SELECT pe.dst AS pg_id, oe.dst AS og_id,
         SUM(CAST(s.score AS DECIMAL(28,6))) AS s
  FROM {prev} s
  JOIN pg_edges pe ON pe.src = s.pg_id{pg_prune}
  JOIN og_edges oe ON oe.src = s.og_id{og_prune}{bucket_join}
  GROUP BY pe.dst, oe.dst
),
computed_{k} AS (
  SELECT c.pg_id, c.og_id,
         ROUND(CAST(c.s AS DOUBLE) / (ip.c * io.c), 2) AS score
  FROM contrib_{k} c
  JOIN pg_indeg ip ON ip.dst = c.pg_id
  JOIN og_indeg io ON io.dst = c.og_id
),
sr_{k} AS (
  SELECT c.pg_id, c.og_id, CAST(c.score AS DOUBLE) AS score
  FROM computed_{k} c
  WHERE c.score <> 0 AND NOT EXISTS (
    SELECT 1 FROM sr_init i WHERE i.pg_id = c.pg_id AND i.og_id = c.og_id)
  UNION ALL SELECT pg_id, og_id, score FROM sr_init
)
"""


_TIE = " + ".join(
    f"CASE WHEN p.{a} = n.{a} THEN 1 ELSE 0 END"
    for a in ["children", "props", "max_depth", "max_properties"]
)

BEST_MATCH_CTES = f"""
scored AS (
  SELECT c.pg_id, c.og_id, c.score,
         CASE WHEN {_ALL10_EQ} THEN 1 ELSE 0 END AS exact,
         {_TIE} AS tie_score
  FROM sr_1 c
  JOIN pg_vertices p ON p.id = c.pg_id
  JOIN og_vertices n ON n.id = c.og_id
),
best AS (
  SELECT pg_id, og_id, score FROM (
    SELECT s.*, ROW_NUMBER() OVER (
      PARTITION BY pg_id
      ORDER BY exact DESC, tie_score DESC, score DESC, og_id ASC) AS rn
    FROM scored s) WHERE rn = 1
)
"""


_MATCHED_CTE = f"""
matched AS (SELECT pg_id, og_id FROM best WHERE score > {THRESHOLD})
"""


def _sr_sql(
    body: str, rounds: int = 0, best: bool = False, pruned_round: bool = False
) -> str:
    ctes = SR_BASE_CTES
    prev = "sr_init"
    for k in range(1, rounds + 1):
        ctes += "," + _sr_round_ctes(k, prev)
        prev = f"sr_{k}"
    if best:
        ctes += "," + BEST_MATCH_CTES
    if pruned_round:
        # round-2 recomputation restricted to not-yet-matched nodes
        ctes += "," + _MATCHED_CTE + "," + _sr_round_ctes(
            rounds + 1, f"sr_{rounds}", pruned=True
        )
    return graph_sql(f", {ctes.strip()} {body}")

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


def q_simrank_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 init: identity pairs via full-tuple equality (score 1.0)."""
    og, pg = _graphs(spark, sf_dir)
    return simrank.init_scores(pg, og)


def q_simrank_round1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: one Jacobi propagation round from the identity seed."""
    og, pg = _graphs(spark, sf_dir)
    return simrank.simrank(pg, og, rounds=1)


def q_simrank_round1_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 with candidate pruning: only child pairs agreeing on the G7
    tie attributes are scored — the scale path (SURVEY.md §7.4.1)."""
    og, pg = _graphs(spark, sf_dir)
    return simrank.simrank(pg, og, rounds=1, attr_bucket=True)


def q_simrank_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5+G6: a second Jacobi round with accumulator pruning — the
    reference's memoization flow (match after a batch, skip matched
    nodes in the next batch, `HelperFunction.scala:203-210`). The
    pruning is what keeps round 2 sparse: without it the propagation
    frontier is O(Σ outdeg²) dense pairs."""
    og, pg = _graphs(spark, sf_dir)
    r1 = simrank.simrank(pg, og, rounds=1)
    best = matching.best_match(r1, pg, og)
    matches = best.filter(F.col("score") > THRESHOLD)
    return simrank.simrank_round(r1, pg, og, matches=matches)


def q_best_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: attribute-tie-scored argmax resolution over round-1 scores."""
    og, pg = _graphs(spark, sf_dir)
    scores = simrank.simrank(pg, og, rounds=1)
    return matching.best_match(scores, pg, og)


def q_match_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P6: TP/FP counts of best matches above the 0.1 threshold."""
    og, pg = _graphs(spark, sf_dir)
    best = matching.best_match(simrank.simrank(pg, og, rounds=1), pg, og)
    return matching.match_class_counts(best, THRESHOLD)


def q_valuable_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8: best matches whose matched original node holds valuable data."""
    og, pg = _graphs(spark, sf_dir)
    best = matching.best_match(simrank.simrank(pg, og, rounds=1), pg, og)
    return matching.valuable_matches(best, og)


def q_uncovered_valuable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/G11: valuable original nodes with no match — the blind spot."""
    og, pg = _graphs(spark, sf_dir)
    best = matching.best_match(simrank.simrank(pg, og, rounds=1), pg, og)
    return matching.uncovered_valuable(best, og)


def q_walk_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2-G4 (rows-only: seeded-random, not SQL-expressible; property
    checks live in tests/test_walks_pipeline.py)."""
    _, pg = _graphs(spark, sf_dir)
    start_ids = [
        r["id"] for r in _topo.start_nodes(pg).select("id").collect()
    ]
    assignments = walks_mod.sample_start_assignments(spark, start_ids, _SMALL_CFG)
    return walks_mod.run_walks(spark, pg, assignments, _SMALL_CFG)


def q_mitm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 end-to-end (rows-only): walks → per-walk SimRank → best
    match → valuable filter → global max-merge → 8-metric stats."""
    og, pg = _graphs(spark, sf_dir)
    result = run_pipeline(spark, og, pg, _SMALL_CFG)
    return spark.createDataFrame(
        [(k, v) for k, v in result.stats.items()], "metric STRING, value STRING"
    )


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
        "simrank_init": q_simrank_init,
        "simrank_round1": q_simrank_round1,
        "simrank_round1_bucketed": q_simrank_round1_bucketed,
        "simrank_round2": q_simrank_round2,
        "best_match": q_best_match,
        "match_classes": q_match_classes,
        "valuable_matches": q_valuable_matches,
        "uncovered_valuable": q_uncovered_valuable,
        "walk_kernel": q_walk_kernel,
        "mitm_pipeline": q_mitm_pipeline,
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
        "simrank_init": _sr_sql("SELECT pg_id, og_id, score FROM sr_init"),
        "simrank_round1": _sr_sql(
            "SELECT pg_id, og_id, score FROM sr_1", rounds=1
        ),
        "simrank_round1_bucketed": graph_sql(
            ", "
            + SR_BASE_CTES.strip()
            + ","
            + _sr_round_ctes(1, "sr_init", bucketed=True)
            + " SELECT pg_id, og_id, score FROM sr_1"
        ),
        "simrank_round2": _sr_sql(
            "SELECT pg_id, og_id, score FROM sr_2",
            rounds=1,
            best=True,
            pruned_round=True,
        ),
        "best_match": _sr_sql(
            "SELECT pg_id, og_id, score FROM best", rounds=1, best=True
        ),
        "match_classes": _sr_sql(
            f"""
            SELECT CAST(COALESCE(SUM(CASE WHEN pg_id = og_id THEN 1 END), 0) AS BIGINT)
                     AS n_true_positive,
                   CAST(COALESCE(SUM(CASE WHEN pg_id <> og_id THEN 1 END), 0) AS BIGINT)
                     AS n_false_positive
            FROM best WHERE score > {THRESHOLD}
            """,
            rounds=1,
            best=True,
        ),
        "valuable_matches": _sr_sql(
            """
            SELECT b.pg_id, b.og_id, b.score FROM best b
            WHERE EXISTS (SELECT 1 FROM og_vertices v
                          WHERE v.id = b.og_id AND v.valuable_data)
            """,
            rounds=1,
            best=True,
        ),
        "uncovered_valuable": _sr_sql(
            """
            SELECT v.id FROM og_vertices v
            WHERE v.valuable_data
              AND v.id NOT IN (SELECT og_id FROM best)
            """,
            rounds=1,
            best=True,
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
