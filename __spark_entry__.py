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

from big_data_graph_analysis_with_spark_spark.config import SimConfig  # noqa: E402
from big_data_graph_analysis_with_spark_spark.model import NetGraph  # noqa: E402
from big_data_graph_analysis_with_spark_spark.operators import (  # noqa: E402
    dedup,
    graphalg,
    matching,
    multimodal,
    similarity,
    simrank,
    textops,
    topology,
)
from big_data_graph_analysis_with_spark_spark.operators import walks as walks_mod  # noqa: E402
from big_data_graph_analysis_with_spark_spark.functions.eventtime import (  # noqa: E402
    event_micros,
)
from big_data_graph_analysis_with_spark_spark.functions.hashing import (  # noqa: E402
    hash56_sql,
)
from big_data_graph_analysis_with_spark_spark.functions.zorder import (  # noqa: E402
    morton2_sql,
)
from big_data_graph_analysis_with_spark_spark.plans import doc_oracles  # noqa: E402
from big_data_graph_analysis_with_spark_spark.plans.pipeline import run_pipeline  # noqa: E402
from big_data_graph_analysis_with_spark_spark.sources import tpch_graph  # noqa: E402
from big_data_graph_analysis_with_spark_spark.sources.tpch_graph import (  # noqa: E402
    GRAPH_CTES,
    graph_sql,
)

_topo = topology

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
    k: int,
    prev: str,
    pruned: bool = False,
    bucketed: bool = False,
    bucket_mod: int | None = None,
) -> str:
    """One Jacobi round as CTEs: sr_{k} = propagate({prev}). With
    `pruned`, edges into already-matched nodes are excluded (G6),
    mirroring the pushed-down prune in `simrank_round`. With `bucketed`,
    only child pairs agreeing on the G7 tie attributes are scored
    (candidate pruning, SURVEY.md §7.4.1); `bucket_mod` additionally
    requires id-residue agreement (the round-9 widened bucket key)."""
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
        if bucket_mod:
            eq += f" AND pe.dst % {bucket_mod} = oe.dst % {bucket_mod}"
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
    body: str,
    rounds: int = 0,
    best: bool = False,
    pruned_round: bool = False,
    bucketed: bool = False,
) -> str:
    ctes = SR_BASE_CTES
    prev = "sr_init"
    for k in range(1, rounds + 1):
        ctes += "," + _sr_round_ctes(k, prev, bucketed=bucketed)
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


def _prep(spark: SparkSession) -> SparkSession:
    """Harden an externally-supplied SparkSession (the driver builds its
    own): if events.parquet carries TIMESTAMP(NANOS) (one of the
    testdata generations did), Spark 4 refuses it unless read as
    nanos-longs; functions/eventtime then normalizes either shape.
    Runtime-settable, idempotent."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Time bucketing must agree with the DuckDB oracles regardless of the
    # host JVM's default zone; eventtime.event_micros is tz-independent by
    # construction, but window()/date_trunc-style operators are not.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _graphs(spark: SparkSession, sf_dir: str) -> tuple[NetGraph, NetGraph]:
    return tpch_graph.derive_graphs(_prep(spark), sf_dir)


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


def q_parent_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: reverse adjacency, exploded to (id, parent) rows for the
    order-insensitive oracle compare."""
    og, _ = _graphs(spark, sf_dir)
    return topology.parent_map(og).select(
        "id", F.explode("parents").alias("parent")
    )


def q_induced_subgraph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: edges of the subgraph induced by a deterministic node set
    (all nations + suppliers — ids below CUSTOMER_OFFSET)."""
    from big_data_graph_analysis_with_spark_spark.operators import subgraph

    og, _ = _graphs(spark, sf_dir)
    ids = og.vertices.filter(
        F.col("id") < tpch_graph.CUSTOMER_OFFSET
    ).select("id")
    sub = subgraph.induced_subgraph(og, ids)
    return sub.edges.select("src", "dst", "action_type", "cost")


def q_subgraph_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+O2: deterministic init node (min in-degree-0 id) of the same
    induced subgraph."""
    from big_data_graph_analysis_with_spark_spark.operators import subgraph

    og, _ = _graphs(spark, sf_dir)
    ids = og.vertices.filter(
        F.col("id") < tpch_graph.CUSTOMER_OFFSET
    ).select("id")
    return subgraph.subgraph_init_node(subgraph.induced_subgraph(og, ids))


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
    # materialize the round-1 table and the accumulator once: the
    # round-2 plan references r1 directly AND through the matches
    # filter (itself referenced 4x inside simrank_round for fallback +
    # both prunes), so the lazy chain re-executed round 1 + best_match
    # many times over — the physical plan carried 956 parquet scans
    # before this (r12). Results identical; this mirrors what the
    # pipeline's round loop always did with its match table.
    r1 = simrank.simrank(pg, og, rounds=1).localCheckpoint()
    best = matching.best_match(r1, pg, og)
    matches = best.filter(F.col("score") > THRESHOLD).localCheckpoint()
    return simrank.simrank_round(r1, pg, og, matches=matches)


def q_simrank_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 fixpoint loop (SURVEY.md §7.1.5): Jacobi rounds until the
    2-decimal score table stops changing, capped at 3. The oracle
    unrolls exactly 3 bucketed rounds: if the loop converges at round
    r < 3, sr_r = sr_{r+1} = ... = sr_3 by definition of a fixpoint,
    so early exit and the full unroll produce the same table."""
    og, pg = _graphs(spark, sf_dir)
    scores, _rounds = simrank.simrank_fixpoint(pg, og, max_rounds=3)
    return scores


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
    # best feeds the anti-join diff via multiple references — one
    # materialization instead of re-running round1+argmax per
    # reference (282 parquet scans in the lazy plan, r12)
    best = matching.best_match(
        simrank.simrank(pg, og, rounds=1), pg, og
    ).localCheckpoint()
    return matching.uncovered_valuable(best, og)


def q_greedy_walk_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G10 made oracle-checkable: per-partition successful/unsuccessful
    walk counts (`Main.scala:189-202`) over DETERMINISTIC min-neighbor
    walks instead of the seeded random kernel — the real
    `stats.classify_walks` + `walk_counts` path (distinct-visited dedup,
    TP/FP flag joins) verified end to end against SQL, which the
    rows-only `walk_kernel`/`mitm_pipeline` entries never could."""
    from big_data_graph_analysis_with_spark_spark.operators import stats

    og, pg = _graphs(spark, sf_dir)
    # the TP/FP flag joins reference the classified matches twice —
    # materialize best once (200 parquet scans in the lazy plan, r12)
    best = matching.best_match(
        simrank.simrank(pg, og, rounds=1), pg, og
    ).localCheckpoint()
    classified = matching.classify_matches(best, THRESHOLD)
    walks = walks_mod.greedy_walks(pg, depth=6, n_partitions=4)
    return stats.walk_counts(stats.classify_walks(walks, classified))


def q_graph_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact edge/endpoint counts per derived graph plus a verdict that
    this engine's HLL distinct-source estimate lands within 5% — the
    sketch-trust audit extended to the graph tables."""
    from big_data_graph_analysis_with_spark_spark.operators import sketches

    og, pg = _graphs(spark, sf_dir)
    return sketches.graph_distinct_sketch_audit(og.edges, pg.edges)


def q_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing dyadic-weight EWMA of daily order revenue in exact
    integer cents — scatter via a literal offsets array, no range
    join."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.trailing_dyadic_revenue(sess.read.parquet(f"{sf_dir}/orders.parquet"))


def q_segment_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation market-segment membership as a bit_or bitmask —
    fixed-vocabulary set encoding that merges map-side."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.segment_bitmask(
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap algebra: click vs error user sets through
    INTERSECT / EXCEPT / UNION, one row per operator."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.user_set_ops(sess.read.parquet(f"{sf_dir}/events.parquet"))


def q_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-densified daily event counts: explicit zero rows for
    gap days via one scalar span aggregate + sequence()."""
    from big_data_graph_analysis_with_spark_spark.operators import drift

    sess = _prep(spark)
    return drift.daily_gap_fill(sess.read.parquet(f"{sf_dir}/events.parquet"))


def q_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward repair of error readings per
    user timeline (last ignorenulls over an ordered window)."""
    from big_data_graph_analysis_with_spark_spark.operators import drift

    sess = _prep(spark)
    return drift.value_locf(sess.read.parquet(f"{sf_dir}/events.parquet"))


def q_balance_outlier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer z-score outlier census: |x−μ| > 1.5σ
    cross-multiplied to 4(n·x−Σ)² > 9(nΣx²−Σ²) in DECIMAL(38,0)/HUGEINT
    — no float σ, so the boundary customers hash identically
    cross-engine (1.5σ, not 2σ: bounded-support balances never pass
    √3σ)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.balance_outlier_census(
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_embedding_clip_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector clipping audit via array higher-order functions
    (transform/filter/aggregate), integer-exact after floor(x·1000)."""
    from big_data_graph_analysis_with_spark_spark.operators import similarity

    sess = _prep(spark)
    return similarity.embedding_clip_census(
        sess.read.parquet(f"{sf_dir}/embeddings.parquet")
    )


# ---------------------------------------------------------------------------
# whole-graph analytics (operators/graphalg.py)
# ---------------------------------------------------------------------------


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle participation over the original graph."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.triangle_counts(og)


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected connected components (min-label fixpoint) — the
    oracle is the recursive-CTE min-reachable-id, so the fixpoint
    semantics (not an iteration count) is what is being checked."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.connected_components(og)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank, 4 rounds, over the original graph."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.pagerank(og, iters=4)


def q_neighbor_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded k-out-neighbor sampling over the original graph's edges
    (GNN-style fan-out cap, reproducible across engines/partitionings)."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    og, _ = _graphs(spark, sf_dir)
    return sampling.neighbor_sample(og.edges, k=3, seed=5)


def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (teleport mass pinned to the minimum
    vertex id), 4 fixed-point integer rounds."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.personalized_pagerank(og, iters=4)


def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP (Bellman-Ford, exact milli-unit weights) from the
    minimum vertex id — Pregel's SSSP as join + min-agg rounds."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.sssp_distances(og, rounds=10)


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the original graph by iterative peeling (early-exit
    loop; the oracle unrolls a fixed round count — no-op past the
    fixpoint — so both engines name the same subgraph)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.kcore_vertices(og, k=3)


def q_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed single-source BFS hop counts from the minimum vertex id
    (frontier expansion, one shuffle per round) — the oracle is a
    dist-capped recursive CTE taking MIN(dist) over all paths, so the
    shortest-path semantics, not the iteration schedule, is checked."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.bfs_distances(og)


def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient as an exact fixed-point
    integer (ppm) — triangles + degree, integer div only."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.clustering_coefficient(og)


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities, 3 rounds,
    deterministic (count DESC, label ASC) tie-break — the oracle
    unrolls the identical rounds."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.label_propagation(og, rounds=3)


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 non-adjacent pairs by common-neighbor count (integer
    scores, wedge-join candidate generation bounded by the degree-64
    hub cap — mirrored verbatim in the oracle)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.link_prediction(og, k=100, max_center_degree=64)


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected degree distribution including the zero bucket."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.degree_histogram(og)


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss edges (every edge in ≥1 triangle) by iterative peel;
    the oracle unrolls a fixed round count past the fixpoint. k=3, not
    4: the sf0.01 graph has no 4-truss, and a 0=0 hash match would
    verify nothing (round-5 verdict)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.ktruss_edges(og, k=3, rounds=5)


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority, 2 unnormalized rounds — exact integers, so
    the round-unrolled oracle hash-matches (normalization is a positive
    per-round scalar; ranking is unchanged)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.hits_scores(og, rounds=2)


def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-edge reciprocity summary (mutual-edge ratio in ppm)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.reciprocity(og)


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer sufficient statistics for degree assortativity
    (the caller finishes Pearson r with one scalar float step)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.assortativity_stats(og)


def _scc_extra_edges(og) -> DataFrame:
    """Deterministic reversed-edge subset (dst % 7 == 0) that gives the
    TPC-H-derived DAG nontrivial cycles, so SCC has real work to do."""
    return og.edges.filter(
        (F.col("dst") % 7 == 0) & (F.col("src") != F.col("dst"))
    ).select(F.col("dst").alias("src"), F.col("src").alias("dst"))


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (trim + coloring) over the
    original graph augmented with a reversed-edge subset; the oracle is
    the recursive-CTE mutual-reachability closure, so the FIXPOINT
    semantics — not the round schedule — is what is checked."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.scc_components(og, extra_edges=_scc_extra_edges(og))


def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luby maximal independent set, 6 deterministic seeded rounds;
    the oracle unrolls the same rounds with the shared MD5 priority."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.maximal_independent_set(og, rounds=6)


def q_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled closeness/harmonic centrality: exact BFS from the 4
    smallest vertex ids, integer distance/harmonic aggregation."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.closeness_sampled(og, n_seeds=4)


def q_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-path counting (Brandes σ forward phase) from the
    minimum vertex id — exact integer counts, 8-level cap shared with
    the level-unrolled oracle."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.path_counts(og, levels=8)


def q_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: node2vec biased walk corpus (seeded, second-order
    p/q transitions; trajectory a pure function of (seed, start, rep))
    over the original graph — the graph-embedding training-data
    generator. Path validity and partitioning-invariance are pinned in
    tests; a seeded RNG kernel has no SQL twin."""
    og, _ = _graphs(spark, sf_dir)
    return walks_mod.node2vec_walks(
        _prep(spark), og, walks_per_vertex=1, walk_length=10, p=2.0, q=0.5,
        seed=9,
    )


def q_hub_attack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted-attack robustness: connectivity summary after removing
    the 10 highest-degree vertices (deterministic tie-break)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.hub_attack_robustness(og, n_remove=10)


def q_motif_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed 3-node motif census (FFL vs 3-cycle vs mutual pairs)
    over the cycle-augmented graph — each instance counted exactly
    once via canonical anchoring."""
    og, _ = _graphs(spark, sf_dir)
    aug = NetGraph(
        og.vertices,
        og.edges.select("src", "dst").unionAll(_scc_extra_edges(og)),
        og.init_id,
    )
    return graphalg.motif_counts(aug)


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-weighted PageRank (the reference's Action.cost payload as
    transition weights), 4 fixed-point integer rounds."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.pagerank_weighted(og, iters=4)


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled Brandes betweenness (4 deterministic seeds). The δ
    recurrence is a float ratio sum, so this is a rows-only check; its
    σ forward phase is the oracle-checked `path_counts`, and the small-
    graph hand-computed Brandes values live in the unit tests."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.betweenness_sampled(og, n_seeds=4)


_UND_CTES = """
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM og_edges WHERE src <> dst
)
"""


def _triangles_sql() -> str:
    return graph_sql(
        f""", {_UND_CTES.strip()},
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
members AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, COUNT(*) AS n FROM members GROUP BY id)
SELECT v.id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_triangles
FROM og_vertices v LEFT JOIN cnt c ON c.id = v.id
"""
    )


def _edge_support_sql() -> str:
    return graph_sql(
        f""", {_UND_CTES.strip()},
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
esup AS (
  SELECT a, b FROM tri
  UNION ALL SELECT b, c FROM tri
  UNION ALL SELECT a, c FROM tri
),
scnt AS (SELECT a, b, COUNT(*) AS s FROM esup GROUP BY a, b),
per_edge AS (
  SELECT CAST(COALESCE(s.s, 0) AS BIGINT) AS support
  FROM und e LEFT JOIN scnt s ON s.a = e.a AND s.b = e.b
)
SELECT support, CAST(COUNT(*) AS BIGINT) AS n_edges
FROM per_edge GROUP BY support
"""
    )


def _common_neighbor_sql(max_center_degree: int = 64) -> str:
    """Twin of graphalg.common_neighbor_histogram — same wedge join,
    same hub-center cap, same edge-flag left join."""
    return graph_sql(
        f""", {_UND_CTES.strip()},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
deg AS (SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY a),
wsym AS (
  SELECT s.a, s.b FROM sym s
  JOIN deg d ON d.id = s.b AND d.deg <= {max_center_degree}
),
pairs AS (
  SELECT l.a AS u, r.a AS w, COUNT(*) AS n_common
  FROM wsym l JOIN wsym r ON r.b = l.b AND l.a < r.a
  GROUP BY 1, 2
)
SELECT (e.a IS NOT NULL) AS is_edge,
       CAST(p.n_common AS BIGINT) AS n_common,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs p LEFT JOIN und e ON e.a = p.u AND e.b = p.w
GROUP BY 1, 2
"""
    )


def _transitivity_sql() -> str:
    """Twin of graphalg.global_transitivity — same ordered triangle
    join, wedge sum over symmetric degrees, 1-row cross joins."""
    return graph_sql(
        f""", {_UND_CTES.strip()},
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
wed AS (
  SELECT COALESCE(SUM(deg * (deg - 1) // 2), 0) AS wedges
  FROM (SELECT COUNT(*) AS deg FROM sym GROUP BY a)
),
nv AS (SELECT COUNT(*) AS n_vertices FROM og_vertices),
ne AS (SELECT COUNT(*) AS n_edges FROM und)
SELECT CAST(n_vertices AS BIGINT) AS n_vertices,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(wedges AS BIGINT) AS wedges,
       CAST(n_triangles * 3 AS BIGINT) AS closed_wedges
FROM nv, ne, wed, tri
"""
    )


def _component_density_sql() -> str:
    """Twin of graphalg.component_density_profile — the components
    recursive CTE plus the one-endpoint edge-label join and the
    bit-length size bucket."""
    return f"""
WITH RECURSIVE {GRAPH_CTES},
{_UND_CTES.strip()},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
reach(id, r) AS (
  SELECT id, id FROM og_vertices
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b
),
cc AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
sizes AS (SELECT component_id, COUNT(*) AS size FROM cc GROUP BY 1),
ec AS (
  SELECT c.component_id, COUNT(*) AS n_e
  FROM und e JOIN cc c ON c.id = e.a GROUP BY 1
),
per AS (
  SELECT s.size, COALESCE(ec.n_e, 0) AS n_e
  FROM sizes s LEFT JOIN ec ON ec.component_id = s.component_id
)
SELECT CAST(length(bin(size)) AS BIGINT) AS size_bits,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(size) AS BIGINT) AS n_vertices,
       CAST(SUM(n_e) AS BIGINT) AS n_internal_edges
FROM per GROUP BY 1
"""


def _components_sql() -> str:
    # graph_sql can't host a recursive CTE (RECURSIVE must follow WITH),
    # so compose the preamble by hand
    return f"""
WITH RECURSIVE {GRAPH_CTES},
{_UND_CTES.strip()},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
reach(id, r) AS (
  SELECT id, id FROM og_vertices
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b
)
SELECT CAST(id AS BIGINT) AS id, CAST(MIN(r) AS BIGINT) AS component_id
FROM reach GROUP BY id
"""


def _scc_sql() -> str:
    # fixpoint twin of scc_components: mutual-reachability closure over
    # og_edges ∪ the reversed dst%7 subset (same augmentation as q_scc);
    # scc_id = MAX mutually-reachable id, matching the coloring root.
    # Closure size is V·avg-reach — fine at oracle scale; the Spark side
    # is the one that has to be (and is) closure-free.
    return f"""
WITH RECURSIVE {GRAPH_CTES},
fedges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM og_edges WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM og_edges
    WHERE dst % 7 = 0 AND src <> dst)
),
reach(s, d) AS (
  SELECT id, id FROM og_vertices
  UNION
  SELECT r.s, e.dst FROM reach r JOIN fedges e ON e.src = r.d
)
SELECT CAST(a.s AS BIGINT) AS id, CAST(MAX(a.d) AS BIGINT) AS scc_id
FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
GROUP BY a.s
"""


def _mis_sql(rounds: int = 6) -> str:
    # round-unrolled Luby: win_k = undecided vertices whose (pri, id)
    # beats every undecided neighbor's; rem_k peels winners + their
    # neighborhoods. MATERIALIZED stops the rem chain from inlining
    # exponentially (each rem is referenced three times downstream).
    pri = hash56_sql("id")
    ctes = [
        f""",
{_UND_CTES.strip()},
sym AS MATERIALIZED (
  SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
),
rem0 AS MATERIALIZED (SELECT id, {pri} AS pri FROM og_vertices)"""
    ]
    for r in range(1, rounds + 1):
        p, c = r - 1, r
        ctes.append(f""",
win{c} AS MATERIALIZED (
  SELECT r.id FROM rem{p} r WHERE NOT EXISTS (
    SELECT 1 FROM sym s JOIN rem{p} n ON n.id = s.b
    WHERE s.a = r.id
      AND (n.pri < r.pri OR (n.pri = r.pri AND n.id < r.id)))
),
rem{c} AS MATERIALIZED (
  SELECT * FROM rem{p}
  WHERE id NOT IN (SELECT id FROM win{c})
    AND id NOT IN (SELECT s.b FROM sym s JOIN win{c} w ON w.id = s.a)
)""")
    union = "\nUNION ALL ".join(
        f"SELECT CAST(id AS BIGINT) AS id, CAST({r} AS BIGINT) AS mis_round "
        f"FROM win{r}"
        for r in range(1, rounds + 1)
    )
    return graph_sql("".join(ctes) + "\n" + union)


def _closeness_sql(n_seeds: int = 4, max_dist: int = 64) -> str:
    # one recursive BFS CTE per deterministic min-id seed (the
    # multi-recursive-CTE chaining pattern of _diameter_sql), then the
    # integer closeness/harmonic aggregation
    ctes = [
        f"""
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM og_edges WHERE src <> dst
),
sym AS (
  SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
)"""
    ]
    for k in range(n_seeds):
        ctes.append(f""",
b{k}(id, dist) AS (
  SELECT id, 0 FROM og_vertices
  WHERE id = (SELECT id FROM og_vertices ORDER BY id LIMIT 1 OFFSET {k})
  UNION
  SELECT e.b, s.dist + 1 FROM b{k} s JOIN sym e ON e.a = s.id
  WHERE s.dist < {max_dist}
),
d{k} AS (SELECT id, MIN(dist) AS dist FROM b{k} GROUP BY id)""")
    union = "\n  UNION ALL ".join(
        f"SELECT id, dist FROM d{k} WHERE dist > 0" for k in range(n_seeds)
    )
    return f"""
WITH RECURSIVE {GRAPH_CTES},
{''.join(ctes)},
alld AS ({union})
SELECT CAST(id AS BIGINT) AS id,
       CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(SUM(dist) AS BIGINT) AS sum_dist,
       CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_ppm
FROM alld GROUP BY id
"""


def _path_counts_sql(levels: int = 8) -> str:
    # level-unrolled σ (shortest-path counting): each level is one
    # join + GROUP BY over the previous frontier — plain CTEs, exact
    # integers; both engines run the SAME level cap so the bounded
    # semantics match by construction
    ctes = [
        """
dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM og_edges),
l0 AS MATERIALIZED (
  SELECT (SELECT MIN(id) FROM og_vertices) AS id,
         CAST(0 AS BIGINT) AS dist, CAST(1 AS BIGINT) AS n_paths
),
v0 AS MATERIALIZED (SELECT id FROM l0)"""
    ]
    for d in range(1, levels + 1):
        p = d - 1
        ctes.append(f""",
l{d} AS MATERIALIZED (
  SELECT e.dst AS id, CAST({d} AS BIGINT) AS dist,
         CAST(SUM(l{p}.n_paths) AS BIGINT) AS n_paths
  FROM l{p} JOIN dedges e ON e.src = l{p}.id
  WHERE e.dst NOT IN (SELECT id FROM v{p})
  GROUP BY e.dst
),
v{d} AS MATERIALIZED (
  SELECT id FROM v{p} UNION ALL SELECT id FROM l{d}
)""")
    union = "\nUNION ALL ".join(
        f"SELECT id, dist, n_paths FROM l{d}" for d in range(levels + 1)
    )
    return graph_sql("," + "".join(ctes) + "\n" + union)


def _bfs_sql(max_dist: int = 64) -> str:
    # recursive like _components_sql; UNION (distinct) over (id, dist)
    # pairs + the dist cap bound the recursion on cyclic graphs, and
    # MIN(dist) recovers shortest-path semantics from all-paths search
    return f"""
WITH RECURSIVE {GRAPH_CTES},
bfs(id, dist) AS (
  SELECT id, 0 FROM og_vertices
  WHERE id = (SELECT MIN(id) FROM og_vertices)
  UNION
  SELECT e.dst, b.dist + 1
  FROM bfs b JOIN og_edges e ON e.src = b.id
  WHERE b.dist < {max_dist}
)
SELECT CAST(id AS BIGINT) AS id, CAST(MIN(dist) AS BIGINT) AS dist
FROM bfs GROUP BY id
"""


def _diameter_sql(max_dist: int = 64) -> str:
    # two chained recursive BFS sweeps over the symmetric edge set; the
    # peak CTE's (dist DESC, id ASC) pick matches diameter_double_sweep's
    # tie-break exactly, so both engines run the second sweep from the
    # same vertex
    return f"""
WITH RECURSIVE {GRAPH_CTES},
und AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM og_edges WHERE src <> dst
),
sym AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und)
),
b1(id, dist) AS (
  SELECT id, 0 FROM og_vertices
  WHERE id = (SELECT MIN(id) FROM og_vertices)
  UNION
  SELECT e.b, b1.dist + 1
  FROM b1 JOIN sym e ON e.a = b1.id
  WHERE b1.dist < {max_dist}
),
d1 AS (SELECT id, MIN(dist) AS dist FROM b1 GROUP BY id),
peak AS (SELECT id, dist FROM d1 ORDER BY dist DESC, id ASC LIMIT 1),
b2(id, dist) AS (
  SELECT id, 0 FROM peak
  UNION
  SELECT e.b, b2.dist + 1
  FROM b2 JOIN sym e ON e.a = b2.id
  WHERE b2.dist < {max_dist}
),
d2 AS (SELECT id, MIN(dist) AS dist FROM b2 GROUP BY id)
SELECT CAST((SELECT MIN(id) FROM og_vertices) AS BIGINT) AS seed,
       CAST((SELECT id FROM peak) AS BIGINT) AS peak_id,
       CAST((SELECT dist FROM peak) AS BIGINT) AS ecc_seed,
       CAST((SELECT MAX(dist) FROM d2) AS BIGINT) AS diameter_lb
"""


def _sssp_sql(rounds: int = 10) -> str:
    # Bellman-Ford unrolled; d_{k-1} is referenced twice per round
    # (carry + relax), so MATERIALIZED again prevents 2^rounds inlining
    ctes = """,
wedges AS MATERIALIZED (
  SELECT src, dst, (src * 7 + dst) % 1000 AS w FROM og_edges),
d_0 AS (
  SELECT id, CAST(0 AS BIGINT) AS d FROM og_vertices
  WHERE id = (SELECT MIN(id) FROM og_vertices))"""
    for i in range(1, rounds + 1):
        ctes += f""",
d_{i} AS MATERIALIZED (
  SELECT id, MIN(d) AS d FROM (
    SELECT id, d FROM d_{i - 1}
    UNION ALL
    SELECT e.dst AS id, p.d + e.w AS d
    FROM d_{i - 1} p JOIN wedges e ON e.src = p.id
  ) GROUP BY id
)"""
    return graph_sql(
        f"{ctes} SELECT CAST(id AS BIGINT) AS id,"
        f" CAST(d AS BIGINT) AS dist_scaled FROM d_{rounds}"
    )


def _ppr_sql(iters: int = 4) -> str:
    scale, num, den = graphalg.PR_SCALE, graphalg.PR_DAMP_NUM, graphalg.PR_DAMP_DEN
    base = (den - num) * scale // den
    ctes = f"""
outdeg AS (SELECT src AS id, COUNT(*) AS od FROM og_edges GROUP BY src),
srcv AS (SELECT MIN(id) AS s FROM og_vertices),
pr_0 AS (
  SELECT v.id,
         CAST(CASE WHEN v.id = srcv.s THEN {scale} ELSE 0 END AS BIGINT) AS pr
  FROM og_vertices v CROSS JOIN srcv
)"""
    for k in range(1, iters + 1):
        ctes += f""",
contrib_{k} AS (
  SELECT e.dst AS id, SUM(p.pr // o.od) AS s
  FROM pr_{k - 1} p
  JOIN outdeg o ON o.id = p.id
  JOIN og_edges e ON e.src = p.id
  GROUP BY e.dst
),
pr_{k} AS (
  SELECT v.id,
         CAST(CASE WHEN v.id = srcv.s THEN {base} ELSE 0 END
              + (COALESCE(c.s, 0) * {num}) // {den} AS BIGINT) AS pr
  FROM og_vertices v CROSS JOIN srcv
  LEFT JOIN contrib_{k} c ON c.id = v.id
)"""
    return graph_sql(
        f", {ctes.strip()} SELECT id, pr AS pr_scaled FROM pr_{iters}"
    )


def _kcore_sql(k: int = 3, rounds: int = 16) -> str:
    # round-unrolled peeling, the same trick as _pagerank_sql: extra
    # rounds past the fixpoint are no-ops, so a fixed unroll depth
    # checks the same object Spark's early-exiting loop produces
    # MATERIALIZED is load-bearing: each round references the previous
    # active set twice, so default CTE inlining would expand 2^rounds
    ctes = f""",
{_UND_CTES.strip()},
active_0 AS MATERIALIZED (
  SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und)"""
    for i in range(1, rounds + 1):
        ctes += f""",
keep_{i} AS MATERIALIZED (
  SELECT a AS id FROM active_{i - 1} GROUP BY a HAVING COUNT(*) >= {k}),
active_{i} AS MATERIALIZED (
  SELECT t.a, t.b FROM active_{i - 1} t
  JOIN keep_{i} x ON t.a = x.id
  JOIN keep_{i} y ON t.b = y.id
)"""
    return graph_sql(
        f"{ctes} SELECT CAST(id AS BIGINT) AS id FROM keep_{rounds}"
    )


def _pagerank_sql(iters: int = 4) -> str:
    scale, num, den = graphalg.PR_SCALE, graphalg.PR_DAMP_NUM, graphalg.PR_DAMP_DEN
    base = f"(({den - num} * {scale}) // ({den} * nn.n))"
    ctes = f"""
outdeg AS (SELECT src AS id, COUNT(*) AS od FROM og_edges GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM og_vertices),
pr_0 AS (
  SELECT v.id, CAST({scale} // nn.n AS BIGINT) AS pr
  FROM og_vertices v CROSS JOIN nn
)"""
    for k in range(1, iters + 1):
        ctes += f""",
contrib_{k} AS (
  SELECT e.dst AS id, SUM(p.pr // o.od) AS s
  FROM pr_{k - 1} p
  JOIN outdeg o ON o.id = p.id
  JOIN og_edges e ON e.src = p.id
  GROUP BY e.dst
),
pr_{k} AS (
  SELECT v.id,
         CAST({base} + (COALESCE(c.s, 0) * {num}) // {den} AS BIGINT) AS pr
  FROM og_vertices v CROSS JOIN nn
  LEFT JOIN contrib_{k} c ON c.id = v.id
)"""
    return graph_sql(
        f", {ctes.strip()} SELECT id, pr AS pr_scaled FROM pr_{iters}"
    )


def _neighborhood_features_sql() -> str:
    return graph_sql("""
, de AS (SELECT DISTINCT src, dst FROM og_edges),
one AS (
  SELECT e.src AS id, COUNT(*) AS od,
         SUM(CASE WHEN v.valuable_data THEN 1 ELSE 0 END) AS nv,
         CAST(SUM(CAST(v.stored_value AS DECIMAL(18,6))) AS DOUBLE) AS sv
  FROM de e JOIN og_vertices v ON v.id = e.dst
  GROUP BY e.src
),
two AS (
  SELECT src AS id, COUNT(*) AS n2
  FROM (SELECT DISTINCT a.src, b.dst AS hop2
        FROM de a JOIN de b ON b.src = a.dst)
  GROUP BY src
)
SELECT v.id,
       CAST(COALESCE(o.od, 0) AS BIGINT) AS out_deg,
       CAST(COALESCE(o.nv, 0) AS BIGINT) AS n_valuable_nbrs,
       COALESCE(o.sv, 0.0) AS sum_nbr_value,
       CAST(COALESCE(t.n2, 0) AS BIGINT) AS n_2hop
FROM og_vertices v
LEFT JOIN one o ON o.id = v.id
LEFT JOIN two t ON t.id = v.id
""")


def _condensation_sql() -> str:
    # scc labels from the mutual-reachability closure (see _scc_sql),
    # then inter-component edge contraction
    return f"""
WITH RECURSIVE {GRAPH_CTES},
fedges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM og_edges WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM og_edges
    WHERE dst % 7 = 0 AND src <> dst)
),
reach(s, d) AS (
  SELECT id, id FROM og_vertices
  UNION
  SELECT r.s, e.dst FROM reach r JOIN fedges e ON e.src = r.d
),
scc AS MATERIALIZED (
  SELECT a.s AS id, MAX(a.d) AS scc_id
  FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
  GROUP BY a.s
)
SELECT DISTINCT CAST(ls.scc_id AS BIGINT) AS src_scc,
                CAST(ld.scc_id AS BIGINT) AS dst_scc
FROM (SELECT src, dst FROM og_edges
      UNION ALL
      SELECT dst AS src, src AS dst FROM og_edges WHERE dst % 7 = 0) e
JOIN scc ls ON ls.id = e.src
JOIN scc ld ON ld.id = e.dst
WHERE ls.scc_id <> ld.scc_id
"""


def _hub_attack_sql(n_remove: int = 10) -> str:
    # hubs by (degree DESC, id ASC), then the CC closure restricted to
    # the survivors — same recursive skeleton as _components_sql
    return f"""
WITH RECURSIVE {GRAPH_CTES},
{_UND_CTES.strip()},
deg AS (
  SELECT id, COUNT(*) AS d FROM (
    SELECT a AS id FROM und UNION ALL SELECT b FROM und)
  GROUP BY id
),
hubs AS MATERIALIZED (
  SELECT id FROM deg ORDER BY d DESC, id ASC LIMIT {n_remove}
),
vleft AS MATERIALIZED (
  SELECT id FROM og_vertices WHERE id NOT IN (SELECT id FROM hubs)
),
syml AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und)
  WHERE a NOT IN (SELECT id FROM hubs)
    AND b NOT IN (SELECT id FROM hubs)
),
reach(id, r) AS (
  SELECT id, id FROM vleft
  UNION
  SELECT s.a, reach.r FROM syml s JOIN reach ON reach.id = s.b
),
cc AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
sizes AS (SELECT component_id, COUNT(*) AS n FROM cc GROUP BY component_id)
SELECT CAST({n_remove} AS BIGINT) AS n_removed,
       CAST(SUM(n) AS BIGINT) AS n_vertices_left,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(MAX(n) AS BIGINT) AS largest_component
FROM sizes
"""


def _motif_sql() -> str:
    # same reversed-subset augmentation as _scc_sql so the directed
    # census has cycles and mutual pairs to find
    return f"""
WITH {GRAPH_CTES},
fedges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM og_edges WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM og_edges
    WHERE dst % 7 = 0 AND src <> dst)
),
wedges AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM fedges e1 JOIN fedges e2 ON e2.src = e1.dst
  WHERE e1.src <> e2.dst
)
SELECT
  CAST((SELECT COUNT(*) FROM wedges w
        JOIN fedges e ON e.src = w.a AND e.dst = w.c) AS BIGINT) AS n_ffl,
  CAST((SELECT COUNT(*) FROM wedges w
        JOIN fedges e ON e.src = w.c AND e.dst = w.a
        WHERE w.a < w.b AND w.a < w.c) AS BIGINT) AS n_cycle3,
  CAST((SELECT COUNT(*) FROM fedges e
        JOIN fedges r ON r.src = e.dst AND r.dst = e.src
        WHERE e.src < e.dst) AS BIGINT) AS n_mutual,
  CAST((SELECT COUNT(*) FROM fedges) AS BIGINT) AS n_directed
"""


def _pagerank_weighted_sql(iters: int = 4) -> str:
    scale, num, den = graphalg.PR_SCALE, graphalg.PR_DAMP_NUM, graphalg.PR_DAMP_DEN
    base = f"(({den - num} * {scale}) // ({den} * nn.n))"
    ctes = f"""
wedges_pr AS (
  SELECT src, dst, CAST(ROUND(cost * 1000) AS BIGINT) + 1 AS w
  FROM og_edges
),
wsum AS (SELECT src AS id, SUM(w) AS wtot FROM wedges_pr GROUP BY src),
nn AS (SELECT COUNT(*) AS n FROM og_vertices),
wpr_0 AS (
  SELECT v.id, CAST({scale} // nn.n AS BIGINT) AS pr
  FROM og_vertices v CROSS JOIN nn
)"""
    for k in range(1, iters + 1):
        ctes += f""",
wcontrib_{k} AS (
  SELECT e.dst AS id, SUM((p.pr * e.w) // o.wtot) AS s
  FROM wpr_{k - 1} p
  JOIN wsum o ON o.id = p.id
  JOIN wedges_pr e ON e.src = p.id
  GROUP BY e.dst
),
wpr_{k} AS (
  SELECT v.id,
         CAST({base} + (COALESCE(c.s, 0) * {num}) // {den} AS BIGINT) AS pr
  FROM og_vertices v CROSS JOIN nn
  LEFT JOIN wcontrib_{k} c ON c.id = v.id
)"""
    return graph_sql(
        f", {ctes.strip()} SELECT id, pr AS pr_scaled FROM wpr_{iters}"
    )


_SYM_CTES = f"""{_UND_CTES.strip()},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und)
"""


def _clustering_sql() -> str:
    scale = graphalg.LCC_SCALE
    return graph_sql(
        f""", {_SYM_CTES.strip()},
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
members AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, COUNT(*) AS n FROM members GROUP BY id),
deg AS (SELECT a AS id, COUNT(*) AS degree FROM sym GROUP BY a)
SELECT v.id,
       CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN COALESCE(d.degree, 0) >= 2
            THEN (2 * COALESCE(c.n, 0) * {scale}) // (d.degree * (d.degree - 1))
            ELSE 0 END AS BIGINT) AS lcc_ppm
FROM og_vertices v
LEFT JOIN cnt c ON c.id = v.id
LEFT JOIN deg d ON d.id = v.id
"""
    )


def _degree_clustering_sql() -> str:
    """Twin of graphalg.degree_clustering_profile: the per-vertex LCC
    CTEs grouped by the bit-length bucket — `length(bin(degree))` is
    `length(conv(degree, 10, 2))`'s exact DuckDB equivalent (both
    render the unpadded binary string; 0 → '0', length 1)."""
    scale = graphalg.LCC_SCALE
    return graph_sql(
        f""", {_SYM_CTES.strip()},
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
members AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, COUNT(*) AS n FROM members GROUP BY id),
deg AS (SELECT a AS id, COUNT(*) AS degree FROM sym GROUP BY a),
lcc AS (
  SELECT v.id,
         COALESCE(d.degree, 0) AS degree,
         COALESCE(c.n, 0) AS n_triangles,
         CASE WHEN COALESCE(d.degree, 0) >= 2
              THEN (2 * COALESCE(c.n, 0) * {scale})
                   // (d.degree * (d.degree - 1))
              ELSE 0 END AS lcc_ppm
  FROM og_vertices v
  LEFT JOIN cnt c ON c.id = v.id
  LEFT JOIN deg d ON d.id = v.id
)
SELECT CAST(length(bin(degree)) AS BIGINT) AS degree_bits,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(n_triangles) AS BIGINT) AS sum_triangles,
       CAST(SUM(lcc_ppm) AS BIGINT) AS sum_lcc_ppm,
       CAST(SUM(lcc_ppm) // COUNT(*) AS BIGINT) AS mean_lcc_ppm
FROM lcc GROUP BY 1
"""
    )


def _label_propagation_sql(rounds: int = 3) -> str:
    ctes = f"""{_SYM_CTES.strip()},
l0 AS (SELECT id, id AS label FROM og_vertices)"""
    for k in range(1, rounds + 1):
        ctes += f""",
c{k} AS (
  SELECT s.a, l.label, COUNT(*) AS c
  FROM sym s JOIN l{k - 1} l ON l.id = s.b
  GROUP BY s.a, l.label
),
m{k} AS (
  SELECT a, label FROM (
    SELECT a, label,
           ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, label ASC) AS rn
    FROM c{k}
  ) WHERE rn = 1
),
l{k} AS (
  SELECT p.id, COALESCE(m.label, p.label) AS label
  FROM l{k - 1} p LEFT JOIN m{k} m ON m.a = p.id
)"""
    return graph_sql(
        f", {ctes.strip()} SELECT id, CAST(label AS BIGINT) AS label FROM l{rounds}"
    )


def _link_prediction_sql(k: int = 100, max_center_degree: int = 64) -> str:
    return graph_sql(
        f""", {_SYM_CTES.strip()},
deg AS (SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY a),
wsym AS (
  SELECT s.a, s.b FROM sym s
  JOIN deg dc ON dc.id = s.b AND dc.deg <= {max_center_degree}
),
cand AS (
  SELECT l.a AS a, r.a AS b, COUNT(*) AS cn
  FROM wsym l JOIN wsym r ON r.b = l.b AND l.a < r.a
  GROUP BY l.a, r.a
),
nonedge AS (
  SELECT c.a, c.b, c.cn FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = c.a AND e.b = c.b)
)
SELECT n.a, n.b,
       CAST(n.cn AS BIGINT) AS common_neighbors,
       CAST(da.deg * db.deg AS BIGINT) AS deg_product
FROM nonedge n
JOIN deg da ON da.id = n.a
JOIN deg db ON db.id = n.b
ORDER BY common_neighbors DESC, n.a, n.b
LIMIT {k}
"""
    )


def _neighbor_jaccard_sql(max_center_degree: int = 64) -> str:
    return graph_sql(
        f""", {_SYM_CTES.strip()},
deg AS (SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY a),
wsym AS (
  SELECT s.a, s.b FROM sym s
  JOIN deg dc ON dc.id = s.b AND dc.deg <= {max_center_degree}
),
common AS (
  SELECT l.a AS a, r.a AS b, COUNT(*) AS nc
  FROM wsym l JOIN wsym r ON r.b = l.b AND l.a < r.a
  GROUP BY l.a, r.a
)
SELECT e.a, e.b,
       CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(c.nc, 0) * 1000000
            // (da.deg + db.deg - COALESCE(c.nc, 0)) AS BIGINT) AS jaccard_ppm
FROM und e
LEFT JOIN common c ON c.a = e.a AND c.b = e.b
JOIN deg da ON da.id = e.a
JOIN deg db ON db.id = e.b
"""
    )


def _resource_allocation_sql(k: int = 100, max_center_degree: int = 64) -> str:
    scale = graphalg.RA_SCALE
    return graph_sql(
        f""", {_SYM_CTES.strip()},
deg AS (SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY a),
wsym AS (
  SELECT s.a, s.b, dc.deg FROM sym s
  JOIN deg dc ON dc.id = s.b AND dc.deg <= {max_center_degree}
),
cand AS (
  SELECT l.a AS a, r.a AS b,
         SUM({scale} // l.deg) AS ra, COUNT(*) AS cn
  FROM wsym l JOIN wsym r ON r.b = l.b AND l.a < r.a
  GROUP BY l.a, r.a
),
nonedge AS (
  SELECT c.a, c.b, c.ra, c.cn FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = c.a AND e.b = c.b)
)
SELECT a, b, CAST(ra AS BIGINT) AS ra_ppb,
       CAST(cn AS BIGINT) AS common_neighbors
FROM nonedge
ORDER BY ra_ppb DESC, a, b
LIMIT {k}
"""
    )


def _two_hop_reach_sql() -> str:
    return graph_sql(
        """, e AS (SELECT DISTINCT src, dst FROM og_edges),
two AS (
  SELECT e1.src AS src, e2.dst AS dst
  FROM e e1 JOIN e e2 ON e2.src = e1.dst
),
reach AS (
  SELECT src, COUNT(DISTINCT dst) AS n FROM (
    SELECT src, dst FROM e UNION ALL SELECT src, dst FROM two
  ) WHERE src <> dst GROUP BY src
)
SELECT v.id, CAST(COALESCE(r.n, 0) AS BIGINT) AS n_reach_2
FROM og_vertices v LEFT JOIN reach r ON r.src = v.id
"""
    )


def _component_sizes_sql() -> str:
    # same recursive reach as _components_sql, rolled up to a histogram
    return f"""
WITH RECURSIVE {GRAPH_CTES},
{_UND_CTES.strip()},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
reach(id, r) AS (
  SELECT id, id FROM og_vertices
  UNION
  SELECT s.a, reach.r FROM sym s JOIN reach ON reach.id = s.b
),
labels AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
sizes AS (SELECT component_id, COUNT(*) AS n FROM labels GROUP BY component_id)
SELECT CAST(n AS BIGINT) AS component_size,
       CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY n
"""


def _degree_histogram_sql() -> str:
    return graph_sql(
        f""", {_SYM_CTES.strip()},
deg AS (SELECT a AS id, COUNT(*) AS degree FROM sym GROUP BY a),
vdeg AS (
  SELECT CAST(COALESCE(d.degree, 0) AS BIGINT) AS degree
  FROM og_vertices v LEFT JOIN deg d ON d.id = v.id
)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM vdeg GROUP BY degree
"""
    )


def _ktruss_sql(k: int = 4, rounds: int = 5) -> str:
    # MATERIALIZED is load-bearing: each round references the previous
    # edge set 3× (the triangle self-joins), so plain CTEs inline into
    # 3^rounds re-reads of the base scan
    ctes = f"""{_UND_CTES.strip()},
e_0 AS MATERIALIZED (SELECT a, b FROM und)"""
    for r in range(1, rounds + 1):
        ctes += f""",
tri_{r} AS MATERIALIZED (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e_{r - 1} e1
  JOIN e_{r - 1} e2 ON e2.a = e1.b
  JOIN e_{r - 1} e3 ON e3.a = e1.a AND e3.b = e2.b
),
sup_{r} AS (
  SELECT a, b, COUNT(*) AS s FROM (
    SELECT a, b FROM tri_{r}
    UNION ALL SELECT b AS a, c AS b FROM tri_{r}
    UNION ALL SELECT a, c AS b FROM tri_{r}
  ) GROUP BY a, b
),
e_{r} AS MATERIALIZED (SELECT a, b FROM sup_{r} WHERE s >= {k - 2})"""
    return graph_sql(
        f", {ctes.strip()} SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b FROM e_{rounds}"
    )


def _hits_sql(rounds: int = 2) -> str:
    ctes = """
hub_0 AS (SELECT id, CAST(1 AS BIGINT) AS hub FROM og_vertices)"""
    for k in range(1, rounds + 1):
        ctes += f""",
auth_{k}_raw AS (
  SELECT e.dst AS id, SUM(h.hub) AS auth
  FROM og_edges e JOIN hub_{k - 1} h ON h.id = e.src
  GROUP BY e.dst
),
auth_{k} AS (
  SELECT v.id, CAST(COALESCE(a.auth, 0) AS BIGINT) AS auth
  FROM og_vertices v LEFT JOIN auth_{k}_raw a ON a.id = v.id
),
hub_{k}_raw AS (
  SELECT e.src AS id, SUM(a.auth) AS hub
  FROM og_edges e JOIN auth_{k} a ON a.id = e.dst
  GROUP BY e.src
),
hub_{k} AS (
  SELECT v.id, CAST(COALESCE(h.hub, 0) AS BIGINT) AS hub
  FROM og_vertices v LEFT JOIN hub_{k}_raw h ON h.id = v.id
)"""
    return graph_sql(
        f""", {ctes.strip()}
SELECT h.id, h.hub, a.auth
FROM hub_{rounds} h JOIN auth_{rounds} a ON a.id = h.id
"""
    )


def _reciprocity_sql() -> str:
    scale = graphalg.LCC_SCALE
    return graph_sql(
        f""", e AS (
  SELECT DISTINCT src, dst FROM og_edges WHERE src <> dst
),
m AS (
  SELECT COUNT(*) AS n_mutual FROM e
  WHERE EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_directed,
       CAST(m.n_mutual AS BIGINT) AS n_mutual,
       CAST((m.n_mutual * {scale}) // (SELECT COUNT(*) FROM e) AS BIGINT)
         AS reciprocity_ppm
FROM m
"""
    )


def _assortativity_sql() -> str:
    return graph_sql(
        f""", {_SYM_CTES.strip()},
deg AS (SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY a),
pairs AS (
  SELECT da.deg AS x, db.deg AS y
  FROM sym s
  JOIN deg da ON da.id = s.a
  JOIN deg db ON db.id = s.b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy,
       CAST(SUM(x * x) AS BIGINT) AS sum_x2
FROM pairs
"""
    )


# ---------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _prep(spark).read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _prep(spark).read.parquet(f"{sf_dir}/embeddings.parquet")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup group resolution: MinHash-LSH pairs → connected
    components (min-label propagation) → (doc_id, group_id)."""
    pairs = dedup.minhash_lsh_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)
    return dedup.dup_groups(pairs)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup of an append batch against an existing
    hash index (simulated: docs with doc_id % 5 == 0 are the prior
    corpus, the rest arrive as the new batch)."""
    docs = _docs(spark, sf_dir)
    seen = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    new = docs.filter(F.col("doc_id") % 5 != 0)
    return dedup.incremental_dedup(new, seen)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-copy selection over MinHash near-dup groups: keep the
    longest member (argmax n_chars, ties → min doc_id)."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(docs, n=3, threshold=0.2)
    return dedup.dedup_keep_best(docs, pairs)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=8)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH candidates + decimal cosine verify. Threshold 0.4 (not
    the production 0.9): the synthetic embeddings are near-orthogonal
    (max pairwise cosine ≈ 0.51 at sf0.01), so a realistic near-dup
    threshold matches on an empty set and validates nothing."""
    return dedup.embedding_cosine_pairs(_embs(spark, sf_dir), threshold=0.4)


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embs(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 20)
    return similarity.cosine_topk(emb, queries_df, k=5)


def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: approximate — recall vs the exact baseline is asserted
    in tests/test_dataops.py instead of oracle identity. multi_probe=1
    is the production config (recall@5 ≥ 0.9 at sf0.1 vs 0.36 plain)."""
    emb = _embs(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_lsh_topk(emb, queries_df, k=5, multi_probe=1)


def q_similarity_ann_lsh_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked ANN: same bucket-then-rerank shape as
    similarity_ann_lsh, but decimal SRP signatures + decimal rerank so
    the DuckDB oracle reproduces candidates, scores, and ranks exactly."""
    emb = _embs(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_lsh_topk_exact(emb, queries_df, k=5)


def q_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: IVF coarse-quantizer ANN (inverted lists + probes);
    recall vs the exact baseline asserted in tests/test_skew_ivf.py."""
    emb = _embs(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_ivf_topk(emb, queries_df, k=5)


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline in ONE plan: quality gate +
    language ID + MinHash near-dup canonical resolution."""
    from big_data_graph_analysis_with_spark_spark.operators import corpus

    return corpus.clean_corpus(_docs(spark, sf_dir), quality_threshold=0.2)


def q_doc_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations report over documents: one
    partial-aggregated pass however many rules, unpivoted in-plan."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    docs = _docs(spark, sf_dir)
    return curation.expectations(
        docs,
        {
            "text_not_null": F.col("text").isNotNull(),
            "n_chars_positive": F.col("n_chars") > 0,
            "n_chars_consistent": F.col("n_chars") == F.length("text"),
            "lang_known": F.col("lang").isin("de", "en", "es", "fr", "zh"),
            "text_min_tokens": F.size(F.split("text", " ")) >= 3,
        },
    )


def q_corpus_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE corpus-preparation pass — clean → per-language mixture
    reweight → deterministic shard shuffle — as one declarative plan
    (operators/corpus.prepare_corpus)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpus

    return corpus.prepare_corpus(
        _docs(spark, sf_dir),
        quality_threshold=0.2,
        weights=_MIX_WEIGHTS,
        default_rate=0.5,
        mix_seed=11,
        n_shards=4,
        shard_seed=3,
    )


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking: consecutive ≤64-token chunks per doc."""
    from big_data_graph_analysis_with_spark_spark.operators import chunking

    return chunking.doc_chunks(_docs(spark, sf_dir), max_tokens=64)


def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucketed sequence packing at a 512-token
    budget — membership is a pure function of corpus content."""
    from big_data_graph_analysis_with_spark_spark.operators import chunking

    return chunking.pack_documents(_docs(spark, sf_dir), budget=512, n_buckets=8)


def q_events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events table (30-min gap)."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return sessions.sessionize_events(ev)


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficiency batching: similar-length docs grouped into
    fixed-size batches (hash-shuffled within each length bucket)."""
    from big_data_graph_analysis_with_spark_spark.operators import chunking

    return chunking.length_buckets(_docs(spark, sf_dir))


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel progression view → click → purchase per user
    (min-time semantics: each step must occur at or after the earliest
    qualifying previous step)."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return sessions.funnel_steps(ev)


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling — membership is a pure function of
    (doc_id, seed), stable across engines/partitionings."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.hash_sample(_docs(spark, sf_dir), rate=0.25, seed=7).select(
        "doc_id", "lang", "source", "n_chars"
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified cap: ≤50 docs per language by seeded hash order."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.stratified_cap(
        _docs(spark, sf_dir), "lang", cap=50, seed=7
    ).select("doc_id", "lang")


def q_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval labeling by seeded id hash."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.train_eval_split(
        _docs(spark, sf_dir), eval_frac=0.1, seed=7
    ).select("doc_id", "split")


#: training-mixture weights for the mixture_sample query — exercised
#: over the documents table's language column
_MIX_WEIGHTS = {"en": 0.5, "de": 1.0, "fr": 0.25}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain mixture reweighting: language-keyed keep rates,
    deterministic hash membership, narrow map (no shuffle)."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.mixture_sample(
        _docs(spark, sf_dir), _MIX_WEIGHTS, strata_col="lang",
        default_rate=0.1, seed=11,
    ).select("doc_id", "lang", "source", "n_chars")


def q_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle materialized as
    (doc_id, shard, pos) — hash-keyed shards with per-shard local
    sorts, never a global orderBy."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.shard_assignments(_docs(spark, sf_dir), n_shards=8, seed=3)


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_stats(_docs(spark, sf_dir))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_scores(_docs(spark, sf_dir))


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.language_id(_docs(spark, sf_dir))


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.doc_fingerprints(_docs(spark, sf_dir)).select(
        "doc_id", F.explode("fingerprint").alias("h")
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 distinctive terms by rational tf-idf (the
    monotone log-free form — see operators/textops.tfidf_top_terms)."""
    return textops.tfidf_top_terms(_docs(spark, sf_dir), k=5)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs flagged by shared-n-gram
    overlap against the (broadcast) eval split's n-gram set."""
    from big_data_graph_analysis_with_spark_spark.operators import curation, sampling

    split = sampling.train_eval_split(_docs(spark, sf_dir), eval_frac=0.1, seed=7)
    return curation.decontaminate(
        split.filter(F.col("split") == "train").drop("split"),
        split.filter(F.col("split") == "eval").drop("split"),
        n=3,
        min_overlap=2,
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicated word/2-gram/3-gram fractions per doc."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    return curation.repetition_stats(_docs(spark, sf_dir))


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking over deterministically-planted addresses/numbers
    (the fixture corpus contains none — the plant makes the redaction
    observable; both engines plant the identical text)."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.expr(
                "repeat(concat(' u', CAST(doc_id AS STRING), '@ex.com'),"
                " CAST(doc_id % 3 AS INT))"
            ),
            F.expr(
                "repeat(concat(' +1 555 ',"
                " lpad(CAST(doc_id % 10000 AS STRING), 7, '0')),"
                " CAST(doc_id % 2 AS INT))"
            ),
        ).alias("text"),
    )
    return curation.redact_pii(planted)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: mapInPandas decode plumbing with stubbed codecs."""
    assets = multimodal.synthesize_assets(_docs(spark, sf_dir))
    return multimodal.extract_features(assets).drop("feature")


def q_multimodal_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: per-kind rollup of extracted features."""
    assets = multimodal.synthesize_assets(_docs(spark, sf_dir))
    return multimodal.asset_summary(multimodal.extract_features(assets))


def q_multimodal_real_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: REAL decode end-to-end — genuine PPM / WAV payloads
    built batch-wise, decoded by the dependency-free codecs (pure-numpy
    P6 reader, stdlib wave); only the video kind takes the stub path."""
    assets = multimodal.synthesize_media_assets(_docs(spark, sf_dir))
    return multimodal.extract_features(assets).drop("feature")


# ---------------------------------------------------------------------------
# relational suite (windows / sorts / decimal aggregation at scale)
# ---------------------------------------------------------------------------


#: Q3 cutoff (orders/lineitem timestamps are µs TIMESTAMP_NTZ — unlike
#: events, the only nanos table — so date-string comparison is the
#: timezone-free cross-engine form)
_Q3_CUT = "1998-06-01"


def q_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge over orders: a derived change batch (doubled price
    for keys ≡0 mod 7 at v1, delete markers for keys ≡0 mod 13 at v2)
    folded into the v0 base — last-writer-wins per key, change side
    wins ties, delete winners dropped. One key shuffle, no join
    (operators/merge.upsert)."""
    from big_data_graph_analysis_with_spark_spark.operators import merge

    orders = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = orders.withColumn("v", F.lit(0).cast("long"))
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("v", F.lit(1).cast("long"))
        .withColumn("_del", F.lit(False))
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("v", F.lit(2).cast("long"))
        .withColumn("_del", F.lit(True))
    )
    return merge.upsert(
        base,
        updates.unionByName(deletes),
        key=["o_orderkey"],
        version_col="v",
        delete_col="_del",
    )


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style five-way join: revenue by nation for one region
    and one order-date year, where supplier and customer share the
    nation. region→nation broadcast into the fact chain; the
    s_nationkey = c_nationkey equality rides the supplier join, so the
    plan is a left-deep hash-join chain with both date filters pushed
    to the scans — no join pair ever materializes outside its keys."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    orders = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    asia_nations = F.broadcast(
        region.filter(F.col("r_name") == "ASIA").join(
            nation, F.col("r_regionkey") == F.col("n_regionkey")
        )
    )
    return (
        cust.join(asia_nations, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style join pipeline: segment-filtered customers ⋈
    date-filtered orders ⋈ lineitem, revenue per order, top 10.

    The shape Catalyst is built for: both dimension filters push to the
    parquet scans, the customer side broadcasts, and the final top-k is
    a single ordered limit (no global sort materialization)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cut = F.lit(_Q3_CUT).cast("timestamp_ntz")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cut)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cut)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan-heavy aggregate: the canonical columnar-scan
    + map-side partial agg benchmark shape."""
    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
                ).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: one-row revenue-change forecast — a pure
    pushdown-filter + single decimal aggregate; the scan should read 3
    columns with every predicate pushed (PLAN_AUDIT checks)."""
    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returned items per customer
    (top 20) — the 3-table join + aggregate + deterministic top-k."""
    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rev = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, on=F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, on=F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,2)")
                        - F.col("l_discount").cast("decimal(18,2)")
                    )
                ).cast("decimal(28,4)")
            ).alias("rev_dec"),
            F.count("*").cast("long").alias("n_items"),
        )
    )
    return (
        rev.orderBy(F.desc("rev_dec"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("rev_dec").cast("double").alias("revenue"),
            "n_items",
        )
    )


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + window rank: top-3 customers by order revenue per nation."""
    orders = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rev = (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("n_name").orderBy(
        F.desc("rev_d"), F.asc("c_custkey")
    )
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "n_name",
            "c_custkey",
            F.col("rev_d").cast("double").alias("revenue"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per type per hour — the batch shape of the streaming
    tumbling-window demo (streaming/walk_rates.py)."""
    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    # integer floor-div on the epoch-µs long — double division would
    # lose precision above 2^53
    hour = F.expr("tus div 3600000000")
    ev = ev.withColumn("tus", event_micros(ev))
    return ev.groupBy(
        F.col("event_type"), hour.alias("hour_bucket")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window tumbling aggregation — the batch twin of the streaming
    rollup (streaming/walk_rates.py; stream ≡ batch asserted in
    tests/test_streaming.py). Window start exported as epoch seconds so
    both engines compare as BIGINT."""
    from big_data_graph_analysis_with_spark_spark.streaming import walk_rates

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return walk_rates.windowed_event_counts(ev).select(
        F.unix_timestamp("window_start").alias("window_start_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window rollup (1-hour windows every 15 min): each event
    lands in 4 overlapping windows, expanded in-plan by F.window — no
    self-join. Same engine path as the streaming twin."""
    from big_data_graph_analysis_with_spark_spark.streaming import walk_rates

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return walk_rates.windowed_event_counts(
        ev, window="1 hour", slide="15 minutes"
    ).select(
        F.unix_timestamp("window_start").alias("window_start_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user journeys
    (lag window + vocabulary-sized aggregation)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.event_transitions(ev)


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks up the latest at-or-before
    view event of the same user (union-and-carry, one shuffle). The
    oracle is DuckDB's native ASOF LEFT JOIN — an independent
    implementation of the same point-in-time semantics."""
    from big_data_graph_analysis_with_spark_spark.operators import asof

    raw = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select(
        "event_id", "user_id", "event_type", event_micros(raw).alias("tus")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "tus"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("tus").alias("vtus"))
        .agg(F.max("event_id").alias("view_event_id"))
    )
    joined = asof.asof_join(
        clicks,
        views,
        key=["user_id"],
        left_ts="tus",
        right_ts="vtus",
        right_payload=["view_event_id"],
        left_tie="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "tus",
        "view_event_id",
        F.col("vtus").alias("view_tus"),
        (F.col("tus") - F.col("vtus")).cast("long").alias("gap_us"),
    )


def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3-event per-user moving sum/average (operators/olap):
    one hash shuffle on user_id, partition-local window sorts, decimal
    sums so the rolling average is cross-engine exact."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.rolling_user_stats(ev, n_last=3)


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type pivot (counts + decimal value sums) with the
    pivot vocabulary given explicitly — one partial-aggregated shuffle,
    no distinct-scan."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.event_type_pivot(ev)


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: global top-50 word bigrams by occurrence
    (TakeOrderedAndProject — per-partition top-k, no global sort)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.top_ngrams(_docs(spark, sf_dir), n=2, min_docs=2, k=50)


def q_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language token-count quantiles by integer rank
    selection (the oracle-checkable baseline for approx_percentile)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.token_quantiles(_docs(spark, sf_dir), group="lang")


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embeddings table (narrow
    map; floor of correctly-rounded IEEE ops → engine-exact codes)."""
    return similarity.quantize_embeddings(_embs(spark, sf_dir))


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in exact decimal fixed point."""
    return similarity.label_centroids(_embs(spark, sf_dir))


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup with subtotal levels: (event_type, day) detail rows,
    per-type subtotals, and a grand total, tagged by grouping_id —
    Spark's ROLLUP grouping-sets expansion keeps this a single
    partial-aggregated shuffle (no per-level rescan)."""
    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    e = ev.withColumn("tus", event_micros(ev)).select(
        "event_type",
        F.expr("tus div 86400000000").alias("day_bucket"),
        "value",
    )
    return e.rollup("event_type", "day_bucket").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed interval join: click events falling inside any 4-hour
    window opened by an error event of the same user. Bucketized
    equi-join (operators/ranges) — the oracle states the same semantics
    as a direct inequality join, which DuckDB executes natively."""
    from big_data_graph_analysis_with_spark_spark.operators import ranges

    raw = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select(
        "event_id", "user_id", "event_type", event_micros(raw).alias("tus")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("tus").alias("click_tus")
    )
    win_us = 14_400 * 1_000_000
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("tus").alias("win_start"),
        (F.col("tus") + win_us).cast("long").alias("win_end"),
    )
    joined = ranges.interval_join(
        clicks,
        errors,
        key=["user_id"],
        point_ts="click_tus",
        start="win_start",
        end="win_end",
        bucket_width=win_us,
    )
    return joined.select("click_id", "user_id", "click_tus", "error_id", "win_start")


def q_salted_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation lineitem revenue through an explicitly salted join
    (functions/skew.salted_join) — result is salt-invariant, so the
    oracle is the plain join; the salt only reshapes the shuffle."""
    from big_data_graph_analysis_with_spark_spark.functions import skew

    sess = _prep(spark)
    li = sess.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).cast("decimal(28,4)").alias("rev"),
    )
    supp = sess.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = skew.salted_join(li, supp, on="l_suppkey", salt=8)
    return joined.groupBy("s_nationkey").agg(
        F.sum("rev").cast("double").alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — users bucketed by first active day,
    counted at each returning day-offset (all-integer day arithmetic)."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return cohorts.retention_cohorts(ev)


def q_events_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per tumbling hour (heavy hitters with a
    deterministic count DESC / type ASC rank)."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return cohorts.topk_per_window(ev, k=3)


def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burst days: daily counts > mean + 2σ of that user's own
    history, tested in cross-multiplied integer form (no division or
    sqrt, so both engines agree exactly)."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return cohorts.user_anomaly_days(ev, sigmas=2, min_days=3)


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 unigram vocabulary with ranks and cumulative occurrence
    counts — the tokenizer-build coverage curve."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.vocab_coverage(_docs(spark, sf_dir), k=200)


def q_winsorize_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc lengths clipped to the exact [p5, p95] band; cutoffs from a
    value-histogram cumulative scan (no global row sort)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.winsorize_lengths(_docs(spark, sf_dir))


def q_term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document co-occurrence counts for the top-20 DF unigrams —
    candidate pairs bounded per doc by the broadcast vocabulary."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.term_cooccurrence(_docs(spark, sf_dir), vocab_k=20, k=100)


def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free time-ordered train/eval split of events at the
    exact 4/5 quantile of distinct active days."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return sampling.temporal_split(ev, train_frac=(4, 5))


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU engagement rollup — trailing distinct counts via the
    explode-forward fan-out (windowed countDistinct doesn't exist)."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return cohorts.active_users(ev)


def q_interarrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of per-user inter-event gaps (lag window +
    integer rank selection)."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return cohorts.interarrival_quantiles(ev)


def q_token_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language robust center/spread: exact median and MAD of token
    counts (two chained integer rank selections)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.token_mad(_docs(spark, sf_dir))


def q_orders_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history over the same synthetic change feed as
    `orders_upsert`: every version becomes a validity interval
    (valid_from/valid_to/is_current) — one key shuffle, one lead
    window, no join."""
    from big_data_graph_analysis_with_spark_spark.operators import merge

    orders = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = orders.withColumn("v", F.lit(0).cast("long")).withColumn(
        "_del", F.lit(False)
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("v", F.lit(1).cast("long"))
        .withColumn("_del", F.lit(False))
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 13 == 0)
        .withColumn("v", F.lit(2).cast("long"))
        .withColumn("_del", F.lit(True))
    )
    hist = merge.scd2_history(
        base.unionByName(updates).unionByName(deletes),
        key=["o_orderkey"],
        version_col="v",
        delete_col="_del",
    )
    return hist.select(
        "o_orderkey", "o_totalprice", "o_orderstatus",
        "valid_from", "valid_to", "is_current",
    )


def q_orders_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup over the SCD2 history: the table state
    AS OF version 1 (updates applied, deletes not yet) — the
    time-travel read the versioned-interval layout exists for."""
    hist = q_orders_scd2(spark, sf_dir)
    asof_v = 1
    return hist.filter(
        (F.col("valid_from") <= asof_v)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > asof_v))
    ).select("o_orderkey", "o_totalprice", "o_orderstatus", "valid_from")


def q_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation DAG of the cycle-augmented graph: SCCs contracted
    to their max-id labels, inter-component edges kept once."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.condensation_edges(og, extra_edges=_scc_extra_edges(og))


def q_neighborhood_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-passing feature layer: per-vertex 1-hop aggregates
    (degree, valuable-neighbor count, decimal-exact value sum) and the
    distinct 2-hop reach count."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.neighborhood_features(og)


def q_churned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn cohort: users active in the first half of the day range
    with zero activity after — exact integer cutoff, one anti join."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    # the synthetic users are active nearly everywhere; only a thin
    # "after" window (the last ~5% of days) yields a nonempty cohort
    return cohorts.churned_users(ev, split=(19, 20))


def q_attributed_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase→prior-click attribution pairs within a 1-hour horizon
    (the batch twin of the stream-stream watermark join; the streaming
    equivalence is asserted in tests)."""
    from big_data_graph_analysis_with_spark_spark.streaming import correlate

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return correlate.attributed_purchases(
        ev, horizon="1 hour", watermark=None
    ).select("user_id", "purchase_id", "click_id", "value")


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct-token and hapax counts at
    doc-count checkpoints, from ONE token aggregation."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.vocab_growth(
        _docs(spark, sf_dir), checkpoints=(100, 500, 2_000, 10_000)
    )


def q_knn_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation over the exact cosine kNN
    graph (deterministic vec_id %% 2 audit slice): seeds = vec_id %% 3
    == 0, two majority-vote rounds with deterministic tie-breaks."""
    return similarity.knn_label_propagation(
        _embs(spark, sf_dir).filter(F.col("vec_id") % 2 == 0),
        k=5, rounds=2, known_mod=3,
    )


def q_user_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type sequences in exact (time, id) order, capped
    at the first 50 events — behavior-sequence training-data export."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.user_sequences(ev, max_len=50)


def q_ego_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layered GraphSAGE-style ego-net batch from the 8 smallest vertex
    ids, fanouts (3, 2). Membership is a pure function of (edge, seed)
    hash rank, so the whole two-layer expansion unrolls into chained
    SQL CTEs — oracle-checked end to end (plus repartitioning-
    invariance tests)."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    og, _ = _graphs(spark, sf_dir)
    seeds = og.vertices.select("id").orderBy("id").limit(8)
    return sampling.ego_batch(og.edges, seeds, fanouts=(3, 2), seed=5)


def q_session_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of session duration and depth (rank-selection
    quantiles over the sessionized events)."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return sessions.session_quantiles(ev)


def q_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language composition with exact ppm shares."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.language_mix(_docs(spark, sf_dir))


def q_user_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running purchase value (unbounded-preceding decimal
    cumulative sum — the LTV curve)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.user_running_value(ev, event_type="purchase")


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine 5-NN graph over the vec_id % 10 slice of the
    embedding table (decimal dots, round(9) cosines)."""
    return similarity.knn_graph(_embs(spark, sf_dir), k=5, sample_mod=10)


def q_events_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout codes over (user_id, day) — the
    clustering key a lakehouse OPTIMIZE ZORDER writes files by, as a
    pure bit-algebra projection (engine-exact, no UDF)."""
    from big_data_graph_analysis_with_spark_spark.functions.zorder import morton2

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    day = F.expr("tus div 86400000000").cast("long")
    return (
        ev.select("event_id", "user_id", event_micros(ev).alias("tus"))
        .select("event_id", "user_id", day.alias("day"))
        .select(
            "event_id",
            "user_id",
            "day",
            morton2(F.col("user_id"), F.col("day")).alias("zorder"),
        )
    )


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal second-moment statistics for every embedding
    dimension pair — the distributed half of covariance/PCA/whitening."""
    return similarity.embedding_covariance(_embs(spark, sf_dir))


def q_sketch_audit_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts per event type plus a verdict that
    this engine's HLL estimate lands within 5% — exact values and
    verdicts hash-match cross-engine, the sketch stays engine-local."""
    from big_data_graph_analysis_with_spark_spark.operators import sketches

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return sketches.distinct_sketch_audit(ev)


def q_sketch_audit_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 token counts plus a verdict that the approximate-
    percentile sketch lands within 10% of each."""
    from big_data_graph_analysis_with_spark_spark.operators import sketches

    return sketches.quantile_sketch_audit(_docs(spark, sf_dir))


def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup: prefix-sort blocking + adjacent-pair
    integer-ppm Jaccard — the O(n log n), single-shuffle member of the
    dedup family (no inverted index, no candidate self-join)."""
    return dedup.sorted_neighborhood_pairs(
        _docs(spark, sf_dir), threshold_ppm=300_000
    )


def q_prefix_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-containment dedup: block on the first 32 chars, verify by
    exact substring compare — catches whole-doc-inside-longer-doc
    leaks that shingle-Jaccard dilutes away."""
    return dedup.prefix_containment_pairs(_docs(spark, sf_dir), block_chars=32)


def q_length_matched_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-flattening resample: every length bucket hash-gated
    down to the smallest bucket's count with exact integer rates."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.length_matched_resample(
        _docs(spark, sf_dir), bucket_width=128, n_buckets=8, seed=13
    )


def q_rp_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±1 Johnson–Lindenstrauss projection of the embeddings to 8 dims
    (Achlioptas signs from the shared MD5), decimal-exact sums."""
    return similarity.rp_project(_embs(spark, sf_dir), out_dims=8)


def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning: lineitem is pre-filtered by a
    broadcast bloom of the urgent orders' keys (a plain projection, no
    shuffle), then joined. The ORACLE is the UNPRUNED join — green iff
    the bloom admits every true key (no false negatives), the property
    that makes the prune safe at 100 TB."""
    from big_data_graph_analysis_with_spark_spark.functions import bloom

    spark = _prep(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pruned = bloom.bloom_prune(lineitem, orders, "l_orderkey", "o_orderkey")
    return (
        pruned.join(
            orders.select("o_orderkey"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty (fraction of shingles unique to the doc
    corpus-wide, exact ppm) — diversity scoring for mixture building."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.ngram_novelty(_docs(spark, sf_dir), n=3)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE merge-table induction, 4 rounds — one bigram count +
    one rewrite pass per round; only the winning pair reaches the
    driver. Oracle = the same loop as chained CTEs."""
    return textops.bpe_merges(_docs(spark, sf_dir), rounds=4)


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot diff (added/removed/changed) between orders
    and a deterministically-churned copy; the oracle derives the same
    churn analytically, so the full-outer-join classification is what
    is under test."""
    from big_data_graph_analysis_with_spark_spark.operators import merge

    orders = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    old = orders.select("o_orderkey", "o_totalprice")
    new = (
        orders.filter(F.col("o_orderkey") % 13 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionAll(
            orders.filter(F.col("o_orderkey") % 17 == 0).select(
                (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    return merge.snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice"])


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governance audit: quasi-identifier equivalence classes of
    (lang, source, length-bucket) smaller than k=3 — the groups a
    k-anonymity release policy must suppress."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    d = _docs(spark, sf_dir).select(
        "lang", "source", F.expr("n_chars div 100").alias("len_bucket")
    )
    return curation.k_anonymity_violations(
        d, ["lang", "source", "len_bucket"], k=3
    )


def q_type_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite one-mode projection: event types weighted by shared
    distinct users (capped per-user fan-out)."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return cohorts.type_projection(ev, max_types_per_user=64)


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: shared distinct text digests
    per unordered source pair (digest-keyed join, text never shuffled).

    The synthetic corpus has no cross-source duplicate texts, so the
    matrix over the raw table is empty and a 0=0 hash match verifies
    nothing (round-5 verdict). The fixture therefore unions in a
    deterministic 'mirror' source — every doc_id % 10 == 0 row
    relabeled — seeding real cross-source duplicates the oracle
    reproduces with the same union."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    docs = _docs(spark, sf_dir)
    mirror = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "source", F.lit("mirror")
    )
    return curation.source_overlap_matrix(docs.unionByName(mirror))


def q_grid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarse embedding cells from JL projection sign patterns —
    2^6 deterministic clusters, decimal-exact assignment."""
    return similarity.embedding_grid_clusters(_embs(spark, sf_dir), bits=6)


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-gated quality filter: keep docs at/above the median
    quality via value-histogram rank selection (no global row sort)."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    return curation.quality_percentile_filter(_docs(spark, sf_dir), num=1, den=2)


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Duffield-Lund-Thorup
    priority sampling): 48-bit-exact uniform / (n_chars+1) priorities,
    global top-k via per-partition heaps — deterministic selected SET,
    oracle-checkable."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.priority_sample(_docs(spark, sf_dir), k=50, seed=7)


def q_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload analytics: per-event-type integer stats of the
    `$.k` property extracted JVM-side with get_json_object."""
    from big_data_graph_analysis_with_spark_spark.operators import jsonops

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return jsonops.props_stats(ev)


def q_props_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the JSON `$.k` property per event type
    (bucket = k DIV 10) — payload shape inspection before thresholding."""
    from big_data_graph_analysis_with_spark_spark.operators import jsonops

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return jsonops.props_histogram(ev)


def q_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite user↔event_type projection: distinct users shared by
    each unordered type pair (per-user fan-out bounded by the type
    vocabulary, never by event count)."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return cohorts.type_affinity(ev)


def q_stratified_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum weighted quota sampling: k smallest priority keys
    per language — fixed per-domain sizes with weight-biased
    within-stratum inclusion."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.stratified_priority_sample(
        _docs(spark, sf_dir), k_per_stratum=20, strata_col="lang", seed=7
    )


def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source type-token ratio in exact ppm — the float-free
    template-spam/boilerplate monitor."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.lexical_diversity(_docs(spark, sf_dir))


def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dup triage report (digest-keyed, texts never
    shuffled)."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    return curation.dup_rate_by_source(_docs(spark, sf_dir))


def q_graph_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sweep diameter lower bound (two undirected frontier-BFS
    sweeps; deterministic tie-broken peak, so the oracle's recursive
    CTE picks the identical second seed)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.diameter_double_sweep(og)


def q_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-half vs second-half value-distribution drift: integer-cent
    equi-width histogram with exact ppm share deltas (Σ/2e6 = total
    variation distance)."""
    from big_data_graph_analysis_with_spark_spark.operators import drift

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return drift.value_drift(ev, n_buckets=20)


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest user_id keys with exact ppm table shares — the
    pre-flight skew check before joins/groupBys on the key."""
    from big_data_graph_analysis_with_spark_spark.operators import drift

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return drift.key_skew_profile(ev, "user_id", k=20)


def q_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's 3 most recent events (latest-N-per-key window,
    event_id-desc tie-break)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.recent_events_per_user(ev, n=3)


def q_type_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Herfindahl concentration of event types in exact ppm
    (cross-multiplied Σ n_t² · 1e6 div n² — no pre-division)."""
    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return cohorts.type_purity(ev)


def q_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source embedding join-coverage audit (docs with / without a
    vec_id = doc_id embedding row)."""
    return similarity.embedding_coverage(
        _docs(spark, sf_dir), _embs(spark, sf_dir)
    )


def q_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-based robust length outliers per language: |n − med| > 2·MAD,
    pure integer test over a broadcast one-row-per-group stats table
    (k=2 — the synthetic lengths are near-uniform, so 3·MAD flags
    nothing; real crawls use 3)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.length_outliers(_docs(spark, sf_dir), k=2)


def q_length_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document empirical length-CDF position in exact ppm
    (value-histogram construction, broadcast back — no row-rank
    window)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.length_cdf(_docs(spark, sf_dir))


def q_time_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day seasonality profile with exact ppm
    shares (pure epoch arithmetic — no calendar functions)."""
    from big_data_graph_analysis_with_spark_spark.operators import drift

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return drift.time_profile(ev)


# ---------------------------------------------------------------------------
# round-6 additions (new operators; every one oracle-backed)
# ---------------------------------------------------------------------------


def q_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge neighborhood Jaccard ppm (tie-strength / bridge-edge
    signal), wedge-join candidates with the degree-64 hub-center cap
    mirrored in the oracle."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.neighbor_jaccard(og, max_center_degree=64)


def q_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 non-adjacent pairs by the resource-allocation index in
    exact ppb integers (1e9 div deg), hub cap mirrored in the oracle."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.resource_allocation_scores(og, k=100, max_center_degree=64)


def q_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct ≤2-hop directed reach per vertex (sampling fan-out /
    coverage estimate), 2-path join — never all-pairs."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.two_hop_reach(og)


def q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component size histogram (giant-component check)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.component_size_histogram(og)


def q_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 character trigrams per language — the Cavnar-Trenkle
    profile table a language identifier trains from."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.char_trigram_profile(_docs(spark, sf_dir), k=10)


def q_token_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length distribution (tokenizer sizing profile)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.token_length_histogram(_docs(spark, sf_dir))


def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc + token mass per quality decile — the profile that sizes a
    percentile quality gate before anyone commits to a threshold."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    return curation.quality_deciles(_docs(spark, sf_dir))


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization digests (lower / strip punctuation /
    collapse whitespace) — the C4/CCNet-style key exact dedup should
    use when casing+punctuation jitter must not split duplicates."""
    return textops.normalize_text(_docs(spark, sf_dir))


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: monthly PROMO-part revenue vs total revenue
    (decimal-exact sums; part is sf-PROPORTIONAL, so the broadcast is
    size-gated — hinted while the projection fits, AQE-decided past
    that)."""
    from big_data_graph_analysis_with_spark_spark.functions.joins import maybe_broadcast

    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    p = _prep(spark).read.parquet(f"{sf_dir}/part.parquet")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    return (
        li.join(
            maybe_broadcast(p.select("p_partkey", "p_type")),
            on=F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("long")
            .alias("ship_month")
        )
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(
                F.lit(0).cast("decimal(28,4)")
            ))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(disc).cast("double").alias("total_revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def q_customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of per-customer order counts,
    zero-order customers included via the left join."""
    c = _prep(spark).read.parquet(f"{sf_dir}/customer.parquet")
    o = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    per_cust = (
        c.select("c_custkey")
        .join(o.select("o_custkey", "o_orderkey"),
              on=F.col("o_custkey") == F.col("c_custkey"), how="left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(
        F.col("c_count").cast("long").alias("n_orders")
    ).agg(F.count("*").cast("long").alias("n_customers"))


def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: orders with any lineitem shipped >60 days after
    the order date, counted per priority (existence semi-join)."""
    o = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    late = o.join(
        li.select("l_orderkey", "l_shipdate"),
        on=(F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        how="left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_late_orders")
    )


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point squared L2 norms (the pre-cosine audit)."""
    return similarity.embedding_norms(_embs(spark, sf_dir))


def q_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 embedding dimensions by exact integer variance numerator
    (dead-dimension / feature-selection audit)."""
    return similarity.dim_variance_stats(_embs(spark, sf_dir), k=8)


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size histogram over the MinHash-LSH pairs —
    the 'one giant boilerplate cluster' detector."""
    pairs = dedup.minhash_lsh_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)
    return dedup.dup_group_size_histogram(pairs)


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase pairs: top-100 part pairs by shared
    order count (within-basket self-join — never all-pairs)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    return olap.copurchase_pairs(li, k=100, min_orders=2)


def q_supplier_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC cut: the minimal set of suppliers covering 80% of
    discounted lineitem revenue (cumulative window over the
    pre-aggregated supplier frame, integer cross-multiplied share
    test — no float division)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(28,4)")
    per_supp = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(rev).cast("decimal(38,4)").alias("revenue")
    )
    cut = olap.pareto_coverage(
        per_supp, "suppkey", "revenue", share_num=4, share_den=5
    )
    return cut.select(
        "suppkey",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("cum_weight").cast("double").alias("cum_revenue"),
    )


def q_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct-supplier variety per (p_brand, p_size)
    from observed lineitems, excluding negative-balance suppliers (the
    broadcast anti-join exclusion shape)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.part_supplier_variety(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/part.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
    )


IDLE_CUTOFF = "2000-01-01"
#: Q18 threshold: ~top-1% of per-order quantity sums in the synthetic
#: data (non-vacuous at sf0.001 AND under the top-k cut at sf0.01)
LARGE_ORDER_MIN_QTY = 200


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: per-nation count and balance of above-average-
    balance customers with no order since IDLE_CUTOFF (broadcast scalar
    threshold + anti join). Recency-idle rather than Q22's never-ordered:
    in this synthetic data every customer has at least one order, so the
    literal Q22 anti-join is vacuously empty at every SF — the cutoff
    keeps the exact same plan shape (scalar threshold broadcast, date-
    filtered anti join) while giving the hash check real rows."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.idle_customers(
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        cutoff=IDLE_CUTOFF,
    )


def q_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: yearly discounted revenue between every
    (supplier nation → customer nation) pair, cross-nation flows only.
    Broadcast supplier/customer/nation dims; the one big shuffle is
    lineitem ⋈ orders on orderkey (co-located when both are
    orderkey-bucketed at scale)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.nation_trade_flow(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through EUROPE's
    suppliers exceeds 1/1000 of the region total. Broadcast region→
    nation→supplier chain prunes the fact scan; the threshold is a
    one-row aggregate of the same grouped frame broadcast back in; the
    share test runs in exact integer cents."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.part_value_concentration(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
        sess.read.parquet(f"{sf_dir}/region.parquet"),
    )


def q_late_line_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per return flag, how many lines shipped >60
    days after their order date in 1997 belong to critical-priority
    orders vs not. Date window pushed into the lineitem scan; one
    orderkey shuffle."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.late_line_priority_census(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
    )


def q_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved >50 units of some
    'small '-prefixed part in 1997 — chained semi-join (part prefix →
    (supp,part) volume HAVING → supplier), no fact-fact join."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.bulk_part_suppliers(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
        sess.read.parquet(f"{sf_dir}/part.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_regional_local_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full TPC-H Q5 shape: 1997 discounted revenue per ASIA nation
    counting only local trades (supplier nation = customer nation).
    Region/nation/customer/supplier broadcast; the one fact-fact
    shuffle is lineitem ⋈ date-pruned orders on orderkey."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.regional_local_revenue(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
        sess.read.parquet(f"{sf_dir}/region.parquet"),
    )


def q_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini-coefficient sufficient statistics over document
    lengths — the corpus length-inequality audit (grouped-lengths rank
    identity, no global per-document sort). The operator assembles the
    statistics in DECIMAL(38,0); the entry casts them to double for the
    hash (both engines cast the same exact integer, so the doubles are
    bit-identical — the repo's standard decimal→double convention)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    g = corpusstats.length_gini_stats(_docs(spark, sf_dir))
    return g.select(
        "n_docs",
        F.col("total_len").cast("double").alias("total_len"),
        F.col("sum_rank_len").cast("double").alias("sum_rank_len"),
        F.col("gini_num").cast("double").alias("gini_num"),
        F.col("gini_den").cast("double").alias("gini_den"),
    )


def q_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-point squared distances between per-label embedding
    centroids (class-separation / IVF-balance audit). dist_num is exact
    DECIMAL(38,0) inside the operator and cast to double here — both
    engines round the same exact integer, so the hash is stable."""
    d = similarity.centroid_distances(_embs(spark, sf_dir))
    return d.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        F.col("dist_num").cast("double").alias("dist_num"),
    )


def q_degree_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-coefficient profile by power-of-two degree bucket
    (bit-length bucket key, integer ppm sums — the C(k)~1/k curve)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.degree_clustering_profile(og)


def q_order_priority_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 full shape: per (priority, quarter) total orders and
    orders with a >60-day-late lineitem (existence flag per order)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.order_priority_funnel(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
    )


def q_supplier_leadtime_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact per-supplier p50/p90/p99 order-to-ship lead time via the
    shared value-histogram rank selection (integer day differences)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.supplier_leadtime_quantiles(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
    )


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: top-100 orders by exact total lineitem
    quantity above the threshold (HAVING before the join back)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.large_orders(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        min_qty=LARGE_ORDER_MIN_QTY,
    )


def q_small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape per brand: lineitems under 1/5 of their part's
    average quantity (integer cross-multiplied predicate, no float
    average)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.small_lot_revenue(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/part.parquet"),
    )


def q_top_inactivity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 longest per-user inter-event gaps (LAG + deterministic
    TakeOrdered top-k) — the session-threshold audit."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.top_inactivity_gaps(
        sess.read.parquet(f"{sf_dir}/events.parquet")
    )


def q_source_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source p50/p90/p99 document length (value-histogram
    rank selection; window over distinct (source, length) only)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.source_length_quantiles(_docs(spark, sf_dir))


def q_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-class census (portable regex classes,
    codegen'd length differences — the mojibake/markup tripwire)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.charclass_profile(_docs(spark, sf_dir))


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club curve: induced-subgraph size/edges/density (exact
    ppm) above power-of-two degree thresholds."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.rich_club_profile(og)


def q_joint_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint degree histogram: per-edge (bit-length lo, hi) bucket
    counts — the assortativity heatmap."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.joint_degree_profile(og)


def q_user_activity_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto cut over per-user event counts: the minimal user set
    covering 90% of events (integer cross-multiplied share)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    counts = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events")
    )
    cut = olap.pareto_coverage(
        counts, "user_id", "n_events", share_num=9, share_den=10
    )
    return cut.select(
        "user_id",
        "n_events",
        F.col("cum_weight").cast("long").alias("cum_events"),
    )


def q_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAU trendline: events and distinct users per integer 7-day
    epoch bucket (no ISO-week cross-engine hazard)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.weekly_active_users(
        _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    )


def q_stopword_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stopword token share (fixed 20-word list, integer
    ppm) — the fluency / language-mix audit."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.stopword_coverage(_docs(spark, sf_dir))


def q_embedding_grid_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cell-size quantiles of the sign-pattern embedding grid —
    the IVF/shard balance audit."""
    return similarity.embedding_grid_occupancy(_embs(spark, sf_dir), bits=6)


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: per-branch revenue of an OR-of-ANDs
    (brand, quantity-range) predicate — pushdown-friendly disjunction."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.disjunctive_revenue(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/part.parquet"),
    )


def q_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape over observed prices: per-part argmin supplier
    (decimal-exact ordering, pair pre-aggregate before the window)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.cheapest_supplier_per_part(
        _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per (customer region, year) the revenue of each
    supplier nation plus the region-year market total — numerator and
    denominator exposed, no float division."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.market_share(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
        sess.read.parquet(f"{sf_dir}/region.parquet"),
    )


def q_supplier_nation_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per supplier nation per ship year, discounted
    revenue and retail-priced cost of goods (no partsupp in this
    corpus; both profit terms exact, consumers subtract)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.supplier_nation_margin(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
        sess.read.parquet(f"{sf_dir}/part.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_top_supplier_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the max-revenue supplier(s) of every calendar
    quarter, ties kept, selection on the exact decimal sum."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.top_supplier_by_quarter(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
    )


def q_monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue frame: per calendar month the exact
    order-revenue total with the previous month's total alongside."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.monthly_revenue_growth(
        _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_customer_acquisition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort acquisition curve: customers whose first order lands in
    each month, with the running acquired total (all-integer)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.customer_acquisition(
        _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_hapax_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical richness: token occurrences, vocabulary size,
    and hapax-legomena count (all-integer)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.hapax_by_source(_docs(spark, sf_dir))


def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sentence-granularity profile: non-empty terminal-
    punctuation segments and their total trimmed length."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.sentence_stats(_docs(spark, sf_dir))


def q_edge_support_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge triangle-support histogram over the original graph
    (support 0 included) — the truss-k planning profile."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.edge_support_histogram(og)


def q_common_neighbor_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint common-neighbor-count distribution over wedge-joined
    vertex pairs, split edge vs non-edge — the link-prediction
    calibration table and 4-cycle census."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.common_neighbor_histogram(og)


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation grid: customers binned by bit-length buckets
    of recency and frequency, exact decimal spend per cell."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.rfm_segments(
        _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_part_catalog_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part catalog at every ROLLUP level — (brand, type), per-brand,
    grand total — with rolled-up levels labeled 'ALL'."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.part_catalog_rollup(
        _prep(spark).read.parquet(f"{sf_dir}/part.parquet")
    )


def q_nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter revenue per customer nation: exact decimal
    totals with the previous quarter alongside."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.nation_revenue_trend(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level vocabulary overlap per source pair: common distinct
    tokens plus both vocabulary sizes (all-integer)."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.vocab_overlap(_docs(spark, sf_dir))


def q_embedding_dot_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-dot-product histogram over hash-grouped embedding
    pairs in exact 0.1-wide decimal bands — the similarity-threshold
    audit."""
    return similarity.embedding_dot_hist(_embs(spark, sf_dir))


def q_global_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row global clustering summary: vertex/edge counts, wedges,
    and closed wedges (3 × triangles) as exact BIGINTs."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.global_transitivity(og)


def q_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 accountability shape on the return flag: the only
    supplier with a returned line in a multi-supplier order."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.sole_returned_supplier(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
    )


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Herfindahl concentration inputs over supplier
    revenue: exact numerator pair, consumers divide."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.supplier_hhi(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_order_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: orders bucketed by exact line count ×
    status with exact discounted revenue per cell."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.order_size_profile(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
    )


def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: histogram of each user's longest run of
    consecutive active days."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    return sessions.activity_streaks(
        _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    )


def q_daily_autocovariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, exact integer lag-1/lag-7 autocovariance inputs
    of the daily count series."""
    from big_data_graph_analysis_with_spark_spark.operators import drift

    return drift.daily_autocovariance(
        _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    )


def q_edge_quality_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row ingest data-quality audit of the raw directed edge
    list: self-loops, directed dupes, reciprocal pairs."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.edge_quality_census(og)


def q_source_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact integer sufficient statistics for the
    char-length ↔ token-count Pearson correlation."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.source_corr_profile(_docs(spark, sf_dir))


def q_order_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle on orders: first-order month ×
    months-since, distinct customers per cell."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.order_cohort_retention(
        _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_supply_bipartite_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite degree histograms of the part–supplier network:
    suppliers per part and parts per supplier."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.supply_bipartite_profile(
        _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    )


def q_pricing_knob_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint discount × tax grid in exact integer cents with line
    counts and exact decimal revenue per cell."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.pricing_knob_grid(
        _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    )


def q_user_event_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-breadth histogram: users by count of distinct event
    types touched."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    return sessions.user_event_type_diversity(
        _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    )


def q_edge_block_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block structure of the derived graph: edges by (src class,
    dst class) over the disjoint nation/supplier/customer id ranges."""
    from big_data_graph_analysis_with_spark_spark.sources.tpch_graph import (
        CUSTOMER_OFFSET,
        SUPPLIER_OFFSET,
    )

    og, _ = _graphs(spark, sf_dir)
    return graphalg.edge_block_census(
        og,
        [
            ("nation", SUPPLIER_OFFSET),
            ("supplier", CUSTOMER_OFFSET),
            ("customer", 1 << 62),
        ],
    )


def q_segment_revenue_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly order volume and exact revenue per customer market
    segment."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.segment_revenue_mix(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
    )


def q_supplier_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of supplier account balance (cents) per
    nation via the shared value-histogram rank selection."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.supplier_balance_deciles(
        sess.read.parquet(f"{sf_dir}/supplier.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority composition per year with exact ppm shares."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.priority_mix_shift(
        _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_leading_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 leading tokens per source — the boilerplate/template
    detector on document openers."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.leading_tokens(_docs(spark, sf_dir))


def q_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, exact integer moment inputs (cents) for the
    value column."""
    from big_data_graph_analysis_with_spark_spark.operators import drift

    return drift.value_moments(
        _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    )


def q_component_density_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Components bucketed by size bit-length with vertex and internal
    undirected edge totals — clique-or-thread density census."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.component_density_profile(og)


def q_fk_integrity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row referential-integrity audit between orders and
    lineitem key sets."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.fk_integrity_census(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
    )


def q_custbal_order_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row exact sufficient statistics for the balance ↔
    order-count correlation over all customers."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.custbal_order_corr(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
    )


def q_brand_price_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand retail-price dispersion inputs in exact integer
    cents."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.brand_price_moments(
        _prep(spark).read.parquet(f"{sf_dir}/part.parquet")
    )


def q_lang_token_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact token-length moment inputs — the
    bytes-per-token predictor."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.lang_token_moments(_docs(spark, sf_dir))


def q_knn_mutuality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN curve per rank over the exact cosine 5-NN slice —
    the hubness tripwire."""
    return similarity.knn_mutuality(_embs(spark, sf_dir), k=5, sample_mod=10)


def q_perturbation_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row original-vs-perturbed diff totals — the golden-YAML
    taxonomy (modified/removed/added) as an auditable frame."""
    og, pg = _graphs(spark, sf_dir)
    return graphalg.perturbation_census(og, pg)


def q_revenue_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines revenue reconciliation census by sign ×
    bit-length of the exact decimal difference."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.revenue_reconciliation(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/lineitem.parquet"),
    )


def q_linenumber_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-sequence density census: max(linenumber) − count per
    order, histogrammed."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.linenumber_holes(
        _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    )


def q_entry_exit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry→exit event-type matrix: each user's first and last event
    type, struct-extreme ordered."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    return sessions.entry_exit_matrix(
        _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    )


def q_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered event-type pairs by (user, day) co-occurrence — the
    behavioral market basket."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    return sessions.type_cooccurrence(
        _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    )


def q_label_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label class balance and exact fixed-point norm range of the
    embedding table."""
    return similarity.label_norm_profile(_embs(spark, sf_dir))


def q_trailing_revenue_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation daily revenue with a trailing-7-day RANGE-frame
    total and next-day LEAD."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.trailing_revenue_range(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_balance_quartile_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-nation NTILE(4) balance quartiles with exact cent
    totals."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.balance_quartile_mix(
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four grouping levels in one native GROUPING SETS pass with
    'ALL' sentinel labels."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.sales_grouping_sets(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
    )


def q_nation_quarter_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation first/second/last active-quarter revenue via
    full-frame window value functions."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.nation_quarter_extremes(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_part_metrics_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part numeric columns unpivoted to long form with exact integer
    stats per metric."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.part_metrics_long(
        _prep(spark).read.parquet(f"{sf_dir}/part.parquet")
    )


def q_nation_segment_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation sorted segment signature — the set-valued rollup
    pattern that hash-compares cross-engine."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.nation_segment_signature(
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_token_class_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source digit/alpha/mixed/other token census on portable
    anchored regexes."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.token_class_mix(_docs(spark, sf_dir))


def q_activity_span_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user activity span (last − first active
    day)."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    return sessions.activity_span_hist(
        _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    )


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


def q_skew_salted_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type above-mean census routed through an explicitly SALTED
    equi-join on the deliberately skewed event_type key — the round-9
    demonstration of functions/skew.salted_join as a registry query
    (output is salt-invariant; the oracle joins unsalted)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.skew_salted_enrich(ev)


def q_graph_degree_quantile_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact median out-degree per derived graph plus a verdict that
    this engine's quantile sketch lands inside the exact [p40, p60]
    rank window — the quantile counterpart of graph_sketch_audit."""
    from big_data_graph_analysis_with_spark_spark.operators import sketches

    og, pg = _graphs(spark, sf_dir)
    return sketches.graph_degree_quantile_audit(og.edges, pg.edges)


def q_simrank_round1_bucketed_wide(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """G5 candidate pruning with the WIDENED bucket key (tie attributes
    + id residue class, bucket_mod=8) — the round-9 mitigation for the
    measured 100×-probe quadratic crossover: each residue class divides
    the per-bucket pair term by the modulus while keeping every
    id-equal true match. Surviving pairs score identically to the
    attr_bucket-only variant (strict row-subset)."""
    og, pg = _graphs(spark, sf_dir)
    return simrank.simrank(
        pg, og, rounds=1, attr_bucket=True, bucket_mod=8
    )


def q_weighted_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag — the
    weighted-quantile operator (histogram rank selection over DISTINCT
    (flag, cents) pairs; exact integer unit ranks)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    return olap.weighted_price_median(li)


def q_segment_priority_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact contingency-table sufficient statistics for the market-
    segment × order-priority independence test (integer cross-multiplied
    χ² numerator; the caller divides scalars)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sp = _prep(spark)
    cust = sp.read.parquet(f"{sf_dir}/customer.parquet")
    orders = sp.read.parquet(f"{sf_dir}/orders.parquet")
    return olap.segment_priority_chisq(cust, orders)


def q_discount_trend_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise OLS sufficient statistics (discount bps on ship epoch
    days, per return flag) — regression as five exact integers."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    return olap.discount_trend_stats(li)


def q_event_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford leading-digit census of positive event-value cents per
    event type — string-exact digit extraction, no float log10."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.event_value_benford(ev)


def q_order_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer consecutive-order gap histogram bucketed by bit
    length of the gap in days (the shared conv/bin convention)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    orders = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    return olap.order_gap_profile(orders)


def q_quantity_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact modal quantity per (returnflag, linestatus), ties to the
    smallest value — argmax over the value histogram."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    return olap.quantity_mode(li)


def q_user_type_map_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type histogram reduced entirely with Spark MAP
    higher-order functions (map_from_entries / map_values / map_filter /
    aggregate); plain-integer output so a map-free oracle hash-matches."""
    from big_data_graph_analysis_with_spark_spark.operators import jsonops

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return jsonops.user_type_map_census(ev)


def q_word_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE islands over the token stream: (lang, run_len, n_runs) census
    of maximal same-word runs — the boilerplate/stuck-generator audit."""
    from big_data_graph_analysis_with_spark_spark.operators import textops

    return textops.word_run_lengths(_docs(spark, sf_dir))


def q_part_name_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein similarity join over distinct catalog names
    (edit distance ≤ 2 within last-token blocks) with part multiplicity
    as census weight."""
    from big_data_graph_analysis_with_spark_spark.operators import dedup

    part = _prep(spark).read.parquet(f"{sf_dir}/part.parquet")
    return dedup.typo_pair_join(part)


def q_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-bridge census per derived graph: edges whose endpoints
    share no common neighbor (span > 2) — the zero-support stratum."""
    og, pg = _graphs(spark, sf_dir)
    return graphalg.local_bridge_census(og, pg)


def q_dyad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holland–Leinhardt dyad census (mutual / asymmetric / null) per
    derived directed graph; null dyads by scalar arithmetic."""
    og, pg = _graphs(spark, sf_dir)
    return graphalg.dyad_census(og, pg)


def q_embedding_sign_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension sign census of the embedding corpus — dead/biased
    dimension detector; IEEE sign tests are exact cross-engine."""
    return similarity.embedding_sign_profile(_embs(spark, sf_dir))


def q_similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: product-quantization ANN (m=4 sub-space codebooks,
    ADC candidate scoring over compressed codes, exact rerank); recall
    vs the exact baseline asserted in tests/test_round10_ops.py."""
    emb = _embs(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_pq_topk(emb, queries_df, k=5)


def q_value_band_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type census against the GLOBAL exact [p25, p75] value band
    (histogram rank selection; 1-row broadcast threshold join)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.value_band_census(ev)


def q_priority_transition_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-order Markov transition counts between a customer's
    consecutive order priorities (event_transitions lifted to orders)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    orders = _prep(spark).read.parquet(f"{sf_dir}/orders.parquet")
    return olap.priority_transition_census(orders)


def q_type_trigram_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order sequence census: consecutive event-type trigrams
    per user stream (two stacked lags, one window exec)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.type_trigram_census(ev)


def q_lang_collision_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson/collision sufficient statistics of the token-frequency
    distribution per language (exact Σ count² in DECIMAL(38,0))."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.lang_collision_stats(_docs(spark, sf_dir))


def q_wedge_closure_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity curve: wedges vs closed wedges per center-degree
    bit-length bucket — no wedge enumeration (degrees + triangle
    census only)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.wedge_closure_by_bucket(og)


def q_directed_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclic vs transitive 2-path closures per derived directed graph
    — feed-forward vs feedback structure."""
    og, pg = _graphs(spark, sf_dir)
    return graphalg.directed_triangle_census(og, pg)


def q_similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: the composed IVF-PQ index (coarse lists prune rows,
    PQ codes compress the probed scan, shared exact rerank budget);
    recall asserted in tests/test_round10_ops.py."""
    emb = _embs(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_ivfpq_topk(emb, queries_df, k=5)


def q_attribute_mixing_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical mixing matrix over the `children` vertex attribute
    (canonical class pairs × edge counts — the homophily census)."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.attribute_mixing_matrix(og)


def q_value_roundness_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-digit (round-number) bias census of positive event
    values — the Benford complement, pure modular arithmetic on cents."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.value_roundness_census(ev)


def q_bowtie_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bowtie decomposition (CORE/IN/OUT/OTHER) around the
    largest SCC of the augmented directed graph — closure-free on the
    Spark side (SCC labels + two whole-core frontier BFS sweeps); the
    oracle classifies against the recursive-CTE reachability closure."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.bowtie_census(og, extra_edges=_scc_extra_edges(og))


def q_ship_delay_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority — the round's
    one fact-fact join (lineitem ⋈ 3-column orders projection)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sp = _prep(spark)
    orders = sp.read.parquet(f"{sf_dir}/orders.parquet")
    li = sp.read.parquet(f"{sf_dir}/lineitem.parquet")
    return olap.ship_delay_histogram(orders, li)


def q_repeat_rate_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase integers per market segment (customers / buyers
    / repeat buyers / orders; all ratios are caller-side scalars)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sp = _prep(spark)
    cust = sp.read.parquet(f"{sf_dir}/customer.parquet")
    orders = sp.read.parquet(f"{sf_dir}/orders.parquet")
    return olap.repeat_rate_by_segment(cust, orders)


def _bowtie_sql() -> str:
    # the scc oracle's closure skeleton (same fedges augmentation),
    # extended with the largest-SCC pick (ties -> smallest scc_id) and
    # reachability classification; fwd/bwd include the core itself, the
    # CASE precedence resolves it
    return f"""
WITH RECURSIVE {GRAPH_CTES},
fedges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM og_edges WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM og_edges
    WHERE dst % 7 = 0 AND src <> dst)
),
reach(s, d) AS (
  SELECT id, id FROM og_vertices
  UNION
  SELECT r.s, e.dst FROM reach r JOIN fedges e ON e.src = r.d
),
scc AS (
  SELECT a.s AS id, MAX(a.d) AS scc_id
  FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
  GROUP BY a.s
),
core_pick AS (
  SELECT scc_id FROM (
    SELECT scc_id, COUNT(*) AS n FROM scc GROUP BY 1
  ) ORDER BY n DESC, scc_id ASC LIMIT 1
),
core AS (
  SELECT id FROM scc WHERE scc_id = (SELECT scc_id FROM core_pick)
),
fwd AS (SELECT DISTINCT r.d AS id FROM reach r JOIN core c ON r.s = c.id),
bwd AS (SELECT DISTINCT r.s AS id FROM reach r JOIN core c ON r.d = c.id),
cls AS (
  SELECT v.id,
         CASE WHEN c.id IS NOT NULL THEN 'CORE'
              WHEN f.id IS NOT NULL THEN 'OUT'
              WHEN b.id IS NOT NULL THEN 'IN'
              ELSE 'OTHER' END AS region
  FROM og_vertices v
  LEFT JOIN core c ON c.id = v.id
  LEFT JOIN fwd f ON f.id = v.id
  LEFT JOIN bwd b ON b.id = v.id
)
SELECT region, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM cls GROUP BY 1
"""


def q_scc_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC size distribution in bit-length buckets — the directed
    counterpart of component_density_profile's bucket view."""
    og, _ = _graphs(spark, sf_dir)
    return graphalg.scc_size_profile(og, extra_edges=_scc_extra_edges(og))


def q_interpolated_median_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_CONT(0.5) decomposed into exact integers (lo/hi
    straddling values + their sum = 2× the interpolated median)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    li = _prep(spark).read.parquet(f"{sf_dir}/lineitem.parquet")
    return olap.interpolated_median_stats(li)


def q_repeat_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-to-purchase latency histogram per user stream (lead
    over the type-filtered subset; bit-length second buckets)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    ev = _prep(spark).read.parquet(f"{sf_dir}/events.parquet")
    return olap.repeat_purchase_latency(ev)


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U sufficient stats (doubled tie-averaged rank sums,
    exact decimals) on order totals: BUILDING vs MACHINERY."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.mann_whitney_u(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
    )


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance (exact cross-multiplied fraction) between
    even- and odd-source document-length distributions."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.ks_two_sample(
        sess.read.parquet(f"{sf_dir}/documents.parquet")
    )


def q_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank-correlation sufficient stats (doubled-rank Σd²)
    between customer balance and order count."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.spearman_rank_corr(
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
    )


def q_spearman_tie_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Σ(t³−t) tie-correction terms per Spearman variable."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.spearman_tie_terms(
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
    )


def q_mood_median_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median-test contingency inputs per customer segment
    against the pooled order-total median."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.mood_median_inputs(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
    )


def q_qq_decile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact present-value decile Q-Q table: BUILDING vs MACHINERY
    order totals, 9 integer rows."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.qq_decile_table(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
    )


def q_size_tie_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-structure census of part sizes per brand (max tie group,
    Σ t(t−1)/2 tied pairs)."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.size_tie_census(
        sess.read.parquet(f"{sf_dir}/part.parquet")
    )


def q_percent_rank_band_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers bucketed by integer-exact percent_rank decile of
    account balance — computed wholly on the distinct-value histogram."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.percent_rank_band_census(
        sess.read.parquet(f"{sf_dir}/supplier.parquet")
    )


def q_revenue_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan of daily revenue, cross-multiplied to
    exact integers; argmax day with deterministic tie-break."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.revenue_cusum(sess.read.parquet(f"{sf_dir}/orders.parquet"))


def q_revenue_acceleration_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sign census of the second difference of daily revenue, by
    month."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.revenue_acceleration_census(
        sess.read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_revenue_monotone_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands census of strictly-increasing daily-revenue
    runs, by month of run start."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.revenue_monotone_runs(
        sess.read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_supplier_cosupply_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the supplier co-supply graph (bipartite
    projection with an explicit per-part fanout cap)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.supplier_cosupply_degree(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet")
    )


def q_hash_sample_estimate_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic 1/16 hash-sample total estimator audited against
    the exact per-type value total."""
    from big_data_graph_analysis_with_spark_spark.operators import sketches

    sess = _prep(spark)
    return sketches.hash_sample_estimate_audit(
        sess.read.parquet(f"{sf_dir}/events.parquet")
    )


def q_kendall_tau_band_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b sufficient stats on the banded (size × price
    decile) contingency table — pair mass via a bounded cell self-join."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.kendall_tau_band_inputs(
        sess.read.parquet(f"{sf_dir}/part.parquet")
    )


def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank sufficient stats on paired per-customer
    annual revenue (1995 → 1996)."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.wilcoxon_signed_rank(
        sess.read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér–von Mises integrated squared CDF deviation (exact
    integers) between purchase and click value distributions."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.cvm_two_sample(
        sess.read.parquet(f"{sf_dir}/events.parquet")
    )


def q_ab_proportion_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test inputs for a deterministic md5-56
    hash-split A/B experiment on the event stream."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.ab_proportion_inputs(
        sess.read.parquet(f"{sf_dir}/events.parquet")
    )


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S statistic + tie term over the calendar-bounded
    daily revenue frame (pairwise join is scale-constant)."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.mann_kendall_trend(
        sess.read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_runs_test_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs-test inputs on daily revenue around the
    pooled daily median."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    sess = _prep(spark)
    return hypotests.runs_test_inputs(
        sess.read.parquet(f"{sf_dir}/orders.parquet")
    )


def q_lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Lorenz curve of customer revenue concentration (partial
    tie groups split exactly; zero-revenue customers included)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.lorenz_curve_points(
        sess.read.parquet(f"{sf_dir}/orders.parquet"),
        sess.read.parquet(f"{sf_dir}/customer.parquet"),
    )


def q_tukey_fence_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey 1.5·IQR outlier census per return flag (integer-scaled
    fences, histogram re-aggregation — no second fact scan)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    sess = _prep(spark)
    return olap.tukey_fence_census(
        sess.read.parquet(f"{sf_dir}/lineitem.parquet")
    )


# ---------------------------------------------------------------------------
# round-12 registration: the nine candidate waves accumulated during the
# r9-r11 registry freeze (tests/test_candidate_oracles.py) promoted to
# first-class registry entries. Each wrapper mirrors its candidate test's
# construction exactly; the oracle SQL strings below are the pinned DuckDB
# twins, verbatim.
# ---------------------------------------------------------------------------


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _prep(spark).read.parquet(f"{sf_dir}/{name}.parquet")


def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point inputs over daily revenue: rank-based U_t
    via the doubled-rank histogram discipline (no per-row windows)."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.pettitt_changepoint(_tbl(spark, sf_dir, "orders"))


def q_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall S statistic per month-of-year over daily
    revenue (day count is SF-invariant, so the in-season pair join is
    bounded)."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.seasonal_mann_kendall(_tbl(spark, sf_dir, "orders"))


def q_trimmed_sum_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed revenue sum per returnflag from the value histogram
    (two rank selections + one histogram re-aggregation)."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.trimmed_sum_census(_tbl(spark, sf_dir, "lineitem"))


def q_measure_crossproducts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer moment/cross-product matrix (covariance inputs)
    per returnflag — one scan, decimal-exact."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.measure_crossproducts(_tbl(spark, sf_dir, "lineitem"))


def q_l_diversity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity histogram of the sensitive balance band over
    (nation, segment) quasi-identifier groups — k_anonymity's
    sensitive-attribute companion."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    cust = _tbl(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.round(F.col("c_acctbal") / 1000).cast("long")).alias("bal_band"),
    )
    return curation.l_diversity_census(
        cust, ["c_nationkey", "c_mktsegment"], "bal_band"
    )


def q_zipf_rank_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency curve at 11 decile ranks of the vocabulary —
    frequency-histogram rank selection, never a global per-token sort."""
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    return corpusstats.zipf_rank_freq_points(_tbl(spark, sf_dir, "documents"))


def _ivm_orders_split(spark: SparkSession, sf_dir: str):
    orders = _tbl(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    old = orders.filter(F.year("o_orderdate") < 1998)
    new = orders.filter(F.year("o_orderdate") >= 1998)
    return old, new, cents


def q_ivm_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM end-to-end: per-customer count/sum state from the pre-1998
    slice, maintained through a 1998+ CDC insert batch; oracle is the
    plain recompute over ALL orders."""
    from big_data_graph_analysis_with_spark_spark.operators import merge

    old, new, cents = _ivm_orders_split(spark, sf_dir)
    state = old.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(cents).cast("long").alias("sum_cents"),
    )
    cdc = new.select(
        F.lit("I").alias("op"),
        F.col("o_custkey").alias("key"),
        F.lit(None).cast("long").alias("old_cents"),
        cents.alias("new_cents"),
    )
    return merge.maintain_group_aggregate(state, cdc)


def q_ivm_distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM distinct-count view (auxiliary per-(key,value) multiset)
    maintained through the 1998+ insert batch."""
    from big_data_graph_analysis_with_spark_spark.operators import merge

    old, new, _ = _ivm_orders_split(spark, sf_dir)
    aux = old.groupBy(
        F.col("o_custkey").alias("key"),
        F.col("o_orderpriority").alias("v"),
    ).agg(F.count("*").cast("long").alias("m"))
    cdc = new.select(
        F.lit("I").alias("op"),
        F.col("o_custkey").alias("key"),
        F.lit(None).cast("string").alias("old_v"),
        F.col("o_orderpriority").alias("new_v"),
    )
    return merge.maintain_distinct_count(aux, cdc)[1]


def q_ivm_histogram_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM median via maintained value histogram + rank selection —
    quantiles stay incrementally maintainable when the state is the
    histogram, not the sorted list."""
    from big_data_graph_analysis_with_spark_spark.operators import merge

    old, new, cents = _ivm_orders_split(spark, sf_dir)
    hist = old.groupBy(
        F.col("o_orderpriority").alias("key"), cents.alias("cents")
    ).agg(F.count("*").cast("long").alias("w"))
    cdc = new.select(
        F.lit("I").alias("op"),
        F.col("o_orderpriority").alias("key"),
        F.lit(None).cast("long").alias("old_cents"),
        cents.alias("new_cents"),
    )
    maintained = merge.maintain_value_histogram(hist, cdc)
    return merge.quantile_from_histogram(maintained, 5)


def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-resample Poisson(1) bootstrap of the revenue sum — seeded
    md5-56 weights, single scan × B, no resampled row materialization."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.poisson_bootstrap_sums(
        _tbl(spark, sf_dir, "events"), n_resamples=8
    )


def q_block_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular block bootstrap of daily revenue (block length 30) from
    the daily prefix-sum index — each block is two prefix lookups."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.block_bootstrap_daily_sums(
        _tbl(spark, sf_dir, "orders"), n_resamples=8, block_len=30
    )


def q_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed stats of the JSON props '$.k' variant field per event
    type (presence, sum, min/max, distinct)."""
    from big_data_graph_analysis_with_spark_spark.operators import jsonops

    return jsonops.props_variant_stats(_tbl(spark, sf_dir, "events"))


def q_km_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier risk table for first-purchase conversion: per
    duration day, number at risk / events / censored."""
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    return sessions.km_risk_table(_tbl(spark, sf_dir, "events"))


def q_mcnemar_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired-proportion contingency cells: per-customer 1995
    vs 1996 activity flags."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.mcnemar_inputs(_tbl(spark, sf_dir, "orders"))


def q_daily_count_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation inputs of the daily order count (day
    spine is SF-invariant; the lag join is spine-sized)."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.daily_count_autocorr(_tbl(spark, sf_dir, "orders"))


def q_friedman_rank_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test rank sums: blocks = order months, treatments =
    market segments, doubled-rank histogram per block."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.friedman_rank_inputs(
        _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer")
    )


def q_filter_agreement_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 agreement census between two document-quality filters
    (length gate vs chars-per-token gate)."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    return curation.filter_agreement_census(_tbl(spark, sf_dir, "documents"))


def q_jonckheere_trend_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative inputs over priority
    groups: per ordered group pair, doubled Mann-Whitney U from the
    pooled distinct-value grid (never a value-band join)."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.jonckheere_trend_inputs(_tbl(spark, sf_dir, "orders"))


def q_ngram_novelty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty deciles of non-reference documents against the
    reference-quarter shingle set (doc_id % 4 == 0 holdout)."""
    from big_data_graph_analysis_with_spark_spark.operators import curation

    return curation.ngram_novelty_profile(_tbl(spark, sf_dir, "documents"))


def q_kruskal_wallis_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis inputs over the 5 priority groups: pooled-rank
    sums (doubled) + pooled tie term, all from value histograms."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.kruskal_wallis_inputs(_tbl(spark, sf_dir, "orders"))


def q_mood_scale_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood scale-test inputs (BUILDING vs MACHINERY): squared centered
    doubled ranks per group from the pooled histogram."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.mood_scale_inputs(
        _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer")
    )


def q_cochran_q_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q inputs: per-user binary flags for 3 funnel event
    types, row/column sum-of-squares."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.cochran_q_inputs(_tbl(spark, sf_dir, "events"))


def q_token_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of a 1M-token budget across
    languages by character mass — exact-integer (div/mod), allocations
    provably sum to the budget."""
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    return sampling.token_mix_allocation(_tbl(spark, sf_dir, "documents"))


def q_kcore_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_nodes, n_edges) of the 3-core after 8 peel rounds — the
    fixed-round census twin of the converging `kcore` (G12); iterates
    persist DISK_ONLY with eager unpersist per the r10/r11 scale rules."""
    from big_data_graph_analysis_with_spark_spark.operators import graphalg

    og, _ = _graphs(spark, sf_dir)
    return graphalg.kcore_census(og, k=3, rounds=8)


def q_degree_assortativity_inputs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact integer moments for the degree-assortativity coefficient
    over the undirected simple graph (one degree join per edge side)."""
    from big_data_graph_analysis_with_spark_spark.operators import graphalg

    og, _ = _graphs(spark, sf_dir)
    return graphalg.degree_assortativity_inputs(og)


def q_rich_club_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club census on log2 degree tiers: nodes and edges wholly
    inside each ≥-degree tier (suffix-cumulative histograms)."""
    from big_data_graph_analysis_with_spark_spark.operators import graphalg

    og, _ = _graphs(spark, sf_dir)
    return graphalg.rich_club_census(og)


def q_brunner_munzel_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brunner-Munzel placement sums (BUILDING vs MACHINERY) from the
    shared value histogram — doubled placements and their squares."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.brunner_munzel_inputs(
        _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer")
    )


def q_count_min_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch audit: exact vs CMS estimate for the 8 heaviest
    users — cells are order-independent sums over the shared seeded
    md5-56 hash, so both engines build the identical sketch."""
    from big_data_graph_analysis_with_spark_spark.operators import sketches

    return sketches.count_min_audit(_tbl(spark, sf_dir, "events"))


def q_ks_one_sample_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer one-sample KS statistic vs the discrete uniform on
    the observed span — both one-sided deviations scored per distinct
    value (the r10-advice D⁻ fix is regression-pinned)."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.ks_one_sample_uniform(_tbl(spark, sf_dir, "events"))


def q_page_trend_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L ordered-alternative inputs: per-priority doubled
    Friedman rank sums and their L-statistic terms."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.page_trend_inputs(_tbl(spark, sf_dir, "orders"))


def q_dominance_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order stochastic dominance census between two segments'
    revenue CDFs — cross-multiplied integer CDF comparison per distinct
    value, no floats."""
    from big_data_graph_analysis_with_spark_spark.operators import hypotests

    return hypotests.dominance_census(
        _tbl(spark, sf_dir, "orders"), _tbl(spark, sf_dir, "customer")
    )


def q_bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter audit: membership probes for the 8 heaviest users
    (no-false-negative guarantee) + 8 provably-outside ids (measured
    false-positive census); bit_or bitmap is order-independent so every
    column hash-matches the twin."""
    from big_data_graph_analysis_with_spark_spark.operators import sketches

    return sketches.bloom_filter_audit(_tbl(spark, sf_dir, "events"))


def q_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (k=8, w=4): the MOSS-style
    partial-overlap detector whole-document shingling misses. Honest
    scan-linear floor (every character is hashed) — gram fan-out routed
    through spread_before_explode, pair buckets capped by max_fp_df."""
    from big_data_graph_analysis_with_spark_spark.operators import dedup

    return dedup.winnow_overlap_pairs(_tbl(spark, sf_dir, "documents"))


def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(year, priority) revenue grouping sets in one Expand pass —
    shuffle carries ≤ (years+1)·(priorities+1) cells."""
    from big_data_graph_analysis_with_spark_spark.operators import olap

    return olap.revenue_cube(_tbl(spark, sf_dir, "orders"))


def q_source_copy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: winnowing-overlap pair stream
    rolled up to ordered source pairs (how much of source B is
    textually derivative of source A before mixing both into a
    training set)."""
    from big_data_graph_analysis_with_spark_spark.operators import dedup

    return dedup.source_copy_matrix(_tbl(spark, sf_dir, "documents"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_start_node_stats(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering note: the external driver verifies the FIRST 50 insertion-
    # ordered entries against the DuckDB oracles each round; local parity
    # (tests/test_oracle_parity.py) always covers ALL entries.
    #
    # Rotation policy since round 8 (lint-enforced by
    # tests/test_registry_lint.py; entries verified in the LATEST committed
    # round are exempt from the sortedness check — they are the just-landed
    # window and rotate here at the start of the next round):
    # the oracle-backed registry is sorted by staleness — never-driver-
    # verified queries first (newest batch at the head as it ships), then
    # ascending last-driver-verified round, computed from the committed
    # CORRECTNESS_r*.json history. The 50-slot window therefore always
    # holds every never-verified query plus the stalest re-verification
    # backfill; the 11 rows-only tail entries cannot hash-verify by design
    # and stay at the tail.
    return {
        # -- ROUND-12 REGISTRATION (r11 verdict task 1): the nine
        #    candidate waves accumulated during the r9-r11 freeze enter
        #    the registry. 35 never-driver-verified entries head the
        #    window; the remaining 15 slots are the full r5 evidence
        #    tail (r11 verdict task 2), so after this round lands the
        #    oracle-backed staleness floor is r6. Sorted ascending by
        #    last-driver-verified round from CORRECTNESS_r*.json.
        # -- never driver-verified (round-12 registration) ----------
        "pettitt_changepoint": q_pettitt_changepoint,
        "seasonal_mann_kendall": q_seasonal_mann_kendall,
        "trimmed_sum_census": q_trimmed_sum_census,
        "measure_crossproducts": q_measure_crossproducts,
        "l_diversity_census": q_l_diversity_census,
        "zipf_rank_freq": q_zipf_rank_freq,
        "ivm_orders_rollup": q_ivm_orders_rollup,
        "ivm_distinct_priorities": q_ivm_distinct_priorities,
        "ivm_histogram_median": q_ivm_histogram_median,
        "poisson_bootstrap": q_poisson_bootstrap,
        "block_bootstrap": q_block_bootstrap,
        "props_variant_stats": q_props_variant_stats,
        "km_risk_table": q_km_risk_table,
        "mcnemar_inputs": q_mcnemar_inputs,
        "daily_count_autocorr": q_daily_count_autocorr,
        "friedman_rank_inputs": q_friedman_rank_inputs,
        "filter_agreement_census": q_filter_agreement_census,
        "jonckheere_trend_inputs": q_jonckheere_trend_inputs,
        "ngram_novelty_profile": q_ngram_novelty_profile,
        "kruskal_wallis_inputs": q_kruskal_wallis_inputs,
        "mood_scale_inputs": q_mood_scale_inputs,
        "cochran_q_inputs": q_cochran_q_inputs,
        "token_mix_allocation": q_token_mix_allocation,
        "kcore_census": q_kcore_census,
        "degree_assortativity_inputs": q_degree_assortativity_inputs,
        "rich_club_census": q_rich_club_census,
        "brunner_munzel_inputs": q_brunner_munzel_inputs,
        "count_min_audit": q_count_min_audit,
        "ks_one_sample_uniform": q_ks_one_sample_uniform,
        "page_trend_inputs": q_page_trend_inputs,
        "dominance_census": q_dominance_census,
        "bloom_filter_audit": q_bloom_filter_audit,
        "winnow_overlap_pairs": q_winnow_overlap_pairs,
        "revenue_cube": q_revenue_cube,
        "source_copy_matrix": q_source_copy_matrix,
        # -- last driver-verified round 5 ---------------------------
        "dedup_prefix_containment": q_prefix_containment,
        "length_matched_resample": q_length_matched_resample,
        "rp_project": q_rp_project,
        "priority_sample": q_priority_sample,
        "props_stats": q_props_stats,
        "props_histogram": q_props_histogram,
        "type_affinity": q_type_affinity,
        "stratified_priority_sample": q_stratified_priority_sample,
        "lexical_diversity": q_lexical_diversity,
        "dup_rate_by_source": q_dup_rate_by_source,
        "graph_diameter": q_graph_diameter,
        "value_drift": q_value_drift,
        "key_skew_profile": q_key_skew_profile,
        "recent_events": q_recent_events,
        "type_purity": q_type_purity,
        # -- last driver-verified round 6 ---------------------------
        "embedding_coverage": q_embedding_coverage,
        "length_outliers": q_length_outliers,
        "length_cdf": q_length_cdf,
        "time_profile": q_time_profile,
        "ego_batch": q_ego_batch,
        "neighbor_jaccard": q_neighbor_jaccard,
        "resource_allocation": q_resource_allocation,
        "two_hop_reach": q_two_hop_reach,
        "component_sizes": q_component_sizes,
        "char_trigrams": q_char_trigrams,
        "token_length_hist": q_token_length_hist,
        "quality_deciles": q_quality_deciles,
        "text_normalize": q_text_normalize,
        "promo_revenue_share": q_promo_revenue_share,
        "customer_order_histogram": q_customer_order_histogram,
        "late_shipment_priority": q_late_shipment_priority,
        "embedding_norms": q_embedding_norms,
        "dim_variance": q_dim_variance,
        "dedup_cluster_sizes": q_dedup_cluster_sizes,
        "copurchase_pairs": q_copurchase_pairs,
        "start_nodes": q_start_nodes,
        "start_node_stats": q_start_node_stats,
        "degrees": q_degrees,
        "valuable_nodes": q_valuable_nodes,
        "graph_sizes": q_graph_sizes,
        "parent_map": q_parent_map,
        "induced_subgraph_edges": q_induced_subgraph_edges,
        "subgraph_init": q_subgraph_init,
        "simrank_init": q_simrank_init,
        "simrank_round1": q_simrank_round1,
        "simrank_round1_bucketed": q_simrank_round1_bucketed,
        "simrank_round2": q_simrank_round2,
        "simrank_fixpoint": q_simrank_fixpoint,
        "best_match": q_best_match,
        "match_classes": q_match_classes,
        "valuable_matches": q_valuable_matches,
        "uncovered_valuable": q_uncovered_valuable,
        "triangle_counts": q_triangle_counts,
        "connected_components": q_connected_components,
        "pagerank": q_pagerank,
        "bfs_distances": q_bfs_distances,
        "kcore": q_kcore,
        "sssp": q_sssp,
        "pagerank_personalized": q_pagerank_personalized,
        # -- last driver-verified round 7 ---------------------------
        "ktruss": q_ktruss,
        "source_overlap": q_source_overlap,
        "supplier_pareto": q_supplier_pareto,
        "part_supplier_variety": q_part_supplier_variety,
        "idle_customers": q_idle_customers,
        "nation_trade_flow": q_nation_trade_flow,
        "length_gini": q_length_gini,
        "centroid_distances": q_centroid_distances,
        "degree_clustering": q_degree_clustering,
        "order_priority_funnel": q_order_priority_funnel,
        "supplier_leadtime_quantiles": q_supplier_leadtime_quantiles,
        "large_orders": q_large_orders,
        "small_lot_revenue": q_small_lot_revenue,
        "top_inactivity_gaps": q_top_inactivity_gaps,
        "source_length_quantiles": q_source_length_quantiles,
        "charclass_profile": q_charclass_profile,
        "rich_club": q_rich_club,
        "joint_degree_profile": q_joint_degree_profile,
        "user_activity_pareto": q_user_activity_pareto,
        "weekly_active_users": q_weekly_active_users,
        "stopword_coverage": q_stopword_coverage,
        "embedding_grid_occupancy": q_embedding_grid_occupancy,
        "disjunctive_revenue": q_disjunctive_revenue,
        "cheapest_supplier": q_cheapest_supplier,
        "market_share": q_market_share,
        "supplier_nation_margin": q_supplier_nation_margin,
        "top_supplier_quarter": q_top_supplier_quarter,
        "monthly_revenue_growth": q_monthly_revenue_growth,
        "customer_acquisition": q_customer_acquisition,
        "hapax_by_source": q_hapax_by_source,
        "sentence_stats": q_sentence_stats,
        "edge_support_hist": q_edge_support_hist,
        "common_neighbor_hist": q_common_neighbor_hist,
        "rfm_segments": q_rfm_segments,
        "part_catalog_rollup": q_part_catalog_rollup,
        "nation_revenue_trend": q_nation_revenue_trend,
        "vocab_overlap": q_vocab_overlap,
        "embedding_dot_hist": q_embedding_dot_hist,
        "global_transitivity": q_global_transitivity,
        "sole_returned_supplier": q_sole_returned_supplier,
        "supplier_hhi": q_supplier_hhi,
        "order_size_profile": q_order_size_profile,
        "activity_streaks": q_activity_streaks,
        "daily_autocovariance": q_daily_autocovariance,
        "edge_quality_census": q_edge_quality_census,
        "source_corr_profile": q_source_corr_profile,
        "order_cohort_retention": q_order_cohort_retention,
        "supply_bipartite_profile": q_supply_bipartite_profile,
        "pricing_knob_grid": q_pricing_knob_grid,
        "user_event_type_diversity": q_user_event_type_diversity,
        # -- last driver-verified round 8 ---------------------------
        "part_value_concentration": q_part_value_concentration,
        "late_line_census": q_late_line_census,
        "bulk_part_suppliers": q_bulk_part_suppliers,
        "regional_local_revenue": q_regional_local_revenue,
        "greedy_walk_classes": q_greedy_walk_classes,
        "graph_sketch_audit": q_graph_sketch_audit,
        "revenue_ewma": q_revenue_ewma,
        "daily_gap_fill": q_daily_gap_fill,
        "value_locf": q_value_locf,
        "user_set_ops": q_user_set_ops,
        "segment_bitmask": q_segment_bitmask,
        "embedding_clip_census": q_embedding_clip_census,
        "balance_outlier_census": q_balance_outlier_census,
        "edge_block_census": q_edge_block_census,
        "segment_revenue_mix": q_segment_revenue_mix,
        "supplier_balance_deciles": q_supplier_balance_deciles,
        "priority_mix_shift": q_priority_mix_shift,
        "leading_tokens": q_leading_tokens,
        "value_moments": q_value_moments,
        "component_density_profile": q_component_density_profile,
        "fk_integrity_census": q_fk_integrity_census,
        "custbal_order_corr": q_custbal_order_corr,
        "brand_price_moments": q_brand_price_moments,
        "lang_token_moments": q_lang_token_moments,
        "knn_mutuality": q_knn_mutuality,
        "perturbation_census": q_perturbation_census,
        "revenue_reconciliation": q_revenue_reconciliation,
        "linenumber_holes": q_linenumber_holes,
        "entry_exit_matrix": q_entry_exit_matrix,
        "type_cooccurrence": q_type_cooccurrence,
        "label_norm_profile": q_label_norm_profile,
        "trailing_revenue_range": q_trailing_revenue_range,
        "balance_quartile_mix": q_balance_quartile_mix,
        "sales_grouping_sets": q_sales_grouping_sets,
        "nation_quarter_extremes": q_nation_quarter_extremes,
        "part_metrics_long": q_part_metrics_long,
        "nation_segment_signature": q_nation_segment_signature,
        "token_class_mix": q_token_class_mix,
        "activity_span_hist": q_activity_span_hist,
        "neighbor_sample": q_neighbor_sample,
        "tfidf_top_terms": q_tfidf_top_terms,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_groups": q_dedup_groups,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "similarity_topk": q_similarity_topk,
        "similarity_ann_lsh_exact": q_similarity_ann_lsh_exact,
        "corpus_clean": q_corpus_clean,
        # -- last driver-verified round 9 ---------------------------
        "ab_proportion_inputs": q_ab_proportion_inputs,
        "mann_kendall_trend": q_mann_kendall_trend,
        "runs_test_inputs": q_runs_test_inputs,
        "lorenz_curve_points": q_lorenz_curve_points,
        "tukey_fence_census": q_tukey_fence_census,
        "mood_median_inputs": q_mood_median_inputs,
        "qq_decile_table": q_qq_decile_table,
        "size_tie_census": q_size_tie_census,
        "percent_rank_band_census": q_percent_rank_band_census,
        "revenue_acceleration_census": q_revenue_acceleration_census,
        "revenue_monotone_runs": q_revenue_monotone_runs,
        "supplier_cosupply_degree": q_supplier_cosupply_degree,
        "hash_sample_estimate_audit": q_hash_sample_estimate_audit,
        "scc_size_profile": q_scc_size_profile,
        "interpolated_median_stats": q_interpolated_median_stats,
        "repeat_purchase_latency": q_repeat_purchase_latency,
        "bowtie_census": q_bowtie_census,
        "ship_delay_histogram": q_ship_delay_histogram,
        "repeat_rate_by_segment": q_repeat_rate_by_segment,
        "attribute_mixing_matrix": q_attribute_mixing_matrix,
        "value_roundness_census": q_value_roundness_census,
        "value_band_census": q_value_band_census,
        "priority_transition_census": q_priority_transition_census,
        "type_trigram_census": q_type_trigram_census,
        "lang_collision_stats": q_lang_collision_stats,
        "wedge_closure_by_bucket": q_wedge_closure_by_bucket,
        "directed_triangle_census": q_directed_triangle_census,
        "segment_priority_chisq": q_segment_priority_chisq,
        "discount_trend_stats": q_discount_trend_stats,
        "event_value_benford": q_event_value_benford,
        "order_gap_profile": q_order_gap_profile,
        "quantity_mode": q_quantity_mode,
        "user_type_map_census": q_user_type_map_census,
        "word_run_lengths": q_word_run_lengths,
        "part_name_typo_pairs": q_part_name_typo_pairs,
        "local_bridges": q_local_bridges,
        "dyad_census": q_dyad_census,
        "embedding_sign_profile": q_embedding_sign_profile,
        "skew_salted_enrich": q_skew_salted_enrich,
        "graph_degree_quantile_audit": q_graph_degree_quantile_audit,
        "weighted_price_median": q_weighted_price_median,
        "simrank_round1_bucketed_wide": q_simrank_round1_bucketed_wide,
        # -- last driver-verified round 10 ---------------------------
        "kendall_tau_band_inputs": q_kendall_tau_band_inputs,
        "wilcoxon_signed_rank": q_wilcoxon_signed_rank,
        "cvm_two_sample": q_cvm_two_sample,
        "mann_whitney_u": q_mann_whitney_u,
        "ks_two_sample": q_ks_two_sample,
        "spearman_rank_corr": q_spearman_rank_corr,
        "spearman_tie_terms": q_spearman_tie_terms,
        "revenue_cusum": q_revenue_cusum,
        "corpus_prepare": q_corpus_prepare,
        "doc_expectations": q_doc_expectations,
        "decontaminate": q_decontaminate,
        "repetition_stats": q_repetition_stats,
        "pii_redaction": q_pii_redaction,
        "doc_chunks": q_doc_chunks,
        "pack_documents": q_pack_documents,
        "events_sessionized": q_events_sessionized,
        "sample_hash": q_sample_hash,
        "sample_stratified": q_sample_stratified,
        "train_eval_split": q_train_eval_split,
        "mixture_sample": q_mixture_sample,
        "corpus_shards": q_corpus_shards,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_language_id": q_text_language_id,
        "doc_fingerprints": q_doc_fingerprints,
        "events_windowed": q_events_windowed,
        "events_asof": q_events_asof,
        "events_sliding": q_events_sliding,
        "events_rolling": q_events_rolling,
        "events_pivot": q_events_pivot,
        "event_transitions": q_event_transitions,
        "top_ngrams": q_top_ngrams,
        "token_quantiles": q_token_quantiles,
        "embedding_centroids": q_embedding_centroids,
        "embedding_quantize": q_embedding_quantize,
        "events_cube": q_events_cube,
        "events_range_join": q_events_range_join,
        "salted_supplier_revenue": q_salted_supplier_revenue,
        "shipping_priority": q_shipping_priority,
        "local_supplier_volume": q_local_supplier_volume,
        "orders_upsert": q_orders_upsert,
        "pricing_summary": q_pricing_summary,
        "top_customers_per_nation": q_top_customers_per_nation,
        "events_rollup": q_events_rollup,
        "dedup_keep_best": q_dedup_keep_best,
        "dedup_incremental": q_dedup_incremental,
        "events_funnel": q_events_funnel,
        "length_buckets": q_length_buckets,
        "clustering_coefficient": q_clustering_coefficient,
        "label_propagation": q_label_propagation,
        # -- last driver-verified round 11 ---------------------------
        "link_prediction": q_link_prediction,
        "degree_histogram": q_degree_histogram,
        "events_retention": q_events_retention,
        "events_topk_window": q_events_topk_window,
        "events_anomaly_days": q_events_anomaly_days,
        "vocab_coverage": q_vocab_coverage,
        "winsorize_lengths": q_winsorize_lengths,
        "term_cooccurrence": q_term_cooccurrence,
        "temporal_split": q_temporal_split,
        "hits": q_hits,
        "reciprocity": q_reciprocity,
        "assortativity": q_assortativity,
        "orders_scd2": q_orders_scd2,
        "session_quantiles": q_session_quantiles,
        "language_mix": q_language_mix,
        "user_ltv": q_user_ltv,
        "knn_graph": q_knn_graph,
        "scc": q_scc,
        "mis": q_mis,
        "closeness": q_closeness,
        "path_counts": q_path_counts,
        "pagerank_weighted": q_pagerank_weighted,
        "hub_attack": q_hub_attack,
        "motif_counts": q_motif_counts,
        "bloom_pruned_join": q_bloom_pruned_join,
        "ngram_novelty": q_ngram_novelty,
        "bpe_merges": q_bpe_merges,
        "orders_point_in_time": q_orders_point_in_time,
        "condensation": q_condensation,
        "neighborhood_features": q_neighborhood_features,
        "churned_users": q_churned_users,
        "attributed_purchases": q_attributed_purchases,
        "vocab_growth": q_vocab_growth,
        "knn_label_prop": q_knn_label_prop,
        "user_sequences": q_user_sequences,
        "forecast_revenue": q_forecast_revenue,
        "returned_items": q_returned_items,
        "snapshot_diff": q_snapshot_diff,
        "k_anonymity": q_k_anonymity,
        "type_projection": q_type_projection,
        "grid_clusters": q_grid_clusters,
        "quality_filter": q_quality_filter,
        "active_users": q_active_users,
        "interarrival_quantiles": q_interarrival_quantiles,
        "token_mad": q_token_mad,
        "events_zorder": q_events_zorder,
        "embedding_covariance": q_embedding_covariance,
        "sketch_audit_distinct": q_sketch_audit_distinct,
        "sketch_audit_quantile": q_sketch_audit_quantile,
        "dedup_sorted_neighborhood": q_dedup_sorted_neighborhood,
        # -- rows-only tail (no SQL oracle by design; driver rows-only
        #    check). Keep LAST: the 50-slot window must hold only
        #    hash-verifiable queries.
        "multimodal_features": q_multimodal_features,
        "multimodal_summary": q_multimodal_summary,
        "walk_kernel": q_walk_kernel,
        "mitm_pipeline": q_mitm_pipeline,
        "similarity_ann_lsh": q_similarity_ann_lsh,
        "similarity_ann_ivf": q_similarity_ann_ivf,
        "node2vec_walks": q_node2vec_walks,
        "betweenness": q_betweenness,
        "multimodal_real_codecs": q_multimodal_real_codecs,
        "similarity_ann_pq": q_similarity_ann_pq,
        "similarity_ann_ivfpq": q_similarity_ann_ivfpq,
    }


# -- round-12 registration oracle helpers (graph CTEs + seeded-hash SQL
#    built programmatically, mirroring tests/test_candidate_oracles.py) ----

#: shared undirected-degree CTE preamble for the graph-census twins
_DEG_CTES = """
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM og_edges WHERE src <> dst
),
deg AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT a AS id FROM und UNION ALL SELECT b FROM und
  ) GROUP BY id
),
annotated AS (
  SELECT u.a, u.b, x.deg AS da, y.deg AS db
  FROM und u JOIN deg x ON x.id = u.a JOIN deg y ON y.id = u.b
)"""


def _kcore_census_sql(k: int = 3, rounds: int = 8) -> str:
    ctes = """
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM og_edges WHERE src <> dst
),
e_0 AS MATERIALIZED (SELECT a, b FROM und)"""
    for r in range(1, rounds + 1):
        ctes += f""",
deg_{r} AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT a AS id FROM e_{r - 1}
    UNION ALL SELECT b FROM e_{r - 1}
  ) GROUP BY id
),
keep_{r} AS (SELECT id FROM deg_{r} WHERE deg >= {k}),
e_{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e_{r - 1} e
  JOIN keep_{r} ka ON ka.id = e.a
  JOIN keep_{r} kb ON kb.id = e.b
)"""
    return graph_sql(f""", {ctes.strip()}
SELECT CAST((SELECT COUNT(*) FROM
              (SELECT a AS id FROM e_{rounds}
               UNION SELECT b FROM e_{rounds})) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e_{rounds}) AS BIGINT) AS n_edges
""")


def _poisson_bootstrap_sql(n_resamples: int = 8) -> str:
    from big_data_graph_analysis_with_spark_spark.operators.sampling import (
        poisson1_thresholds_56,
    )

    ts = poisson1_thresholds_56()
    case = "CASE " + " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(ts)
    ) + f" ELSE {len(ts)} END"
    return f"""
        WITH t AS (
          SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                 b.b,
                 (('0x' || substr(md5(
                    CAST(b.b AS VARCHAR) || ':' ||
                    CAST(event_id AS VARCHAR)), 1, 14))::BIGINT) AS u
          FROM events, (SELECT UNNEST(range(0, {n_resamples})) AS b) b
          WHERE value IS NOT NULL AND event_id IS NOT NULL
        ),
        w AS (SELECT b, cents, {case} AS w FROM t)
        SELECT CAST(b AS BIGINT) AS b,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(w) AS BIGINT) AS n_eff,
               CAST(SUM(w * cents) AS BIGINT) AS boot_cents
        FROM w GROUP BY 1
    """


#: seeded md5-56 bucket hash shared by the sketch-audit twins
_CMS_H = (
    "(('0x' || substr(md5(CAST((CAST(r AS VARCHAR) || ':' || "
    "CAST(user_id AS VARCHAR)) AS VARCHAR)), 1, 14))::BIGINT) % 256"
)
_BLOOM_H = (
    "(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || "
    "CAST({x} AS VARCHAR)), 1, 14))::BIGINT) % 512"
)

#: winnowing fingerprint pipeline (k=8, w=4, df-cap 64) shared by the
#: winnow_overlap_pairs and source_copy_matrix twins
_WINNOW_KFPS_CTES = """
            pos AS (
              SELECT doc_id, text,
                     GREATEST(length(text) - 7, 1) AS n_grams,
                     UNNEST(generate_series(1,
                       GREATEST(length(text) - 7, 1))) AS i
              FROM d
            ),
            grams AS (
              SELECT doc_id, i, n_grams,
                     ('0x' || substr(md5(substr(text, CAST(i AS INT), 8)),
                       1, 14))::BIGINT AS h
              FROM pos
            ),
            wins AS (
              SELECT doc_id, i, n_grams,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
              FROM grams
            ),
            fps AS (
              SELECT DISTINCT doc_id, wmin AS fp
              FROM wins WHERE i <= GREATEST(n_grams - 3, 1)
            ),
            keep AS (
              SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 64
            ),
            kfps AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp))"""


def oracle_sql() -> dict[str, str]:
    return {
        # -- batch 7: second wave of the shift/rank-statistic suite ------
        "kendall_tau_band_inputs": """
            WITH h AS (
              SELECT CAST(ROUND(p_retailprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM part GROUP BY 1
            ),
            r AS (
              SELECT cents,
                     COALESCE(SUM(cnt) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + 1 AS rnk,
                     SUM(cnt) OVER () AS n
              FROM h
            ),
            bands AS (
              SELECT cents,
                     LEAST(9, ((rnk - 1) * 10) // GREATEST(n - 1, 1))
                       AS band
              FROM r
            ),
            cells AS (
              SELECT p_size AS size, band, COUNT(*) AS m
              FROM part JOIN bands
                ON CAST(ROUND(p_retailprice * 100) AS BIGINT) = cents
              GROUP BY 1, 2
            ),
            conc AS (
              SELECT SUM(CAST(a.m AS HUGEINT) * b.m) AS v
              FROM cells a JOIN cells b
                ON b.size > a.size AND b.band > a.band
            ),
            disc AS (
              SELECT SUM(CAST(a.m AS HUGEINT) * b.m) AS v
              FROM cells a JOIN cells b
                ON b.size > a.size AND b.band < a.band
            ),
            tr AS (
              SELECT SUM(CAST(t * (t - 1) // 2 AS HUGEINT)) AS v
              FROM (SELECT size, SUM(m) AS t FROM cells GROUP BY 1)
            ),
            tc AS (
              SELECT SUM(CAST(t * (t - 1) // 2 AS HUGEINT)) AS v
              FROM (SELECT band, SUM(m) AS t FROM cells GROUP BY 1)
            ),
            tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n FROM cells)
            SELECT tot.n AS n,
                   -- BIGINT (not DECIMAL(38,0)): DuckDB surfaces wide
                   -- decimals as float64 and the driver hash sees
                   -- "17764676.0" vs Spark's "17764676" (r9 verdict
                   -- task 1, the 2f0a72b recipe). Values fit BIGINT at
                   -- every test SF; the Spark side keeps DECIMAL(38,0).
                   CAST(COALESCE(conc.v, 0) AS BIGINT) AS c_pairs,
                   CAST(COALESCE(disc.v, 0) AS BIGINT) AS d_pairs,
                   CAST(tr.v AS BIGINT) AS tie_row,
                   CAST(tc.v AS BIGINT) AS tie_col
            FROM tot, conc, disc, tr, tc
        """,
        "wilcoxon_signed_rank": """
            WITH ra AS (
              SELECT o_custkey,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS rev_a
              FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1
            ),
            rb AS (
              SELECT o_custkey,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS rev_b
              FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
            ),
            d AS (
              SELECT rb.rev_b - ra.rev_a AS d
              FROM ra JOIN rb USING (o_custkey)
            ),
            nz AS (
              SELECT ABS(d) AS ad, d > 0 AS pos FROM d WHERE d <> 0
            ),
            h AS (SELECT ad, COUNT(*) AS cnt FROM nz GROUP BY 1),
            r AS (
              SELECT ad,
                     2 * COALESCE(SUM(cnt) OVER (
                       ORDER BY ad
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2
              FROM h
            ),
            j AS (SELECT nz.pos, r.r2 FROM nz JOIN r USING (ad)),
            z AS (SELECT COUNT(*) AS n_zero FROM d WHERE d = 0),
            -- aggregate j SEPARATELY and cross join the one-row result
            -- with z (mirrors the Spark plan's agg.crossJoin(zero)):
            -- `FROM j, z` would yield n_zero=NULL when j is empty
            -- (every paired diff zero), diverging from the operator
            -- (r9 ADVICE). BIGINT, not DECIMAL(38,0), in the final
            -- columns: driver-hash dtype drift (r9 verdict task 1).
            ja AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                     CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_pos,
                     CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_neg,
                     CAST(SUM(CASE WHEN pos THEN CAST(r2 AS HUGEINT)
                              ELSE 0 END) AS BIGINT) AS w2_pos,
                     CAST(SUM(CASE WHEN NOT pos THEN CAST(r2 AS HUGEINT)
                              ELSE 0 END) AS BIGINT) AS w2_neg
              FROM j
            )
            SELECT ja.n_pairs, ja.n_pos, ja.n_neg,
                   CAST(z.n_zero AS BIGINT) AS n_zero,
                   ja.w2_pos, ja.w2_neg
            FROM ja, z
        """,
        "cvm_two_sample": """
            WITH h AS (
              SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                     SUM(CASE WHEN event_type = 'purchase' THEN 1
                         ELSE 0 END) AS cnt_a,
                     SUM(CASE WHEN event_type = 'click' THEN 1
                         ELSE 0 END) AS cnt_b
              FROM events WHERE event_type IN ('purchase', 'click')
              GROUP BY 1
            ),
            c AS (
              SELECT cnt_a, cnt_b,
                     SUM(cnt_a) OVER (ORDER BY cents) AS cum_a,
                     SUM(cnt_b) OVER (ORDER BY cents) AS cum_b,
                     SUM(cnt_a) OVER () AS n_a,
                     SUM(cnt_b) OVER () AS n_b
              FROM h
            )
            SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
                   CAST(MAX(n_b) AS BIGINT) AS n_b,
                   CAST(SUM(
                     (CAST(cum_a AS HUGEINT) * n_b
                      - CAST(cum_b AS HUGEINT) * n_a)
                     * (CAST(cum_a AS HUGEINT) * n_b
                        - CAST(cum_b AS HUGEINT) * n_a)
                     * (cnt_a + cnt_b)
                   ) AS BIGINT) AS sum_sq_dev
            FROM c
        """,
        "ab_proportion_inputs": """
            SELECT CAST((('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                         1, 14))::BIGINT) % 2 AS BIGINT)
                     AS arm,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END) AS BIGINT) AS n_purchases
            FROM events GROUP BY 1
        """,
        "mann_kendall_trend": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS cents
              FROM orders GROUP BY 1
            ),
            s AS (
              SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                   WHEN b.cents < a.cents THEN -1
                                   ELSE 0 END) AS BIGINT) AS s_stat
              FROM daily a JOIN daily b ON b.day > a.day
            ),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
            t AS (
              SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                       AS tie_term
              FROM (SELECT cents, COUNT(*) AS t FROM daily GROUP BY 1)
            )
            SELECT n.n_days, s.s_stat, t.tie_term FROM n, s, t
        """,
        "runs_test_inputs": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS cents
              FROM orders GROUP BY 1
            ),
            h AS (SELECT cents, COUNT(*) AS cnt FROM daily GROUP BY 1),
            c AS (
              SELECT cents, cnt,
                     SUM(cnt) OVER (ORDER BY cents) AS cum,
                     SUM(cnt) OVER () AS n
              FROM h
            ),
            med AS (
              SELECT cents AS med FROM c
              WHERE cum - cnt <= (n - 1) // 2 AND (n - 1) // 2 < cum
              LIMIT 1
            ),
            sgn AS (
              SELECT day, cents > med AS above
              FROM daily, med WHERE cents <> med
            ),
            f AS (
              SELECT above,
                     CASE WHEN LAG(above) OVER (ORDER BY day) IS NULL
                            OR above <> LAG(above) OVER (ORDER BY day)
                          THEN 1 ELSE 0 END AS flip
              FROM sgn
            )
            SELECT CAST(COALESCE(SUM(CASE WHEN above THEN 1 ELSE 0 END),
                                 0) AS BIGINT) AS n_above,
                   CAST(COALESCE(SUM(CASE WHEN NOT above THEN 1 ELSE 0
                                     END), 0) AS BIGINT) AS n_below,
                   CAST(COALESCE(SUM(flip), 0) AS BIGINT) AS n_runs
            FROM f
        """,
        "lorenz_curve_points": """
            WITH rev AS (
              SELECT COALESCE(o.cents, 0) AS cents
              FROM customer LEFT JOIN (
                SELECT o_custkey,
                       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                         AS cents
                FROM orders GROUP BY 1
              ) o ON c_custkey = o_custkey
            ),
            h AS (SELECT cents, COUNT(*) AS cnt FROM rev GROUP BY 1),
            c AS (
              SELECT cents, cnt,
                     SUM(cnt) OVER (ORDER BY cents) AS cum,
                     COALESCE(SUM(cnt * cents) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS cents_before,
                     SUM(cnt) OVER () AS n,
                     SUM(cnt * cents) OVER () AS total
              FROM h
            ),
            p AS (
              SELECT c.*, q.decile, (n * q.decile) // 10 AS k
              FROM c, (SELECT UNNEST(range(1, 11)) AS decile) q
            ),
            picks AS (
              SELECT * FROM p WHERE cum - cnt < k AND k <= cum
            )
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(k AS BIGINT) AS k_customers,
                   CAST(cents_before + (k - (cum - cnt)) * cents
                        AS BIGINT) AS cum_cents,
                   CAST(total AS BIGINT) AS total_cents
            FROM picks
        """,
        "tukey_fence_census": """
            WITH h AS (
              SELECT l_returnflag AS returnflag,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       AS cents,
                     COUNT(*) AS cnt
              FROM lineitem GROUP BY 1, 2
            ),
            c AS (
              SELECT returnflag, cents, cnt,
                     SUM(cnt) OVER (
                       PARTITION BY returnflag ORDER BY cents
                     ) AS cum,
                     SUM(cnt) OVER (PARTITION BY returnflag) AS n
              FROM h
            ),
            q AS (
              SELECT returnflag, MAX(n) AS n,
                     MAX(CASE WHEN cum - cnt <= (n - 1) // 4
                               AND (n - 1) // 4 < cum
                              THEN cents END) AS q1_cents,
                     MAX(CASE WHEN cum - cnt <= (3 * (n - 1)) // 4
                               AND (3 * (n - 1)) // 4 < cum
                              THEN cents END) AS q3_cents
              FROM c
              WHERE (cum - cnt <= (n - 1) // 4 AND (n - 1) // 4 < cum)
                 OR (cum - cnt <= (3 * (n - 1)) // 4
                     AND (3 * (n - 1)) // 4 < cum)
              GROUP BY 1
            )
            SELECT h.returnflag,
                   CAST(MAX(q.n) AS BIGINT) AS n,
                   CAST(MAX(q.q1_cents) AS BIGINT) AS q1_cents,
                   CAST(MAX(q.q3_cents) AS BIGINT) AS q3_cents,
                   CAST(SUM(CASE WHEN 4 * h.cents
                                      < 10 * q.q1_cents - 6 * q.q3_cents
                                 THEN h.cnt ELSE 0 END) AS BIGINT)
                     AS n_low,
                   CAST(SUM(CASE WHEN 4 * h.cents
                                      > 10 * q.q3_cents - 6 * q.q1_cents
                                 THEN h.cnt ELSE 0 END) AS BIGINT)
                     AS n_high
            FROM h JOIN q USING (returnflag) GROUP BY 1
        """,
        # -- batch 6: distribution-shift / rank-statistic suite ----------
        "mann_whitney_u": """
            WITH t AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     c_mktsegment = 'BUILDING' AS is_a
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            ),
            h AS (
              SELECT cents,
                     SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS cnt_a,
                     SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS cnt_b,
                     COUNT(*) AS cnt
              FROM t GROUP BY 1
            ),
            r AS (
              SELECT cnt_a, cnt_b, cnt,
                     COALESCE(SUM(cnt) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS cum_before
              FROM h
            ),
            a AS (
              SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
                     CAST(SUM(cnt_b) AS BIGINT) AS n_b,
                     SUM(CAST(cnt_a AS HUGEINT)
                         * (2 * cum_before + cnt + 1)) AS r2h
              FROM r
            )
            SELECT n_a, n_b,
                   CAST(r2h AS BIGINT) AS r2_a,
                   CAST(r2h - CAST(n_a AS HUGEINT) * (n_a + 1)
                        AS BIGINT) AS u2_a,
                   CAST(2 * CAST(n_a AS HUGEINT) * n_b - r2h
                        + CAST(n_a AS HUGEINT) * (n_a + 1)
                        AS BIGINT) AS u2_b
            FROM a
        """,
        "ks_two_sample": """
            WITH t AS (
              -- TRY_CAST mirrors Spark's cast-to-long semantics: a
              -- source with no digits yields NULL is_a, and the CASE
              -- sums count it in neither sample on BOTH engines (a
              -- plain CAST('' AS BIGINT) errors in DuckDB; r9 ADVICE)
              SELECT n_chars,
                     TRY_CAST(regexp_extract(source, '(\\d+)', 1)
                              AS BIGINT) % 2 = 0 AS is_a
              FROM documents
            ),
            h AS (
              SELECT n_chars,
                     SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS cnt_a,
                     SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS cnt_b
              FROM t GROUP BY 1
            ),
            c AS (
              SELECT n_chars,
                     SUM(cnt_a) OVER (ORDER BY n_chars) AS cum_a,
                     SUM(cnt_b) OVER (ORDER BY n_chars) AS cum_b,
                     SUM(cnt_a) OVER () AS n_a,
                     SUM(cnt_b) OVER () AS n_b
              FROM h
            ),
            d AS (
              SELECT n_chars, n_a, n_b,
                     ABS(CAST(cum_a AS HUGEINT) * n_b
                         - CAST(cum_b AS HUGEINT) * n_a) AS d
              FROM c
            ),
            m AS (SELECT MAX(d) AS d_num FROM d)
            SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
                   CAST(MAX(n_b) AS BIGINT) AS n_b,
                   CAST(MAX(m.d_num) AS BIGINT) AS d_num,
                   CAST(MIN(n_chars) AS BIGINT) AS at_chars
            FROM d JOIN m ON d.d = m.d_num
        """,
        "spearman_rank_corr": """
            WITH pc AS (
              SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x,
                     COALESCE(o.y, 0) AS y
              FROM customer LEFT JOIN (
                SELECT o_custkey, COUNT(*) AS y FROM orders GROUP BY 1
              ) o ON c_custkey = o_custkey
            ),
            hx AS (SELECT x, COUNT(*) AS cnt FROM pc GROUP BY 1),
            rx AS (
              SELECT x,
                     2 * COALESCE(SUM(cnt) OVER (
                       ORDER BY x
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2_x
              FROM hx
            ),
            hy AS (SELECT y, COUNT(*) AS cnt FROM pc GROUP BY 1),
            ry AS (
              SELECT y,
                     2 * COALESCE(SUM(cnt) OVER (
                       ORDER BY y
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2_y
              FROM hy
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(r2_x - r2_y AS HUGEINT)
                            * (r2_x - r2_y)) AS BIGINT) AS sum_d2
            FROM pc JOIN rx USING (x) JOIN ry USING (y)
        """,
        "spearman_tie_terms": """
            WITH pc AS (
              SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS x,
                     COALESCE(o.y, 0) AS y
              FROM customer LEFT JOIN (
                SELECT o_custkey, COUNT(*) AS y FROM orders GROUP BY 1
              ) o ON c_custkey = o_custkey
            )
            SELECT 'x' AS var,
                   CAST(SUM(CAST(t AS HUGEINT) * t * t - t)
                        AS BIGINT) AS tie_sum
            FROM (SELECT x, COUNT(*) AS t FROM pc GROUP BY 1)
            UNION ALL
            SELECT 'y' AS var,
                   CAST(SUM(CAST(t AS HUGEINT) * t * t - t)
                        AS BIGINT) AS tie_sum
            FROM (SELECT y, COUNT(*) AS t FROM pc GROUP BY 1)
        """,
        "mood_median_inputs": """
            WITH c0 AS (
              SELECT o_custkey,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            ),
            h AS (SELECT cents, COUNT(*) AS cnt FROM c0 GROUP BY 1),
            c AS (
              SELECT cents, cnt,
                     SUM(cnt) OVER (ORDER BY cents) AS cum,
                     SUM(cnt) OVER () AS n
              FROM h
            ),
            med AS (
              SELECT cents AS median_cents FROM c
              WHERE cum - cnt <= (n - 1) // 2 AND (n - 1) // 2 < cum
              LIMIT 1
            )
            SELECT c_mktsegment AS segment,
                   CAST(SUM(CASE WHEN cents < median_cents THEN 1 ELSE 0
                            END) AS BIGINT) AS n_below,
                   CAST(SUM(CASE WHEN cents = median_cents THEN 1 ELSE 0
                            END) AS BIGINT) AS n_equal,
                   CAST(SUM(CASE WHEN cents > median_cents THEN 1 ELSE 0
                            END) AS BIGINT) AS n_above,
                   CAST(MAX(median_cents) AS BIGINT) AS median_cents
            FROM c0 JOIN customer ON o_custkey = c_custkey, med
            GROUP BY 1
        """,
        "qq_decile_table": """
            WITH h AS (
              SELECT c_mktsegment AS seg,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
              GROUP BY 1, 2
            ),
            c AS (
              SELECT seg, cents, cnt,
                     SUM(cnt) OVER (
                       PARTITION BY seg ORDER BY cents
                     ) AS cum,
                     SUM(cnt) OVER (PARTITION BY seg) AS n
              FROM h
            ),
            p AS (
              SELECT c.*, q.decile,
                     ((n - 1) * q.decile) // 10 AS want
              FROM c, (SELECT UNNEST(range(1, 10)) AS decile) q
            ),
            picks AS (
              SELECT * FROM p WHERE cum - cnt <= want AND want < cum
            )
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(MAX(CASE WHEN seg = 'BUILDING' THEN cents END)
                        AS BIGINT) AS a_cents,
                   CAST(MAX(CASE WHEN seg = 'MACHINERY' THEN cents END)
                        AS BIGINT) AS b_cents,
                   CAST(MAX(CASE WHEN seg = 'BUILDING' THEN cents END)
                        - MAX(CASE WHEN seg = 'MACHINERY' THEN cents END)
                        AS BIGINT) AS diff_cents
            FROM picks GROUP BY 1
        """,
        "size_tie_census": """
            SELECT p_brand AS brand,
                   CAST(SUM(t) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_sizes,
                   CAST(MAX(t) AS BIGINT) AS max_tie,
                   CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS tie_pairs
            FROM (
              SELECT p_brand, p_size, COUNT(*) AS t
              FROM part GROUP BY 1, 2
            ) GROUP BY 1
        """,
        "percent_rank_band_census": """
            WITH h AS (
              SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM supplier GROUP BY 1
            ),
            r AS (
              SELECT cents, cnt,
                     COALESCE(SUM(cnt) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + 1 AS rnk,
                     SUM(cnt) OVER () AS n
              FROM h
            ),
            b AS (
              SELECT cents, cnt,
                     LEAST(9, ((rnk - 1) * 10) // GREATEST(n - 1, 1))
                       AS band
              FROM r
            )
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(SUM(cnt) AS BIGINT) AS n_suppliers,
                   CAST(MIN(cents) AS BIGINT) AS min_cents,
                   CAST(MAX(cents) AS BIGINT) AS max_cents
            FROM b GROUP BY 1
        """,
        "revenue_cusum": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS cents
              FROM orders GROUP BY 1
            ),
            c AS (
              SELECT day,
                     ROW_NUMBER() OVER (ORDER BY day) AS k,
                     SUM(cents) OVER (ORDER BY day) AS cum,
                     COUNT(*) OVER () AS n,
                     SUM(cents) OVER () AS total
              FROM daily
            ),
            d AS (
              SELECT day, n, total,
                     ABS(CAST(n AS HUGEINT) * cum
                         - CAST(k AS HUGEINT) * total) AS s_abs
              FROM c
            ),
            m AS (SELECT MAX(s_abs) AS mx FROM d)
            SELECT CAST(MAX(n) AS BIGINT) AS n_days,
                   CAST(MAX(total) AS BIGINT) AS total_cents,
                   CAST(MAX(m.mx) AS BIGINT) AS max_abs_cusum,
                   CAST(MIN(day) AS BIGINT) AS at_day
            FROM d JOIN m ON d.s_abs = m.mx
        """,
        "revenue_acceleration_census": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS cents
              FROM orders GROUP BY 1
            ),
            a AS (
              SELECT day, cents - LAG(cents) OVER (ORDER BY day) AS d1
              FROM daily
            ),
            b AS (
              SELECT day, d1 - LAG(d1) OVER (ORDER BY day) AS d2 FROM a
            )
            SELECT CAST(year(DATE '1970-01-01' + CAST(day AS INTEGER))
                        * 100
                        + month(DATE '1970-01-01' + CAST(day AS INTEGER))
                        AS BIGINT) AS month,
                   CAST(SUM(CASE WHEN d2 > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_up,
                   CAST(SUM(CASE WHEN d2 < 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_down,
                   CAST(SUM(CASE WHEN d2 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_flat
            FROM b WHERE d2 IS NOT NULL GROUP BY 1
        """,
        "revenue_monotone_runs": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                       AS cents
              FROM orders GROUP BY 1
            ),
            f AS (
              SELECT day,
                     ROW_NUMBER() OVER (ORDER BY day) AS rn,
                     CASE WHEN cents > LAG(cents) OVER (ORDER BY day)
                          THEN 1 ELSE 0 END AS up
              FROM daily
            ),
            g AS (
              SELECT day, up,
                     rn - SUM(up) OVER (
                       ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS rid
              FROM f
            ),
            runs AS (
              SELECT rid, COUNT(*) AS run_len, MIN(day) AS start_day
              FROM g WHERE up = 1 GROUP BY 1
            )
            SELECT CAST(year(DATE '1970-01-01'
                             + CAST(start_day AS INTEGER)) * 100
                        + month(DATE '1970-01-01'
                                + CAST(start_day AS INTEGER))
                        AS BIGINT) AS month,
                   CAST(COUNT(*) AS BIGINT) AS n_runs,
                   CAST(MAX(run_len) AS BIGINT) AS max_run,
                   CAST(SUM(run_len) AS BIGINT) AS up_days
            FROM runs GROUP BY 1
        """,
        "supplier_cosupply_degree": """
            WITH ps AS (
              SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
              FROM lineitem
            ),
            keepers AS (
              SELECT pk FROM ps GROUP BY 1 HAVING COUNT(*) <= 64
            ),
            k AS (SELECT ps.pk, ps.sk FROM ps JOIN keepers USING (pk)),
            deg AS (
              SELECT a.sk, COUNT(DISTINCT b.sk) AS degree
              FROM k a JOIN k b ON a.pk = b.pk AND a.sk <> b.sk
              GROUP BY 1
            )
            SELECT CAST(degree AS BIGINT) AS degree,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers
            FROM deg GROUP BY 1
        """,
        "hash_sample_estimate_audit": """
            WITH t AS (
              SELECT event_type,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents,
                     (('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                      1, 14))::BIGINT) % 16 = 0
                       AS insample
              FROM events
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN insample THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sample,
                   CAST(SUM(cents) AS BIGINT) AS exact_cents,
                   CAST(SUM(CASE WHEN insample THEN cents ELSE 0 END)
                        * 16 AS BIGINT) AS est_cents,
                   CAST(SUM(CASE WHEN insample THEN cents ELSE 0 END)
                        * 16 - SUM(cents) AS BIGINT) AS err_cents
            FROM t GROUP BY 1
        """,
        # -- round-10 additions -----------------------------------------
        "scc_size_profile": f"""
WITH RECURSIVE {GRAPH_CTES},
fedges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM og_edges WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM og_edges
    WHERE dst % 7 = 0 AND src <> dst)
),
reach(s, d) AS (
  SELECT id, id FROM og_vertices
  UNION
  SELECT r.s, e.dst FROM reach r JOIN fedges e ON e.src = r.d
),
scc AS (
  SELECT a.s AS id, MAX(a.d) AS scc_id
  FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s
  GROUP BY a.s
),
sizes AS (SELECT scc_id, COUNT(*) AS size FROM scc GROUP BY 1)
SELECT CAST(length(bin(size)) AS BIGINT) AS size_bits,
       CAST(COUNT(*) AS BIGINT) AS n_sccs,
       CAST(SUM(size) AS BIGINT) AS n_vertices
FROM sizes GROUP BY 1
""",
        "interpolated_median_stats": """
            WITH h AS (
              SELECT l_returnflag AS returnflag,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS w
              FROM lineitem GROUP BY 1, 2
            ),
            c AS (
              SELECT returnflag, cents, w,
                     SUM(w) OVER (
                       PARTITION BY returnflag ORDER BY cents
                     ) AS cum,
                     SUM(w) OVER (PARTITION BY returnflag) AS n
              FROM h
            ),
            picks AS (
              SELECT returnflag, cents, w, cum, n,
                     (cum - w <= (n - 1) // 2 AND (n - 1) // 2 < cum)
                       AS covers_lo,
                     (cum - w <= n // 2 AND n // 2 < cum) AS covers_hi
              FROM c
            )
            SELECT returnflag,
                   CAST(MAX(n) AS BIGINT) AS n,
                   CAST(MAX(CASE WHEN covers_lo THEN cents END) AS BIGINT)
                     AS lo_cents,
                   CAST(MAX(CASE WHEN covers_hi THEN cents END) AS BIGINT)
                     AS hi_cents,
                   CAST(MAX(CASE WHEN covers_lo THEN cents END)
                        + MAX(CASE WHEN covers_hi THEN cents END) AS BIGINT)
                     AS median_x2_cents
            FROM picks WHERE covers_lo OR covers_hi
            GROUP BY returnflag
        """,
        "repeat_purchase_latency": """
            WITH p AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus
              FROM events WHERE event_type = 'purchase'
            ),
            g AS (
              SELECT (LEAD(tus) OVER (
                        PARTITION BY user_id ORDER BY tus, event_id
                      ) - tus) // 1000000 AS gap_s
              FROM p
            )
            SELECT CAST(length(bin(gap_s)) AS BIGINT) AS gap_bits,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
                   CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
            FROM g WHERE gap_s IS NOT NULL
            GROUP BY 1
        """,
        "bowtie_census": _bowtie_sql(),
        "ship_delay_histogram": """
            SELECT o.o_orderpriority AS priority,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) AS BIGINT)
                     AS delay_days,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        """,
        "repeat_rate_by_segment": """
            WITH pc AS (
              SELECT o_custkey, COUNT(*) AS n_ord FROM orders GROUP BY 1
            )
            SELECT c.c_mktsegment AS segment,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(COUNT(pc.n_ord) AS BIGINT) AS n_buyers,
                   CAST(SUM(CASE WHEN COALESCE(pc.n_ord, 0) > 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
                   CAST(SUM(COALESCE(pc.n_ord, 0)) AS BIGINT) AS n_orders
            FROM customer c LEFT JOIN pc ON pc.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "attribute_mixing_matrix": graph_sql(
            """
            , und AS (
              SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM og_edges WHERE src <> dst
            ),
            lab AS (SELECT id, children AS _lab FROM og_vertices),
            pairs AS (
              SELECT la._lab AS xa, lb._lab AS xb
              FROM und e
              JOIN lab la ON la.id = e.a
              JOIN lab lb ON lb.id = e.b
            )
            SELECT LEAST(xa, xb) AS attr_a,
                   GREATEST(xa, xb) AS attr_b,
                   CAST(COUNT(*) AS BIGINT) AS n_edges
            FROM pairs GROUP BY 1, 2
        """
        ),
        "value_roundness_census": """
            WITH ev AS (
              SELECT event_type,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents
              FROM events
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_pos,
                   CAST(SUM(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_whole,
                   CAST(SUM(CASE WHEN cents % 1000 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tens,
                   CAST(SUM(CASE WHEN cents % 100 = 50 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_half
            FROM ev WHERE cents > 0
            GROUP BY event_type
        """,
        "value_band_census": """
            WITH ev AS (
              SELECT event_type,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents
              FROM events
            ),
            h AS (SELECT cents, COUNT(*) AS hc FROM ev GROUP BY 1),
            c AS (
              SELECT cents, hc,
                     SUM(hc) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS cum,
                     SUM(hc) OVER () AS n
              FROM h
            ),
            band AS (
              SELECT MAX(CASE WHEN cum - hc <= (n - 1) * 1 // 4
                               AND (n - 1) * 1 // 4 < cum
                              THEN cents END) AS lo,
                     MAX(CASE WHEN cum - hc <= (n - 1) * 3 // 4
                               AND (n - 1) * 3 // 4 < cum
                              THEN cents END) AS hi
              FROM c
            )
            SELECT event_type,
                   CAST(SUM(CASE WHEN cents < lo THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_below,
                   CAST(SUM(CASE WHEN cents >= lo AND cents <= hi
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
                   CAST(SUM(CASE WHEN cents > hi THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_above
            FROM ev, band GROUP BY event_type
        """,
        "priority_transition_census": """
            WITH o AS (
              SELECT o_custkey, o_orderkey, o_orderpriority,
                     date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS day
              FROM orders
            ),
            l AS (
              SELECT o_orderpriority AS to_priority,
                     LAG(o_orderpriority) OVER (
                       PARTITION BY o_custkey ORDER BY day, o_orderkey
                     ) AS from_priority
              FROM o
            )
            SELECT from_priority, to_priority,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM l WHERE from_priority IS NOT NULL
            GROUP BY 1, 2
        """,
        "type_trigram_census": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
              FROM events
            ),
            l AS (
              SELECT event_type AS t3,
                     LAG(event_type, 1) OVER win AS t2,
                     LAG(event_type, 2) OVER win AS t1
              FROM e
              WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id)
            )
            SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
            FROM l WHERE t1 IS NOT NULL
            GROUP BY 1, 2, 3
        """,
        "lang_collision_stats": """
            WITH t AS (
              SELECT lang, unnest(string_split(text, ' ')) AS tok
              FROM documents
            ),
            g AS (
              SELECT lang, tok, COUNT(*) AS cnt FROM t GROUP BY 1, 2
            )
            SELECT lang,
                   CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS BIGINT)
                     AS sum_sq,
                   CAST(MAX(cnt) AS BIGINT) AS max_count
            FROM g GROUP BY 1
        """,
        "wedge_closure_by_bucket": graph_sql(
            """
            , und AS (
              SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM og_edges WHERE src <> dst
            ),
            sym AS (SELECT a, b FROM und
                    UNION ALL SELECT b AS a, a AS b FROM und),
            deg AS (SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY 1),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1
              JOIN und e2 ON e2.a = e1.b
              JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            mem AS (
              SELECT x AS id FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri
            ),
            tcnt AS (SELECT id, COUNT(*) AS tri FROM mem GROUP BY 1)
            SELECT CAST(length(bin(deg)) AS BIGINT) AS degree_bits,
                   CAST(COUNT(*) AS BIGINT) AS n_vertices,
                   CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
                   CAST(SUM(COALESCE(tri, 0)) AS BIGINT) AS n_closed
            FROM deg LEFT JOIN tcnt USING (id)
            GROUP BY 1
        """
        ),
        "directed_triangle_census": graph_sql(
            """
            , e_og AS (
              SELECT DISTINCT src, dst FROM og_edges WHERE src <> dst
            ),
            e_pg AS (
              SELECT DISTINCT src, dst FROM pg_edges WHERE src <> dst
            ),
            p_og AS (
              SELECT a.src AS u, a.dst AS v, b.dst AS w
              FROM e_og a JOIN e_og b ON b.src = a.dst
              WHERE a.src <> b.dst
            ),
            p_pg AS (
              SELECT a.src AS u, a.dst AS v, b.dst AS w
              FROM e_pg a JOIN e_pg b ON b.src = a.dst
              WHERE a.src <> b.dst
            ),
            cyc_og AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p_og p
              WHERE EXISTS (SELECT 1 FROM e_og e
                            WHERE e.src = p.w AND e.dst = p.u)
            ),
            tra_og AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p_og p
              WHERE EXISTS (SELECT 1 FROM e_og e
                            WHERE e.src = p.u AND e.dst = p.w)
            ),
            cyc_pg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p_pg p
              WHERE EXISTS (SELECT 1 FROM e_pg e
                            WHERE e.src = p.w AND e.dst = p.u)
            ),
            tra_pg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p_pg p
              WHERE EXISTS (SELECT 1 FROM e_pg e
                            WHERE e.src = p.u AND e.dst = p.w)
            )
            SELECT 'og' AS graph,
                   (SELECT n FROM cyc_og) AS n_cyclic_paths,
                   (SELECT n FROM tra_og) AS n_transitive_paths,
                   CAST((SELECT n FROM cyc_og) // 3 AS BIGINT) AS n_cyclic
            UNION ALL
            SELECT 'pg' AS graph,
                   (SELECT n FROM cyc_pg) AS n_cyclic_paths,
                   (SELECT n FROM tra_pg) AS n_transitive_paths,
                   CAST((SELECT n FROM cyc_pg) // 3 AS BIGINT) AS n_cyclic
        """
        ),
        "segment_priority_chisq": """
            WITH cont AS (
              SELECT c.c_mktsegment AS segment,
                     o.o_orderpriority AS priority,
                     CAST(COUNT(*) AS BIGINT) AS n_obs
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
              GROUP BY 1, 2
            )
            SELECT segment, priority, n_obs,
                   CAST(SUM(n_obs) OVER (PARTITION BY segment) AS BIGINT)
                     AS seg_total,
                   CAST(SUM(n_obs) OVER (PARTITION BY priority) AS BIGINT)
                     AS pri_total,
                   CAST(SUM(n_obs) OVER () AS BIGINT) AS grand_total,
                   CAST(CAST(SUM(n_obs) OVER () AS HUGEINT) * n_obs
                     - CAST(SUM(n_obs) OVER (PARTITION BY segment) AS HUGEINT)
                       * CAST(SUM(n_obs) OVER (PARTITION BY priority)
                              AS HUGEINT) AS BIGINT) AS chi_num
            FROM cont
        """,
        "discount_trend_stats": """
            WITH li AS (
              SELECT l_returnflag AS returnflag,
                     CAST(date_diff('day', DATE '1970-01-01',
                                    CAST(l_shipdate AS DATE)) AS HUGEINT)
                       AS x,
                     CAST(ROUND(l_discount * 10000) AS HUGEINT) AS y
              FROM lineitem
            )
            SELECT returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x * y) AS BIGINT) AS sum_xy,
                   CAST(SUM(x * x) AS BIGINT) AS sum_x2
            FROM li GROUP BY 1
        """,
        "event_value_benford": """
            WITH ev AS (
              SELECT event_type,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents
              FROM events
            )
            SELECT event_type,
                   CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                     AS digit,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ev WHERE cents > 0
            GROUP BY 1, 2
        """,
        "order_gap_profile": """
            WITH o AS (
              SELECT o_custkey, o_orderkey,
                     date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS day
              FROM orders
            ),
            g AS (
              SELECT day - LAG(day) OVER (
                       PARTITION BY o_custkey ORDER BY day, o_orderkey
                     ) AS gap
              FROM o
            )
            SELECT CAST(length(bin(gap)) AS BIGINT) AS gap_bits,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(MIN(gap) AS BIGINT) AS min_gap_days,
                   CAST(MAX(gap) AS BIGINT) AS max_gap_days
            FROM g WHERE gap IS NOT NULL
            GROUP BY 1
        """,
        "quantity_mode": """
            WITH h AS (
              SELECT l_returnflag AS returnflag,
                     l_linestatus AS linestatus,
                     CAST(l_quantity AS BIGINT) AS qty,
                     COUNT(*) AS cnt
              FROM lineitem GROUP BY 1, 2, 3
            ),
            r AS (
              SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY returnflag, linestatus
                       ORDER BY cnt DESC, qty ASC) AS rn
              FROM h
            )
            SELECT returnflag, linestatus, qty AS mode_qty,
                   CAST(cnt AS BIGINT) AS mode_count
            FROM r WHERE rn = 1
        """,
        "user_type_map_census": """
            WITH pt AS (
              SELECT user_id, event_type,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1, 2
            ),
            u AS (
              SELECT user_id, COUNT(*) AS n_types, SUM(cnt) AS n_events
              FROM pt GROUP BY 1
            )
            SELECT pt.user_id,
                   CAST(u.n_types AS BIGINT) AS n_types,
                   CAST(u.n_events AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN pt.cnt * u.n_types > u.n_events
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_above_mean
            FROM pt JOIN u USING (user_id)
            GROUP BY 1, 2, 3
        """,
        "word_run_lengths": """
            WITH toks AS (
              SELECT doc_id, lang,
                     list_filter(string_split(text, ' '), x -> x <> '')
                       AS ws
              FROM documents
            ),
            w AS (
              SELECT doc_id, lang,
                     unnest(ws) AS word,
                     generate_subscripts(ws, 1) AS pos
              FROM toks
            ),
            flagged AS (
              SELECT doc_id, lang, pos,
                     CASE WHEN LAG(word) OVER win IS NULL
                               OR LAG(word) OVER win <> word
                          THEN 1 ELSE 0 END AS chg
              FROM w
              WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
            ),
            runs AS (
              SELECT doc_id, lang,
                     SUM(chg) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS run_id
              FROM flagged
            ),
            rl AS (
              SELECT lang, CAST(COUNT(*) AS BIGINT) AS run_len
              FROM runs GROUP BY doc_id, lang, run_id
            )
            SELECT lang, run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
            FROM rl GROUP BY 1, 2
        """,
        "part_name_typo_pairs": """
            WITH names AS (
              SELECT p_name AS name,
                     CAST(COUNT(*) AS BIGINT) AS n_parts,
                     string_split(p_name, ' ')[-1] AS block
              FROM part GROUP BY 1
            )
            SELECT a.name AS name_a, b.name AS name_b,
                   CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
                   a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
            FROM names a JOIN names b
              ON a.block = b.block AND a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 2
        """,
        "local_bridges": graph_sql(
            """
            , und_og AS (
              SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM og_edges WHERE src <> dst
            ),
            und_pg AS (
              SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM pg_edges WHERE src <> dst
            ),
            sym_og AS (SELECT a, b FROM und_og
                       UNION ALL SELECT b AS a, a AS b FROM und_og),
            sym_pg AS (SELECT a, b FROM und_pg
                       UNION ALL SELECT b AS a, a AS b FROM und_pg),
            br_og AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM und_og e
              WHERE NOT EXISTS (
                SELECT 1 FROM sym_og s1 JOIN sym_og s2
                  ON s2.a = e.b AND s2.b = s1.b
                WHERE s1.a = e.a AND s1.b <> e.b)
            ),
            br_pg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n FROM und_pg e
              WHERE NOT EXISTS (
                SELECT 1 FROM sym_pg s1 JOIN sym_pg s2
                  ON s2.a = e.b AND s2.b = s1.b
                WHERE s1.a = e.a AND s1.b <> e.b)
            )
            SELECT 'og' AS graph,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM und_og) AS n_edges,
                   (SELECT n FROM br_og) AS n_local_bridges
            UNION ALL
            SELECT 'pg' AS graph,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM und_pg) AS n_edges,
                   (SELECT n FROM br_pg) AS n_local_bridges
        """
        ),
        "dyad_census": graph_sql(
            """
            , e_og AS (
              SELECT DISTINCT src, dst FROM og_edges WHERE src <> dst
            ),
            e_pg AS (
              SELECT DISTINCT src, dst FROM pg_edges WHERE src <> dst
            ),
            p_og AS (
              SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
                     COUNT(*) AS n_dir
              FROM e_og GROUP BY 1, 2
            ),
            p_pg AS (
              SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
                     COUNT(*) AS n_dir
              FROM e_pg GROUP BY 1, 2
            ),
            s_og AS (
              SELECT COALESCE(SUM(CASE WHEN n_dir = 2 THEN 1 ELSE 0 END), 0)
                       AS m,
                     COALESCE(SUM(CASE WHEN n_dir = 1 THEN 1 ELSE 0 END), 0)
                       AS asym
              FROM p_og
            ),
            s_pg AS (
              SELECT COALESCE(SUM(CASE WHEN n_dir = 2 THEN 1 ELSE 0 END), 0)
                       AS m,
                     COALESCE(SUM(CASE WHEN n_dir = 1 THEN 1 ELSE 0 END), 0)
                       AS asym
              FROM p_pg
            ),
            v_og AS (SELECT COUNT(*) AS n_v FROM og_vertices),
            v_pg AS (SELECT COUNT(*) AS n_v FROM pg_vertices)
            SELECT 'og' AS graph, CAST(m AS BIGINT) AS n_mutual,
                   CAST(asym AS BIGINT) AS n_asym,
                   CAST(n_v * (n_v - 1) // 2 - m - asym AS BIGINT) AS n_null
            FROM s_og, v_og
            UNION ALL
            SELECT 'pg' AS graph, CAST(m AS BIGINT) AS n_mutual,
                   CAST(asym AS BIGINT) AS n_asym,
                   CAST(n_v * (n_v - 1) // 2 - m - asym AS BIGINT) AS n_null
            FROM s_pg, v_pg
        """
        ),
        "embedding_sign_profile": """
            WITH x AS (
              SELECT unnest(embedding) AS v,
                     generate_subscripts(embedding, 1) - 1 AS dim
              FROM embeddings
            )
            SELECT CAST(dim AS BIGINT) AS dim,
                   CAST(SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_neg,
                   CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_zero,
                   CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_pos
            FROM x GROUP BY 1
        """,
        # -- round-9 additions ------------------------------------------
        "skew_salted_enrich": """
            WITH ev AS (
              SELECT event_type,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents
              FROM events
            ),
            st AS (
              SELECT event_type, COUNT(*) AS n,
                     SUM(CAST(cents AS HUGEINT)) AS sum_cents
              FROM ev GROUP BY event_type
            )
            SELECT ev.event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN CAST(ev.cents AS HUGEINT) * st.n
                                      > st.sum_cents
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_above_mean
            FROM ev JOIN st USING (event_type)
            GROUP BY ev.event_type
        """,
        "weighted_price_median": """
            WITH h AS (
              SELECT l_returnflag AS returnflag,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                     SUM(CAST(l_quantity AS BIGINT)) AS w
              FROM lineitem GROUP BY 1, 2
            ),
            c AS (
              SELECT returnflag, cents, w,
                     SUM(w) OVER (
                       PARTITION BY returnflag ORDER BY cents
                     ) AS cum,
                     SUM(w) OVER (PARTITION BY returnflag) AS tot
              FROM h
            )
            SELECT returnflag,
                   CAST(tot AS BIGINT) AS total_units,
                   cents AS wmedian_price_cents
            FROM c
            WHERE cum - w <= (tot - 1) // 2 AND (tot - 1) // 2 < cum
        """,
        "graph_degree_quantile_audit": graph_sql(
            """
            , deg_og AS (
              SELECT src, COUNT(*) AS deg FROM og_edges GROUP BY src
            ),
            ord_og AS (
              SELECT deg, ROW_NUMBER() OVER (ORDER BY deg) - 1 AS rn,
                     COUNT(*) OVER () AS n
              FROM deg_og
            ),
            pick_og AS (
              SELECT MAX(n) AS n_sources,
                     MAX(CASE WHEN rn = ((n-1)*1)//2 THEN deg END) AS p50,
                     MAX(CASE WHEN rn = ((n-1)*2)//5 THEN deg END) AS lo,
                     MAX(CASE WHEN rn = ((n-1)*3)//5 THEN deg END) AS hi
              FROM ord_og
            ),
            ap_og AS (SELECT approx_quantile(deg, 0.5) AS ap FROM deg_og),
            deg_pg AS (
              SELECT src, COUNT(*) AS deg FROM pg_edges GROUP BY src
            ),
            ord_pg AS (
              SELECT deg, ROW_NUMBER() OVER (ORDER BY deg) - 1 AS rn,
                     COUNT(*) OVER () AS n
              FROM deg_pg
            ),
            pick_pg AS (
              SELECT MAX(n) AS n_sources,
                     MAX(CASE WHEN rn = ((n-1)*1)//2 THEN deg END) AS p50,
                     MAX(CASE WHEN rn = ((n-1)*2)//5 THEN deg END) AS lo,
                     MAX(CASE WHEN rn = ((n-1)*3)//5 THEN deg END) AS hi
              FROM ord_pg
            ),
            ap_pg AS (SELECT approx_quantile(deg, 0.5) AS ap FROM deg_pg)
            SELECT 'og' AS graph,
                   CAST(n_sources AS BIGINT) AS n_sources,
                   CAST(p50 AS BIGINT) AS exact_p50,
                   (ap >= lo AND ap <= hi) AS sketch_ok
            FROM pick_og, ap_og
            UNION ALL
            SELECT 'pg', CAST(n_sources AS BIGINT), CAST(p50 AS BIGINT),
                   (ap >= lo AND ap <= hi)
            FROM pick_pg, ap_pg
            """
        ),
        # -- round-8 additions (reference-path G10 + sketch audit) ----------
        "greedy_walk_classes": _sr_sql(
            f"""
            , nxt AS (SELECT src, MIN(dst) AS nxt FROM pg_edges GROUP BY src),
            starts AS (
              SELECT id FROM pg_vertices v
              WHERE NOT EXISTS (SELECT 1 FROM pg_edges e WHERE e.dst = v.id)
            ),
            w0 AS (SELECT id AS walk_id, id AS node FROM starts),
            w1 AS (SELECT w.walk_id, n.nxt AS node FROM w0 w JOIN nxt n ON w.node = n.src),
            w2 AS (SELECT w.walk_id, n.nxt AS node FROM w1 w JOIN nxt n ON w.node = n.src),
            w3 AS (SELECT w.walk_id, n.nxt AS node FROM w2 w JOIN nxt n ON w.node = n.src),
            w4 AS (SELECT w.walk_id, n.nxt AS node FROM w3 w JOIN nxt n ON w.node = n.src),
            w5 AS (SELECT w.walk_id, n.nxt AS node FROM w4 w JOIN nxt n ON w.node = n.src),
            w6 AS (SELECT w.walk_id, n.nxt AS node FROM w5 w JOIN nxt n ON w.node = n.src),
            steps AS (
              SELECT * FROM w0 UNION ALL SELECT * FROM w1
              UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3
              UNION ALL SELECT * FROM w4 UNION ALL SELECT * FROM w5
              UNION ALL SELECT * FROM w6
            ),
            visited AS (SELECT DISTINCT walk_id, node FROM steps),
            sigs AS (
              SELECT walk_id, walk_id % 4 AS partition_key,
                     string_agg(CAST(node AS VARCHAR), ',' ORDER BY node) AS sig
              FROM visited GROUP BY 1, 2
            ),
            kept AS (
              SELECT MIN(walk_id) AS walk_id FROM sigs
              GROUP BY partition_key, sig
            ),
            thresh AS (
              SELECT pg_id, (pg_id = og_id) AS is_tp
              FROM best WHERE score > {THRESHOLD}
            ),
            wflags AS (
              SELECT v.walk_id % 4 AS partition_key, v.walk_id,
                     MAX(CASE WHEN t.is_tp THEN 1 ELSE 0 END) AS hit_tp,
                     MAX(CASE WHEN t.is_tp = FALSE THEN 1 ELSE 0 END) AS hit_fp
              FROM visited v
              JOIN kept k ON v.walk_id = k.walk_id
              LEFT JOIN thresh t ON v.node = t.pg_id
              GROUP BY 1, 2
            )
            SELECT CAST(partition_key AS BIGINT) AS partition_key,
                   CAST(SUM(CASE WHEN hit_tp = 1 AND hit_fp = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_successful,
                   CAST(SUM(hit_fp) AS BIGINT) AS n_unsuccessful
            FROM wflags GROUP BY 1
            """,
            rounds=1,
            best=True,
        ),
        "graph_sketch_audit": graph_sql(
            """
            SELECT 'og' AS graph, CAST(COUNT(*) AS BIGINT) AS n_edges,
                   CAST(COUNT(DISTINCT src) AS BIGINT) AS exact_src,
                   CAST(COUNT(DISTINCT dst) AS BIGINT) AS exact_dst,
                   ABS(approx_count_distinct(src) - COUNT(DISTINCT src))
                     * 1000000 <= 150000 * COUNT(DISTINCT src) AS sketch_ok
            FROM og_edges
            UNION ALL
            SELECT 'pg', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(DISTINCT src) AS BIGINT),
                   CAST(COUNT(DISTINCT dst) AS BIGINT),
                   ABS(approx_count_distinct(src) - COUNT(DISTINCT src))
                     * 1000000 <= 150000 * COUNT(DISTINCT src)
            FROM pg_edges
            """
        ),
        # -- round-8 additions, third batch ----------------------------------
        "revenue_ewma": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS cents
              FROM orders GROUP BY 1
            ),
            contrib AS (
              SELECT d.day + t.off AS day,
                     d.cents * (1 << CAST(7 - t.off AS INTEGER)) AS w
              FROM daily d, range(8) t(off)
            )
            SELECT CAST(d.day AS BIGINT) AS day,
                   CAST(d.cents AS BIGINT) AS day_cents,
                   CAST(SUM(c.w) AS BIGINT) AS trail_weighted_cents
            FROM daily d JOIN contrib c ON c.day = d.day
            GROUP BY 1, 2
        """,
        "daily_gap_fill": """
            WITH daily AS (
              SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
              FROM events GROUP BY 1
            ),
            span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
            cal AS (
              SELECT unnest(generate_series(d0, d1)) AS day FROM span
            )
            SELECT CAST(cal.day AS BIGINT) AS day,
                   CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events,
                   daily.n IS NULL AS is_gap
            FROM cal LEFT JOIN daily ON cal.day = daily.day
        """,
        "value_locf": """
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(user_id AS BIGINT) AS user_id,
                   LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END
                              IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS filled_value
            FROM events
        """,
        "user_set_ops": """
            SELECT 'intersect' AS set_op, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM (SELECT user_id FROM events WHERE event_type = 'click'
                  INTERSECT
                  SELECT user_id FROM events WHERE event_type = 'error')
            UNION ALL
            SELECT 'except', CAST(COUNT(*) AS BIGINT)
            FROM (SELECT user_id FROM events WHERE event_type = 'click'
                  EXCEPT
                  SELECT user_id FROM events WHERE event_type = 'error')
            UNION ALL
            SELECT 'union', CAST(COUNT(*) AS BIGINT)
            FROM (SELECT user_id FROM events WHERE event_type = 'click'
                  UNION
                  SELECT user_id FROM events WHERE event_type = 'error')
        """,
        "segment_bitmask": """
            SELECT n_name AS nation,
                   CAST(bit_or(CASE c_mktsegment
                     WHEN 'AUTOMOBILE' THEN 1 WHEN 'BUILDING' THEN 2
                     WHEN 'FURNITURE' THEN 4 WHEN 'HOUSEHOLD' THEN 8
                     WHEN 'MACHINERY' THEN 16 ELSE 0 END) AS BIGINT)
                     AS segment_mask,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1
        """,
        "balance_outlier_census": """
            WITH base AS (
              SELECT c_nationkey,
                     CAST(round(c_acctbal*100) AS BIGINT) AS cents
              FROM customer
            ),
            st AS (
              SELECT c_nationkey, COUNT(*) AS n,
                     CAST(SUM(cents) AS BIGINT) AS s1,
                     CAST(SUM(cents*cents) AS BIGINT) AS s2
              FROM base GROUP BY 1
            ),
            o AS (
              SELECT b.c_nationkey, b.cents,
                     CAST(st.n * b.cents - st.s1 AS HUGEINT) AS dev,
                     CAST(st.n AS HUGEINT) * CAST(st.s2 AS HUGEINT)
                       - CAST(st.s1 AS HUGEINT) * CAST(st.s1 AS HUGEINT)
                       AS varn2
              FROM base b JOIN st USING (c_nationkey)
            ),
            outl AS (
              SELECT c_nationkey, COUNT(*) AS n_outliers,
                     SUM(cents) AS outlier_cents
              FROM o WHERE 4*dev*dev > 9*varn2 GROUP BY 1
            )
            SELECT n_name AS nation,
                   CAST(st.n AS BIGINT) AS n_custs,
                   CAST(COALESCE(outl.n_outliers, 0) AS BIGINT) AS n_outliers,
                   CAST(COALESCE(outl.outlier_cents, 0) AS BIGINT)
                     AS outlier_cents
            FROM st
            LEFT JOIN outl USING (c_nationkey)
            JOIN nation ON c_nationkey = n_nationkey
        """,
        "embedding_clip_census": """
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(len(list_filter(embedding,
                     x -> abs(CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT))
                          > 500)) AS BIGINT) AS n_high,
                   CAST(list_sum(list_transform(embedding,
                     x -> greatest(least(
                            CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT),
                            500), -500))) AS BIGINT) AS clip_milli_sum
            FROM embeddings
        """,
        # -- round-8 additions (TPC-H shape-suite completion) ---------------
        "part_value_concentration": """
            WITH per_part AS (
              SELECT l_partkey AS partkey,
                     SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                         * CAST(l_quantity AS BIGINT)) AS value_cents
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'
              GROUP BY 1
            ), total AS (SELECT SUM(value_cents) AS total_cents FROM per_part)
            SELECT CAST(partkey AS BIGINT) AS partkey,
                   CAST(value_cents AS DOUBLE)/100.0 AS supply_value
            FROM per_part, total
            WHERE value_cents * 1000 > total_cents
        """,
        "late_line_census": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
            GROUP BY 1
        """,
        "bulk_part_suppliers": """
            SELECT s_name, n_name AS nation
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (
              SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'small %'
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
              GROUP BY l_suppkey, l_partkey
              HAVING SUM(l_quantity) > 50.0
            )
        """,
        "regional_local_revenue": """
            SELECT n_name AS nation,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_lineitems
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND s_nationkey = c_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1997-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        # -- round-6 additions ----------------------------------------------
        "neighbor_jaccard": _neighbor_jaccard_sql(max_center_degree=64),
        "resource_allocation": _resource_allocation_sql(
            k=100, max_center_degree=64
        ),
        "two_hop_reach": _two_hop_reach_sql(),
        "component_sizes": _component_sizes_sql(),
        "char_trigrams": """
            WITH tri AS (
              SELECT lang,
                     substring(text,
                               CAST(unnest(range(1, length(text) - 1)) AS INT),
                               3) AS trigram
              FROM documents WHERE length(text) >= 3
            ),
            counts AS (
              SELECT lang, trigram, COUNT(*) AS n
              FROM tri GROUP BY lang, trigram
            ),
            ranked AS (
              SELECT lang, trigram, n,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY n DESC, trigram) AS rnk
              FROM counts
            )
            SELECT lang, trigram, CAST(n AS BIGINT) AS n_occurrences,
                   CAST(rnk AS BIGINT) AS "rank"
            FROM ranked WHERE rnk <= 10
        """,
        "token_length_hist": r"""
            WITH toks AS (
              SELECT unnest(string_split_regex(text, '[ \t\n\r\f]+')) AS tok
              FROM documents
            )
            SELECT CAST(length(tok) AS BIGINT) AS token_len,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
            FROM toks WHERE tok <> '' GROUP BY length(tok)
        """,
        "quality_deciles": f"""
            WITH qall AS ({doc_oracles.quality_sql().strip()})
            SELECT LEAST(9, CAST(ROUND(quality * 1000000) AS BIGINT) // 100000)
                     AS decile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
            FROM qall GROUP BY 1
        """,
        "text_normalize": """
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                       ' +', ' ', 'g')) AS norm
              FROM documents
            )
            SELECT doc_id, md5(norm) AS norm_digest,
                   CAST(length(norm) AS BIGINT) AS n_norm_chars
            FROM n
        """,
        "promo_revenue_share": """
            SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
                     AS ship_month,
                   CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (CAST(1 AS DECIMAL(18,2))
                                - CAST(l_discount AS DECIMAL(18,2)))
                             AS DECIMAL(28,4))
                        ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
                     AS promo_revenue,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON p_partkey = l_partkey
            GROUP BY 1
        """,
        "customer_order_histogram": """
            WITH co AS (
              SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
              GROUP BY c.c_custkey
            )
            SELECT CAST(c_count AS BIGINT) AS n_orders,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM co GROUP BY c_count
        """,
        "late_shipment_priority": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_late_orders
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate
                                               + INTERVAL 60 DAY)
            GROUP BY o_orderpriority
        """,
        "embedding_norms": """
            WITH comp AS (
              SELECT vec_id,
                     CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS nx
              FROM embeddings
            )
            SELECT vec_id, CAST(SUM(nx * nx) AS BIGINT) AS norm_sq_scaled
            FROM comp GROUP BY vec_id
        """,
        "dim_variance": """
            WITH comp AS (
              SELECT unnest(range(len(embedding))) AS dim,
                     CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS nx
              FROM embeddings
            ),
            stats AS (
              SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
                     SUM(nx) AS s, SUM(nx * nx) AS ss
              FROM comp GROUP BY dim
            )
            SELECT dim, CAST(n AS BIGINT) AS n,
                   CAST(s AS BIGINT) AS sum_scaled,
                   CAST(ss AS BIGINT) AS sumsq_scaled,
                   CAST(n * ss - s * s AS BIGINT) AS var_num
            FROM stats ORDER BY var_num DESC, dim LIMIT 8
        """,
        "dedup_cluster_sizes": doc_oracles.dup_group_sizes_sql(
            doc_oracles.minhash_lsh_sql(n=3, threshold=0.2)
        ),
        "copurchase_pairs": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            pairs AS (
              SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                     COUNT(*) AS n
              FROM op a JOIN op b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2
            )
            SELECT part_a, part_b, CAST(n AS BIGINT) AS n_orders
            FROM pairs WHERE n >= 2
            ORDER BY n_orders DESC, part_a, part_b
            LIMIT 100
        """,
        "supplier_pareto": """
            WITH per_supp AS (
              SELECT l_suppkey AS suppkey,
                     CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2))
                             - CAST(l_discount AS DECIMAL(18,2)))
                          AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS revenue
              FROM lineitem GROUP BY l_suppkey
            ),
            tot AS (SELECT SUM(revenue) AS total FROM per_supp),
            cum AS (
              SELECT suppkey, revenue,
                     SUM(revenue) OVER (ORDER BY revenue DESC, suppkey ASC)
                       AS cum_weight
              FROM per_supp
            )
            SELECT suppkey, CAST(revenue AS DOUBLE) AS revenue,
                   CAST(cum_weight AS DOUBLE) AS cum_revenue
            FROM cum, tot
            WHERE (cum_weight - revenue) * 5 < total * 4
        """,
        "part_supplier_variety": """
            SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_size
        """,
        "idle_customers": f"""
            WITH t AS (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) AS avg_bal
              FROM customer WHERE c_acctbal > 0
            )
            SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_custs,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_acctbal
            FROM customer c, t
            WHERE CAST(c_acctbal AS DOUBLE) > t.avg_bal
              AND NOT EXISTS (
                    SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
            GROUP BY c_nationkey
        """,
        "nation_trade_flow": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS "year",
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_lineitems
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE s_nationkey <> c_nationkey
            GROUP BY 1, 2, 3
        """,
        "length_gini": """
            WITH grouped AS (
              SELECT CAST(n_chars AS BIGINT) AS len, COUNT(*) AS cnt
              FROM documents GROUP BY 1
            ),
            cum AS (
              SELECT len, cnt,
                     COALESCE(SUM(cnt) OVER (ORDER BY len
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS "before"
              FROM grouped
            ),
            agg AS (
              SELECT CAST(SUM(cnt) AS BIGINT) AS n_docs,
                     SUM(CAST(len AS HUGEINT) * cnt) AS total_len,
                     SUM(CAST(len AS HUGEINT)
                         * (CAST(cnt AS HUGEINT) * "before"
                            + (CAST(cnt AS HUGEINT) * (cnt + 1)) // 2))
                       AS sum_rank_len
              FROM cum
            )
            SELECT n_docs,
                   CAST(total_len AS DOUBLE) AS total_len,
                   CAST(sum_rank_len AS DOUBLE) AS sum_rank_len,
                   CAST(2 * sum_rank_len
                        - (CAST(n_docs AS HUGEINT) + 1) * total_len AS DOUBLE)
                     AS gini_num,
                   CAST(CAST(n_docs AS HUGEINT) * total_len AS DOUBLE)
                     AS gini_den
            FROM agg
        """,
        "centroid_distances": """
            WITH comp AS (
              SELECT CAST(label AS BIGINT) AS label,
                     unnest(range(len(embedding))) AS j,
                     CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS s
              FROM embeddings
            ),
            sums AS (
              SELECT label, j, SUM(s) AS s, CAST(COUNT(*) AS BIGINT) AS n
              FROM comp GROUP BY label, j
            )
            SELECT a.label AS label_a, b.label AS label_b,
                   a.n AS n_a, b.n AS n_b,
                   CAST(SUM((CAST(b.n AS HUGEINT) * a.s
                             - CAST(a.n AS HUGEINT) * b.s)
                            * (CAST(b.n AS HUGEINT) * a.s
                               - CAST(a.n AS HUGEINT) * b.s)) AS DOUBLE)
                     AS dist_num
            FROM sums a JOIN sums b ON a.j = b.j AND a.label < b.label
            GROUP BY 1, 2, 3, 4
        """,
        "degree_clustering": _degree_clustering_sql(),
        "order_priority_funnel": """
            WITH late AS (
              SELECT DISTINCT o.o_orderkey AS k
              FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            )
            SELECT o_orderpriority,
                   CAST(year(o_orderdate) * 10 + quarter(o_orderdate)
                        AS BIGINT) AS quarter,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(COUNT(k) AS BIGINT) AS n_late
            FROM orders LEFT JOIN late ON k = o_orderkey
            GROUP BY 1, 2
        """,
        "supplier_leadtime_quantiles": """
            WITH lead AS (
              SELECT l.l_suppkey AS suppkey,
                     datediff('day', o.o_orderdate, l.l_shipdate)
                       AS lead_days,
                     l.l_orderkey, l.l_linenumber
              FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            ),
            qs(p_label, num, den) AS (
              VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)
            ),
            r AS (
              SELECT suppkey, lead_days,
                     ROW_NUMBER() OVER (PARTITION BY suppkey
                       ORDER BY lead_days, l_orderkey, l_linenumber) AS rn,
                     COUNT(*) OVER (PARTITION BY suppkey) AS cnt
              FROM lead
            )
            SELECT r.suppkey, q.p_label,
                   CAST(r.cnt AS BIGINT) AS n_items,
                   CAST(r.lead_days AS BIGINT) AS q_lead_days
            FROM r, qs q
            WHERE r.rn - 1 = (r.cnt - 1) * q.num // q.den
        """,
        "large_orders": """
            WITH q AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                          AS DECIMAL(38,2)) AS s
              FROM lineitem GROUP BY 1
            )
            SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
                   CAST(s AS DOUBLE) AS sum_qty
            FROM orders o JOIN q ON q.l_orderkey = o.o_orderkey
            WHERE s > 200
            ORDER BY s DESC, o.o_orderkey
            LIMIT 100
        """,
        "small_lot_revenue": """
            WITH pp AS (
              SELECT l_partkey AS pk,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)))
                          AS DECIMAL(18,2)) AS qty_sum,
                     CAST(COUNT(*) AS BIGINT) AS qty_n
              FROM lineitem GROUP BY 1
            ),
            small AS (
              SELECT l.l_partkey,
                     CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2))
                             - CAST(l.l_discount AS DECIMAL(18,2)))
                          AS DECIMAL(28,4)) AS rev
              FROM lineitem l JOIN pp ON pp.pk = l.l_partkey
              WHERE CAST(l.l_quantity AS DECIMAL(9,2)) * 5 * pp.qty_n
                    < pp.qty_sum
            )
            SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_small_lots,
                   CAST(SUM(s.rev) AS DOUBLE) AS revenue
            FROM small s JOIN part p ON p.p_partkey = s.l_partkey
            GROUP BY 1
        """,
        "top_inactivity_gaps": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
            ),
            g AS (
              SELECT user_id, event_id,
                     tus - LAG(tus) OVER (PARTITION BY user_id
                                          ORDER BY tus, event_id) AS gap_us
              FROM e
            )
            SELECT user_id, CAST(gap_us AS BIGINT) AS gap_us,
                   event_id AS gap_end_event
            FROM g WHERE gap_us IS NOT NULL
            ORDER BY gap_us DESC, user_id, gap_end_event
            LIMIT 100
        """,
        "source_length_quantiles": """
            WITH qs(p_label, num, den) AS (
              VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)
            ),
            r AS (
              SELECT source, CAST(n_chars AS BIGINT) AS n_chars,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY n_chars, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS cnt
              FROM documents
            )
            SELECT r.source, q.p_label,
                   CAST(r.cnt AS BIGINT) AS n_docs,
                   r.n_chars AS q_chars
            FROM r, qs q
            WHERE r.rn - 1 = (r.cnt - 1) * q.num // q.den
        """,
        "rich_club": graph_sql(
            f""", {_SYM_CTES.strip()},
deg AS (SELECT a AS id, COUNT(*) AS degree FROM sym GROUP BY a),
ks(k) AS (VALUES (1), (2), (4), (8), (16), (32)),
nodes AS (
  SELECT k.k, COUNT(*) AS n_nodes FROM deg d, ks k
  WHERE d.degree > k.k GROUP BY k.k
),
tagged AS (
  SELECT LEAST(da.degree, db.degree) AS min_deg
  FROM und e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b
),
redges AS (
  SELECT k.k, COUNT(*) AS n_edges FROM tagged t, ks k
  WHERE t.min_deg > k.k GROUP BY k.k
)
SELECT CAST(n.k AS BIGINT) AS k,
       CAST(n.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(e.n_edges, 0) AS BIGINT) AS n_edges,
       CAST(CASE WHEN n.n_nodes >= 2
            THEN (2 * COALESCE(e.n_edges, 0) * 1000000)
                 // (n.n_nodes * (n.n_nodes - 1))
            ELSE 0 END AS BIGINT) AS density_ppm
FROM nodes n LEFT JOIN redges e ON e.k = n.k
"""
        ),
        "joint_degree_profile": graph_sql(
            f""", {_SYM_CTES.strip()},
deg AS (SELECT a AS id, COUNT(*) AS degree FROM sym GROUP BY a)
SELECT CAST(LEAST(length(bin(da.degree)), length(bin(db.degree)))
            AS BIGINT) AS bits_lo,
       CAST(GREATEST(length(bin(da.degree)), length(bin(db.degree)))
            AS BIGINT) AS bits_hi,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM und e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b
GROUP BY 1, 2
"""
        ),
        "user_activity_pareto": """
            WITH pu AS (
              SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1
            ),
            tot AS (SELECT SUM(n_events) AS total FROM pu),
            cum AS (
              SELECT user_id, n_events,
                     SUM(n_events) OVER (ORDER BY n_events DESC,
                                         user_id ASC) AS cum_events
              FROM pu
            )
            SELECT user_id, n_events,
                   CAST(cum_events AS BIGINT) AS cum_events
            FROM cum, tot
            WHERE (cum_events - n_events) * 10 < total * 9
        """,
        "weekly_active_users": """
            SELECT CAST((epoch_us(ts) // 86400000000) // 7 AS BIGINT)
                     AS week_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        "stopword_coverage": """
            WITH toks AS (
              SELECT lang, unnest(string_split(text, ' ')) AS tok
              FROM documents
            ),
            agg AS (
              SELECT lang, COUNT(*) AS n_tokens,
                     COUNT(*) FILTER (tok IN (
                       'the','of','and','a','to','in','is','it','that',
                       'for','on','was','with','as','be','at','by',
                       'this','are','or')) AS n_stop
              FROM toks WHERE tok <> '' GROUP BY lang
            )
            SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_stop AS BIGINT) AS n_stopword_tokens,
                   CAST((n_stop * 1000000) // n_tokens AS BIGINT)
                     AS coverage_ppm
            FROM agg
        """,
        "embedding_grid_occupancy": f"""
            WITH gc AS ({doc_oracles.grid_clusters_sql(bits=6).strip()}),
            sizes AS (
              SELECT CAST(n_vecs AS BIGINT) AS cell_size, cluster_id
              FROM gc
            ),
            qs(p_label, num, den) AS (
              VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)
            ),
            r AS (
              SELECT cell_size,
                     ROW_NUMBER() OVER (ORDER BY cell_size, cluster_id)
                       AS rn,
                     COUNT(*) OVER () AS cnt
              FROM sizes
            )
            SELECT q.p_label, CAST(r.cnt AS BIGINT) AS n_cells,
                   r.cell_size AS q_cell_size
            FROM r, qs q
            WHERE r.rn - 1 = (r.cnt - 1) * q.num // q.den
        """,
        "disjunctive_revenue": """
            WITH j AS (
              SELECT p.p_brand,
                     CAST(l.l_quantity AS DECIMAL(9,2)) AS qty,
                     CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(18,2))
                             - CAST(l.l_discount AS DECIMAL(18,2)))
                          AS DECIMAL(28,4)) AS rev
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            )
            SELECT 'b12_small' AS branch,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(COALESCE(SUM(rev), 0) AS DOUBLE) AS revenue
            FROM j WHERE p_brand = 'Brand#12' AND qty >= 1 AND qty <= 11
            UNION ALL
            SELECT 'b23_mid',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(rev), 0) AS DOUBLE)
            FROM j WHERE p_brand = 'Brand#23' AND qty >= 10 AND qty <= 20
            UNION ALL
            SELECT 'b34_large',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COALESCE(SUM(rev), 0) AS DOUBLE)
            FROM j WHERE p_brand = 'Brand#34' AND qty >= 20 AND qty <= 30
        """,
        "cheapest_supplier": """
            WITH pairs AS (
              SELECT l_partkey, l_suppkey,
                     MIN(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS pair_min
              FROM lineitem GROUP BY 1, 2
            ),
            r AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
                       ORDER BY pair_min, l_suppkey) AS rn
              FROM pairs
            )
            SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                   CAST(pair_min AS DOUBLE) AS min_price
            FROM r WHERE rn = 1
        """,
        "market_share": """
            WITH g AS (
              SELECT r.r_name AS cust_region, year(l_shipdate) AS yr,
                     n1.n_name AS supp_nation,
                     SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(28,4))) AS rev_dec
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              JOIN region r ON n2.n_regionkey = r.r_regionkey
              GROUP BY 1, 2, 3
            )
            SELECT cust_region, CAST(yr AS BIGINT) AS "year", supp_nation,
                   CAST(rev_dec AS DOUBLE) AS revenue,
                   CAST(SUM(rev_dec) OVER (PARTITION BY cust_region, yr)
                        AS DOUBLE) AS region_total
            FROM g
        """,
        "supplier_nation_margin": """
            SELECT n_name AS nation,
                   CAST(year(l_shipdate) AS BIGINT) AS "year",
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
                   CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))
                        AS DECIMAL(28,4))) AS DOUBLE) AS retail_cost,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        """,
        "top_supplier_quarter": """
            WITH pq AS (
              SELECT year(l_shipdate) * 10 + quarter(l_shipdate) AS quarter,
                     l_suppkey,
                     SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(28,4))) AS rev_dec
              FROM lineitem GROUP BY 1, 2
            ),
            rk AS (
              SELECT pq.*, RANK() OVER (PARTITION BY quarter
                       ORDER BY rev_dec DESC) AS rk
              FROM pq
            )
            SELECT CAST(quarter AS BIGINT) AS quarter,
                   CAST(l_suppkey AS BIGINT) AS suppkey, s_name,
                   CAST(rev_dec AS DOUBLE) AS total_revenue
            FROM rk JOIN supplier ON l_suppkey = s_suppkey
            WHERE rk = 1
        """,
        "monthly_revenue_growth": """
            WITH m AS (
              SELECT year(o_orderdate) * 100 + month(o_orderdate) AS month,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
                     CAST(COUNT(*) AS BIGINT) AS n_orders
              FROM orders GROUP BY 1
            )
            SELECT CAST(month AS BIGINT) AS month,
                   CAST(rev_dec AS DOUBLE) AS revenue,
                   CAST(LAG(rev_dec) OVER (ORDER BY month) AS DOUBLE)
                     AS prev_revenue,
                   n_orders
            FROM m
        """,
        "customer_acquisition": """
            WITH fm AS (
              SELECT o_custkey,
                     MIN(year(o_orderdate) * 100 + month(o_orderdate))
                       AS month
              FROM orders GROUP BY 1
            ),
            m AS (
              SELECT month, CAST(COUNT(*) AS BIGINT) AS n_new
              FROM fm GROUP BY 1
            )
            SELECT CAST(month AS BIGINT) AS month, n_new,
                   CAST(SUM(n_new) OVER (ORDER BY month
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_customers
            FROM m
        """,
        "hapax_by_source": """
            WITH toks AS (
              SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents
            ),
            tc AS (
              SELECT source, tok, COUNT(*) AS c
              FROM toks WHERE tok <> '' GROUP BY 1, 2
            )
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_hapax
            FROM tc GROUP BY 1
        """,
        "sentence_stats": r"""
            WITH segs AS (
              SELECT source, doc_id,
                     trim(unnest(string_split_regex(text, '[.!?]+'))) AS seg
              FROM documents
            ),
            pd AS (
              SELECT source, doc_id, COUNT(*) AS n_seg,
                     SUM(length(seg)) AS seg_chars
              FROM segs WHERE seg <> '' GROUP BY 1, 2
            )
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_seg) AS BIGINT) AS n_sentences,
                   CAST(SUM(seg_chars) AS BIGINT) AS total_sentence_chars
            FROM pd GROUP BY 1
        """,
        "edge_support_hist": _edge_support_sql(),
        "common_neighbor_hist": _common_neighbor_sql(),
        "rfm_segments": """
            WITH pc AS (
              SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_day,
                     COUNT(*) AS freq,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
              FROM orders GROUP BY 1
            ),
            mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS max_day
                   FROM orders)
            SELECT CAST(length(bin(date_diff('day', last_day, max_day)))
                        AS BIGINT) AS r_bucket,
                   CAST(length(bin(freq)) AS BIGINT) AS f_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(spend) AS DOUBLE) AS monetary
            FROM pc, mx GROUP BY 1, 2
        """,
        "part_catalog_rollup": """
            SELECT CASE WHEN GROUPING(p_brand) = 1 THEN 'ALL'
                        ELSE p_brand END AS brand,
                   CASE WHEN GROUPING(p_type) = 1 THEN 'ALL'
                        ELSE p_type END AS type,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS retail_total,
                   CAST(SUM(p_size) AS BIGINT) AS size_total
            FROM part GROUP BY ROLLUP(p_brand, p_type)
        """,
        "nation_revenue_trend": """
            WITH g AS (
              SELECT n_name AS nation,
                     year(o_orderdate) * 10 + quarter(o_orderdate) AS q,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
                     CAST(COUNT(*) AS BIGINT) AS n_orders
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY 1, 2
            )
            SELECT nation, CAST(q AS BIGINT) AS quarter,
                   CAST(rev_dec AS DOUBLE) AS revenue,
                   CAST(LAG(rev_dec) OVER (PARTITION BY nation ORDER BY q)
                        AS DOUBLE) AS prev_revenue,
                   n_orders
            FROM g
        """,
        "vocab_overlap": """
            WITH v AS (
              SELECT DISTINCT source, tok FROM (
                SELECT source, unnest(string_split(text, ' ')) AS tok
                FROM documents)
              WHERE tok <> ''
            ),
            s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v
                  FROM v GROUP BY 1),
            c AS (
              SELECT a.source AS source_a, b.source AS source_b,
                     CAST(COUNT(*) AS BIGINT) AS n_common
              FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
              GROUP BY 1, 2
            )
            SELECT source_a, source_b, n_common,
                   sa.v AS vocab_a, sb.v AS vocab_b
            FROM c JOIN s sa ON sa.source = c.source_a
            JOIN s sb ON sb.source = c.source_b
        """,
        "embedding_dot_hist": f"""
            WITH comp AS (
              SELECT vec_id, unnest(range(len(embedding))) AS j,
                     CAST(CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000000) AS BIGINT) * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9)) AS x
              FROM embeddings
            ),
            grp AS (
              SELECT vec_id,
                     ({hash56_sql("vec_id", seed=11)} % 8) AS g
              FROM embeddings
            ),
            dots AS (
              SELECT a.vec_id AS va, b.vec_id AS vb, SUM(a.x * b.x) AS dot
              FROM comp a
              JOIN grp ga ON ga.vec_id = a.vec_id
              JOIN grp gb ON gb.g = ga.g
              JOIN comp b ON b.vec_id = gb.vec_id AND b.j = a.j
                         AND b.vec_id > a.vec_id
              GROUP BY 1, 2
            )
            SELECT CAST(floor(dot * 10) AS BIGINT) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM dots GROUP BY 1
        """,
        "global_transitivity": _transitivity_sql(),
        "sole_returned_supplier": """
            WITH per_supp AS (
              SELECT l_orderkey, l_suppkey,
                     MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS had_ret
              FROM lineitem GROUP BY 1, 2
            ),
            per_order AS (
              SELECT l_orderkey, COUNT(*) AS n_supp, SUM(had_ret) AS n_ret
              FROM per_supp GROUP BY 1
            ),
            q AS (
              SELECT ps.l_suppkey, COUNT(*) AS n_orders
              FROM per_supp ps
              JOIN per_order po ON po.l_orderkey = ps.l_orderkey
              WHERE ps.had_ret = 1 AND po.n_supp >= 2 AND po.n_ret = 1
              GROUP BY 1
            )
            SELECT s_name AS supplier, CAST(n_orders AS BIGINT) AS n_orders
            FROM q JOIN supplier ON s_suppkey = q.l_suppkey
        """,
        "supplier_hhi": """
            WITH per_supp AS (
              SELECT l_suppkey,
                     SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(28,4))) AS rev_dec
              FROM lineitem GROUP BY 1
            ),
            sq AS (
              SELECT l_suppkey, rev_dec,
                     CAST(CAST(rev_dec * 10000 AS DECIMAL(19,0))
                          * CAST(rev_dec * 10000 AS DECIMAL(19,0))
                          AS DECIMAL(38,0)) AS sq_units
              FROM per_supp
            )
            SELECT n_name AS nation,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   CAST(SUM(rev_dec) AS DOUBLE) AS total_rev,
                   CAST(SUM(sq_units) AS DOUBLE) AS sum_sq_rev
            FROM sq
            JOIN supplier ON s_suppkey = sq.l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            GROUP BY 1
        """,
        "order_size_profile": """
            WITH per_order AS (
              SELECT l_orderkey, COUNT(*) AS n_lines,
                     SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(28,4))) AS rev_dec
              FROM lineitem GROUP BY 1
            )
            SELECT CAST(n_lines AS BIGINT) AS n_lines,
                   o_orderstatus AS status,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(rev_dec) AS DOUBLE) AS revenue
            FROM per_order
            JOIN orders ON o_orderkey = l_orderkey
            GROUP BY 1, 2
        """,
        "activity_streaks": """
            WITH days AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ),
            isl AS (
              SELECT user_id,
                     day - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day) AS island
              FROM days
            ),
            runs AS (
              SELECT user_id, island, COUNT(*) AS run_len
              FROM isl GROUP BY 1, 2
            ),
            best AS (
              SELECT user_id, MAX(run_len) AS streak_len
              FROM runs GROUP BY 1
            )
            SELECT CAST(streak_len AS BIGINT) AS streak_len,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM best GROUP BY 1
        """,
        "daily_autocovariance": """
            WITH daily AS (
              SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                     COUNT(*) AS c
              FROM events GROUP BY 1, 2
            ),
            base AS (
              SELECT event_type, COUNT(*) AS n_days, SUM(c) AS sum_c,
                     SUM(c * c) AS sum_sq
              FROM daily GROUP BY 1
            ),
            l1 AS (
              SELECT d.event_type, SUM(d.c * n.c) AS lag1_dot
              FROM daily d JOIN daily n
                ON n.event_type = d.event_type AND n.day = d.day + 1
              GROUP BY 1
            ),
            l7 AS (
              SELECT d.event_type, SUM(d.c * n.c) AS lag7_dot
              FROM daily d JOIN daily n
                ON n.event_type = d.event_type AND n.day = d.day + 7
              GROUP BY 1
            )
            SELECT b.event_type, CAST(n_days AS BIGINT) AS n_days,
                   CAST(sum_c AS BIGINT) AS sum_c,
                   CAST(sum_sq AS BIGINT) AS sum_sq,
                   CAST(COALESCE(lag1_dot, 0) AS BIGINT) AS lag1_dot,
                   CAST(COALESCE(lag7_dot, 0) AS BIGINT) AS lag7_dot
            FROM base b
            LEFT JOIN l1 ON l1.event_type = b.event_type
            LEFT JOIN l7 ON l7.event_type = b.event_type
        """,
        "edge_quality_census": graph_sql(
            """, raw AS (SELECT src, dst FROM og_edges),
dd AS (SELECT DISTINCT src, dst FROM raw),
dirs AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, COUNT(*) AS n_dir
  FROM dd WHERE src <> dst GROUP BY 1, 2
),
t1 AS (
  SELECT COUNT(*) AS n_raw,
         COALESCE(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END), 0)
           AS n_self_loops
  FROM raw
),
t2 AS (SELECT COUNT(*) AS n_distinct FROM dd),
t3 AS (
  SELECT COUNT(*) AS n_undirected,
         COALESCE(SUM(CASE WHEN n_dir = 2 THEN 1 ELSE 0 END), 0) AS n_recip
  FROM dirs
)
SELECT CAST(n_raw AS BIGINT) AS n_raw,
       CAST(n_self_loops AS BIGINT) AS n_self_loops,
       CAST(n_raw - n_distinct AS BIGINT) AS n_dup_directed,
       CAST(n_recip AS BIGINT) AS n_reciprocal_pairs,
       CAST(n_undirected AS BIGINT) AS n_undirected
FROM t1, t2, t3
"""
        ),
        "source_corr_profile": """
            WITH per AS (
              SELECT source, length(text) AS len,
                     len(string_split(text, ' ')) AS tok
              FROM documents
            )
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len) AS BIGINT) AS sum_len,
                   CAST(SUM(tok) AS BIGINT) AS sum_tok,
                   CAST(SUM(len * len) AS BIGINT) AS sum_len_sq,
                   CAST(SUM(tok * tok) AS BIGINT) AS sum_tok_sq,
                   CAST(SUM(len * tok) AS BIGINT) AS sum_len_tok
            FROM per GROUP BY 1
        """,
        "order_cohort_retention": """
            WITH active AS (
              SELECT DISTINCT o_custkey,
                     year(o_orderdate) * 12 + month(o_orderdate) AS m
              FROM orders
            ),
            first AS (
              SELECT o_custkey, MIN(m) AS m0 FROM active GROUP BY 1
            )
            SELECT CAST(m0 AS BIGINT) AS cohort_month,
                   CAST(m - m0 AS BIGINT) AS month_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM active JOIN first USING (o_custkey)
            GROUP BY 1, 2
        """,
        "supply_bipartite_profile": """
            WITH pairs AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ),
            pd AS (
              SELECT l_partkey, COUNT(*) AS n_partners FROM pairs GROUP BY 1
            ),
            sd AS (
              SELECT l_suppkey, COUNT(*) AS n_partners FROM pairs GROUP BY 1
            )
            SELECT 'part' AS side, CAST(n_partners AS BIGINT) AS n_partners,
                   CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM pd GROUP BY n_partners
            UNION ALL
            SELECT 'supplier', CAST(n_partners AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM sd GROUP BY n_partners
        """,
        "pricing_knob_grid": """
            SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc_cents,
                   CAST(round(l_tax * 100) AS BIGINT) AS tax_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (CAST(1 AS DECIMAL(18,2))
                          - CAST(l_discount AS DECIMAL(18,2)))
                       AS DECIMAL(28,4))) AS DOUBLE) AS revenue
            FROM lineitem GROUP BY 1, 2
        """,
        "user_event_type_diversity": """
            WITH pairs AS (
              SELECT DISTINCT user_id, event_type FROM events
            ),
            pu AS (
              SELECT user_id, COUNT(*) AS n_types FROM pairs GROUP BY 1
            )
            SELECT CAST(n_types AS BIGINT) AS n_types,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM pu GROUP BY 1
        """,
        "edge_block_census": graph_sql(
            f"""
SELECT CASE WHEN src < {tpch_graph.SUPPLIER_OFFSET} THEN 'nation'
            WHEN src < {tpch_graph.CUSTOMER_OFFSET} THEN 'supplier'
            ELSE 'customer' END AS src_class,
       CASE WHEN dst < {tpch_graph.SUPPLIER_OFFSET} THEN 'nation'
            WHEN dst < {tpch_graph.CUSTOMER_OFFSET} THEN 'supplier'
            ELSE 'customer' END AS dst_class,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM og_edges GROUP BY 1, 2
"""
        ),
        "segment_revenue_mix": """
            SELECT c_mktsegment AS segment,
                   CAST(year(o_orderdate) AS BIGINT) AS "year",
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS revenue
            FROM orders JOIN customer ON c_custkey = o_custkey
            GROUP BY 1, 2
        """,
        "supplier_balance_deciles": """
            WITH qs(p_label, num, den) AS (
              VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)
            ),
            r AS (
              SELECT n_name AS nation,
                     CAST(round(s_acctbal * 100) AS BIGINT) AS cents,
                     ROW_NUMBER() OVER (PARTITION BY n_name
                       ORDER BY round(s_acctbal * 100), s_suppkey) AS rn,
                     COUNT(*) OVER (PARTITION BY n_name) AS cnt
              FROM supplier JOIN nation ON n_nationkey = s_nationkey
            )
            SELECT r.nation, q.p_label,
                   CAST(r.cnt AS BIGINT) AS n_suppliers,
                   r.cents AS q_cents
            FROM r, qs q
            WHERE r.rn - 1 = (r.cnt - 1) * q.num // q.den
        """,
        "priority_mix_shift": """
            WITH counts AS (
              SELECT year(o_orderdate) AS yr, o_orderpriority AS priority,
                     COUNT(*) AS n_orders
              FROM orders GROUP BY 1, 2
            ),
            totals AS (
              SELECT yr, SUM(n_orders) AS y_total FROM counts GROUP BY 1
            )
            SELECT CAST(c.yr AS BIGINT) AS "year", c.priority,
                   CAST(c.n_orders AS BIGINT) AS n_orders,
                   CAST(c.n_orders * 1000000 // t.y_total AS BIGINT)
                     AS share_ppm
            FROM counts c JOIN totals t ON t.yr = c.yr
        """,
        "leading_tokens": """
            WITH counts AS (
              SELECT source, string_split(text, ' ')[1] AS token,
                     COUNT(*) AS n_docs
              FROM documents GROUP BY 1, 2
            ),
            rk AS (
              SELECT source, token, n_docs,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY n_docs DESC, token) AS rank
              FROM counts
            )
            SELECT source, CAST(rank AS BIGINT) AS rank, token,
                   CAST(n_docs AS BIGINT) AS n_docs
            FROM rk WHERE rank <= 5
        """,
        "value_moments": """
            WITH per AS (
              SELECT event_type,
                     CAST(round(value * 100) AS BIGINT) AS c
              FROM events
            )
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(c) AS DOUBLE) AS sum_cents,
                   CAST(SUM(c * c) AS DOUBLE) AS sum_sq_cents,
                   CAST(MIN(c) AS BIGINT) AS min_cents,
                   CAST(MAX(c) AS BIGINT) AS max_cents
            FROM per GROUP BY 1
        """,
        "component_density_profile": _component_density_sql(),
        "fk_integrity_census": """
            WITH ok AS (SELECT DISTINCT o_orderkey AS k FROM orders),
            lk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
            fj AS (
              SELECT ok.k AS ko, lk.k AS kl
              FROM ok FULL OUTER JOIN lk ON lk.k = ok.k
            )
            SELECT CAST(COUNT(ko) AS BIGINT) AS n_order_keys,
                   CAST(COUNT(kl) AS BIGINT) AS n_lineitem_keys,
                   CAST(SUM(CASE WHEN ko IS NOT NULL AND kl IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
                   CAST(SUM(CASE WHEN ko IS NOT NULL AND kl IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_childless_orders,
                   CAST(SUM(CASE WHEN ko IS NULL AND kl IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_orphan_lineitem_keys
            FROM fj
        """,
        "custbal_order_corr": """
            WITH per_cust AS (
              SELECT o_custkey, COUNT(*) AS n_ord FROM orders GROUP BY 1
            ),
            j AS (
              SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
                     COALESCE(n_ord, 0) AS n_ord
              FROM customer LEFT JOIN per_cust ON o_custkey = c_custkey
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(bal) AS BIGINT) AS sum_bal,
                   CAST(SUM(n_ord) AS BIGINT) AS sum_orders,
                   CAST(SUM(bal * bal) AS DOUBLE) AS sum_bal_sq,
                   CAST(SUM(n_ord * n_ord) AS DOUBLE) AS sum_orders_sq,
                   CAST(SUM(bal * n_ord) AS DOUBLE) AS sum_bal_orders
            FROM j
        """,
        "brand_price_moments": """
            WITH per AS (
              SELECT p_brand AS brand,
                     CAST(round(p_retailprice * 100) AS BIGINT) AS c
              FROM part
            )
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(c) AS BIGINT) AS sum_cents,
                   CAST(SUM(c * c) AS DOUBLE) AS sum_sq_cents,
                   CAST(MIN(c) AS BIGINT) AS min_cents,
                   CAST(MAX(c) AS BIGINT) AS max_cents
            FROM per GROUP BY 1
        """,
        "lang_token_moments": """
            WITH toks AS (
              SELECT lang,
                     length(unnest(string_split(text, ' '))) AS n
              FROM documents
            ),
            dp AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
            ts AS (
              SELECT lang, COUNT(*) AS n_tokens, SUM(n) AS sum_tok_len,
                     SUM(n * n) AS sum_tok_len_sq
              FROM toks GROUP BY 1
            )
            SELECT dp.lang, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(sum_tok_len AS BIGINT) AS sum_tok_len,
                   CAST(sum_tok_len_sq AS BIGINT) AS sum_tok_len_sq
            FROM dp JOIN ts ON ts.lang = dp.lang
        """,
        "knn_mutuality": f"""
            WITH g AS (
              SELECT vec_id, neighbor_id, rank FROM (
                {doc_oracles.knn_graph_sql(k=5, sample_mod=10)}
              )
            )
            SELECT CAST(g.rank AS BIGINT) AS rank,
                   CAST(COUNT(*) AS BIGINT) AS n_edges,
                   CAST(SUM(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_mutual
            FROM g LEFT JOIN g r
              ON r.vec_id = g.neighbor_id AND r.neighbor_id = g.vec_id
            GROUP BY 1
        """,
        "perturbation_census": graph_sql(
            """
, vd AS (
  SELECT o.id AS oid, p.id AS pid, o.props AS po, p.props AS pp
  FROM og_vertices o FULL OUTER JOIN pg_vertices p ON p.id = o.id
),
vt AS (
  SELECT COUNT(oid) AS n_vertices_og, COUNT(pid) AS n_vertices_pg,
         SUM(CASE WHEN oid IS NOT NULL AND pid IS NULL THEN 1 ELSE 0 END)
           AS n_removed,
         SUM(CASE WHEN oid IS NULL AND pid IS NOT NULL THEN 1 ELSE 0 END)
           AS n_added,
         SUM(CASE WHEN oid IS NOT NULL AND pid IS NOT NULL
                  AND po <> pp THEN 1 ELSE 0 END) AS n_modified
  FROM vd
),
oe AS (SELECT DISTINCT src, dst FROM og_edges),
pe AS (SELECT DISTINCT src, dst FROM pg_edges),
ed AS (
  SELECT oe.src AS osrc, pe.src AS psrc
  FROM oe FULL OUTER JOIN pe ON pe.src = oe.src AND pe.dst = oe.dst
),
et AS (
  SELECT COUNT(osrc) AS n_edges_og, COUNT(psrc) AS n_edges_pg,
         SUM(CASE WHEN osrc IS NOT NULL AND psrc IS NULL THEN 1 ELSE 0 END)
           AS n_edges_removed,
         SUM(CASE WHEN osrc IS NULL AND psrc IS NOT NULL THEN 1 ELSE 0 END)
           AS n_edges_added
  FROM ed
)
SELECT CAST(n_vertices_og AS BIGINT) AS n_vertices_og,
       CAST(n_vertices_pg AS BIGINT) AS n_vertices_pg,
       CAST(COALESCE(n_removed, 0) AS BIGINT) AS n_removed,
       CAST(COALESCE(n_added, 0) AS BIGINT) AS n_added,
       CAST(COALESCE(n_modified, 0) AS BIGINT) AS n_modified,
       CAST(n_edges_og AS BIGINT) AS n_edges_og,
       CAST(n_edges_pg AS BIGINT) AS n_edges_pg,
       CAST(COALESCE(n_edges_removed, 0) AS BIGINT) AS n_edges_removed,
       CAST(COALESCE(n_edges_added, 0) AS BIGINT) AS n_edges_added
FROM vt, et
"""
        ),
        "revenue_reconciliation": """
            WITH per_order AS (
              SELECT l_orderkey,
                     SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(28,4)) * 10000 AS BIGINT)) AS line_u
              FROM lineitem GROUP BY 1
            ),
            j AS (
              SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 10000
                          AS BIGINT) - line_u AS u
              FROM orders JOIN per_order ON l_orderkey = o_orderkey
            )
            SELECT CAST(CASE WHEN u > 0 THEN 1 WHEN u < 0 THEN -1
                        ELSE 0 END AS BIGINT) AS sign,
                   CAST(length(bin(abs(u))) AS BIGINT) AS diff_bits,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM j GROUP BY 1, 2
        """,
        "linenumber_holes": """
            WITH per_order AS (
              SELECT l_orderkey, COUNT(*) AS n_lines,
                     MAX(l_linenumber) AS max_ln
              FROM lineitem GROUP BY 1
            )
            SELECT CAST(max_ln - n_lines AS BIGINT) AS slack,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM per_order GROUP BY 1
        """,
        "entry_exit_matrix": """
            WITH r AS (
              SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS rf,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rl
              FROM events
            ),
            fl AS (
              SELECT f.user_id, f.event_type AS first_type,
                     l.event_type AS last_type
              FROM r f JOIN r l ON l.user_id = f.user_id
              WHERE f.rf = 1 AND l.rl = 1
            )
            SELECT first_type, last_type,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM fl GROUP BY 1, 2
        """,
        "type_cooccurrence": """
            WITH t AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day, event_type
              FROM events
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_user_days
            FROM t a JOIN t b
              ON b.user_id = a.user_id AND b.day = a.day
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "label_norm_profile": """
            WITH comp AS (
              SELECT vec_id, label,
                     CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                          AS BIGINT) AS nx
              FROM embeddings
            ),
            per AS (
              SELECT label, SUM(nx * nx) AS nsq
              FROM comp GROUP BY vec_id, label
            )
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   CAST(SUM(nsq) AS DOUBLE) AS sum_norm_sq,
                   CAST(MIN(nsq) AS BIGINT) AS min_norm_sq,
                   CAST(MAX(nsq) AS BIGINT) AS max_norm_sq
            FROM per GROUP BY 1
        """,
        "trailing_revenue_range": """
            WITH cn AS (
              SELECT c_custkey, n_name AS nation
              FROM customer JOIN nation ON n_nationkey = c_nationkey
            ),
            daily AS (
              SELECT nation,
                     date_diff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS day,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
              FROM orders JOIN cn ON c_custkey = o_custkey
              GROUP BY 1, 2
            )
            SELECT nation, CAST(day AS BIGINT) AS day,
                   CAST(rev_dec AS DOUBLE) AS revenue,
                   CAST(SUM(rev_dec) OVER (PARTITION BY nation ORDER BY day
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                        AS DOUBLE) AS trail7_revenue,
                   CAST(LEAD(rev_dec) OVER (PARTITION BY nation ORDER BY day)
                        AS DOUBLE) AS next_revenue
            FROM daily
        """,
        "balance_quartile_mix": """
            WITH tagged AS (
              SELECT n_name AS nation, c_custkey,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer JOIN nation ON n_nationkey = c_nationkey
            ),
            tiled AS (
              SELECT nation, cents,
                     NTILE(4) OVER (PARTITION BY nation
                       ORDER BY cents, c_custkey) AS quartile
              FROM tagged
            )
            SELECT nation, CAST(quartile AS BIGINT) AS quartile,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM tiled GROUP BY 1, 2
        """,
        "sales_grouping_sets": """
            WITH base AS (
              SELECT c_mktsegment AS segment,
                     year(o_orderdate) AS yr,
                     CAST(o_totalprice AS DECIMAL(18,2)) AS p
              FROM orders JOIN customer ON c_custkey = o_custkey
            ),
            g AS (
              SELECT segment, yr, COUNT(*) AS n_orders, SUM(p) AS rev,
                     GROUPING(segment) AS gs, GROUPING(yr) AS gy
              FROM base
              GROUP BY GROUPING SETS ((segment, yr), (segment), (yr), ())
            )
            SELECT CASE WHEN gs = 1 THEN 'ALL' ELSE segment END AS segment,
                   CAST(CASE WHEN gy = 1 THEN 0 ELSE yr END AS BIGINT)
                     AS "year",
                   CAST(n_orders AS BIGINT) AS n_orders,
                   CAST(rev AS DOUBLE) AS revenue
            FROM g
        """,
        "nation_quarter_extremes": """
            WITH cn AS (
              SELECT c_custkey, n_name AS nation
              FROM customer JOIN nation ON n_nationkey = c_nationkey
            ),
            q AS (
              SELECT nation,
                     year(o_orderdate) * 10 + quarter(o_orderdate) AS quarter,
                     SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
              FROM orders JOIN cn ON c_custkey = o_custkey
              GROUP BY 1, 2
            ),
            wf AS (
              SELECT nation,
                     COUNT(*) OVER w AS n_quarters,
                     FIRST_VALUE(rev_dec) OVER w AS f,
                     NTH_VALUE(rev_dec, 2) OVER w AS s,
                     LAST_VALUE(rev_dec) OVER w AS l
              FROM q
              WINDOW w AS (PARTITION BY nation ORDER BY quarter
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            )
            SELECT DISTINCT nation, CAST(n_quarters AS BIGINT) AS n_quarters,
                   CAST(f AS DOUBLE) AS first_rev,
                   CAST(s AS DOUBLE) AS second_rev,
                   CAST(l AS DOUBLE) AS last_rev
            FROM wf
        """,
        "part_metrics_long": """
            WITH lf AS (
              SELECT 'size' AS metric, CAST(p_size AS BIGINT) AS v FROM part
              UNION ALL
              SELECT 'retail_cents',
                     CAST(round(p_retailprice * 100) AS BIGINT) FROM part
            )
            SELECT metric, CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(v) AS BIGINT) AS total,
                   CAST(MIN(v) AS BIGINT) AS min_v,
                   CAST(MAX(v) AS BIGINT) AS max_v
            FROM lf GROUP BY 1
        """,
        "nation_segment_signature": """
            SELECT n_name AS nation,
                   CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
                   string_agg(DISTINCT c_mktsegment, ','
                              ORDER BY c_mktsegment) AS signature
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            GROUP BY 1
        """,
        "token_class_mix": """
            WITH toks AS (
              SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents
            ),
            c AS (
              SELECT source,
                     CASE WHEN regexp_full_match(tok, '[0-9]+') THEN 'digit'
                          WHEN regexp_full_match(tok, '[A-Za-z]+') THEN 'alpha'
                          WHEN regexp_full_match(tok, '[A-Za-z0-9]+')
                            THEN 'mixed'
                          ELSE 'other' END AS cls
              FROM toks
            )
            SELECT source,
                   CAST(SUM(CASE WHEN cls = 'digit' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_digit,
                   CAST(SUM(CASE WHEN cls = 'alpha' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_alpha,
                   CAST(SUM(CASE WHEN cls = 'mixed' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_mixed,
                   CAST(SUM(CASE WHEN cls = 'other' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_other
            FROM c GROUP BY 1
        """,
        "activity_span_hist": """
            WITH per_user AS (
              SELECT user_id,
                     MAX(epoch_us(ts) // 86400000000)
                       - MIN(epoch_us(ts) // 86400000000) AS span_days
              FROM events GROUP BY 1
            )
            SELECT CAST(span_days AS BIGINT) AS span_days,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM per_user GROUP BY 1
        """,
        "charclass_profile": r"""
            WITH c AS (
              SELECT lang, length(text) AS n,
                     length(text) - length(regexp_replace(
                       text, '[A-Za-z]', '', 'g')) AS a,
                     length(text) - length(regexp_replace(
                       text, '[0-9]', '', 'g')) AS d,
                     length(text) - length(regexp_replace(
                       text, '[ \t\n\r\f]', '', 'g')) AS s
              FROM documents
            )
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n) AS BIGINT) AS n_chars,
                   CAST(SUM(a) AS BIGINT) AS n_alpha,
                   CAST(SUM(d) AS BIGINT) AS n_digit,
                   CAST(SUM(s) AS BIGINT) AS n_space,
                   CAST(SUM(n - a - d - s) AS BIGINT) AS n_other
            FROM c GROUP BY 1
        """,
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
        "parent_map": graph_sql(
            "SELECT dst AS id, src AS parent FROM og_edges"
        ),
        "induced_subgraph_edges": graph_sql(
            f"""
            SELECT src, dst, action_type, cost FROM og_edges
            WHERE src < {tpch_graph.CUSTOMER_OFFSET}
              AND dst < {tpch_graph.CUSTOMER_OFFSET}
            """
        ),
        "subgraph_init": graph_sql(
            f"""
            , sub_ids AS (SELECT id FROM og_vertices
                          WHERE id < {tpch_graph.CUSTOMER_OFFSET}),
            sub_edges AS (
              SELECT src, dst FROM og_edges
              WHERE src < {tpch_graph.CUSTOMER_OFFSET}
                AND dst < {tpch_graph.CUSTOMER_OFFSET})
            SELECT CAST(COALESCE(
              (SELECT MIN(id) FROM sub_ids
               WHERE id NOT IN (SELECT dst FROM sub_edges)),
              (SELECT MIN(id) FROM sub_ids)) AS BIGINT) AS init_id
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
        "simrank_round1_bucketed_wide": graph_sql(
            ", "
            + SR_BASE_CTES.strip()
            + ","
            + _sr_round_ctes(1, "sr_init", bucketed=True, bucket_mod=8)
            + " SELECT pg_id, og_id, score FROM sr_1"
        ),
        "simrank_round2": _sr_sql(
            "SELECT pg_id, og_id, score FROM sr_2",
            rounds=1,
            best=True,
            pruned_round=True,
        ),
        "simrank_fixpoint": _sr_sql(
            "SELECT pg_id, og_id, score FROM sr_3", rounds=3, bucketed=True
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
              AND v.id NOT IN (SELECT pg_id FROM best)
            """,
            rounds=1,
            best=True,
        ),
        "triangle_counts": _triangles_sql(),
        "connected_components": _components_sql(),
        "pagerank": _pagerank_sql(iters=4),
        "bfs_distances": _bfs_sql(),
        "graph_diameter": _diameter_sql(),
        "kcore": _kcore_sql(k=3, rounds=16),
        "sssp": _sssp_sql(rounds=10),
        "pagerank_personalized": _ppr_sql(iters=4),
        "clustering_coefficient": _clustering_sql(),
        "label_propagation": _label_propagation_sql(rounds=3),
        "link_prediction": _link_prediction_sql(k=100, max_center_degree=64),
        "degree_histogram": _degree_histogram_sql(),
        "hits": _hits_sql(rounds=2),
        "reciprocity": _reciprocity_sql(),
        "assortativity": _assortativity_sql(),
        "orders_scd2": """
            WITH feed AS (
              SELECT o_orderkey, o_totalprice, o_orderstatus, 0 AS v
              FROM orders
              UNION ALL
              SELECT o_orderkey, o_totalprice * 2, o_orderstatus, 1
              FROM orders WHERE o_orderkey % 7 = 0
              UNION ALL
              SELECT o_orderkey, o_totalprice, o_orderstatus, 2
              FROM orders WHERE o_orderkey % 13 = 0
            )
            SELECT o_orderkey, o_totalprice, o_orderstatus,
                   CAST(v AS BIGINT) AS valid_from,
                   CAST(LEAD(v) OVER (PARTITION BY o_orderkey ORDER BY v)
                        AS BIGINT) AS valid_to,
                   (LEAD(v) OVER (PARTITION BY o_orderkey ORDER BY v) IS NULL
                    AND NOT (v = 2)) AS is_current
            FROM feed
        """,
        "session_quantiles": doc_oracles.session_quantiles_sql(),
        "language_mix": """
            WITH per AS (
              SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY source, lang
            ),
            tot AS (SELECT source, SUM(n_docs) AS total FROM per GROUP BY source)
            SELECT p.source, p.lang, p.n_docs,
                   CAST((p.n_docs * 1000000) // t.total AS BIGINT) AS share_ppm
            FROM per p JOIN tot t ON t.source = p.source
        """,
        "user_ltv": """
            WITH ev AS (
              SELECT event_id, user_id, epoch_us(ts) AS tus,
                     CAST(value AS DECIMAL(18,6)) AS v
              FROM events WHERE event_type = 'purchase'
            )
            SELECT event_id, user_id, tus,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n_so_far,
                   CAST(SUM(v) OVER w AS DOUBLE) AS cum_value
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "knn_graph": doc_oracles.knn_graph_sql(k=5, sample_mod=10),
        "scc": _scc_sql(),
        "mis": _mis_sql(rounds=6),
        "closeness": _closeness_sql(n_seeds=4),
        "path_counts": _path_counts_sql(levels=8),
        "pagerank_weighted": _pagerank_weighted_sql(iters=4),
        "hub_attack": _hub_attack_sql(n_remove=10),
        "motif_counts": _motif_sql(),
        "ktruss": _ktruss_sql(k=3, rounds=5),
        "active_users": """
            WITH days AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ),
            observed AS (SELECT DISTINCT day FROM days),
            dau AS (
              SELECT day, COUNT(DISTINCT user_id) AS dau
              FROM days GROUP BY day
            ),
            wau AS (
              SELECT f.day, COUNT(DISTINCT f.user_id) AS wau FROM (
                SELECT d.user_id, d.day + i.i AS day
                FROM days d, (SELECT unnest(range(7)) AS i) i
              ) f JOIN observed o ON o.day = f.day
              GROUP BY f.day
            ),
            mau AS (
              SELECT f.day, COUNT(DISTINCT f.user_id) AS mau FROM (
                SELECT d.user_id, d.day + i.i AS day
                FROM days d, (SELECT unnest(range(28)) AS i) i
              ) f JOIN observed o ON o.day = f.day
              GROUP BY f.day
            )
            SELECT CAST(d.day AS BIGINT) AS day,
                   CAST(d.dau AS BIGINT) AS dau,
                   CAST(w.wau AS BIGINT) AS wau,
                   CAST(m.mau AS BIGINT) AS mau
            FROM dau d JOIN wau w ON w.day = d.day JOIN mau m ON m.day = d.day
        """,
        "interarrival_quantiles": """
            WITH ev AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
            ),
            gaps AS (
              SELECT user_id, event_id,
                     tus - LAG(tus) OVER (
                       PARTITION BY user_id ORDER BY tus, event_id) AS gap
              FROM ev
            ),
            g AS (SELECT * FROM gaps WHERE gap IS NOT NULL),
            r AS (
              SELECT *, ROW_NUMBER() OVER (
                       ORDER BY gap, user_id, event_id) AS rn,
                     COUNT(*) OVER () AS cnt
              FROM g
            )
            SELECT q.p_label, CAST(r.cnt AS BIGINT) AS n_gaps,
                   CAST(r.gap AS BIGINT) AS q_gap_us
            FROM r, (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
                 AS q(p_label, num, den)
            WHERE r.rn - 1 = (r.cnt - 1) * q.num // q.den
        """,
        "events_zorder": f"""
            WITH ev AS (
              SELECT event_id, user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            )
            SELECT event_id, user_id, CAST(day AS BIGINT) AS day,
                   CAST({morton2_sql("user_id", "day")} AS BIGINT) AS zorder
            FROM ev
        """,
        "embedding_covariance": """
            WITH comp AS (
              SELECT vec_id, unnest(range(len(embedding))) AS j,
                     CAST(CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000000) AS BIGINT) * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9)) AS x
              FROM embeddings
            ),
            marg AS (SELECT j, SUM(x) AS s FROM comp GROUP BY j),
            pairs AS (
              SELECT a.j, b.j AS l, COUNT(*) AS n_vecs,
                     SUM(a.x * b.x) AS sxy
              FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.j <= b.j
              GROUP BY a.j, b.j
            )
            SELECT CAST(p.j AS BIGINT) AS j, CAST(p.l AS BIGINT) AS l,
                   CAST(p.n_vecs AS BIGINT) AS n_vecs,
                   ROUND(CAST(mj.s AS DOUBLE), 6) AS sum_xj,
                   ROUND(CAST(ml.s AS DOUBLE), 6) AS sum_xl,
                   ROUND(CAST(p.sxy AS DOUBLE), 6) AS sum_xjxl
            FROM pairs p
            JOIN marg mj ON mj.j = p.j
            JOIN marg ml ON ml.j = p.l
        """,
        "sketch_audit_distinct": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                   ABS(approx_count_distinct(user_id)
                       - COUNT(DISTINCT user_id)) * 1000000
                     <= 150000 * COUNT(DISTINCT user_id) AS sketch_ok
            FROM events GROUP BY event_type
        """,
        "sketch_audit_quantile": """
            WITH t AS (
              SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            r AS (
              SELECT *, ROW_NUMBER() OVER (ORDER BY n_tokens, doc_id) AS rn,
                     COUNT(*) OVER () AS cnt
              FROM t
            ),
            exact AS (
              SELECT q.p_label, CAST(r.cnt AS BIGINT) AS n_docs,
                     r.n_tokens AS exact_value, q.p
              FROM r, (VALUES ('p50', 1, 2, 0.5), ('p90', 9, 10, 0.9))
                   AS q(p_label, num, den, p)
              WHERE r.rn - 1 = (r.cnt - 1) * q.num // q.den
            ),
            approx AS (
              SELECT 'p50' AS p_label,
                     CAST(approx_quantile(n_tokens, 0.5) AS BIGINT) AS av
              FROM t
              UNION ALL
              SELECT 'p90',
                     CAST(approx_quantile(n_tokens, 0.9) AS BIGINT)
              FROM t
            )
            SELECT e.p_label, e.n_docs, e.exact_value,
                   ABS(a.av - e.exact_value) * 1000000
                     <= 100000 * e.exact_value AS sketch_ok
            FROM exact e JOIN approx a ON a.p_label = e.p_label
        """,
        "dedup_prefix_containment": doc_oracles.prefix_containment_sql(32),
        "length_matched_resample": doc_oracles.length_matched_resample_sql(
            bucket_width=128, n_buckets=8, seed=13
        ),
        "rp_project": doc_oracles.rp_project_sql(out_dims=8),
        "bloom_pruned_join": """
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_qty
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag
        """,
        "ngram_novelty": doc_oracles.ngram_novelty_sql(n=3),
        "bpe_merges": doc_oracles.bpe_merges_sql(rounds=4),
        "orders_point_in_time": """
            WITH feed AS (
              SELECT o_orderkey, o_totalprice, o_orderstatus, 0 AS v
              FROM orders
              UNION ALL
              SELECT o_orderkey, o_totalprice * 2, o_orderstatus, 1
              FROM orders WHERE o_orderkey % 7 = 0
              UNION ALL
              SELECT o_orderkey, o_totalprice, o_orderstatus, 2
              FROM orders WHERE o_orderkey % 13 = 0
            ),
            hist AS (
              SELECT o_orderkey, o_totalprice, o_orderstatus,
                     CAST(v AS BIGINT) AS valid_from,
                     CAST(LEAD(v) OVER (PARTITION BY o_orderkey ORDER BY v)
                          AS BIGINT) AS valid_to
              FROM feed
            )
            SELECT o_orderkey, o_totalprice, o_orderstatus, valid_from
            FROM hist
            WHERE valid_from <= 1 AND (valid_to IS NULL OR valid_to > 1)
        """,
        "condensation": _condensation_sql(),
        "neighborhood_features": _neighborhood_features_sql(),
        "attributed_purchases": """
            SELECT p.user_id, p.event_id AS purchase_id,
                   c.event_id AS click_id, p.value
            FROM events p
            JOIN events c
              ON c.user_id = p.user_id
             AND c.event_type = 'click'
             AND epoch_us(c.ts) <= epoch_us(p.ts)
             AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
            WHERE p.event_type = 'purchase'
        """,
        "vocab_growth": """
            WITH toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents
            ),
            per AS (
              SELECT tok,
                     SUM(CASE WHEN doc_id < 100 THEN 1 ELSE 0 END) AS o100,
                     SUM(CASE WHEN doc_id < 500 THEN 1 ELSE 0 END) AS o500,
                     SUM(CASE WHEN doc_id < 2000 THEN 1 ELSE 0 END) AS o2000,
                     SUM(CASE WHEN doc_id < 10000 THEN 1 ELSE 0 END) AS o10000
              FROM toks GROUP BY tok
            )
            SELECT CAST(c AS BIGINT) AS n_docs,
                   CAST(v AS BIGINT) AS vocab_size,
                   CAST(h AS BIGINT) AS n_hapax
            FROM (
              SELECT 100 AS c, SUM(CASE WHEN o100 > 0 THEN 1 ELSE 0 END) v,
                     SUM(CASE WHEN o100 = 1 THEN 1 ELSE 0 END) h FROM per
              UNION ALL
              SELECT 500, SUM(CASE WHEN o500 > 0 THEN 1 ELSE 0 END),
                     SUM(CASE WHEN o500 = 1 THEN 1 ELSE 0 END) FROM per
              UNION ALL
              SELECT 2000, SUM(CASE WHEN o2000 > 0 THEN 1 ELSE 0 END),
                     SUM(CASE WHEN o2000 = 1 THEN 1 ELSE 0 END) FROM per
              UNION ALL
              SELECT 10000, SUM(CASE WHEN o10000 > 0 THEN 1 ELSE 0 END),
                     SUM(CASE WHEN o10000 = 1 THEN 1 ELSE 0 END) FROM per
            )
        """,
        "knn_label_prop": doc_oracles.knn_label_prop_sql(k=5, rounds=2, known_mod=3, sample_mod=2),
        "user_sequences": """
            WITH seqs AS (
              SELECT user_id,
                     list(event_type ORDER BY epoch_us(ts), event_id) AS s
              FROM events GROUP BY user_id
            )
            SELECT user_id, array_to_string(s[1:50], ' ') AS seq,
                   CAST(LEAST(len(s), 50) AS BIGINT) AS n_events
            FROM seqs
        """,
        "forecast_revenue": """
            SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_discount AS DECIMAL(18,2))
                       AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "returned_items": """
            WITH rev AS (
              SELECT c.c_custkey, c.c_name,
                     SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2))
                            - CAST(l.l_discount AS DECIMAL(18,2)))
                         AS DECIMAL(28,4))) AS rev_dec,
                     CAST(COUNT(*) AS BIGINT) AS n_items
              FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey
              JOIN customer c ON c.c_custkey = o.o_custkey
              WHERE l.l_returnflag = 'R'
              GROUP BY c.c_custkey, c.c_name
            )
            SELECT c_custkey, c_name,
                   CAST(rev_dec AS DOUBLE) AS revenue, n_items
            FROM rev ORDER BY rev_dec DESC, c_custkey ASC LIMIT 20
        """,
        "churned_users": """
            WITH d AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ),
            rng AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
            lab AS (SELECT d.user_id, d.day,
                           r.lo + (r.hi - r.lo) * 19 // 20 AS cut
                    FROM d, rng r),
            after AS (SELECT DISTINCT user_id FROM lab WHERE day > cut)
            SELECT b.user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_days_before,
                   CAST(MAX(b.day) AS BIGINT) AS last_day_before
            FROM lab b
            WHERE b.day <= b.cut
              AND b.user_id NOT IN (SELECT user_id FROM after)
            GROUP BY b.user_id
        """,
        "snapshot_diff": """
            SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                   'removed' AS change
            FROM orders WHERE o_orderkey % 13 = 0
            UNION ALL
            SELECT CAST(o_orderkey AS BIGINT), 'changed'
            FROM orders WHERE o_orderkey % 13 <> 0 AND o_orderkey % 7 = 0
            UNION ALL
            SELECT CAST(o_orderkey + 1000000000 AS BIGINT), 'added'
            FROM orders WHERE o_orderkey % 17 = 0
        """,
        "k_anonymity": """
            SELECT lang, source,
                   CAST(n_chars // 100 AS BIGINT) AS len_bucket,
                   CAST(COUNT(*) AS BIGINT) AS group_size
            FROM documents
            GROUP BY lang, source, n_chars // 100
            HAVING COUNT(*) < 3
        """,
        "type_projection": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
            capped AS (
              SELECT user_id FROM ut GROUP BY user_id HAVING COUNT(*) <= 64
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_shared_users
            FROM ut a
            JOIN ut b ON a.user_id = b.user_id
            JOIN capped c ON c.user_id = a.user_id
            WHERE a.event_type < b.event_type
            GROUP BY a.event_type, b.event_type
        """,
        "source_overlap": doc_oracles.source_overlap_sql(),
        "grid_clusters": doc_oracles.grid_clusters_sql(bits=6),
        "quality_filter": doc_oracles.quality_percentile_sql(num=1, den=2),
        "dedup_sorted_neighborhood": """
            WITH toks AS (
              SELECT doc_id, substr(text, 1, 8) AS blk,
                     substr(text, 1, 32) AS srt,
                     list_sort(list_distinct(string_split(text, ' '))) AS tok
              FROM documents
            ),
            adj AS (
              SELECT doc_id, tok,
                     LAG(doc_id) OVER w AS prev_id,
                     LAG(tok) OVER w AS prev_tok
              FROM toks WINDOW w AS (PARTITION BY blk ORDER BY srt, doc_id)
            ),
            p AS (
              SELECT LEAST(prev_id, doc_id) AS doc_a,
                     GREATEST(prev_id, doc_id) AS doc_b,
                     CAST(len(list_intersect(tok, prev_tok)) AS BIGINT) AS c,
                     CAST(len(tok) + len(prev_tok)
                          - len(list_intersect(tok, prev_tok)) AS BIGINT) AS u
              FROM adj WHERE prev_id IS NOT NULL
            )
            SELECT doc_a, doc_b, c * 1000000 // u AS jaccard_ppm
            FROM p WHERE c * 1000000 // u >= 300000
        """,
        "priority_sample": f"""
            WITH h AS (
              SELECT doc_id, n_chars,
                     {hash56_sql("CAST(doc_id AS VARCHAR)", seed=7)}
                       % 281474976710656 AS h48
              FROM documents
            )
            SELECT doc_id, n_chars
            FROM h
            ORDER BY (CAST(h48 AS DOUBLE) / 281474976710656.0)
                       / (CAST(n_chars AS DOUBLE) + 1.0) ASC,
                     doc_id ASC
            LIMIT 50
        """,
        "props_stats": """
            WITH e AS (
              SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(k) AS BIGINT) AS n_with_prop,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MIN(k) AS BIGINT) AS min_k,
                   CAST(MAX(k) AS BIGINT) AS max_k,
                   CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
            FROM e GROUP BY event_type
        """,
        "props_histogram": """
            WITH e AS (
              SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events
            )
            SELECT event_type, k // 10 AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM e WHERE k IS NOT NULL
            GROUP BY event_type, k // 10
        """,
        "type_affinity": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "stratified_priority_sample": f"""
            WITH h AS (
              SELECT lang, doc_id, n_chars,
                     {hash56_sql("CAST(doc_id AS VARCHAR)", seed=7)}
                       % 281474976710656 AS h48
              FROM documents
            ),
            r AS (
              SELECT lang, doc_id, n_chars,
                     ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY (CAST(h48 AS DOUBLE) / 281474976710656.0)
                                  / (CAST(n_chars AS DOUBLE) + 1.0) ASC,
                                doc_id ASC) AS rk
              FROM h
            )
            SELECT lang, doc_id, n_chars FROM r WHERE rk <= 20
        """,
        "lexical_diversity": """
            WITH t AS (
              SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents
            ),
            g AS (
              SELECT source,
                     CAST(COUNT(*) AS BIGINT) AS n_tokens,
                     CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
              FROM t GROUP BY source
            )
            SELECT source, n_tokens, n_types,
                   n_types * 1000000 // n_tokens AS ttr_ppm
            FROM g
        """,
        "value_drift": """
            WITH e AS (
              SELECT epoch_us(ts) AS tus,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events WHERE value IS NOT NULL
            ),
            s AS (
              SELECT MIN(tus) AS t_lo, MAX(tus) AS t_hi,
                     MIN(cents) AS c_lo, MAX(cents) AS c_hi
              FROM e
            ),
            b AS (
              SELECT CASE WHEN tus <= (t_lo + t_hi) // 2
                          THEN 0 ELSE 1 END AS half,
                     LEAST((cents - c_lo) * 20 // (c_hi - c_lo + 1), 19)
                       AS bucket
              FROM e, s
            ),
            c AS (
              SELECT bucket,
                     CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_first,
                     CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_second
              FROM b GROUP BY bucket
            ),
            t AS (
              SELECT CAST(SUM(n_first) AS BIGINT) AS t_first,
                     CAST(SUM(n_second) AS BIGINT) AS t_second
              FROM c
            )
            SELECT CAST(bucket AS BIGINT) AS bucket, n_first, n_second,
                   CAST(n_first * 1000000 // t_first AS BIGINT)
                     AS share_first_ppm,
                   CAST(n_second * 1000000 // t_second AS BIGINT)
                     AS share_second_ppm,
                   CAST(ABS(n_first * 1000000 // t_first
                            - n_second * 1000000 // t_second) AS BIGINT)
                     AS abs_diff_ppm
            FROM c, t
        """,
        "key_skew_profile": """
            WITH c AS (
              SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
              FROM events GROUP BY user_id
            ),
            t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total FROM c),
            top AS (
              SELECT * FROM c ORDER BY n_rows DESC, user_id ASC LIMIT 20
            )
            SELECT CAST(ROW_NUMBER() OVER (
                     ORDER BY n_rows DESC, user_id ASC) AS BIGINT)
                     AS heavy_rank,
                   user_id, n_rows,
                   CAST(n_rows * 1000000 // total AS BIGINT) AS share_ppm
            FROM top, t
        """,
        "type_purity": """
            WITH per AS (
              SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_t
              FROM events GROUP BY 1, 2
            ),
            g AS (
              SELECT user_id,
                     CAST(SUM(n_t) AS BIGINT) AS n_events,
                     CAST(SUM(n_t * n_t) AS BIGINT) AS sum_sq
              FROM per GROUP BY user_id
            )
            SELECT user_id, n_events,
                   CAST(sum_sq * 1000000 // (n_events * n_events) AS BIGINT)
                     AS hhi_ppm
            FROM g
        """,
        "embedding_coverage": """
            WITH ids AS (SELECT DISTINCT vec_id AS doc_id FROM embeddings)
            SELECT d.source, (i.doc_id IS NOT NULL) AS covered,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents d LEFT JOIN ids i USING (doc_id)
            GROUP BY 1, 2
        """,
        "length_outliers": """
            WITH t AS (
              SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            h AS (SELECT lang, n_tokens AS v, COUNT(*) AS hc
                  FROM t GROUP BY 1, 2),
            c AS (
              SELECT lang, v, hc,
                     SUM(hc) OVER (PARTITION BY lang ORDER BY v) AS cum,
                     SUM(hc) OVER (PARTITION BY lang) AS cnt
              FROM h
            ),
            med AS (
              SELECT lang, v AS med FROM c
              WHERE cum - hc <= (cnt - 1) // 2 AND (cnt - 1) // 2 < cum
            ),
            d AS (
              SELECT t.lang, ABS(t.n_tokens - med.med) AS adev
              FROM t JOIN med USING (lang)
            ),
            hd AS (SELECT lang, adev AS v, COUNT(*) AS hc
                   FROM d GROUP BY 1, 2),
            cd AS (
              SELECT lang, v, hc,
                     SUM(hc) OVER (PARTITION BY lang ORDER BY v) AS cum,
                     SUM(hc) OVER (PARTITION BY lang) AS cnt
              FROM hd
            ),
            mad AS (
              SELECT lang, v AS mad FROM cd
              WHERE cum - hc <= (cnt - 1) // 2 AND (cnt - 1) // 2 < cum
            )
            SELECT t.doc_id, t.lang, t.n_tokens,
                   CAST(med.med AS BIGINT) AS median_tokens,
                   CAST(mad.mad AS BIGINT) AS mad_tokens
            FROM t JOIN med USING (lang) JOIN mad USING (lang)
            WHERE ABS(t.n_tokens - med.med) > 2 * mad.mad
        """,
        "length_cdf": """
            WITH h AS (
              SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1
            ),
            c AS (
              SELECT n_chars,
                     SUM(c) OVER (ORDER BY n_chars) AS cum,
                     SUM(c) OVER () AS total
              FROM h
            )
            SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
                   CAST(cum * 1000000 // total AS BIGINT) AS cdf_ppm
            FROM documents d JOIN c USING (n_chars)
        """,
        "time_profile": """
            WITH b AS (
              SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                     (epoch_us(ts) // 3600000000) % 24 AS hod
              FROM events
            ),
            g AS (
              SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n_events
              FROM b GROUP BY 1, 2
            ),
            t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM g)
            SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
                   n_events,
                   CAST(n_events * 1000000 // total AS BIGINT) AS share_ppm
            FROM g, t
        """,
        "recent_events": """
            WITH e AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
              FROM events
            ),
            r AS (
              SELECT user_id, event_id, event_type, tus,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id
                       ORDER BY tus DESC, event_id DESC) AS rn
              FROM e
            )
            SELECT user_id, CAST(rn AS BIGINT) AS recency_rank, event_id,
                   CAST(tus AS BIGINT) AS tus, event_type
            FROM r WHERE rn <= 3
        """,
        "dup_rate_by_source": """
            WITH g AS (
              SELECT source,
                     CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(COUNT(DISTINCT md5(text)) AS BIGINT)
                       AS n_distinct_texts
              FROM documents GROUP BY source
            )
            SELECT source, n_docs, n_distinct_texts,
                   n_docs - n_distinct_texts AS n_dup_rows,
                   (n_docs - n_distinct_texts) * 1000000 // n_docs AS dup_ppm
            FROM g
        """,
        "token_mad": """
            WITH t AS (
              SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            r AS (
              SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY lang) AS cnt
              FROM t
            ),
            med AS (
              SELECT lang, cnt AS n_docs, n_tokens AS med
              FROM r WHERE rn - 1 = (cnt - 1) // 2
            ),
            dev AS (
              SELECT t.lang, t.doc_id, m.n_docs, m.med,
                     ABS(t.n_tokens - m.med) AS adev
              FROM t JOIN med m ON m.lang = t.lang
            ),
            dr AS (
              SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY adev, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY lang) AS cnt2
              FROM dev
            )
            SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(med AS BIGINT) AS median_tokens,
                   CAST(adev AS BIGINT) AS mad_tokens
            FROM dr WHERE rn - 1 = (cnt2 - 1) // 2
        """,
        "events_retention": """
            WITH days AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS day
              FROM events
            ),
            first AS (
              SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
            )
            SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
                   CAST(d.day - f.cohort_day AS BIGINT) AS day_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM days d JOIN first f ON f.user_id = d.user_id
            GROUP BY f.cohort_day, d.day - f.cohort_day
        """,
        "events_topk_window": """
            WITH counts AS (
              SELECT epoch_us(ts) // 3600000000 AS hour, event_type,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2
            ),
            ranked AS (
              SELECT hour, event_type, n,
                     ROW_NUMBER() OVER (
                       PARTITION BY hour ORDER BY n DESC, event_type) AS rank
              FROM counts
            )
            SELECT CAST(hour AS BIGINT) AS hour, event_type,
                   CAST(n AS BIGINT) AS n_events,
                   CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 3
        """,
        "events_anomaly_days": """
            WITH daily AS (
              SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                     COUNT(*) AS c
              FROM events GROUP BY 1, 2
            ),
            m AS (
              SELECT user_id, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q
              FROM daily GROUP BY user_id
            )
            SELECT d.user_id, CAST(d.day AS BIGINT) AS day,
                   CAST(d.c AS BIGINT) AS n_events
            FROM daily d JOIN m ON m.user_id = d.user_id
            WHERE m.n >= 3
              AND (m.n * d.c - m.s) > 0
              AND (m.n * d.c - m.s) * (m.n * d.c - m.s)
                  > 4 * (m.n * m.q - m.s * m.s)
        """,
        "vocab_coverage": """
            WITH words AS (
              SELECT unnest(string_split(text, ' ')) AS token FROM documents
            ),
            top AS (
              SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occ
              FROM words GROUP BY token
              ORDER BY n_occ DESC, token LIMIT 200
            )
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, token)
                        AS BIGINT) AS rank,
                   token, n_occ,
                   CAST(SUM(n_occ) OVER (
                     ORDER BY n_occ DESC, token
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_occ
            FROM top
        """,
        "winsorize_lengths": """
            WITH hist AS (
              SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars
            ),
            cum AS (
              SELECT n_chars,
                     SUM(cnt) OVER (ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     SUM(cnt) OVER () AS total
              FROM hist
            ),
            cuts AS (
              SELECT
                MIN(CASE WHEN cum > (total - 1) * 1 // 20 THEN n_chars END)
                  AS lo_cut,
                MIN(CASE WHEN cum > (total - 1) * 19 // 20 THEN n_chars END)
                  AS hi_cut
              FROM cum
            )
            SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,
                   CAST(GREATEST(LEAST(d.n_chars, c.hi_cut), c.lo_cut)
                        AS BIGINT) AS n_chars_winsorized
            FROM documents d CROSS JOIN cuts c
        """,
        "term_cooccurrence": """
            WITH toks AS (
              SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS token
                FROM documents
              )
            ),
            top AS (
              SELECT token FROM (
                SELECT token, COUNT(*) AS df FROM toks GROUP BY token
                ORDER BY df DESC, token LIMIT 20
              )
            ),
            nar AS (
              SELECT t.doc_id, t.token FROM toks t
              JOIN top p ON p.token = t.token
            )
            SELECT a.token AS token_a, b.token AS token_b,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM nar a JOIN nar b
              ON a.doc_id = b.doc_id AND a.token < b.token
            GROUP BY a.token, b.token
            ORDER BY n_docs DESC, token_a, token_b
            LIMIT 100
        """,
        "temporal_split": """
            WITH ev AS (
              SELECT event_id, epoch_us(ts) // 86400000000 AS day FROM events
            ),
            days AS (SELECT DISTINCT day FROM ev),
            cum AS (
              SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rn,
                     COUNT(*) OVER () AS total
              FROM days
            ),
            cut AS (
              SELECT day AS cut_day FROM cum
              WHERE rn - 1 = (total - 1) * 4 // 5
            )
            SELECT e.event_id, CAST(e.day AS BIGINT) AS day,
                   CASE WHEN e.day < c.cut_day THEN 'train' ELSE 'eval' END
                     AS split
            FROM ev e CROSS JOIN cut c
        """,
        "neighbor_sample": graph_sql(
            f"""
            , uniq AS (SELECT DISTINCT src, dst FROM og_edges),
            ranked AS (
              SELECT src, dst, ROW_NUMBER() OVER (
                PARTITION BY src
                ORDER BY {hash56_sql("CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)", seed=5)} ASC,
                         dst ASC) AS rk
              FROM uniq
            )
            SELECT src, dst FROM ranked WHERE rk <= 3
            """
        ),
        "ego_batch": graph_sql(
            f"""
            , uniq AS (SELECT DISTINCT src, dst FROM og_edges),
            cap1 AS (
              SELECT src, dst FROM (
                SELECT src, dst, ROW_NUMBER() OVER (
                  PARTITION BY src
                  ORDER BY {hash56_sql("CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)", seed=6)} ASC,
                           dst ASC) AS rk
                FROM uniq) WHERE rk <= 3
            ),
            cap2 AS (
              SELECT src, dst FROM (
                SELECT src, dst, ROW_NUMBER() OVER (
                  PARTITION BY src
                  ORDER BY {hash56_sql("CAST(src AS VARCHAR) || ':' || CAST(dst AS VARCHAR)", seed=7)} ASC,
                           dst ASC) AS rk
                FROM uniq) WHERE rk <= 2
            ),
            seeds AS (SELECT id FROM og_vertices ORDER BY id LIMIT 8),
            layer1 AS (
              SELECT DISTINCT s.id AS seed_id, CAST(1 AS BIGINT) AS hop,
                     c.src, c.dst
              FROM seeds s JOIN cap1 c ON c.src = s.id
            ),
            front1 AS (SELECT DISTINCT seed_id, dst AS node FROM layer1),
            layer2 AS (
              SELECT DISTINCT f.seed_id, CAST(2 AS BIGINT) AS hop,
                     c.src, c.dst
              FROM front1 f JOIN cap2 c ON c.src = f.node
            )
            SELECT seed_id, hop, src, dst FROM layer1
            UNION ALL
            SELECT seed_id, hop, src, dst FROM layer2
            """
        ),
        "tfidf_top_terms": doc_oracles.tfidf_sql(k=5),
        "dedup_exact": doc_oracles.dedup_exact_sql(),
        "dedup_ngram_jaccard": doc_oracles.ngram_jaccard_sql(n=3, threshold=0.2),
        "dedup_minhash_lsh": doc_oracles.minhash_lsh_sql(n=3, threshold=0.2),
        "dedup_groups": doc_oracles.dup_groups_sql(
            doc_oracles.minhash_lsh_sql(n=3, threshold=0.2)
        ),
        "dedup_keep_best": doc_oracles.keep_best_sql(
            doc_oracles.minhash_lsh_sql(n=3, threshold=0.2)
        ),
        "dedup_incremental": """
            WITH seen AS (
              SELECT DISTINCT md5(text) AS h FROM documents
              WHERE doc_id % 5 = 0
            ),
            keyed AS (
              SELECT doc_id, md5(text) AS h FROM documents
              WHERE doc_id % 5 <> 0
            ),
            firsts AS (
              SELECT h, CAST(MIN(doc_id) AS BIGINT) AS doc_id
              FROM keyed GROUP BY h
            )
            SELECT doc_id, h FROM firsts
            WHERE h NOT IN (SELECT h FROM seen)
        """,
        "length_buckets": doc_oracles.length_buckets_sql(),
        "events_funnel": """
            WITH ev AS (
              SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
            ),
            u AS (SELECT DISTINCT user_id FROM ev),
            s0 AS (SELECT user_id, MIN(tus) AS t0 FROM ev
                   WHERE event_type = 'view' GROUP BY user_id),
            s1 AS (SELECT e.user_id, MIN(e.tus) AS t1
                   FROM ev e JOIN s0 ON e.user_id = s0.user_id
                   WHERE e.event_type = 'click' AND e.tus >= s0.t0
                   GROUP BY e.user_id),
            s2 AS (SELECT e.user_id, MIN(e.tus) AS t2
                   FROM ev e JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'purchase' AND e.tus >= s1.t1
                   GROUP BY e.user_id)
            SELECT u.user_id,
                   CAST(CAST(s0.user_id IS NOT NULL AS INT)
                      + CAST(s1.user_id IS NOT NULL AS INT)
                      + CAST(s2.user_id IS NOT NULL AS INT) AS BIGINT)
                     AS steps_completed,
                   CAST(s0.t0 AS BIGINT) AS t_first_us
            FROM u
            LEFT JOIN s0 ON u.user_id = s0.user_id
            LEFT JOIN s1 ON u.user_id = s1.user_id
            LEFT JOIN s2 ON u.user_id = s2.user_id
        """,
        "dedup_simhash": doc_oracles.simhash_sql(max_hamming=8),
        "dedup_embedding_cosine": doc_oracles.embedding_cosine_sql(threshold=0.4),
        "similarity_topk": doc_oracles.cosine_topk_sql(k=5, query_max_id=20),
        "similarity_ann_lsh_exact": doc_oracles.ann_lsh_topk_sql(
            k=5, query_max_id=20
        ),
        "corpus_clean": doc_oracles.clean_corpus_sql(quality_threshold=0.2),
        "doc_expectations": """
            WITH agg AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,"""
        + ",".join(
            f"""
                CAST(SUM(CASE WHEN NOT COALESCE({cond}, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS r_{name}"""
            for name, cond in [
                ("text_not_null", "text IS NOT NULL"),
                ("n_chars_positive", "n_chars > 0"),
                ("n_chars_consistent", "n_chars = length(text)"),
                ("lang_known", "lang IN ('de','en','es','fr','zh')"),
                ("text_min_tokens", "len(string_split(text, ' ')) >= 3"),
            ]
        )
        + """
              FROM documents
            )
            """
        + " UNION ALL ".join(
            f"""
            SELECT '{name}' AS rule, n AS n_rows, r_{name} AS n_violations,
                   r_{name} / n AS violation_rate FROM agg"""
            for name in [
                "text_not_null",
                "n_chars_positive",
                "n_chars_consistent",
                "lang_known",
                "text_min_tokens",
            ]
        ),
        "embedding_quantize": """
            WITH s AS (
              SELECT vec_id, embedding,
                     CAST(list_max(list_transform(embedding, x -> abs(x)))
                          AS DOUBLE) AS scale
              FROM embeddings
            )
            SELECT vec_id, scale,
                   CAST(unnest(range(len(embedding))) AS BIGINT) AS j,
                   CAST(unnest(list_transform(embedding,
                        x -> CASE WHEN scale = 0 THEN 0
                             ELSE floor(CAST(x AS DOUBLE) * 127 / scale) END))
                        AS BIGINT) AS q
            FROM s
        """,
        "corpus_prepare": doc_oracles.prepare_corpus_sql(
            quality_threshold=0.2,
            n=3,
            jaccard_threshold=0.2,
            weights=_MIX_WEIGHTS,
            default_rate=0.5,
            mix_seed=11,
            n_shards=4,
            shard_seed=3,
        ),
        "decontaminate": doc_oracles.decontaminate_sql(
            eval_frac=0.1, seed=7, n=3, min_overlap=2
        ),
        "repetition_stats": doc_oracles.repetition_stats_sql(),
        "pii_redaction": doc_oracles.pii_redaction_sql(),
        "doc_chunks": doc_oracles.doc_chunks_sql(max_tokens=64),
        "pack_documents": doc_oracles.pack_documents_sql(budget=512, n_buckets=8),
        "events_sessionized": doc_oracles.sessionize_sql(
            gap_us=30 * 60 * 1_000_000
        ),
        "sample_hash": doc_oracles.hash_sample_sql(rate=0.25, seed=7),
        "sample_stratified": doc_oracles.stratified_cap_sql("lang", cap=50, seed=7),
        "train_eval_split": doc_oracles.train_eval_split_sql(eval_frac=0.1, seed=7),
        "mixture_sample": doc_oracles.mixture_sample_sql(
            _MIX_WEIGHTS, "lang", default_rate=0.1, seed=11
        ),
        "corpus_shards": doc_oracles.shard_assignments_sql(n_shards=8, seed=3),
        "text_token_stats": doc_oracles.token_stats_sql(),
        "text_quality": doc_oracles.quality_sql(),
        "text_language_id": doc_oracles.language_id_sql(),
        "doc_fingerprints": doc_oracles.fingerprint_sql(n=5, keep=4),
        "events_windowed": """
            SELECT CAST(epoch_ns(ts) // 1000000000 // 3600 * 3600 AS BIGINT)
                     AS window_start_epoch,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "event_transitions": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
              FROM events
            ),
            lagged AS (
              SELECT event_type AS to_type,
                     LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY tus, event_id)
                       AS from_type
              FROM e
            )
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM lagged WHERE from_type IS NOT NULL
            GROUP BY from_type, to_type
        """,
        "events_sliding": """
            WITH e AS (
              SELECT event_type, value, epoch_us(ts) AS tus FROM events
            ),
            x AS (
              SELECT event_type, value,
                     ((tus // 900000000) - k) * 900 AS ws_epoch
              FROM e CROSS JOIN (SELECT unnest(range(4)) AS k)
              WHERE ((tus // 900000000) - k) * 900000000 + 3600000000 > tus
            )
            SELECT CAST(ws_epoch AS BIGINT) AS window_start_epoch,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_value
            FROM x GROUP BY 1, 2
        """,
        "events_rolling": """
            WITH e AS (
              SELECT event_id, user_id, epoch_us(ts) AS tus, value FROM events
            )
            SELECT event_id, user_id, CAST(tus AS BIGINT) AS tus,
                   CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                     AS sum_value,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                     / (COUNT(*) OVER w) AS avg_value
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "events_pivot": """
            SELECT user_id,"""
        + ",".join(
            f"""
                   CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)
                     AS n_{t},
                   CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,6)))
                     FILTER (WHERE event_type = '{t}'), 0) AS DOUBLE) AS v_{t}"""
            for t in ("click", "error", "purchase", "signup", "view")
        )
        + """
            FROM events GROUP BY user_id
        """,
        "events_asof": """
            WITH clicks AS (
              SELECT event_id, user_id, epoch_us(ts) AS tus
              FROM events WHERE event_type = 'click'
            ),
            views AS (
              SELECT user_id, epoch_us(ts) AS vtus,
                     MAX(event_id) AS view_event_id
              FROM events WHERE event_type = 'view'
              GROUP BY user_id, epoch_us(ts)
            )
            SELECT c.event_id, c.user_id, CAST(c.tus AS BIGINT) AS tus,
                   v.view_event_id,
                   CAST(v.vtus AS BIGINT) AS view_tus,
                   CAST(c.tus - v.vtus AS BIGINT) AS gap_us
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.tus >= v.vtus
        """,
        "top_ngrams": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            g AS (
              SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS gram
              FROM w, LATERAL (SELECT UNNEST(range(1, len(ws))) AS i)
            )
            SELECT gram,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_occ
            FROM g GROUP BY gram
            HAVING COUNT(DISTINCT doc_id) >= 2
            ORDER BY n_occ DESC, gram ASC
            LIMIT 50
        """,
        "embedding_centroids": """
            WITH comp AS (
              SELECT label, unnest(range(len(embedding))) AS j,
                     CAST(CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000000) AS BIGINT) * CAST(0.000000001 AS DECIMAL(10,9)) AS DECIMAL(18,9)) AS x
              FROM embeddings
            )
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(j AS BIGINT) AS j,
                   CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   CAST(SUM(x) AS DOUBLE) AS sum_x,
                   CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mean_x
            FROM comp GROUP BY label, j
        """,
        "events_range_join": """
            WITH e AS (
              SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
              FROM events
            ),
            clicks AS (
              SELECT event_id AS click_id, user_id, tus AS click_tus
              FROM e WHERE event_type = 'click'
            ),
            errors AS (
              SELECT event_id AS error_id, user_id, tus AS win_start,
                     tus + 14400000000 AS win_end
              FROM e WHERE event_type = 'error'
            )
            SELECT c.click_id, c.user_id,
                   CAST(c.click_tus AS BIGINT) AS click_tus,
                   r.error_id,
                   CAST(r.win_start AS BIGINT) AS win_start
            FROM clicks c JOIN errors r
              ON c.user_id = r.user_id
             AND c.click_tus >= r.win_start AND c.click_tus <= r.win_end
        """,
        "salted_supplier_revenue": """
            SELECT s_nationkey,
                   CAST(SUM(CAST(
                        CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey
        """,
        "events_cube": """
            WITH e AS (
              SELECT event_type,
                     CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day_bucket,
                     value
              FROM events
            )
            SELECT event_type, day_bucket,
                   CAST(GROUPING(event_type, day_bucket) AS BIGINT) AS gid,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM e GROUP BY ROLLUP (event_type, day_bucket)
        """,
        "token_quantiles": """
            WITH t AS (
              SELECT doc_id, lang,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            r AS (
              SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY lang) AS cnt
              FROM t
            )
            SELECT lang, q.p_label,
                   CAST(cnt AS BIGINT) AS n_docs,
                   n_tokens AS q_value
            FROM r, (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
                 AS q(p_label, num, den)
            WHERE rn - 1 = (cnt - 1) * q.num // q.den
        """,
        "orders_upsert": """
            WITH allrows AS (
              SELECT o_orderkey, o_totalprice, o_orderstatus,
                     0 AS v, FALSE AS del, 0 AS chg
              FROM orders
              UNION ALL
              SELECT o_orderkey, o_totalprice * 2, o_orderstatus,
                     1, FALSE, 1
              FROM orders WHERE o_orderkey % 7 = 0
              UNION ALL
              SELECT o_orderkey, o_totalprice, o_orderstatus, 2, TRUE, 1
              FROM orders WHERE o_orderkey % 13 = 0
            ),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey ORDER BY v DESC, chg DESC) AS rn
              FROM allrows
            )
            SELECT o_orderkey, o_totalprice, o_orderstatus,
                   CAST(v AS BIGINT) AS v
            FROM ranked WHERE rn = 1 AND NOT del
        """,
        "local_supplier_volume": """
            SELECT n_name,
                   CAST(SUM(CAST(
                        CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2))
                           - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "shipping_priority": f"""
            SELECT l_orderkey,
                   CAST(SUM(CAST(
                        CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_orderpriority
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '{_Q3_CUT}'
              AND l_shipdate > TIMESTAMP '{_Q3_CUT}'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_base_price,
                   CAST(SUM(CAST(
                        CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers_per_nation": """
            WITH rev AS (
              SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
              FROM orders GROUP BY o_custkey)
            SELECT n_name, c_custkey, CAST(rev_d AS DOUBLE) AS revenue,
                   CAST(rnk AS BIGINT) AS rnk
            FROM (
              SELECT n.n_name, c.c_custkey, r.rev_d, ROW_NUMBER() OVER (
                PARTITION BY n.n_name ORDER BY r.rev_d DESC, c.c_custkey ASC) AS rnk
              FROM rev r
              JOIN customer c ON r.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey)
            WHERE rnk <= 3
        """,
        "events_rollup": """
            SELECT event_type,
                   CAST(epoch_ns(ts) // 3600000000000 AS BIGINT) AS hour_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
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
        # -- round-12 registration: the pinned candidate twins, verbatim
        #    from tests/test_candidate_oracles.py ------------------------
        "pettitt_changepoint": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
              FROM orders GROUP BY 1
            ),
            h AS (SELECT cents, COUNT(*) AS cnt FROM daily GROUP BY 1),
            r2 AS (
              SELECT cents,
                     2 * COALESCE(SUM(cnt) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2
              FROM h
            ),
            ranked AS (
              SELECT d.day,
                     ROW_NUMBER() OVER (ORDER BY d.day) AS t,
                     SUM(r2.r2) OVER (ORDER BY d.day) AS w2,
                     COUNT(*) OVER () AS n
              FROM daily d JOIN r2 USING (cents)
            ),
            dev AS (
              SELECT day, n,
                     ABS(CAST(w2 AS HUGEINT) - CAST(t AS HUGEINT) * (n + 1))
                       AS u_abs
              FROM ranked WHERE t < n
            ),
            m AS (SELECT MAX(u_abs) AS mx FROM dev)
            SELECT CAST(MAX(n) AS BIGINT) AS n_days,
                   CAST(MAX(m.mx) AS BIGINT) AS max_abs_u,
                   CAST(MIN(day) AS BIGINT) AS at_day
            FROM dev JOIN m ON dev.u_abs = m.mx
        """,
        "seasonal_mann_kendall": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
              FROM orders GROUP BY 1
            ),
            md AS (
              SELECT month(DATE '1970-01-01' + CAST(day AS INTEGER)) AS moy,
                     day, cents
              FROM daily
            ),
            s AS (
              SELECT a.moy,
                     CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                   WHEN b.cents < a.cents THEN -1
                                   ELSE 0 END) AS BIGINT) AS s_stat
              FROM md a JOIN md b ON a.moy = b.moy AND b.day > a.day
              GROUP BY 1
            ),
            n AS (SELECT moy, CAST(COUNT(*) AS BIGINT) AS n_days
                  FROM md GROUP BY 1),
            t AS (
              SELECT moy,
                     CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                       AS tie_term
              FROM (SELECT moy, cents, COUNT(*) AS t FROM md GROUP BY 1, 2)
              GROUP BY 1
            )
            SELECT CAST(n.moy AS BIGINT) AS month_of_year, n.n_days,
                   CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat,
                   t.tie_term
            FROM n LEFT JOIN s ON s.moy = n.moy JOIN t ON t.moy = n.moy
        """,
        "trimmed_sum_census": """
            WITH h AS (
              SELECT l_returnflag AS returnflag,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM lineitem GROUP BY 1, 2
            ),
            c AS (
              SELECT returnflag, cents, cnt,
                     SUM(cnt) OVER (PARTITION BY returnflag
                                    ORDER BY cents) AS cum,
                     SUM(cnt) OVER (PARTITION BY returnflag) AS n
              FROM h
            ),
            b AS (
              SELECT returnflag, MAX(n) AS n,
                     MAX(CASE WHEN cum - cnt <= ((n-1) * 1) // 10
                               AND ((n-1) * 1) // 10 < cum
                              THEN cents END) AS lo_cents,
                     MAX(CASE WHEN cum - cnt <= ((n-1) * 9) // 10
                               AND ((n-1) * 9) // 10 < cum
                              THEN cents END) AS hi_cents
              FROM c
              WHERE (cum - cnt <= ((n-1) * 1) // 10
                     AND ((n-1) * 1) // 10 < cum)
                 OR (cum - cnt <= ((n-1) * 9) // 10
                     AND ((n-1) * 9) // 10 < cum)
              GROUP BY 1
            ),
            k AS (
              SELECT h.returnflag, SUM(h.cnt) AS kept_n,
                     SUM(h.cnt * h.cents) AS kept_sum
              FROM h JOIN b USING (returnflag)
              WHERE h.cents > b.lo_cents AND h.cents < b.hi_cents
              GROUP BY 1
            )
            SELECT b.returnflag,
                   CAST(b.n AS BIGINT) AS n,
                   CAST(b.lo_cents AS BIGINT) AS lo_cents,
                   CAST(b.hi_cents AS BIGINT) AS hi_cents,
                   CAST(COALESCE(k.kept_n, 0) AS BIGINT) AS kept_n,
                   CAST(COALESCE(k.kept_sum, 0) AS BIGINT)
                     AS kept_sum_cents
            FROM b LEFT JOIN k USING (returnflag)
        """,
        "measure_crossproducts": """
            WITH t AS (
              SELECT l_returnflag AS returnflag,
                     CAST(ROUND(l_quantity) AS BIGINT) AS q,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
                     CAST(ROUND(l_discount * 10000) AS BIGINT) AS d
              FROM lineitem
            )
            SELECT returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS sum_q,
                   CAST(SUM(p) AS BIGINT) AS sum_p,
                   CAST(SUM(d) AS BIGINT) AS sum_d,
                   CAST(SUM(CAST(p AS HUGEINT) * p) AS BIGINT) AS spp,
                   CAST(SUM(CAST(q AS HUGEINT) * q) AS BIGINT) AS sqq,
                   CAST(SUM(CAST(d AS HUGEINT) * d) AS BIGINT) AS sdd,
                   CAST(SUM(CAST(q AS HUGEINT) * p) AS BIGINT) AS sqp,
                   CAST(SUM(CAST(q AS HUGEINT) * d) AS BIGINT) AS sqd,
                   CAST(SUM(CAST(p AS HUGEINT) * d) AS BIGINT) AS spd
            FROM t GROUP BY 1
        """,
        "l_diversity_census": """
            WITH t AS (
              SELECT c_nationkey, c_mktsegment,
                     CAST(ROUND(c_acctbal / 1000) AS BIGINT) AS bal_band
              FROM customer
            ),
            cls AS (
              SELECT c_nationkey, c_mktsegment, COUNT(*) AS l
              FROM (SELECT DISTINCT c_nationkey, c_mktsegment, bal_band
                    FROM t)
              GROUP BY 1, 2
            ),
            sz AS (
              SELECT c_nationkey, c_mktsegment, COUNT(*) AS rows_
              FROM t GROUP BY 1, 2
            )
            SELECT CAST(cls.l AS BIGINT) AS l,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(sz.rows_) AS BIGINT) AS n_rows
            FROM cls JOIN sz USING (c_nationkey, c_mktsegment)
            GROUP BY 1
        """,
        "zipf_rank_freq": r"""
            WITH words AS (
              SELECT UNNEST(string_split_regex(lower(text), '\s+')) AS tok
              FROM documents
            ),
            vocab AS (
              SELECT tok, COUNT(*) AS freq FROM words
              WHERE tok <> '' GROUP BY 1
            ),
            fh AS (SELECT freq, COUNT(*) AS cnt FROM vocab GROUP BY 1),
            c AS (
              SELECT freq, cnt,
                     SUM(cnt) OVER (ORDER BY freq DESC) AS cum,
                     SUM(cnt) OVER () AS v
              FROM fh
            ),
            p AS (
              SELECT c.*, q.decile,
                     GREATEST(1, (v * q.decile) // 10) AS want
              FROM c, (SELECT UNNEST(range(0, 11)) AS decile) q
            )
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(want AS BIGINT) AS rank,
                   CAST(freq AS BIGINT) AS freq
            FROM p WHERE cum - cnt < want AND want <= cum
        """,
        "ivm_orders_rollup": """
            SELECT o_custkey AS key,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM orders GROUP BY 1
        """,
        "ivm_distinct_priorities": """
            SELECT o_custkey AS key,
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
                     AS n_distinct
            FROM orders GROUP BY 1
        """,
        "ivm_histogram_median": """
            WITH h AS (
              SELECT o_orderpriority AS key,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS w
              FROM orders GROUP BY 1, 2
            ),
            c AS (
              SELECT key, cents, w,
                     SUM(w) OVER (PARTITION BY key ORDER BY cents) AS cum,
                     SUM(w) OVER (PARTITION BY key) AS n
              FROM h
            )
            SELECT key, CAST(n AS BIGINT) AS n,
                   CAST(cents AS BIGINT) AS q_cents
            FROM c
            WHERE cum - w <= ((n - 1) * 5) // 10
              AND ((n - 1) * 5) // 10 < cum
        """,
        "poisson_bootstrap": _poisson_bootstrap_sql(8),
        "block_bootstrap": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
              FROM orders GROUP BY 1
            ),
            idx AS (
              SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS i,
                     SUM(cents) OVER (ORDER BY day) AS prefix
              FROM daily
            ),
            sc AS (SELECT COUNT(*) AS n, MAX(prefix) AS total FROM idx),
            picks AS (
              SELECT sc.n, sc.total, b.b, j.j,
                     (('0x' || substr(md5(
                        CAST(b.b AS VARCHAR) || ':' ||
                        CAST(j.j AS VARCHAR)), 1, 14))::BIGINT) % sc.n AS s
              FROM sc,
                   (SELECT UNNEST(range(0, 8)) AS b) b,
                   LATERAL (SELECT UNNEST(range(0, CAST((sc.n + 29) // 30
                            AS BIGINT))) AS j) j
            ),
            sums AS (
              SELECT p.b,
                     hi.prefix
                     - CASE WHEN p.s = 0 THEN 0 ELSE lo.prefix END
                     + CASE WHEN p.s + 29 >= p.n THEN p.total ELSE 0 END
                       AS block_cents
              FROM picks p
              JOIN idx lo ON lo.i = (p.s - 1 + p.n) % p.n
              JOIN idx hi ON hi.i = (p.s + 29) % p.n
            )
            SELECT CAST(b AS BIGINT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(COUNT(*) * 30 AS BIGINT) AS n_days_eff,
                   CAST(SUM(block_cents) AS BIGINT) AS boot_cents
            FROM sums GROUP BY 1
        """,
        "props_variant_stats": """
            WITH t AS (
              SELECT event_type,
                     CAST(json_extract(props, '$.k') AS BIGINT) AS k
              FROM events
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(k) AS BIGINT) AS n_with_prop,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MIN(k) AS BIGINT) AS min_k,
                   CAST(MAX(k) AS BIGINT) AS max_k,
                   CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
            FROM t GROUP BY 1
        """,
        "km_risk_table": """
            WITH pu AS (
              SELECT user_id,
                     MIN(epoch_us(ts)) AS t0,
                     MIN(CASE WHEN event_type = 'purchase'
                              THEN epoch_us(ts) END) AS tp
              FROM events GROUP BY 1
            ),
            hz AS (SELECT MAX(epoch_us(ts)) AS hz FROM events),
            d AS (
              SELECT (COALESCE(tp, hz.hz) - t0) // 86400000000 AS t_days,
                     tp IS NOT NULL AS event
              FROM pu, hz
            ),
            h AS (
              SELECT t_days,
                     SUM(CASE WHEN event THEN 1 ELSE 0 END) AS n_events,
                     SUM(CASE WHEN NOT event THEN 1 ELSE 0 END)
                       AS n_censored
              FROM d GROUP BY 1
            )
            SELECT CAST(t_days AS BIGINT) AS t_days,
                   CAST(SUM(n_events + n_censored) OVER ()
                        - COALESCE(SUM(n_events + n_censored) OVER (
                            ORDER BY t_days
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING
                          ), 0) AS BIGINT) AS n_risk,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(n_censored AS BIGINT) AS n_censored
            FROM h
        """,
        "mcnemar_inputs": """
            WITH flags AS (
              SELECT o_custkey,
                     MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1
                         ELSE 0 END) AS a,
                     MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1
                         ELSE 0 END) AS b
              FROM orders GROUP BY 1
            )
            SELECT CAST(COALESCE(SUM(CASE WHEN a = 0 AND b = 0 THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_00,
                   CAST(COALESCE(SUM(CASE WHEN a = 0 AND b = 1 THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_01,
                   CAST(COALESCE(SUM(CASE WHEN a = 1 AND b = 0 THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_10,
                   CAST(COALESCE(SUM(CASE WHEN a = 1 AND b = 1 THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_11
            FROM flags
        """,
        "daily_count_autocorr": """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     COUNT(*) AS x
              FROM orders GROUP BY 1
            ),
            lags AS (SELECT UNNEST(range(1, 8)) AS lag)
            SELECT CAST(l.lag AS BIGINT) AS lag,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(a.x) AS BIGINT) AS sum_x,
                   CAST(SUM(b.x) AS BIGINT) AS sum_y,
                   CAST(SUM(a.x * a.x) AS BIGINT) AS sum_xx,
                   CAST(SUM(b.x * b.x) AS BIGINT) AS sum_yy,
                   CAST(SUM(a.x * b.x) AS BIGINT) AS sum_xy
            FROM lags l
            JOIN daily a ON TRUE
            JOIN daily b ON b.day = a.day + l.lag
            GROUP BY 1
        """,
        "friedman_rank_inputs": """
            WITH cells AS (
              SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                     c_mktsegment AS segment,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS v
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1, 2
            ),
            spine AS (
              SELECT m.ym, s.segment
              FROM (SELECT DISTINCT ym FROM cells) m,
                   (SELECT DISTINCT segment FROM cells) s
            ),
            full_cells AS (
              SELECT spine.ym, spine.segment, COALESCE(cells.v, 0) AS v
              FROM spine LEFT JOIN cells
                ON spine.ym = cells.ym AND spine.segment = cells.segment
            ),
            h AS (
              SELECT ym, v, COUNT(*) AS cnt FROM full_cells GROUP BY 1, 2
            ),
            r2 AS (
              SELECT ym, v,
                     2 * COALESCE(SUM(cnt) OVER (
                       PARTITION BY ym ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2
              FROM h
            )
            SELECT f.segment,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(r2.r2) AS BIGINT) AS r2_sum
            FROM full_cells f JOIN r2 ON f.ym = r2.ym AND f.v = r2.v
            GROUP BY 1
        """,
        "filter_agreement_census": """
            WITH f AS (
              SELECT length(text) >= 500 AS a,
                     length(text) <= 8 * (length(text)
                       - length(replace(text, ' ', '')) + 1) AS b
              FROM documents
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COALESCE(SUM(CASE WHEN a AND b THEN 1 ELSE 0
                                     END), 0) AS BIGINT) AS n_11,
                   CAST(COALESCE(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0
                                     END), 0) AS BIGINT) AS n_10,
                   CAST(COALESCE(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0
                                     END), 0) AS BIGINT) AS n_01,
                   CAST(COALESCE(SUM(CASE WHEN NOT a AND NOT b THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_00
            FROM f
        """,
        "jonckheere_trend_inputs": """
            WITH hist AS (
              SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM orders GROUP BY 1, 2
            ),
            spine AS (
              SELECT v.cents, gg.g
              FROM (SELECT DISTINCT cents FROM hist) v,
                   (SELECT DISTINCT g FROM hist) gg
            ),
            grid AS (
              SELECT spine.g, spine.cents, COALESCE(hist.cnt, 0) AS cnt
              FROM spine LEFT JOIN hist
                ON spine.g = hist.g AND spine.cents = hist.cents
            ),
            cum AS (
              SELECT g, cents, cnt,
                     COALESCE(SUM(cnt) OVER (
                       PARTITION BY g ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS cum_lt
              FROM grid
            ),
            sizes AS (SELECT g, SUM(cnt) AS n FROM hist GROUP BY 1),
            pair_u AS (
              SELECT lo.g, hi.g AS h,
                     SUM(hi.cnt * (2 * lo.cum_lt + lo.cnt)) AS u2
              FROM cum lo JOIN cum hi
                ON lo.cents = hi.cents AND lo.g < hi.g
              GROUP BY 1, 2
            )
            SELECT p.g, p.h,
                   CAST(sg.n AS BIGINT) AS n_g,
                   CAST(sh.n AS BIGINT) AS n_h,
                   CAST(p.u2 AS BIGINT) AS u2
            FROM pair_u p
            JOIN sizes sg ON sg.g = p.g
            JOIN sizes sh ON sh.g = p.h
        """,
        "ngram_novelty_profile": """
            WITH words AS (
              SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents
            ),
            shing AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(range(len(w) - 2),
                            i -> array_to_string(w[i+1:i+3], ' ')))
                       AS shingle
              FROM words WHERE len(w) >= 3
              UNION ALL
              SELECT doc_id, text AS shingle FROM words WHERE len(w) < 3
            ),
            ref AS (
              SELECT DISTINCT shingle FROM shing WHERE doc_id % 4 = 0
            ),
            per_doc AS (
              SELECT s.doc_id,
                     COUNT(*) AS n_grams,
                     COUNT(*) - COUNT(r.shingle) AS n_novel
              FROM shing s LEFT JOIN ref r ON r.shingle = s.shingle
              WHERE s.doc_id % 4 <> 0
              GROUP BY 1
            )
            SELECT CAST((n_novel * 10) // n_grams AS BIGINT)
                     AS novelty_decile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_grams) AS BIGINT) AS sum_grams,
                   CAST(SUM(n_novel) AS BIGINT) AS sum_novel
            FROM per_doc GROUP BY 1
        """,
        "kruskal_wallis_inputs": """
            WITH vals AS (
              SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS g,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            ),
            hist AS (SELECT g, cents, COUNT(*) AS cnt_g FROM vals GROUP BY 1, 2),
            pooled AS (SELECT cents, SUM(cnt_g) AS cnt FROM hist GROUP BY 1),
            ranked AS (
              SELECT cents, cnt,
                     COALESCE(SUM(cnt) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb
              FROM pooled
            ),
            ties AS (SELECT SUM(cnt * cnt * cnt - cnt) AS t3 FROM pooled)
            SELECT h.g,
                   CAST(SUM(h.cnt_g) AS BIGINT) AS n_g,
                   CAST(SUM(h.cnt_g * (2 * r.cb + r.cnt + 1)) AS BIGINT) AS r2_g,
                   CAST(t.t3 AS BIGINT) AS t3_minus_t_pooled
            FROM hist h JOIN ranked r USING (cents), ties t
            GROUP BY h.g, t.t3
        """,
        "mood_scale_inputs": """
            WITH seg AS (
              SELECT c_custkey, c_mktsegment FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            ),
            tagged AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     c_mktsegment AS segment
              FROM orders JOIN seg ON o_custkey = c_custkey
            ),
            hist AS (
              SELECT segment, cents, COUNT(*) AS cnt_g
              FROM tagged GROUP BY 1, 2
            ),
            pooled AS (SELECT cents, SUM(cnt_g) AS cnt FROM hist GROUP BY 1),
            ranked AS (
              SELECT cents, cnt,
                     COALESCE(SUM(cnt) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb,
                     SUM(cnt) OVER () AS n
              FROM pooled
            )
            SELECT h.segment,
                   CAST(SUM(h.cnt_g) AS BIGINT) AS n_g,
                   CAST(SUM(h.cnt_g * (2 * r.cb + r.cnt - r.n)
                            * (2 * r.cb + r.cnt - r.n)) AS BIGINT) AS m4_g
            FROM hist h JOIN ranked r USING (cents)
            GROUP BY h.segment
        """,
        "cochran_q_inputs": """
            WITH per_user AS (
              SELECT user_id,
                     MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f0,
                     MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f1,
                     MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS f2
              FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
              GROUP BY 1
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(3 AS BIGINT) AS k_treatments,
                   CAST(COALESCE(SUM(f0 + f1 + f2), 0) AS BIGINT) AS sum_r,
                   CAST(COALESCE(SUM((f0 + f1 + f2) * (f0 + f1 + f2)), 0)
                        AS BIGINT) AS sum_r2,
                   CAST(COALESCE(SUM(f0), 0) * COALESCE(SUM(f0), 0)
                        + COALESCE(SUM(f1), 0) * COALESCE(SUM(f1), 0)
                        + COALESCE(SUM(f2), 0) * COALESCE(SUM(f2), 0)
                        AS BIGINT) AS sum_c2
            FROM per_user
        """,
        "token_mix_allocation": """
            WITH per AS (
              SELECT lang AS domain, CAST(SUM(n_chars) AS BIGINT) AS weight
              FROM documents GROUP BY 1
            ),
            tot AS (SELECT SUM(weight) AS total_w FROM per),
            scaled AS (
              SELECT domain, weight,
                     (1000000 * weight) // total_w AS quota,
                     (1000000 * weight) % total_w AS rem_num
              FROM per, tot
            ),
            ranked AS (
              SELECT *,
                     ROW_NUMBER() OVER (ORDER BY rem_num DESC, domain ASC)
                       AS rem_rank,
                     1000000 - SUM(quota) OVER () AS leftover
              FROM scaled
            )
            SELECT domain, CAST(weight AS BIGINT) AS weight,
                   CAST(quota + CASE WHEN rem_rank <= leftover THEN 1
                                ELSE 0 END AS BIGINT) AS alloc
            FROM ranked
        """,
        "kcore_census": _kcore_census_sql(k=3, rounds=8),
        "degree_assortativity_inputs": graph_sql(f""", {_DEG_CTES.strip()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COALESCE(SUM(da + db), 0) AS BIGINT) AS s_sum,
       CAST(COALESCE(SUM(da * db), 0) AS BIGINT) AS s_prod,
       CAST(COALESCE(SUM(da * da + db * db), 0) AS BIGINT) AS s_sq
FROM annotated
"""),
        "rich_club_census": graph_sql(f""", {_DEG_CTES.strip()},
node_hist AS (
  SELECT length(bin(deg)) AS degree_bits, COUNT(*) AS n_nodes
  FROM deg GROUP BY 1
),
edge_hist AS (
  SELECT length(bin(LEAST(da, db))) AS degree_bits, COUNT(*) AS n_edges
  FROM annotated GROUP BY 1
),
merged AS (
  SELECT COALESCE(n.degree_bits, e.degree_bits) AS degree_bits,
         COALESCE(n.n_nodes, 0) AS n_nodes,
         COALESCE(e.n_edges, 0) AS n_edges
  FROM node_hist n FULL OUTER JOIN edge_hist e USING (degree_bits)
)
SELECT CAST(degree_bits AS BIGINT) AS degree_bits,
       CAST(SUM(n_nodes) OVER (ORDER BY degree_bits DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_nodes_ge,
       CAST(SUM(n_edges) OVER (ORDER BY degree_bits DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_edges_ge
FROM merged
"""),
        "brunner_munzel_inputs": """
            WITH seg AS (
              SELECT c_custkey, c_mktsegment FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            ),
            tagged AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     c_mktsegment AS segment
              FROM orders JOIN seg ON o_custkey = c_custkey
            ),
            hist AS (
              SELECT cents,
                     SUM(CASE WHEN segment = 'BUILDING' THEN 1 ELSE 0 END)
                       AS cnt_a,
                     SUM(CASE WHEN segment = 'MACHINERY' THEN 1 ELSE 0 END)
                       AS cnt_b
              FROM tagged GROUP BY 1
            ),
            cum AS (
              SELECT cents, cnt_a, cnt_b,
                     COALESCE(SUM(cnt_a) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cuma_lt,
                     COALESCE(SUM(cnt_b) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumb_lt
              FROM hist
            )
            SELECT 'BUILDING' AS segment,
                   CAST(SUM(cnt_a) AS BIGINT) AS n_g,
                   CAST(COALESCE(SUM(cnt_a * (2 * cumb_lt + cnt_b)), 0)
                        AS BIGINT) AS sum_p2,
                   CAST(COALESCE(SUM(cnt_a * (2 * cumb_lt + cnt_b)
                                     * (2 * cumb_lt + cnt_b)), 0)
                        AS BIGINT) AS sum_p2_sq
            FROM cum
            UNION ALL
            SELECT 'MACHINERY' AS segment,
                   CAST(SUM(cnt_b) AS BIGINT) AS n_g,
                   CAST(COALESCE(SUM(cnt_b * (2 * cuma_lt + cnt_a)), 0)
                        AS BIGINT) AS sum_p2,
                   CAST(COALESCE(SUM(cnt_b * (2 * cuma_lt + cnt_a)
                                     * (2 * cuma_lt + cnt_a)), 0)
                        AS BIGINT) AS sum_p2_sq
            FROM cum
        """,
        "count_min_audit": f"""
            WITH hist AS (
              SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
            ),
            rows_r AS (SELECT UNNEST(range(4)) AS r),
            cells AS (
              SELECT r, {_CMS_H} AS b, SUM(n) AS cell
              FROM hist, rows_r GROUP BY 1, 2
            ),
            tracked AS (
              SELECT user_id, n FROM hist
              ORDER BY n DESC, user_id ASC LIMIT 8
            ),
            probes AS (
              SELECT t.user_id, t.n, r.r, {_CMS_H.replace("user_id", "t.user_id")} AS b
              FROM tracked t, rows_r r
            )
            SELECT p.user_id,
                   CAST(p.n AS BIGINT) AS exact_n,
                   CAST(MIN(c.cell) AS BIGINT) AS cms_n
            FROM probes p JOIN cells c ON c.r = p.r AND c.b = p.b
            GROUP BY 1, 2
        """,
        "ks_one_sample_uniform": """
            WITH hist AS (
              SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM events WHERE event_type = 'purchase' GROUP BY 1
            ),
            cum AS (
              SELECT cents, cnt,
                     SUM(cnt) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                     SUM(cnt) OVER () AS n,
                     MIN(cents) OVER () AS lo,
                     MAX(cents) OVER () AS hi
              FROM hist
            ),
            scored AS (
              -- max of the post-jump D+ and pre-jump D- candidates; the
              -- D- term also covers support gaps (sup lands just below
              -- the next observed value)
              SELECT cents, n, lo, hi - lo + 1 AS span,
                     GREATEST(
                       ABS(cum * (hi - lo + 1) - (cents - lo + 1) * n),
                       ABS((cum - cnt) * (hi - lo + 1) - (cents - lo) * n)
                     ) AS dev
              FROM cum
            )
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(lo AS BIGINT) AS lo_cents,
                   CAST(span AS BIGINT) AS span,
                   CAST(dev AS BIGINT) AS d_num,
                   CAST(cents AS BIGINT) AS d_arg_cents
            FROM scored ORDER BY dev DESC, cents ASC LIMIT 1
        """,
        "page_trend_inputs": """
            WITH cells AS (
              SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                     CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS v
              FROM orders GROUP BY 1, 2
            ),
            spine AS (
              SELECT m.ym, s.prio
              FROM (SELECT DISTINCT ym FROM cells) m,
                   (SELECT DISTINCT prio FROM cells) s
            ),
            full_cells AS (
              SELECT spine.ym, spine.prio, COALESCE(cells.v, 0) AS v
              FROM spine LEFT JOIN cells
                ON spine.ym = cells.ym AND spine.prio = cells.prio
            ),
            h AS (
              SELECT ym, v, COUNT(*) AS cnt FROM full_cells GROUP BY 1, 2
            ),
            r2 AS (
              SELECT ym, v,
                     2 * COALESCE(SUM(cnt) OVER (
                       PARTITION BY ym ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2
              FROM h
            ),
            sums AS (
              SELECT f.prio AS priority,
                     CAST(COUNT(*) AS BIGINT) AS n_blocks,
                     CAST(SUM(r2.r2) AS BIGINT) AS r2_sum
              FROM full_cells f JOIN r2 ON f.ym = r2.ym AND f.v = r2.v
              GROUP BY 1
            )
            SELECT priority, n_blocks, r2_sum,
                   CAST(priority * r2_sum AS BIGINT) AS l2_term
            FROM sums
        """,
        "dominance_census": """
            WITH tagged AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     c_mktsegment AS segment
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            ),
            hist AS (
              SELECT cents,
                     SUM(CASE WHEN segment = 'BUILDING' THEN 1 ELSE 0
                         END) AS cnt_a,
                     SUM(CASE WHEN segment = 'MACHINERY' THEN 1 ELSE 0
                         END) AS cnt_b
              FROM tagged GROUP BY 1
            ),
            cum AS (
              SELECT cents,
                     SUM(cnt_a) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_a,
                     SUM(cnt_b) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_b,
                     SUM(cnt_a) OVER () AS n_a,
                     SUM(cnt_b) OVER () AS n_b
              FROM hist
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
                   CAST(MAX(n_a) AS BIGINT) AS n_a,
                   CAST(MAX(n_b) AS BIGINT) AS n_b,
                   CAST(COALESCE(SUM(CASE WHEN CAST(cum_a AS HUGEINT) * n_b
                       > CAST(cum_b AS HUGEINT) * n_a THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS a_dominated,
                   CAST(COALESCE(SUM(CASE WHEN CAST(cum_a AS HUGEINT) * n_b
                       < CAST(cum_b AS HUGEINT) * n_a THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS b_dominated,
                   CAST(COALESCE(SUM(CASE WHEN CAST(cum_a AS HUGEINT) * n_b
                       = CAST(cum_b AS HUGEINT) * n_a THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS cdf_ties
            FROM cum
        """,
        "bloom_filter_audit": f"""
            WITH ids AS (SELECT DISTINCT user_id FROM events),
            rws AS (SELECT UNNEST(range(3)) AS r),
            bits AS (
              SELECT DISTINCT r, {_BLOOM_H.format(x="user_id")} AS b
              FROM ids, rws
            ),
            heavy AS (
              SELECT user_id AS probe_id, 1 AS is_member
              FROM events GROUP BY user_id
              ORDER BY COUNT(*) DESC, user_id ASC LIMIT 8
            ),
            outsiders AS (
              SELECT mx + x AS probe_id, 0 AS is_member
              FROM (SELECT COALESCE(MAX(user_id), 0) AS mx FROM ids),
                   (SELECT UNNEST(range(1, 9)) AS x)
            ),
            probes AS (
              SELECT * FROM heavy UNION ALL SELECT * FROM outsiders
            ),
            pb AS (
              SELECT probe_id, is_member, r,
                     {_BLOOM_H.format(x="probe_id")} AS b
              FROM probes, rws
            )
            SELECT pb.probe_id,
                   CAST(MAX(pb.is_member) AS BIGINT) AS is_member,
                   CAST(CASE WHEN COUNT(bits.b) = 3 THEN 1 ELSE 0
                        END AS BIGINT) AS bloom_hit
            FROM pb LEFT JOIN bits ON bits.r = pb.r AND bits.b = pb.b
            GROUP BY 1
        """,
        "winnow_overlap_pairs": f"""
            WITH d AS (
              SELECT doc_id, text FROM documents
              WHERE text IS NOT NULL AND length(text) > 0
            ),{_WINNOW_KFPS_CTES}
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM kfps a JOIN kfps b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """,
        "revenue_cube": """
            SELECT CAST(GROUPING(year, priority) AS BIGINT) AS gid,
                   CAST(COALESCE(year, -1) AS BIGINT) AS year,
                   CAST(COALESCE(priority, -1) AS BIGINT) AS priority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS revenue_cents
            FROM (
              SELECT year(o_orderdate) AS year,
                     CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                       AS priority,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            )
            GROUP BY CUBE (year, priority)
        """,
        "source_copy_matrix": f"""
            WITH d AS (
              SELECT doc_id, text, source FROM documents
              WHERE text IS NOT NULL AND length(text) > 0
            ),{_WINNOW_KFPS_CTES},
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     COUNT(*) AS n_shared
              FROM kfps a JOIN kfps b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            tagged AS (
              SELECT LEAST(sa.source, sb.source) AS source_a,
                     GREATEST(sa.source, sb.source) AS source_b,
                     p.n_shared
              FROM pairs p
              JOIN d sa ON sa.doc_id = p.doc_a
              JOIN d sb ON sb.doc_id = p.doc_b
              WHERE sa.source <> sb.source
            )
            SELECT source_a, source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(n_shared) AS BIGINT) AS n_shared_fps
            FROM tagged GROUP BY 1, 2
        """,
    }
