"""Seeded random-walk kernel (SURVEY.md §2 rows G2-G4).

Reference (`HelperFunction.scala:305-372`): each Spark partition owns
one start node and runs `numItersPerCompNode` walks from it
sequentially; a walk repeatedly steps to a uniformly random child,
preferring children not yet visited by *earlier walks in the same
partition* (`:341-349` — the cross-walk exploration bias, G4), and
stops once the multiset of visited nodes reaches
``randomWalkCoeff × |V|`` (`:320`). Start nodes are sampled uniformly
with replacement (`createRDDForRW`, `:361-372` — its no-repeat memory
is dead code, SURVEY.md §7.4.5).

Documented deviations (SURVEY.md §7.4):
* **Seeded.** The reference uses unseeded `scala.util.Random`
  (`:347-349,366-368`) — its two recorded runs differ by 20 true
  positives. Every choice here draws from
  ``numpy.random.default_rng([seed, partition_key])``.
* **Sinks terminate.** The reference stalls at out-degree-0 nodes,
  padding the visited count until quota (`:333-339` builds a subgraph
  that is discarded). Termination yields the identical distinct-node
  set without the dead iterations.

Execution model: walks are inherently sequential (step t+1 depends on
t), so the kernel is an `applyInPandas` grouped map — one group per
partition key, Arrow-batched both ways. The adjacency reaches the
kernel **executor-side**: ``child_map`` (one compact row per vertex,
children pre-sorted for seeded-rng determinism) is written once as a
parquet sideload, and each Python worker builds its pre-indexed dict
from that columnar file on first use (cached per worker process). The
driver never materializes a single vertex — unlike the reference,
which collects and broadcasts the whole graph through the driver
(`Main.scala:72-73`) and then does a **linear scan of the edge list
per step** (`:316-318`). On a cluster the sideload path lives on the
shared FS (HDFS/S3) and executors fetch it exactly like any input
split. This is still the one operator that needs the whole graph in
memory *per executor* (a walk can reach anywhere), so the ceiling is
executor RAM — ≤ a few GB of adjacency per walk job; everything
downstream (subgraph induction, SimRank, matching, stats) is pure
DataFrame algebra and scales independently.
"""

from __future__ import annotations

import math
import os
import tempfile
import weakref

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import SimConfig
from ..model import NetGraph
from . import topology

WALK_SCHEMA = "partition_key LONG, walk_id LONG, step LONG, node_id LONG"

# Per-worker adjacency cache: Python workers are reused across tasks, so
# each executor pays the parquet→dict build once per sideload path, not
# once per task. Bounded — a long session walking many graphs must not
# accumulate dead adjacencies.
_ADJ_CACHE: dict[str, dict[int, list[int]]] = {}
_ADJ_CACHE_MAX = 4

# Driver-side sideload reuse: the same (immutable) NetGraph walked again
# — repeated pipeline runs, bench iterations — reuses its already-written
# sideload instead of re-materializing child_map. Weak keys: the path
# entry dies with the graph object. Content can never go stale because a
# NetGraph's frames are immutable and each write gets a fresh dir.
_SIDELOAD_PATHS: "weakref.WeakKeyDictionary[NetGraph, str]" = (
    weakref.WeakKeyDictionary()
)


def _load_adjacency(path: str) -> dict[int, list[int]]:
    adj = _ADJ_CACHE.get(path)
    if adj is None:
        import pyarrow.dataset as ds

        tbl = ds.dataset(path, format="parquet").to_table(
            columns=["id", "children"]
        )
        adj = {
            int(i): [int(c) for c in ch]
            for i, ch in zip(
                tbl.column("id").to_pylist(), tbl.column("children").to_pylist()
            )
        }
        while len(_ADJ_CACHE) >= _ADJ_CACHE_MAX:
            _ADJ_CACHE.pop(next(iter(_ADJ_CACHE)))
        _ADJ_CACHE[path] = adj
    return adj


def sample_start_assignments(
    spark: SparkSession,
    start_ids: list[int],
    cfg: SimConfig,
) -> DataFrame:
    """(partition_key, start_id) — one seeded uniform-with-replacement
    draw per parallel walk slot (G2, `createRDDForRW`)."""
    if not start_ids:
        # reference crashes on cyclic graphs (Random.nextInt(0),
        # SURVEY.md §7.4.8); degrade to an empty assignment instead
        return spark.createDataFrame([], "partition_key LONG, start_id LONG")
    rng = np.random.default_rng([cfg.seed, 0])
    pool = sorted(start_ids)
    rows = [
        (int(k), int(pool[rng.integers(0, len(pool))]))
        for k in range(1, cfg.num_of_parallel_walks + 1)
    ]
    return spark.createDataFrame(rows, "partition_key LONG, start_id LONG")


def sample_start_assignments_dist(
    spark: SparkSession,
    start_nodes: DataFrame,
    cfg: SimConfig,
) -> DataFrame:
    """Distributed twin of :func:`sample_start_assignments` — bit-identical
    output, but the start-node *ids never reach the driver*: only their
    count does (one scalar). The seeded draws index into the id-sorted
    pool, so the driver materializes ``num_of_parallel_walks`` rank
    integers and a rank-equi-join resolves them to ids cluster-side.

    The rank window is unpartitioned, which sorts the start-node set on
    one task — acceptable because start nodes are a frontier (no
    in-edges), a small fraction of V; the full vertex table never flows
    through it.

    The ranked frame is localCheckpointed BEFORE the count so the
    start-node derivation (an anti-join over the full edge table) runs
    exactly once — counting and then re-deriving for the rank join
    would execute that anti-join twice, and on a stage-heavy pipeline
    the second execution is pure latency.
    """
    ranked = (
        start_nodes.select("id")
        .withColumn("rank", F.row_number().over(Window.orderBy("id")) - 1)
        .localCheckpoint()
    )
    n = ranked.count()
    if n == 0:
        return spark.createDataFrame([], "partition_key LONG, start_id LONG")
    rng = np.random.default_rng([cfg.seed, 0])
    draws = [
        (int(k), int(rng.integers(0, n)))
        for k in range(1, cfg.num_of_parallel_walks + 1)
    ]
    draws_df = spark.createDataFrame(draws, "partition_key LONG, rank LONG")
    return (
        ranked.join(F.broadcast(draws_df), on="rank")
        .select("partition_key", F.col("id").alias("start_id"))
    )


def ensure_sideload(
    pg: NetGraph,
    num_vertices: int | None = None,
    cache_key: NetGraph | None = None,
) -> str:
    """Materialize (or reuse) the executor-side adjacency sideload for
    `pg` and return its path.

    Adjacency is aggregated cluster-side (topology.child_map: one
    groupBy, children pre-sorted for seeded-rng determinism) and
    written as a parquet sideload that each executor's Python worker
    reads and indexes itself — NO driver materialization of any part
    of the graph (the round-3 version collected one compact row per
    vertex to the driver before broadcasting; at a 100 TB graph even
    that O(|V|) driver pass is the bottleneck). Locally the sideload
    is a temp dir; on a cluster, point SPARK_GRAFT_SCRATCH at the
    shared FS.

    Reuse is keyed on `cache_key` (default: `pg` itself) in a weak-key
    registry — callers that re-wrap the graph per run (e.g.
    run_pipeline's persist() wrapper returns a fresh NetGraph) pass
    their long-lived ORIGINAL object so repeated runs over the same
    graph write the child_map exactly once. Content can never go stale:
    a NetGraph's frames are immutable and each write gets a fresh dir.
    """
    key = cache_key if cache_key is not None else pg
    adj_path = _SIDELOAD_PATHS.get(key)
    if adj_path is not None and os.path.isdir(adj_path):
        return adj_path
    n_v = num_vertices if num_vertices is not None else pg.num_vertices()
    # fresh dir per write — the per-worker cache is keyed by path,
    # so a path must never be rewritten with different contents
    scratch = tempfile.mkdtemp(
        prefix="bdga_walk_adj_", dir=os.environ.get("SPARK_GRAFT_SCRATCH")
    )
    adj_path = os.path.join(scratch, "child_map")
    n_files = max(1, math.ceil(n_v / 2_000_000))
    topology.child_map(pg).coalesce(n_files).write.mode("overwrite").parquet(
        adj_path
    )
    _SIDELOAD_PATHS[key] = adj_path
    return adj_path


def run_walks(
    spark: SparkSession,
    pg: NetGraph,
    assignments: DataFrame,
    cfg: SimConfig,
    num_vertices: int | None = None,
    adj_path: str | None = None,
) -> DataFrame:
    """All walks for all partitions: (partition_key, walk_id, step, node_id).

    walk_id is globally ordered per partition (0-based across all
    rounds); the driver loop slices rounds by
    ``walk_id // iters_before_accum``.
    """
    n_v = num_vertices if num_vertices is not None else pg.num_vertices()
    quota = cfg.random_walk_coeff * n_v
    n_iters = cfg.num_iters_per_comp_node
    seed = cfg.seed

    if adj_path is None:
        adj_path = ensure_sideload(pg, num_vertices=n_v)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        adj = _load_adjacency(adj_path)
        out_part: list[int] = []
        out_walk: list[int] = []
        out_step: list[int] = []
        out_node: list[int] = []
        for _, row in pdf.iterrows():
            pkey, start = int(row["partition_key"]), int(row["start_id"])
            rng = np.random.default_rng([seed, pkey])
            partition_visited: set[int] = set()
            for walk_id in range(n_iters):
                path: list[int] = []
                cur = start
                while len(path) < quota:
                    path.append(cur)
                    nbrs = adj.get(cur)
                    if not nbrs:
                        break  # sink: terminate (deviation §7.4.6)
                    unvisited = [c for c in nbrs if c not in partition_visited]
                    pool = unvisited if unvisited else nbrs
                    cur = pool[rng.integers(0, len(pool))]
                partition_visited.update(path)
                out_part.extend([pkey] * len(path))
                out_walk.extend([walk_id] * len(path))
                out_step.extend(range(len(path)))
                out_node.extend(path)
        return pd.DataFrame(
            {
                "partition_key": pd.Series(out_part, dtype="int64"),
                "walk_id": pd.Series(out_walk, dtype="int64"),
                "step": pd.Series(out_step, dtype="int64"),
                "node_id": pd.Series(out_node, dtype="int64"),
            }
        )

    return assignments.groupBy("partition_key").applyInPandas(kernel, WALK_SCHEMA)


def walk_visited_sets(walk_steps: DataFrame) -> DataFrame:
    """Distinct visited nodes per walk:
    (partition_key, walk_id, visited array<long> sorted)."""
    return walk_steps.groupBy("partition_key", "walk_id").agg(
        F.array_sort(F.collect_set("node_id")).alias("visited")
    )


def max_walk_len(cfg: SimConfig, num_vertices: int) -> int:
    """Upper bound on path length (the reference's quota, `:320`)."""
    return math.ceil(cfg.random_walk_coeff * num_vertices)


NODE2VEC_SCHEMA = "start_id LONG, rep LONG, step LONG, node_id LONG"


def node2vec_walks(
    spark: SparkSession,
    pg: NetGraph,
    walks_per_vertex: int = 1,
    walk_length: int = 20,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 0,
    adj_path: str | None = None,
) -> DataFrame:
    """(start_id, rep, step, node_id): second-order biased random walks
    (Grover & Leskovec, KDD 2016) from every vertex — the walk-corpus
    generator for skip-gram graph embeddings, built on the same
    executor-side adjacency sideload as the MitM kernel.

    Transition weights from node v after arriving via t: 1/p back to
    t (return), 1 to common neighbors of t and v (BFS-ish), 1/q
    otherwise (DFS-ish); first step uniform. Each walk's RNG is seeded
    by (seed, start_id, rep) — the trajectory is a pure function of
    those, independent of grouping/partitioning, so re-runs and
    repartitions are bit-identical (tested). Directed: walks follow
    out-edges and stop at sinks.

    Scale shape: assignments are a narrow vertices×reps frame grouped
    into bounded hash buckets; the kernel streams Arrow batches and
    reads the shared adjacency sideload (see ensure_sideload — the one
    per-executor whole-graph residency this family needs). Walk output
    is (L+1)·reps·|V| narrow rows — the dominant cost is writing the
    corpus, as it should be.
    """
    adj_path = adj_path if adj_path is not None else ensure_sideload(pg)
    n_buckets = max(8, spark.sparkContext.defaultParallelism * 2)
    assignments = (
        pg.vertices.select(F.col("id").alias("start_id"))
        .select(
            "start_id",
            F.explode(
                F.sequence(F.lit(1), F.lit(int(walks_per_vertex)))
            ).alias("rep"),
        )
        .withColumn(
            "bucket",
            F.abs(F.xxhash64("start_id", "rep", F.lit(seed))) % n_buckets,
        )
    )

    L, P, Q, SEED = int(walk_length), float(p), float(q), int(seed)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        adj = _load_adjacency(adj_path)
        out_start: list[int] = []
        out_rep: list[int] = []
        out_step: list[int] = []
        out_node: list[int] = []
        for start, rep in zip(pdf["start_id"], pdf["rep"]):
            start, rep = int(start), int(rep)
            rng = np.random.default_rng([SEED, start, rep])
            path = [start]
            prev = None
            cur = start
            while len(path) <= L:
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                if prev is None:
                    nxt = nbrs[rng.integers(0, len(nbrs))]
                else:
                    prev_nbrs = adj.get(prev) or []
                    w = np.empty(len(nbrs), dtype=np.float64)
                    for i, x in enumerate(nbrs):
                        if x == prev:
                            w[i] = 1.0 / P
                        elif x in prev_nbrs:
                            w[i] = 1.0
                        else:
                            w[i] = 1.0 / Q
                    w /= w.sum()
                    nxt = nbrs[rng.choice(len(nbrs), p=w)]
                path.append(int(nxt))
                prev, cur = cur, int(nxt)
            out_start.extend([start] * len(path))
            out_rep.extend([rep] * len(path))
            out_step.extend(range(len(path)))
            out_node.extend(path)
        return pd.DataFrame(
            {
                "start_id": pd.Series(out_start, dtype="int64"),
                "rep": pd.Series(out_rep, dtype="int64"),
                "step": pd.Series(out_step, dtype="int64"),
                "node_id": pd.Series(out_node, dtype="int64"),
            }
        )

    return assignments.groupBy("bucket").applyInPandas(kernel, NODE2VEC_SCHEMA)
