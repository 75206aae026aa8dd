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
partition key, Arrow-batched both ways, the adjacency list shipped once
per executor as a Spark broadcast (the reference broadcasts the whole
graph the same way, `Main.scala:72-73`, but then does a **linear scan
of the edge list per step**, `:316-318`; we pre-index child lists).
This is the one operator that needs the graph in memory per executor —
the MitM simulation targets graphs that fit (≤ a few GB of adjacency);
everything downstream (subgraph induction, SimRank, matching, stats)
is pure DataFrame algebra and scales independently.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SimConfig
from ..model import NetGraph
from . import topology

WALK_SCHEMA = "partition_key LONG, walk_id LONG, step LONG, node_id LONG"


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


def run_walks(
    spark: SparkSession,
    pg: NetGraph,
    assignments: DataFrame,
    cfg: SimConfig,
    num_vertices: int | None = None,
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

    # adjacency is aggregated cluster-side (topology.child_map: one
    # groupBy, children pre-sorted for seeded-rng determinism) and the
    # driver collects ONE compact row per vertex — never the raw edge
    # table (a full-edge collect is the first thing to OOM the driver
    # at 100× scale). The broadcast then ships the dict once per
    # executor, exactly like the reference's whole-graph broadcast
    # (`Main.scala:72-73`) but pre-indexed instead of linear-scanned.
    adjacency: dict[int, list[int]] = {
        int(r["id"]): [int(c) for c in r["children"]]
        for r in topology.child_map(pg).collect()
    }
    adj_bv = spark.sparkContext.broadcast(adjacency)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        adj = adj_bv.value
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
