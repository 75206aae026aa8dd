"""Targeted micro-bench: time a named subset of bench suites without
running the whole harness. Usage:

    python scripts/microbench.py dedup_embedding_cosine graph_centrality_paths

Reuses bench.py's fixtures (sf dir, iteration count, min-of-N) by
importing the same operators directly; intended for iterating on one
operator between full bench runs — BENCH_r{N}.json numbers still come
from bench.py.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from big_data_graph_analysis_with_spark_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_ITERS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")))


def main() -> None:
    names = sys.argv[1:] or ["dedup_embedding_cosine", "graph_centrality_paths"]
    spark = get_spark(app_name="microbench")
    spark.sparkContext.setLogLevel("ERROR")

    from big_data_graph_analysis_with_spark_spark.operators import (  # noqa: E402
        dedup as dedup_ops,
    )
    from big_data_graph_analysis_with_spark_spark.operators import graphalg  # noqa: E402
    from big_data_graph_analysis_with_spark_spark.sources import tpch_graph  # noqa: E402
    from big_data_graph_analysis_with_spark_spark.sources.parquet_graph import (  # noqa: E402
        read_graph_parquet,
        read_sym_edges,
        write_graph_parquet,
        write_sym_edges,
    )

    og, _pg = tpch_graph.derive_graphs(spark, SF_DIR)
    og.vertices.persist().count()
    og.edges.persist().count()
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    bucket_path = tempfile.mkdtemp(prefix="bdga_microbench_")
    write_graph_parquet(og, bucket_path, bucket_by=8)
    write_sym_edges(og, bucket_path, bucket_by=8)
    og_bucketed = read_graph_parquet(spark, bucket_path)
    sym_bucketed = read_sym_edges(spark, bucket_path)

    suites = {
        "dedup_embedding_cosine": lambda: dedup_ops.embedding_cosine_pairs(
            embs, threshold=0.9
        ).count(),
        "graph_centrality_paths": lambda: (
            graphalg.closeness_sampled(
                og_bucketed, n_seeds=4, sym_edges=sym_bucketed
            ).agg(F.sum("harmonic_ppm")).collect(),
            graphalg.path_counts(og_bucketed, levels=8, edges_stable=True)
            .agg(F.sum("n_paths"))
            .collect(),
            graphalg.betweenness_sampled(
                og_bucketed, n_seeds=4, edges_stable=True
            ).agg(F.sum("betweenness")).collect(),
        ),
        "graph_centralities": lambda: (
            graphalg.clustering_coefficient(og)
            .agg(F.sum("lcc_ppm"))
            .collect(),
            graphalg.label_propagation(og, rounds=3, sym_edges=sym_bucketed)
            .agg(F.countDistinct("label"))
            .collect(),
            graphalg.hits_scores(og_bucketed, rounds=2, edges_stable=True)
            .agg(F.sum("auth"))
            .collect(),
        ),
        "graph_centrality_paths_plain": lambda: (
            graphalg.closeness_sampled(og, n_seeds=4)
            .agg(F.sum("harmonic_ppm"))
            .collect(),
            graphalg.path_counts(og, levels=8).agg(F.sum("n_paths")).collect(),
            graphalg.betweenness_sampled(og, n_seeds=4)
            .agg(F.sum("betweenness"))
            .collect(),
        ),
    }

    out = {}
    for name in names:
        fn = suites[name]
        best = math.inf
        for it in range(N_ITERS):
            t0 = time.time()
            fn()
            dt = round(time.time() - t0, 3)
            print(f"[micro] {name} iter {it + 1}: {dt}s", file=sys.stderr)
            best = min(best, dt)
        out[name] = best
    print(json.dumps(out))


if __name__ == "__main__":
    main()
