"""Parquet graph storage round-trip (S4 scale-path replacement)."""

from __future__ import annotations

from big_data_graph_analysis_with_spark_spark.sources.ngs_text import load_graph
from big_data_graph_analysis_with_spark_spark.sources.parquet_graph import (
    read_graph_parquet,
    write_graph_parquet,
)
from tests.conftest import REF_INPUT


def test_roundtrip(spark, tmp_path):
    g = load_graph(spark, f"{REF_INPUT}/Graph20.0.txt")
    path = str(tmp_path / "g20")
    write_graph_parquet(g, path)
    back = read_graph_parquet(spark, path)
    assert sorted(map(tuple, back.vertices.collect())) == sorted(
        map(tuple, g.vertices.collect())
    )
    assert sorted(map(tuple, back.edges.collect())) == sorted(
        map(tuple, g.edges.collect())
    )
    assert back.init_id == g.init_id


def test_bucketed_roundtrip_overwrite_and_no_shuffle(spark, tmp_path):
    """Bucketed write → catalog read: repeated writes overwrite (stable
    table names), contents round-trip, and an id-keyed self-join of the
    bucketed tables plans WITHOUT an Exchange on the bucketed key."""
    from pyspark.sql import functions as F

    g = load_graph(spark, f"{REF_INPUT}/Graph20.0.txt")
    path = str(tmp_path / "g20b")
    write_graph_parquet(g, path, bucket_by=4)
    write_graph_parquet(g, path, bucket_by=4)  # stable names → clean overwrite

    back = read_graph_parquet(spark, path)
    assert sorted(map(tuple, back.vertices.collect())) == sorted(
        map(tuple, g.vertices.collect())
    )
    assert sorted(map(tuple, back.edges.collect())) == sorted(
        map(tuple, g.edges.collect())
    )

    # force a sort-merge plan (the tiny fixture would broadcast) to
    # show bucketing itself elides the shuffle: both sides co-bucketed
    # on the key → no "Exchange hashpartitioning" anywhere
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = back.edges.join(
            back.vertices.select(F.col("id").alias("src")), on="src"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_connected_components_same_result_no_edge_exchange(
    spark, tmp_path
):
    """connected_components(sym_edges=<b-bucketed table>) must return
    bit-identical labels to the derived path and plan the per-round
    b-keyed join without an edge-side Exchange."""
    from pyspark.sql import functions as F

    from big_data_graph_analysis_with_spark_spark.operators import graphalg
    from big_data_graph_analysis_with_spark_spark.sources.parquet_graph import (
        read_sym_edges,
        write_sym_edges,
    )

    g = load_graph(spark, f"{REF_INPUT}/Graph20.0.txt")
    path = str(tmp_path / "g20cc")
    write_sym_edges(g, path, bucket_by=4)
    sym = read_sym_edges(spark, path)

    plain = sorted(map(tuple, graphalg.connected_components(g).collect()))
    bucketed = sorted(
        map(tuple, graphalg.connected_components(g, sym_edges=sym).collect())
    )
    assert bucketed == plain

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        labels = g.vertices.select("id", F.col("id").alias("component_id"))

        def round_join(sym_df):
            return sym_df.join(labels, on=sym_df.b == labels.id)

        plan_b = (
            round_join(sym.select("a", "b"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        plan_p = (
            round_join(sym.select("a", "b").localCheckpoint())
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan_b.count("Exchange hashpartitioning") < plan_p.count(
            "Exchange hashpartitioning"
        ), plan_b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_label_propagation_same_result(spark, tmp_path):
    """label_propagation(sym_edges=<b-bucketed table>) must return
    bit-identical labels to the derived path (the per-round join shape
    is the same as connected_components', whose no-Exchange plan
    assertion covers both)."""
    from big_data_graph_analysis_with_spark_spark.operators import graphalg
    from big_data_graph_analysis_with_spark_spark.sources.parquet_graph import (
        read_sym_edges,
        write_sym_edges,
    )

    g = load_graph(spark, f"{REF_INPUT}/Graph20.0.txt")
    path = str(tmp_path / "g20lpa")
    write_sym_edges(g, path, bucket_by=4)
    sym = read_sym_edges(spark, path)

    plain = sorted(
        map(tuple, graphalg.label_propagation(g, rounds=3).collect())
    )
    bucketed = sorted(
        map(tuple, graphalg.label_propagation(g, rounds=3, sym_edges=sym).collect())
    )
    assert bucketed == plain


def test_bucketed_centrality_family_same_results(spark, tmp_path):
    """closeness_sampled(sym_edges=...) / path_counts(edges_stable=True)
    / betweenness_sampled(edges_stable=True) over bucketed catalog
    tables must return bit-identical results to the derived paths (the
    per-level join shapes match connected_components'/pagerank's, whose
    no-Exchange plan assertions cover the shuffle claim)."""
    from big_data_graph_analysis_with_spark_spark.operators import graphalg
    from big_data_graph_analysis_with_spark_spark.sources.parquet_graph import (
        read_sym_edges,
        write_sym_edges,
    )

    g = load_graph(spark, f"{REF_INPUT}/Graph20.0.txt")
    path = str(tmp_path / "g20cf")
    write_graph_parquet(g, path, bucket_by=4)
    write_sym_edges(g, path, bucket_by=4)
    back = read_graph_parquet(spark, path)
    sym = read_sym_edges(spark, path)

    assert sorted(
        map(
            tuple,
            graphalg.closeness_sampled(back, n_seeds=3, sym_edges=sym).collect(),
        )
    ) == sorted(map(tuple, graphalg.closeness_sampled(g, n_seeds=3).collect()))

    assert sorted(
        map(
            tuple,
            graphalg.path_counts(back, levels=6, edges_stable=True).collect(),
        )
    ) == sorted(map(tuple, graphalg.path_counts(g, levels=6).collect()))

    assert sorted(
        map(
            tuple,
            graphalg.betweenness_sampled(
                back, n_seeds=3, edges_stable=True
            ).collect(),
        )
    ) == sorted(
        map(tuple, graphalg.betweenness_sampled(g, n_seeds=3).collect())
    )

    assert sorted(
        map(
            tuple,
            graphalg.hits_scores(back, rounds=2, edges_stable=True).collect(),
        )
    ) == sorted(map(tuple, graphalg.hits_scores(g, rounds=2).collect()))


def test_bucketed_pagerank_same_result_no_edge_exchange(spark, tmp_path):
    """pagerank(edges_stable=True) over the src-bucketed catalog tables
    must (a) return bit-identical scores to the plain path and (b) plan
    the per-round src-keyed join with NO Exchange on the edge side —
    the per-round edge shuffle is the dominant cost at scale and
    bucketing exists precisely to remove it."""
    from pyspark.sql import functions as F

    from big_data_graph_analysis_with_spark_spark.operators import graphalg

    g = load_graph(spark, f"{REF_INPUT}/Graph20.0.txt")
    path = str(tmp_path / "g20pr")
    write_graph_parquet(g, path, bucket_by=4)
    back = read_graph_parquet(spark, path)

    plain = sorted(map(tuple, graphalg.pagerank(g, iters=2).collect()))
    bucketed = sorted(
        map(tuple, graphalg.pagerank(back, iters=2, edges_stable=True).collect())
    )
    assert bucketed == plain

    # plan shape: with broadcast off (forcing the at-scale SMJ), the
    # bucketed edge scan must feed the src-keyed join without its own
    # Exchange — only the derived (vertex-sized) side repartitions
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def round_join(edges):
            pr0 = back.vertices.select(
                "id", F.lit(1_000_000).cast("long").alias("pr_scaled")
            )
            return pr0.join(edges, on=F.col("id") == F.col("src"))

        plan_b = (
            round_join(back.edges.select("src", "dst"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        plan_p = (
            round_join(back.edges.select("src", "dst").localCheckpoint())
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan_b.count("Exchange hashpartitioning") < plan_p.count(
            "Exchange hashpartitioning"
        ), plan_b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_traversal_family_same_results(spark, tmp_path):
    """bfs_distances/sssp_distances/personalized_pagerank
    (edges_stable=True) and kcore_vertices(sym_edges=...) over bucketed
    catalog tables must return bit-identical results to the derived
    paths (the per-round join shapes match pagerank's /
    connected_components', whose no-Exchange plan assertions cover the
    shuffle claim)."""
    from big_data_graph_analysis_with_spark_spark.operators import graphalg
    from big_data_graph_analysis_with_spark_spark.sources.parquet_graph import (
        read_sym_edges,
        write_sym_edges,
    )

    g = load_graph(spark, f"{REF_INPUT}/Graph20.0.txt")
    path = str(tmp_path / "g20tf")
    write_graph_parquet(g, path, bucket_by=4)
    write_sym_edges(g, path, bucket_by=4)
    back = read_graph_parquet(spark, path)
    sym = read_sym_edges(spark, path)

    assert sorted(
        map(tuple, graphalg.bfs_distances(back, edges_stable=True).collect())
    ) == sorted(map(tuple, graphalg.bfs_distances(g).collect()))

    assert sorted(
        map(
            tuple,
            graphalg.sssp_distances(back, rounds=6, edges_stable=True).collect(),
        )
    ) == sorted(map(tuple, graphalg.sssp_distances(g, rounds=6).collect()))

    assert sorted(
        map(tuple, graphalg.kcore_vertices(back, k=2, sym_edges=sym).collect())
    ) == sorted(map(tuple, graphalg.kcore_vertices(g, k=2).collect()))

    assert sorted(
        map(
            tuple,
            graphalg.personalized_pagerank(
                back, iters=2, edges_stable=True
            ).collect(),
        )
    ) == sorted(map(tuple, graphalg.personalized_pagerank(g, iters=2).collect()))
