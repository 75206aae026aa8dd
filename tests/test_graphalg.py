"""Whole-graph analytics: triangles, components, fixed-point PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import graphalg


def _graph(spark, vertex_ids, edge_pairs):
    v = spark.createDataFrame([(int(i),) for i in vertex_ids], "id LONG")
    e = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edge_pairs], "src LONG, dst LONG"
    )
    return NetGraph(v, e)


def test_triangle_counts_known_graph(spark):
    # K3 on {1,2,3} plus a dangling edge 3-4 and an isolated vertex 5;
    # edge directions and a reciprocal pair must not matter
    g = _graph(
        spark, [1, 2, 3, 4, 5], [(1, 2), (2, 1), (2, 3), (3, 1), (3, 4)]
    )
    got = {
        r["id"]: r["n_triangles"] for r in graphalg.triangle_counts(g).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0}


def test_triangle_counts_two_triangles_shared_edge(spark):
    # {1,2,3} and {2,3,4} share edge 2-3
    g = _graph(spark, [1, 2, 3, 4], [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    got = {
        r["id"]: r["n_triangles"] for r in graphalg.triangle_counts(g).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_connected_components_labels_and_singletons(spark):
    # two components {1,2,3}, {10,11} and an isolated vertex 20; a
    # 4-node path checks propagation beyond one hop
    g = _graph(
        spark, [1, 2, 3, 10, 11, 20], [(2, 1), (2, 3), (10, 11)]
    )
    got = {
        r["id"]: r["component_id"]
        for r in graphalg.connected_components(g).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_path(spark):
    ids = list(range(1, 9))
    g = _graph(spark, ids, [(i, i + 1) for i in ids[:-1]])
    got = graphalg.connected_components(g)
    assert got.select("component_id").distinct().collect()[0][0] == 1
    assert got.count() == len(ids)


def test_pagerank_mass_and_ranking(spark):
    # star: everyone points at 1 → vertex 1 must rank strictly first;
    # total mass never exceeds SCALE (dangling mass only shrinks it)
    g = _graph(spark, [1, 2, 3, 4], [(2, 1), (3, 1), (4, 1)])
    pr = {r["id"]: r["pr_scaled"] for r in graphalg.pagerank(g, iters=4).collect()}
    assert pr[1] > pr[2] == pr[3] == pr[4]
    assert sum(pr.values()) <= graphalg.PR_SCALE


def test_pagerank_partitioning_invariance(spark):
    # fixed-point integer arithmetic must be bit-identical regardless of
    # physical partitioning — the property floats cannot give
    ids = list(range(1, 30))
    edges = [(i, (i * 7) % 29 + 1) for i in ids] + [(i, (i * 3) % 29 + 1) for i in ids]
    g1 = _graph(spark, ids, edges)
    g2 = NetGraph(g1.vertices.repartition(7), g1.edges.repartition(11), g1.init_id)
    r1 = sorted(map(tuple, graphalg.pagerank(g1, iters=5).collect()))
    r2 = sorted(map(tuple, graphalg.pagerank(g2, iters=5).collect()))
    assert r1 == r2


def test_undirected_edges_canonical(spark):
    g = _graph(spark, [1, 2], [(1, 2), (2, 1), (1, 1)])
    got = graphalg.undirected_edges(g).collect()
    assert [(r["a"], r["b"]) for r in got] == [(1, 2)]


def test_triangle_plan_has_no_cartesian(spark):
    g = _graph(spark, [1, 2, 3], [(1, 2), (2, 3), (3, 1)])
    plan = graphalg.triangle_counts(g)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bfs_distances_known_graph(spark):
    # diamond 1→{2,3}→4→5, cycle back-edge 5→1, unreachable 6→7
    g = _graph(
        spark,
        [1, 2, 3, 4, 5, 6, 7],
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 1), (6, 7)],
    )
    got = {r["id"]: r["dist"] for r in graphalg.bfs_distances(g).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_bfs_distances_explicit_source_and_cap(spark):
    # path 1→2→3→4: from source 3 only {3,4} are reachable; a 1-hop
    # cap truncates the frontier exactly at distance 1
    g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)])
    got = {
        r["id"]: r["dist"]
        for r in graphalg.bfs_distances(g, source=3).collect()
    }
    assert got == {3: 0, 4: 1}
    capped = {
        r["id"]: r["dist"]
        for r in graphalg.bfs_distances(g, source=1, max_iters=1).collect()
    }
    assert capped == {1: 0, 2: 1}


def test_kcore_peels_cascades(spark):
    # K4 on {1..4} with a pendant path 4-5-6: the 3-core is exactly K4
    # (5 and 6 peel in cascade), and the 2-core keeps nothing of the
    # path either since it is a tree branch
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    g = _graph(spark, [1, 2, 3, 4, 5, 6], k4 + [(4, 5), (5, 6)])
    assert {r["id"] for r in graphalg.kcore_vertices(g, k=3).collect()} == {
        1, 2, 3, 4,
    }
    assert {r["id"] for r in graphalg.kcore_vertices(g, k=2).collect()} == {
        1, 2, 3, 4,
    }


def test_kcore_cycle_is_its_own_2core(spark):
    # a 5-cycle with a pendant vertex: 2-core = the cycle, 3-core empty
    cyc = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (3, 9)]
    g = _graph(spark, [1, 2, 3, 4, 5, 9], cyc)
    assert {r["id"] for r in graphalg.kcore_vertices(g, k=2).collect()} == {
        1, 2, 3, 4, 5,
    }
    assert graphalg.kcore_vertices(g, k=3).count() == 0


def test_sssp_prefers_cheaper_longer_path(spark):
    from pyspark.sql import functions as F

    # 1→2→4 costs 1+1=2, direct 1→4 costs 10; 1→3 costs 5; 5 unreachable
    g = _graph(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 4), (1, 4), (1, 3)])
    w = (
        F.when((F.col("src") == 1) & (F.col("dst") == 4), 10)
        .when((F.col("src") == 1) & (F.col("dst") == 3), 5)
        .otherwise(1)
    )
    got = {
        r["id"]: r["dist_scaled"]
        for r in graphalg.sssp_distances(g, weight=w, source=1).collect()
    }
    assert got == {1: 0, 2: 1, 3: 5, 4: 2}


def test_sssp_round_cap_bounds_path_length(spark):
    from pyspark.sql import functions as F

    # chain 1→2→3→4 at weight 1: one round only relaxes one hop
    g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)])
    got = {
        r["id"]: r["dist_scaled"]
        for r in graphalg.sssp_distances(
            g, weight=F.lit(1), source=1, rounds=1
        ).collect()
    }
    assert got == {1: 0, 2: 1}


def test_personalized_pagerank_localizes_mass(spark):
    # star out of 1 → {2,3}; 4 isolated. Teleport pinned to 1: the
    # source keeps the base mass, its neighbors split the damped mass,
    # and the isolated vertex scores zero (uniform PR would give it
    # base mass > 0)
    g = _graph(spark, [1, 2, 3, 4], [(1, 2), (1, 3)])
    ppr = {
        r["id"]: r["pr_scaled"]
        for r in graphalg.personalized_pagerank(g, source=1, iters=4).collect()
    }
    assert ppr[4] == 0
    assert ppr[1] > ppr[2] == ppr[3] > 0
    uni = {
        r["id"]: r["pr_scaled"] for r in graphalg.pagerank(g, iters=4).collect()
    }
    assert uni[4] > 0  # the contrast that makes it "personalized"
