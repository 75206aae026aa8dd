"""Round-10 second batch: value band census, priority/trigram sequence
censuses, collision stats, wedge-closure curve, directed triangles,
IVF-PQ ANN."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    graphalg,
    olap,
    similarity,
)

SF0001 = "/root/testdata/sf0.001"


def _graph(spark, vertex_ids, edge_pairs):
    v = spark.createDataFrame([(int(i),) for i in vertex_ids], "id LONG")
    e = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edge_pairs], "src LONG, dst LONG"
    )
    return NetGraph(v, e)


class TestValueBandCensus:
    def test_band_against_hand_quartiles(self, spark):
        # cents: 100..800 (8 values, one each) -> 0-indexed rank 1 (p25)
        # = 200, rank 5 (p75) = 600
        rows = [("a", v / 100.0) for v in range(100, 900, 100)]
        ev = spark.createDataFrame(rows, "event_type string, value double")
        r = olap.value_band_census(ev).collect()[0]
        # below 200: 1 row; in [200, 600]: 5 rows; above 600: 2 rows
        assert (r["n_below"], r["n_in"], r["n_above"]) == (1, 5, 2)

    def test_partition_totals(self, spark):
        ev = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0), ("b", 5.0)],
            "event_type string, value double",
        )
        out = olap.value_band_census(ev).collect()
        totals = {r["event_type"]: r["n_below"] + r["n_in"] + r["n_above"] for r in out}
        assert totals == {"a": 2, "b": 3}


class TestPriorityTransitionCensus:
    def test_known_transitions(self, spark):
        rows = [
            (1, 1, "1970-01-01", "HIGH"),
            (2, 1, "1970-01-03", "LOW"),
            (3, 1, "1970-01-05", "LOW"),
            (4, 2, "1970-01-02", "MED"),
        ]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, d string, o_orderpriority string"
        ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
        got = {
            (r["from_priority"], r["to_priority"]): r["n"]
            for r in olap.priority_transition_census(orders).collect()
        }
        assert got == {("HIGH", "LOW"): 1, ("LOW", "LOW"): 1}

    def test_same_day_ties_break_by_orderkey(self, spark):
        rows = [
            (5, 1, "1970-01-01", "B"),
            (4, 1, "1970-01-01", "A"),
        ]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, d string, o_orderpriority string"
        ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
        got = [
            (r["from_priority"], r["to_priority"])
            for r in olap.priority_transition_census(orders).collect()
        ]
        assert got == [("A", "B")]


class TestTypeTrigramCensus:
    def test_known_trigrams(self, spark):
        rows = [
            (1, 10, "1970-01-01 00:00:01", "v"),
            (2, 10, "1970-01-01 00:00:02", "c"),
            (3, 10, "1970-01-01 00:00:03", "p"),
            (4, 10, "1970-01-01 00:00:04", "v"),
            (5, 20, "1970-01-01 00:00:01", "v"),
            (6, 20, "1970-01-01 00:00:02", "c"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, t string, event_type string"
        ).withColumn("ts", F.col("t").cast("timestamp"))
        got = {
            (r["t1"], r["t2"], r["t3"]): r["n"]
            for r in olap.type_trigram_census(ev).collect()
        }
        # user 10 stream v,c,p,v -> trigrams (v,c,p), (c,p,v);
        # user 20 has only 2 events -> none
        assert got == {("v", "c", "p"): 1, ("c", "p", "v"): 1}

    def test_one_window_exec(self, spark):
        ev = spark.createDataFrame(
            [(1, 1, "1970-01-01 00:00:01", "v")],
            "event_id long, user_id long, t string, event_type string",
        ).withColumn("ts", F.col("t").cast("timestamp"))
        plan = (
            olap.type_trigram_census(ev)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the two lags share (partition, order) -> Catalyst collapses
        # them into a single Window operator
        assert plan.count("Window") - plan.count("WindowGroupLimit") <= 1


class TestLangCollisionStats:
    def test_known_distribution(self, spark):
        docs = spark.createDataFrame(
            [(1, "en", "a a a b"), (2, "en", "b c"), (3, "de", "x x")],
            "doc_id long, lang string, text string",
        )
        got = {
            r["lang"]: (r["n_tokens"], r["n_types"], int(r["sum_sq"]), r["max_count"])
            for r in corpusstats.lang_collision_stats(docs).collect()
        }
        # en: counts a=3, b=2, c=1 -> sum_sq = 9+4+1 = 14
        assert got == {"en": (6, 3, 14, 3), "de": (2, 1, 4, 2)}


class TestWedgeClosureByBucket:
    def test_triangle_plus_pendant(self, spark):
        # triangle 1-2-3 plus pendant 3-4: degs = {1:2, 2:2, 3:3, 4:1}
        g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (1, 3), (3, 4)])
        got = {
            r["degree_bits"]: (r["n_vertices"], r["n_wedges"], r["n_closed"])
            for r in graphalg.wedge_closure_by_bucket(g).collect()
        }
        # bits(1)=1: vertex 4 -> 0 wedges; bucket bits=2 holds vertices
        # 1, 2 (1 wedge each, 1 closed each) and 3 (3 wedges, 1 closed:
        # the triangle closes only the {1,2} wedge at vertex 3)
        assert got == {1: (1, 0, 0), 2: (3, 5, 3)}

    def test_totals_match_global_transitivity(self, spark):
        from big_data_graph_analysis_with_spark_spark.sources import tpch_graph

        og, _ = tpch_graph.derive_graphs(spark, SF0001)
        curve = graphalg.wedge_closure_by_bucket(og).agg(
            F.sum("n_wedges").alias("w"), F.sum("n_closed").alias("c")
        ).collect()[0]
        glob = graphalg.global_transitivity(og).collect()[0]
        assert curve["w"] == glob["wedges"]
        assert curve["c"] == glob["closed_wedges"]


class TestDirectedTriangleCensus:
    def test_cyclic_vs_transitive(self, spark):
        # cyclic: 1->2->3->1 ; transitive: 4->5, 5->6, 4->6
        g = _graph(
            spark,
            [1, 2, 3, 4, 5, 6],
            [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (4, 6)],
        )
        out = {r["graph"]: r for r in graphalg.directed_triangle_census(g, g).collect()}
        r = out["og"]
        # cyclic triangle: 3 rotations of u->v->w close cyclically;
        # transitive: exactly 1 path (4->5->6) closes with 4->6
        assert (r["n_cyclic_paths"], r["n_transitive_paths"], r["n_cyclic"]) == (
            3, 1, 1,
        )


class TestIvfPqAnn:
    def test_recall_vs_exact(self, spark):
        emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 20)
        all_pairs = (
            q.select(F.col("vec_id").alias("query_id"))
            .crossJoin(emb.select("vec_id"))
            .filter(F.col("query_id") != F.col("vec_id"))
        )
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity._rerank_topk(all_pairs, emb, q, 5).collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ann_ivfpq_topk(emb, q, k=5).collect()
        }
        recall = len(exact & got) / len(exact)
        # the composed index can only lose vs full-scan PQ through list
        # pruning; 0.7 leaves seed/boundary headroom
        assert recall >= 0.7, f"IVF-PQ recall@5 = {recall}"


class TestAttributeMixingMatrix:
    def test_known_labels(self, spark):
        # edges 1-2, 2-3; attr = id % 2 -> cells (0,1)x2? labels:
        # 1->1, 2->0, 3->1 ; edges (1,2)->(0,1), (2,3)->(0,1)
        v = spark.createDataFrame(
            [(1, 1), (2, 0), (3, 1)], "id long, children long"
        )
        e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        g = NetGraph(v, e)
        got = {
            (r["attr_a"], r["attr_b"]): r["n_edges"]
            for r in graphalg.attribute_mixing_matrix(g).collect()
        }
        assert got == {(0, 1): 2}

    def test_total_mass_is_edge_count(self, spark):
        from big_data_graph_analysis_with_spark_spark.sources import tpch_graph

        og, _ = tpch_graph.derive_graphs(spark, SF0001)
        total = (
            graphalg.attribute_mixing_matrix(og)
            .agg(F.sum("n_edges").alias("t"))
            .collect()[0]["t"]
        )
        n_und = graphalg.undirected_edges(og).count()
        assert total == n_und


class TestValueRoundnessCensus:
    def test_modular_classes(self, spark):
        ev = spark.createDataFrame(
            [
                ("a", 5.00),   # whole, not tens
                ("a", 10.00),  # whole + tens
                ("a", 2.50),   # half
                ("a", 2.37),   # none
                ("a", -1.00),  # filtered
            ],
            "event_type string, value double",
        )
        from big_data_graph_analysis_with_spark_spark.operators import olap

        r = olap.value_roundness_census(ev).collect()[0]
        assert (r["n_pos"], r["n_whole"], r["n_tens"], r["n_half"]) == (
            4, 2, 1, 1,
        )


class TestBowtieCensus:
    def test_known_bowtie(self, spark):
        # core cycle 1->2->3->1; IN: 0->1; OUT: 3->4; OTHER: 5 isolated,
        # 6->7 a disconnected edge (tendril-free OTHER mass)
        g = _graph(
            spark,
            [0, 1, 2, 3, 4, 5, 6, 7],
            [(1, 2), (2, 3), (3, 1), (0, 1), (3, 4), (6, 7)],
        )
        got = {
            r["region"]: r["n_vertices"]
            for r in graphalg.bowtie_census(g).collect()
        }
        assert got == {"CORE": 3, "IN": 1, "OUT": 1, "OTHER": 3}

    def test_largest_core_ties_to_smallest_label(self, spark):
        # two 2-cycles: {1,2} and {8,9}; tie on size -> core is the one
        # with the smaller scc_id label (max member id: 2 vs 9 -> {1,2})
        g = _graph(spark, [1, 2, 8, 9], [(1, 2), (2, 1), (8, 9), (9, 8)])
        got = {
            r["region"]: r["n_vertices"]
            for r in graphalg.bowtie_census(g).collect()
        }
        assert got == {"CORE": 2, "OTHER": 2}

    def test_regions_partition_vertices(self, spark):
        from big_data_graph_analysis_with_spark_spark.sources import tpch_graph
        import __spark_entry__ as entrymod

        og, _ = tpch_graph.derive_graphs(spark, SF0001)
        out = graphalg.bowtie_census(
            og, extra_edges=entrymod._scc_extra_edges(og)
        )
        total = out.agg(F.sum("n_vertices").alias("t")).collect()[0]["t"]
        assert total == og.vertices.count()


class TestShipDelayHistogram:
    def test_known_delays(self, spark):
        orders = spark.createDataFrame(
            [(1, "H", "1970-01-01"), (2, "L", "1970-01-10")],
            "o_orderkey long, o_orderpriority string, d string",
        ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
        li = spark.createDataFrame(
            [(1, "1970-01-03"), (1, "1970-01-03"), (2, "1970-01-10")],
            "l_orderkey long, s string",
        ).withColumn("l_shipdate", F.col("s").cast("timestamp"))
        from big_data_graph_analysis_with_spark_spark.operators import olap

        got = {
            (r["priority"], r["delay_days"]): r["n_lines"]
            for r in olap.ship_delay_histogram(orders, li).collect()
        }
        assert got == {("H", 2): 2, ("L", 0): 1}


class TestRepeatRateBySegment:
    def test_counts(self, spark):
        cust = spark.createDataFrame(
            [(1, "A"), (2, "A"), (3, "A"), (4, "B")],
            "c_custkey long, c_mktsegment string",
        )
        orders = spark.createDataFrame(
            [(10, 1), (11, 1), (12, 2)],
            "o_orderkey long, o_custkey long",
        )
        from big_data_graph_analysis_with_spark_spark.operators import olap

        got = {
            r["segment"]: (
                r["n_customers"], r["n_buyers"], r["n_repeat"], r["n_orders"]
            )
            for r in olap.repeat_rate_by_segment(cust, orders).collect()
        }
        # A: 3 customers, 2 buyers, 1 repeat (cust 1), 3 orders; B: idle
        assert got == {"A": (3, 2, 1, 3), "B": (1, 0, 0, 0)}


class TestSccSizeProfile:
    def test_two_cycles_and_singletons(self, spark):
        # 3-cycle {1,2,3}, 2-cycle {4,5}, singletons 6, 7
        g = _graph(
            spark,
            [1, 2, 3, 4, 5, 6, 7],
            [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4), (6, 7)],
        )
        got = {
            r["size_bits"]: (r["n_sccs"], r["n_vertices"])
            for r in graphalg.scc_size_profile(g).collect()
        }
        # size 1 (bits 1): vertices 6, 7 -> 2 sccs; size 2 and 3 share
        # bits 2: {4,5} and {1,2,3} -> 2 sccs, 5 vertices
        assert got == {1: (2, 2), 2: (2, 5)}


class TestInterpolatedMedianStats:
    def test_even_and_odd_counts(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import olap

        rows = [
            # flag A: 4 values 100..400 -> lo rank 1 = 200, hi rank 2 =
            # 300, median_x2 = 500
            ("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
            # flag B: 3 values -> lo = hi = 200, median_x2 = 400
            ("B", 1.0), ("B", 2.0), ("B", 3.0),
        ]
        li = spark.createDataFrame(
            rows, "l_returnflag string, l_extendedprice double"
        )
        got = {
            r["returnflag"]: (
                r["n"], r["lo_cents"], r["hi_cents"], r["median_x2_cents"]
            )
            for r in olap.interpolated_median_stats(li).collect()
        }
        assert got == {"A": (4, 200, 300, 500), "B": (3, 200, 200, 400)}

    def test_matches_percentile_cont_semantics(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import olap

        li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
        out = {r["returnflag"]: r for r in olap.interpolated_median_stats(li).collect()}
        ref = {
            r["l_returnflag"]: r["m"]
            for r in li.groupBy("l_returnflag")
            .agg(
                F.expr(
                    "percentile(cast(round(l_extendedprice * 100) as long), 0.5)"
                ).alias("m")
            )
            .collect()
        }
        for flag, r in out.items():
            assert abs(r["median_x2_cents"] / 2.0 - ref[flag]) < 1e-6


class TestRepeatPurchaseLatency:
    def test_gap_buckets_purchases_only(self, spark):
        rows = [
            # user 1: purchases at 0s, 3s, 10s -> gaps 3 (bits 2), 7
            # (bits 3); an interleaved view must NOT break the chain
            (1, 1, "1970-01-01 00:00:00", "purchase"),
            (2, 1, "1970-01-01 00:00:01", "view"),
            (3, 1, "1970-01-01 00:00:03", "purchase"),
            (4, 1, "1970-01-01 00:00:10", "purchase"),
            # user 2: single purchase -> no gap
            (5, 2, "1970-01-01 00:00:00", "purchase"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, t string, event_type string"
        ).withColumn("ts", F.col("t").cast("timestamp"))
        from big_data_graph_analysis_with_spark_spark.operators import olap

        got = {
            r["gap_bits"]: (r["n_gaps"], r["min_gap_s"], r["max_gap_s"])
            for r in olap.repeat_purchase_latency(ev).collect()
        }
        assert got == {2: (1, 3, 3), 3: (1, 7, 7)}
