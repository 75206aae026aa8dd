"""Round-10 operators: contingency χ² stats, OLS trend stats, Benford
census, order-gap RLE-ish histogram, exact mode, map-HOF census, word
run lengths, blocked edit-distance join, local bridges, dyad census,
embedding sign profile, PQ ANN."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    dedup,
    graphalg,
    jsonops,
    olap,
    similarity,
    textops,
)

SF0001 = "/root/testdata/sf0.001"


def _graph(spark, vertex_ids, edge_pairs):
    v = spark.createDataFrame([(int(i),) for i in vertex_ids], "id LONG")
    e = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edge_pairs], "src LONG, dst LONG"
    )
    return NetGraph(v, e)


class TestSegmentPriorityChisq:
    def test_known_contingency(self, spark):
        cust = spark.createDataFrame(
            [(1, "A"), (2, "A"), (3, "B")],
            "c_custkey long, c_mktsegment string",
        )
        orders = spark.createDataFrame(
            [(10, 1, "U"), (11, 1, "U"), (12, 2, "V"), (13, 3, "U")],
            "o_orderkey long, o_custkey long, o_orderpriority string",
        )
        got = {
            (r["segment"], r["priority"]): r
            for r in olap.segment_priority_chisq(cust, orders).collect()
        }
        # contingency: A/U=2, A/V=1, B/U=1; totals: A=3, B=1, U=3, V=1, G=4
        r = got[("A", "U")]
        assert (r["n_obs"], r["seg_total"], r["pri_total"], r["grand_total"]) == (
            2, 3, 3, 4,
        )
        # chi_num = G*n - S*P = 4*2 - 3*3 = -1
        assert int(r["chi_num"]) == -1
        assert int(got[("A", "V")]["chi_num"]) == 4 * 1 - 3 * 1
        assert int(got[("B", "U")]["chi_num"]) == 4 * 1 - 1 * 3

    def test_chi_num_sums_to_zero_over_margins_when_complete(self, spark):
        """For a COMPLETE contingency table, Σ chi_num within any segment
        (or priority) is algebraically zero: Σ_p (G·n_sp − S_s·P_p) =
        G·S_s − S_s·G."""
        cust = spark.createDataFrame(
            [(i, "S" + str(i % 2)) for i in range(1, 9)],
            "c_custkey long, c_mktsegment string",
        )
        orders = spark.createDataFrame(
            [(100 + i, (i % 8) + 1, "P" + str(i % 3)) for i in range(48)],
            "o_orderkey long, o_custkey long, o_orderpriority string",
        )
        out = olap.segment_priority_chisq(cust, orders)
        per_seg = (
            out.groupBy("segment").agg(F.sum("chi_num").alias("s")).collect()
        )
        assert all(int(r["s"]) == 0 for r in per_seg)


class TestDiscountTrendStats:
    def test_sufficient_stats_reconstruct_slope(self, spark):
        # y = 2x + 1 exactly, one flag -> slope numerator/denominator exact
        rows = [("A", f"1970-01-0{d}", (2 * d + 1) / 10000.0) for d in range(1, 6)]
        li = spark.createDataFrame(
            rows, "l_returnflag string, ship string, l_discount double"
        ).withColumn("l_shipdate", F.col("ship").cast("timestamp"))
        r = olap.discount_trend_stats(li).collect()[0]
        n, sx, sy, sxy, sx2 = (
            r["n"], int(r["sum_x"]), int(r["sum_y"]), int(r["sum_xy"]),
            int(r["sum_x2"]),
        )
        # x = epoch day of 1970-01-0d = d-1; y = 2d+1 = 2x+3
        num = n * sxy - sx * sy
        den = n * sx2 - sx * sx
        assert den > 0 and num == 2 * den  # slope exactly 2 bps/day


class TestEventValueBenford:
    def test_digit_extraction_and_filter(self, spark):
        ev = spark.createDataFrame(
            [
                ("a", 1.23),    # 123 -> 1
                ("a", 93.0),    # 9300 -> 9
                ("a", 0.0),     # 0 -> filtered
                ("a", -5.0),    # negative -> filtered
                ("b", 0.01),    # 1 -> 1
            ],
            "event_type string, value double",
        )
        got = {
            (r["event_type"], r["digit"]): r["n"]
            for r in olap.event_value_benford(ev).collect()
        }
        assert got == {("a", 1): 1, ("a", 9): 1, ("b", 1): 1}


class TestOrderGapProfile:
    def test_gap_buckets(self, spark):
        rows = [
            # customer 1: days 0, 1, 4 -> gaps 1 (bits 1), 3 (bits 2)
            (1, 1, "1970-01-01"), (2, 1, "1970-01-02"), (3, 1, "1970-01-05"),
            # customer 2: same day twice -> gap 0 (bits 1)
            (4, 2, "1970-02-01"), (5, 2, "1970-02-01"),
            # customer 3: single order -> no gap
            (6, 3, "1970-03-01"),
        ]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, d string"
        ).withColumn("o_orderdate", F.col("d").cast("timestamp"))
        got = {
            r["gap_bits"]: (r["n_gaps"], r["min_gap_days"], r["max_gap_days"])
            for r in olap.order_gap_profile(orders).collect()
        }
        assert got == {1: (2, 0, 1), 2: (1, 3, 3)}


class TestQuantityMode:
    def test_mode_with_tie_to_smallest(self, spark):
        rows = [
            ("A", "F", 5.0), ("A", "F", 5.0), ("A", "F", 3.0), ("A", "F", 3.0),
            ("A", "F", 9.0),
            ("B", "O", 7.0),
        ]
        li = spark.createDataFrame(
            rows, "l_returnflag string, l_linestatus string, l_quantity double"
        )
        got = {
            (r["returnflag"], r["linestatus"]): (r["mode_qty"], r["mode_count"])
            for r in olap.quantity_mode(li).collect()
        }
        # A/F: 3 and 5 both appear twice -> tie breaks to 3
        assert got == {("A", "F"): (3, 2), ("B", "O"): (7, 1)}


class TestUserTypeMapCensus:
    def test_known_histogram(self, spark):
        ev = spark.createDataFrame(
            [(1, "x")] * 6 + [(1, "y")] * 2 + [(1, "z")] * 1 + [(2, "x")],
            "user_id long, event_type string",
        )
        got = {
            r["user_id"]: (r["n_types"], r["n_events"], r["n_above_mean"])
            for r in jsonops.user_type_map_census(ev).collect()
        }
        # user 1: counts {x:6, y:2, z:1}, mean=3 -> only x strictly above
        # (6*3 > 9, 2*3 < 9, 1*3 < 9)
        assert got == {1: (3, 9, 1), 2: (1, 1, 0)}

    def test_plan_has_no_python_eval(self, spark):
        ev = spark.createDataFrame([(1, "x")], "user_id long, event_type string")
        plan = (
            jsonops.user_type_map_census(ev)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestWordRunLengths:
    def test_rle_islands(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "en", "a a b a"),
                (2, "en", "b  b b"),  # double space -> empty token dropped
                (3, "de", "x"),
            ],
            "doc_id long, lang string, text string",
        )
        got = {
            (r["lang"], r["run_len"]): r["n_runs"]
            for r in textops.word_run_lengths(docs).collect()
        }
        # doc1: runs [a×2, b×1, a×1]; doc2: [b×3]; doc3: [x×1]
        assert got == {
            ("en", 2): 1,
            ("en", 1): 2,
            ("en", 3): 1,
            ("de", 1): 1,
        }


class TestTypoPairJoin:
    def test_blocked_pairs_and_weights(self, spark):
        part = spark.createDataFrame(
            [
                (1, "old bolt"), (2, "cold bolt"), (3, "cold bolt"),
                (4, "red gear"),  # other block
                (5, "blue bolt"),  # dist 4 from 'old bolt' -> excluded
            ],
            "p_partkey long, p_name string",
        )
        rows = dedup.typo_pair_join(part).collect()
        got = {
            (r["name_a"], r["name_b"]): (r["dist"], r["n_parts_a"], r["n_parts_b"])
            for r in rows
        }
        assert got == {("cold bolt", "old bolt"): (1, 2, 1)}

    def test_cross_block_pairs_never_form(self, spark):
        # 'red bolt'/'red colt' are distance 1 but different last-token
        # blocks -- the documented blocking trade (a noun swap is treated
        # as a different entity, not a typo)
        part = spark.createDataFrame(
            [(1, "red bolt"), (2, "red colt")], "p_partkey long, p_name string"
        )
        assert dedup.typo_pair_join(part).count() == 0


class TestLocalBridgeCensus:
    def test_triangle_plus_pendant(self, spark):
        # triangle 1-2-3 plus pendant 3-4: the pendant edge has no
        # common neighbor -> the only local bridge
        g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (1, 3), (3, 4)])
        out = {r["graph"]: r for r in graphalg.local_bridge_census(g, g).collect()}
        assert out["og"]["n_edges"] == 4
        assert out["og"]["n_local_bridges"] == 1
        assert out["pg"]["n_local_bridges"] == 1

    def test_square_all_bridges(self, spark):
        # 4-cycle: no triangles at all -> every edge is a local bridge
        g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4), (4, 1)])
        out = {r["graph"]: r for r in graphalg.local_bridge_census(g, g).collect()}
        assert out["og"]["n_edges"] == 4
        assert out["og"]["n_local_bridges"] == 4


class TestDyadCensus:
    def test_mutual_asym_null(self, spark):
        # edges: 1<->2 mutual, 1->3 asym, vertex 4 isolated
        g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 1), (1, 3)])
        out = {r["graph"]: r for r in graphalg.dyad_census(g, g).collect()}
        r = out["og"]
        # C(4,2)=6 pairs: 1 mutual, 1 asym, 4 null
        assert (r["n_mutual"], r["n_asym"], r["n_null"]) == (1, 1, 4)

    def test_self_loops_and_duplicates_ignored(self, spark):
        g = _graph(spark, [1, 2], [(1, 1), (1, 2), (1, 2)])
        r = {x["graph"]: x for x in graphalg.dyad_census(g, g).collect()}["og"]
        assert (r["n_mutual"], r["n_asym"], r["n_null"]) == (0, 1, 0)


class TestEmbeddingSignProfile:
    def test_sign_counts(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, -1.0, 0.0]), (2, [2.0, 3.0, -4.0])],
            "vec_id long, embedding array<float>",
        )
        got = {
            r["dim"]: (r["n_neg"], r["n_zero"], r["n_pos"])
            for r in similarity.embedding_sign_profile(emb).collect()
        }
        assert got == {0: (0, 0, 2), 1: (1, 0, 1), 2: (1, 1, 0)}


class TestPQAnn:
    def test_codes_shape_and_determinism(self, spark):
        emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
        books = similarity.pq_codebooks(emb, m=16, n_codes=32)
        assert len(books) == 16
        again = similarity.pq_codebooks(emb, m=16, n_codes=32)
        import numpy as np

        assert all((a == b).all() for a, b in zip(books, again))
        codes = similarity.pq_assign(emb, books).collect()
        assert all(len(r["codes"]) == 16 for r in codes)
        assert all(0 <= c < 32 for r in codes for c in r["codes"])

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
            for r in similarity.ann_pq_topk(emb, q, k=5).collect()
        }
        recall = len(exact & got) / len(exact)
        # measured 0.94+ at the shipped defaults; 0.8 leaves seed headroom
        assert recall >= 0.8, f"PQ recall@5 = {recall}"

    def test_rank_contract(self, spark):
        emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        out = similarity.ann_pq_topk(emb, q, k=3).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, rows in by_q.items():
            ranks = sorted(r["rank"] for r in rows)
            assert ranks == list(range(1, len(rows) + 1))
            assert all(r["neighbor_id"] != qid for r in rows)
