"""Round-7 operators: Pareto/ABC coverage cut, TPC-H Q16/Q22/Q7
shapes, grouped-lengths Gini statistics, and exact centroid distances.
Known-value fixtures — the SQL-oracle parity for the same operators
lives in test_oracle_parity via the entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    olap,
    similarity,
)


# ---------------------------------------------------------------- pareto


def _weighted(spark, rows):
    from decimal import Decimal

    rows = [(k, Decimal(str(v))) for k, v in rows]
    return spark.createDataFrame(rows, "suppkey STRING, revenue DECIMAL(38,4)")


def test_pareto_coverage_includes_crossing_row(spark):
    df = _weighted(
        spark, [("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0)]
    )
    out = olap.pareto_coverage(df, "suppkey", "revenue", 4, 5).collect()
    got = {r["suppkey"]: float(r["cum_weight"]) for r in out}
    # 80% of 100 = 80: a (cum 50) and b (cum 80, the crossing row) are
    # kept; c starts at exactly 80 so the strict < cuts it.
    assert got == {"a": 50.0, "b": 80.0}


def test_pareto_coverage_exact_boundary_excluded(spark):
    df = _weighted(spark, [("a", 50.0), ("b", 50.0)])
    out = olap.pareto_coverage(df, "suppkey", "revenue", 1, 2).collect()
    assert [r["suppkey"] for r in out] == ["a"]


def test_pareto_coverage_tie_order_is_key_asc(spark):
    df = _weighted(spark, [("y", 40.0), ("x", 40.0), ("z", 20.0)])
    out = olap.pareto_coverage(df, "suppkey", "revenue", 1, 2).collect()
    # ties broken key-ASC: x before y; 50% of 100 = 50 → x (before=0)
    # and y (before=40) kept, z (before=80) cut.
    assert sorted(r["suppkey"] for r in out) == ["x", "y"]


# ------------------------------------------------------- Q16/Q22/Q7 shapes


def test_part_supplier_variety_distinct_after_exclusion(spark):
    li = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (1, 3), (2, 1)],
        "l_partkey LONG, l_suppkey LONG",
    )
    part = spark.createDataFrame(
        [(1, "B1", 1), (2, "B1", 2)], "p_partkey LONG, p_brand STRING, p_size INT"
    )
    supp = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 0.0)], "s_suppkey LONG, s_acctbal DOUBLE"
    )
    out = {
        (r["p_brand"], r["p_size"]): r["supplier_cnt"]
        for r in olap.part_supplier_variety(li, part, supp).collect()
    }
    # supplier 2 excluded (negative balance); duplicate (p1, s1) rows
    # collapse under the distinct count.
    assert out == {("B1", 1): 2, ("B1", 2): 1}


def test_idle_customers_threshold_and_recency(spark):
    cust = spark.createDataFrame(
        [(1, 1, 100.0), (2, 1, 300.0), (4, 2, 200.0), (5, 2, 250.0),
         (6, 3, 400.0)],
        "c_custkey LONG, c_nationkey LONG, c_acctbal DOUBLE",
    )
    orders = spark.createDataFrame(
        [(10, 2, datetime.datetime(1999, 5, 5)),
         (11, 5, datetime.datetime(2000, 6, 1))],
        "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP",
    )
    out = {
        r["nationkey"]: (r["n_custs"], r["total_acctbal"])
        for r in olap.idle_customers(cust, orders, "2000-01-01").collect()
    }
    # avg positive balance = 250. Above (strict): c2=300, c6=400.
    # c2's only order is pre-cutoff (idle, kept); c6 never ordered
    # (kept); c5=250 sits exactly on the threshold (strict >, dropped).
    assert out == {1: (1, 300.0), 3: (1, 400.0)}


def test_nation_trade_flow_cross_nation_only(spark):
    nation = spark.createDataFrame(
        [(0, "A"), (1, "B")], "n_nationkey LONG, n_name STRING"
    )
    supp = spark.createDataFrame(
        [(1, 0), (2, 1)], "s_suppkey LONG, s_nationkey LONG"
    )
    cust = spark.createDataFrame(
        [(1, 1), (2, 0)], "c_custkey LONG, c_nationkey LONG"
    )
    orders = spark.createDataFrame(
        [(100, 1), (200, 2)], "o_orderkey LONG, o_custkey LONG"
    )
    li = spark.createDataFrame(
        [
            (100, 1, datetime.datetime(1995, 3, 1), 100.0, 0.10),
            (100, 2, datetime.datetime(1995, 3, 2), 10.0, 0.0),
            (200, 1, datetime.datetime(1996, 7, 1), 50.0, 0.0),
            (200, 2, datetime.datetime(1996, 7, 2), 200.0, 0.25),
        ],
        "l_orderkey LONG, l_suppkey LONG, l_shipdate TIMESTAMP, "
        "l_extendedprice DOUBLE, l_discount DOUBLE",
    )
    out = {
        (r["supp_nation"], r["cust_nation"], r["year"]):
            (r["revenue"], r["n_lineitems"])
        for r in olap.nation_trade_flow(li, orders, cust, supp, nation).collect()
    }
    # same-nation flows (s2→c1 both B, s1→c2 both A) are dropped.
    assert out == {
        ("A", "B", 1995): (90.0, 1),
        ("B", "A", 1996): (150.0, 1),
    }


# ------------------------------------------------------------ length gini


def test_length_gini_known_values(spark):
    docs = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 4)], "doc_id LONG, n_chars LONG"
    )
    row = corpusstats.length_gini_stats(docs).collect()[0]
    # sorted lengths 1,1,2,4 → ranks 1..4; Σ rank·len = 1+2+6+16 = 25
    assert row["n_docs"] == 4
    assert int(row["total_len"]) == 8
    assert int(row["sum_rank_len"]) == 25
    assert int(row["gini_num"]) == 2 * 25 - 5 * 8  # = 10
    assert int(row["gini_den"]) == 4 * 8  # gini = 10/32 = 0.3125


def test_length_gini_uniform_lengths_zero_gini(spark):
    docs = spark.createDataFrame(
        [(i, 7) for i in range(5)], "doc_id LONG, n_chars LONG"
    )
    row = corpusstats.length_gini_stats(docs).collect()[0]
    assert int(row["gini_num"]) == 0


# ----------------------------------------------------- centroid distances


def test_centroid_distances_known_value(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
        ],
        "label LONG, embedding ARRAY<DOUBLE>",
    )
    rows = similarity.centroid_distances(emb).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["label_a"], r["label_b"], r["n_a"], r["n_b"]) == (0, 1, 2, 1)
    # S_0 = (2e6, 0), S_1 = (0, 1e6):
    # dist_num = (1·2e6 − 2·0)² + (1·0 − 2·1e6)² = 8e12
    # true dist² = 8e12 / (n_a·n_b·1e6)² = 2  (unit vectors at 90°)
    assert int(r["dist_num"]) == 8_000_000_000_000


def test_centroid_distances_identical_centroids_zero(spark):
    emb = spark.createDataFrame(
        [(0, [0.5, -0.25]), (1, [0.5, -0.25]), (1, [0.5, -0.25])],
        "label LONG, embedding ARRAY<DOUBLE>",
    )
    r = similarity.centroid_distances(emb).collect()[0]
    assert int(r["dist_num"]) == 0


# ------------------------------------------------- round-7 growth batch


def _graph(spark, vertex_ids, edge_pairs):
    from big_data_graph_analysis_with_spark_spark.model import NetGraph

    v = spark.createDataFrame([(int(i),) for i in vertex_ids], "id LONG")
    e = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edge_pairs], "src LONG, dst LONG"
    )
    return NetGraph(v, e)


def test_degree_clustering_profile_triangle_plus_pendant(spark):
    from big_data_graph_analysis_with_spark_spark.operators import graphalg

    # K3 on {1,2,3} with pendant 4 on vertex 1: degrees 3,2,2,1;
    # lcc_ppm = 333333, 1e6, 1e6, 0; bit-length buckets: {3,2,2}→2, {1}→1
    g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 1), (1, 4)])
    out = {
        r["degree_bits"]: (
            r["n_vertices"], r["sum_triangles"], r["sum_lcc_ppm"],
            r["mean_lcc_ppm"],
        )
        for r in graphalg.degree_clustering_profile(g).collect()
    }
    assert out[2] == (3, 3, 333333 + 1_000_000 + 1_000_000, 2333333 // 3)
    assert out[1] == (1, 0, 0, 0)


def test_order_priority_funnel_late_flag_and_totals(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", datetime.datetime(1995, 1, 1)),
            (2, "1-URGENT", datetime.datetime(1995, 2, 1)),
            (3, "2-HIGH", datetime.datetime(1995, 4, 1)),
        ],
        "o_orderkey LONG, o_orderpriority STRING, o_orderdate TIMESTAMP",
    )
    li = spark.createDataFrame(
        [
            # order 1: one late (>60 days), one early line
            (1, datetime.datetime(1995, 3, 15)),
            (1, datetime.datetime(1995, 1, 10)),
            # order 2: only an early line
            (2, datetime.datetime(1995, 2, 20)),
        ],
        "l_orderkey LONG, l_shipdate TIMESTAMP",
    )
    out = {
        (r["o_orderpriority"], r["quarter"]): (r["n_orders"], r["n_late"])
        for r in olap.order_priority_funnel(li, orders).collect()
    }
    # order 3 has no lineitems at all: counted, never late
    assert out == {
        ("1-URGENT", 19951): (2, 1),
        ("2-HIGH", 19952): (1, 0),
    }


def test_supplier_leadtime_quantiles_rank_selection(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    base = datetime.datetime(1995, 1, 1)
    orders = spark.createDataFrame(
        [(i, base) for i in range(1, 6)],
        "o_orderkey LONG, o_orderdate TIMESTAMP",
    )
    li = spark.createDataFrame(
        [
            (i, 7, base + datetime.timedelta(days=i))  # lead days 1..5
            for i in range(1, 6)
        ],
        "l_orderkey LONG, l_suppkey LONG, l_shipdate TIMESTAMP",
    )
    out = {
        r["p_label"]: (r["n_items"], r["q_lead_days"])
        for r in olap.supplier_leadtime_quantiles(li, orders).collect()
    }
    # n=5: p50 rank (5-1)*1 div 2 = 2 → value 3; p90/p99 rank 3 → 4
    assert out == {"p50": (5, 3), "p90": (5, 4), "p99": (5, 4)}


def test_large_orders_threshold_and_order(spark):
    from decimal import Decimal
    from big_data_graph_analysis_with_spark_spark.operators import olap

    orders = spark.createDataFrame(
        [
            (1, 10, datetime.datetime(1995, 1, 1)),
            (2, 20, datetime.datetime(1995, 2, 1)),
            (3, 30, datetime.datetime(1995, 3, 1)),
        ],
        "o_orderkey LONG, o_custkey LONG, o_orderdate TIMESTAMP",
    )
    li = spark.createDataFrame(
        [(1, 250.0), (2, 200.0), (3, 150.0), (3, 150.0)],
        "l_orderkey LONG, l_quantity DOUBLE",
    )
    rows = olap.large_orders(li, orders, min_qty=200, k=10).collect()
    # order 2 sums to exactly 200 (strict >, excluded); 3 (300) > 1 (250)
    assert [(r["o_orderkey"], r["sum_qty"]) for r in rows] == [
        (3, 300.0), (1, 250.0),
    ]


def test_small_lot_revenue_cross_multiplied_threshold(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    part = spark.createDataFrame(
        [(1, "B1")], "p_partkey LONG, p_brand STRING"
    )
    li = spark.createDataFrame(
        # part 1: qty 1,10,10,10 → sum 31, n 4; small iff 20·qty < 31
        [(1, 1.0, 100.0, 0.10), (1, 10.0, 50.0, 0.0),
         (1, 10.0, 50.0, 0.0), (1, 10.0, 50.0, 0.0)],
        "l_partkey LONG, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE",
    )
    rows = olap.small_lot_revenue(li, part).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["p_brand"], r["n_small_lots"], r["revenue"]) == ("B1", 1, 90.0)


def test_top_inactivity_gaps_order_and_values(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    base = datetime.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base, 1, "click", 0.0, ""),
            (2, base + datetime.timedelta(seconds=10), 1, "click", 0.0, ""),
            (3, base + datetime.timedelta(seconds=100), 1, "click", 0.0, ""),
            (4, base, 2, "view", 0.0, ""),  # single event: no gap
        ],
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    rows = olap.top_inactivity_gaps(ev, k=10).collect()
    assert [(r["user_id"], r["gap_us"], r["gap_end_event"]) for r in rows] == [
        (1, 90_000_000, 3), (1, 10_000_000, 2),
    ]


def test_source_length_quantiles_per_source(spark):
    docs = spark.createDataFrame(
        [(i, "s1", i) for i in range(1, 6)] + [(10, "s2", 42)],
        "doc_id LONG, source STRING, n_chars LONG",
    )
    out = {
        (r["source"], r["p_label"]): (r["n_docs"], r["q_chars"])
        for r in corpusstats.source_length_quantiles(docs).collect()
    }
    assert out[("s1", "p50")] == (5, 3)
    assert out[("s1", "p90")] == (5, 4)
    assert out[("s2", "p50")] == (1, 42)


def test_charclass_profile_census(spark):
    docs = spark.createDataFrame(
        [(1, "ab1 ?\n", "en"), (2, "xy", "en"), (3, "12", "de")],
        "doc_id LONG, text STRING, lang STRING",
    )
    out = {
        r["lang"]: (
            r["n_docs"], r["n_chars"], r["n_alpha"], r["n_digit"],
            r["n_space"], r["n_other"],
        )
        for r in corpusstats.charclass_profile(docs).collect()
    }
    # "ab1 ?\n": 6 chars = 2 alpha + 1 digit + 2 ws (space, \n) + 1 other
    assert out["en"] == (2, 8, 4, 1, 2, 1)
    assert out["de"] == (1, 2, 0, 2, 0, 0)


# ----------------------------------------------- round-7 growth batch 2


def test_rich_club_profile_star_plus_core(spark):
    from big_data_graph_analysis_with_spark_spark.operators import graphalg

    # core triangle {1,2,3} (degrees 3,3,2 after pendants) + pendants:
    # 1-4, 2-5. degrees: 1→3, 2→3, 3→2, 4→1, 5→1
    g = _graph(
        spark, [1, 2, 3, 4, 5],
        [(1, 2), (2, 3), (3, 1), (1, 4), (2, 5)],
    )
    out = {
        r["k"]: (r["n_nodes"], r["n_edges"], r["density_ppm"])
        for r in graphalg.rich_club_profile(g, thresholds=(1, 2, 4)).collect()
    }
    # k=1: nodes deg>1 = {1,2,3}; edges among them = 3 (the triangle);
    # density = 2*3/(3*2) = 1.0
    assert out[1] == (3, 3, 1_000_000)
    # k=2: nodes deg>2 = {1,2}; edge 1-2 kept; density = 2/(2*1) = 1.0
    assert out[2] == (2, 1, 1_000_000)
    # k=4: no nodes → absent row (node_counts drives the frame)
    assert 4 not in out


def test_joint_degree_profile_buckets(spark):
    from big_data_graph_analysis_with_spark_spark.operators import graphalg

    # path 1-2-3: degrees 1,2,1 → edges (1,2): bits (1,2) twice
    g = _graph(spark, [1, 2, 3], [(1, 2), (2, 3)])
    out = {
        (r["bits_lo"], r["bits_hi"]): r["n_edges"]
        for r in graphalg.joint_degree_profile(g).collect()
    }
    assert out == {(1, 2): 2}


def test_weekly_active_users_integer_buckets(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    base = datetime.datetime(2024, 1, 1)  # epoch day 19723 → bucket 2817
    ev = spark.createDataFrame(
        [
            (1, base, 1, "click", 0.0, ""),
            (2, base + datetime.timedelta(days=1), 2, "click", 0.0, ""),
            (3, base + datetime.timedelta(days=1), 1, "view", 0.0, ""),
            (4, base + datetime.timedelta(days=8), 1, "view", 0.0, ""),
        ],
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    out = {
        r["week_bucket"]: (r["n_events"], r["n_users"])
        for r in olap.weekly_active_users(ev).collect()
    }
    b0 = 19723 // 7
    # Jan 1 2024 is epoch day 19723; days 19723-19724 share bucket, day
    # 19731 is the next
    assert out[b0] == (3, 2)
    assert out[19731 // 7] == (1, 1)
    assert len(out) == 2


def test_stopword_coverage_ppm(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "en"), (2, "zzz qqq", "xx")],
        "doc_id LONG, text STRING, lang STRING",
    )
    out = {
        r["lang"]: (r["n_tokens"], r["n_stopword_tokens"], r["coverage_ppm"])
        for r in corpusstats.stopword_coverage(docs).collect()
    }
    # en: 6 tokens, stopwords {the, on, the} = 3 → 500000 ppm
    assert out["en"] == (6, 3, 500_000)
    assert out["xx"] == (2, 0, 0)


def test_cheapest_supplier_argmin_and_ties(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    li = spark.createDataFrame(
        [
            (1, 10, 5.0), (1, 10, 9.0),  # pair (1,10) min 5.0
            (1, 20, 5.0),                 # tie at 5.0 → suppkey 10 wins
            (2, 30, 7.0), (2, 20, 8.0),
        ],
        "l_partkey LONG, l_suppkey LONG, l_extendedprice DOUBLE",
    )
    out = {
        r["partkey"]: (r["suppkey"], r["min_price"])
        for r in olap.cheapest_supplier_per_part(li).collect()
    }
    assert out == {1: (10, 5.0), 2: (30, 7.0)}


def test_disjunctive_revenue_branches(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    part = spark.createDataFrame(
        [(1, "Brand#12"), (2, "Brand#23")], "p_partkey LONG, p_brand STRING"
    )
    li = spark.createDataFrame(
        [
            (1, 5.0, 100.0, 0.0),    # b12_small (qty 1-11)
            (1, 50.0, 100.0, 0.0),   # qty out of range: no branch
            (2, 15.0, 200.0, 0.5),   # b23_mid → 100.0
        ],
        "l_partkey LONG, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE",
    )
    out = {
        r["branch"]: (r["n_items"], r["revenue"])
        for r in olap.disjunctive_revenue(li, part).collect()
    }
    assert out == {
        "b12_small": (1, 100.0),
        "b23_mid": (1, 100.0),
        "b34_large": (0, 0.0),  # empty branch still emits its row
    }


def test_embedding_grid_occupancy_quantiles(spark):
    # 2 vectors land in deterministic grid cells; with tiny input the
    # quantile selection must still pick real cell sizes
    emb = spark.createDataFrame(
        [(i, [float(i + 1), float(-i - 1)]) for i in range(6)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    rows = similarity.embedding_grid_occupancy(emb, bits=2).collect()
    got = {r["p_label"]: r for r in rows}
    assert set(got) == {"p50", "p90", "p99"}
    n_cells = got["p50"]["n_cells"]
    total = sum(
        r["n_vecs"]
        for r in similarity.embedding_grid_clusters(emb, bits=2).collect()
    )
    assert total == 6 and n_cells >= 1
    assert got["p50"]["q_cell_size"] <= got["p99"]["q_cell_size"]
