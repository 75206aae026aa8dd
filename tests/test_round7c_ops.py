"""Round-7 third batch: common-neighbor histogram, RFM segmentation
grid, part-catalog ROLLUP, nation revenue trend, vocabulary overlap,
and the embedding dot-product histogram. Known-value fixtures —
SQL-oracle parity for the same operators lives in test_oracle_parity
via the entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    graphalg,
    olap,
    similarity,
)


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


# ------------------------------------------------- common-neighbor histogram


def _graph(spark, edges, ids):
    v = spark.createDataFrame([(i,) for i in ids], "id LONG")
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    return NetGraph(v, e)


def test_common_neighbor_hist_square_diagonals(spark):
    # 4-cycle 1-2-3-4-1: the two diagonals each share 2 neighbors and
    # are NOT edges; no edge pair shares any neighbor.
    g = _graph(spark, [(1, 2), (2, 3), (3, 4), (4, 1)], [1, 2, 3, 4])
    got = {
        (r["is_edge"], r["n_common"]): r["n_pairs"]
        for r in graphalg.common_neighbor_histogram(g).collect()
    }
    assert got == {(False, 2): 2}


def test_common_neighbor_hist_triangle_edges(spark):
    # triangle: every edge pair shares exactly the third vertex.
    g = _graph(spark, [(1, 2), (2, 3), (3, 1)], [1, 2, 3])
    got = {
        (r["is_edge"], r["n_common"]): r["n_pairs"]
        for r in graphalg.common_neighbor_histogram(g).collect()
    }
    assert got == {(True, 1): 3}


def test_common_neighbor_hist_hub_cap(spark):
    # star K1,5: with the hub capped out no wedge centers remain; with
    # cap=None the 10 leaf pairs all share the hub.
    edges = [(0, i) for i in range(1, 6)]
    g = _graph(spark, edges, list(range(6)))
    assert graphalg.common_neighbor_histogram(g, max_center_degree=4).count() == 0
    got = {
        (r["is_edge"], r["n_common"]): r["n_pairs"]
        for r in graphalg.common_neighbor_histogram(
            g, max_center_degree=None
        ).collect()
    }
    assert got == {(False, 1): 10}


# ------------------------------------------------------------- RFM segments


def test_rfm_segments_buckets_and_spend(spark):
    orders = spark.createDataFrame(
        [
            (1, 1, 10.0, _ts(2020, 1, 1)),
            (2, 1, 20.0, _ts(2020, 1, 10)),
            (3, 2, 5.0, _ts(2020, 1, 10)),
        ],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP",
    )
    got = {
        (r["r_bucket"], r["f_bucket"]): (r["n_customers"], r["monetary"])
        for r in olap.rfm_segments(orders).collect()
    }
    # both customers last-ordered on the corpus max day → rec_days = 0
    # → bucket len(bin(0)) = 1; freq 2 → bucket 2, freq 1 → bucket 1.
    assert got == {(1, 2): (1, 30.0), (1, 1): (1, 5.0)}


def test_rfm_segments_recency_bucket(spark):
    orders = spark.createDataFrame(
        [
            (1, 1, 1.0, _ts(2020, 1, 1)),  # 9 days stale → bin(9) len 4
            (2, 2, 1.0, _ts(2020, 1, 10)),
        ],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP",
    )
    got = {
        (r["r_bucket"], r["f_bucket"]): r["n_customers"]
        for r in olap.rfm_segments(orders).collect()
    }
    assert got == {(4, 1): 1, (1, 1): 1}


# ------------------------------------------------------ part catalog rollup


def test_part_catalog_rollup_levels(spark):
    part = spark.createDataFrame(
        [
            (1, "B1", "T1", 5, 10.0),
            (2, "B1", "T2", 3, 20.0),
            (3, "B2", "T1", 2, 40.0),
        ],
        "p_partkey LONG, p_brand STRING, p_type STRING, p_size INT,"
        " p_retailprice DOUBLE",
    )
    got = {
        (r["brand"], r["type"]): (r["n_parts"], r["retail_total"], r["size_total"])
        for r in olap.part_catalog_rollup(part).collect()
    }
    assert got == {
        ("B1", "T1"): (1, 10.0, 5),
        ("B1", "T2"): (1, 20.0, 3),
        ("B2", "T1"): (1, 40.0, 2),
        ("B1", "ALL"): (2, 30.0, 8),
        ("B2", "ALL"): (1, 40.0, 2),
        ("ALL", "ALL"): (3, 70.0, 10),
    }


# ----------------------------------------------------- nation revenue trend


def test_nation_revenue_trend_lag(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, 10.0, _ts(1995, 2, 1)),
            (2, 10, 20.0, _ts(1995, 5, 1)),
            (3, 20, 7.0, _ts(1995, 2, 2)),
        ],
        "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP",
    )
    customer = spark.createDataFrame(
        [(10, 1), (20, 2)], "c_custkey LONG, c_nationkey INT"
    )
    nation = spark.createDataFrame(
        [(1, "FR"), (2, "DE")], "n_nationkey INT, n_name STRING"
    )
    rows = sorted(
        olap.nation_revenue_trend(orders, customer, nation).collect(),
        key=lambda r: (r["nation"], r["quarter"]),
    )
    got = [
        (r["nation"], r["quarter"], r["revenue"], r["prev_revenue"], r["n_orders"])
        for r in rows
    ]
    assert got == [
        ("DE", 19951, 7.0, None, 1),
        ("FR", 19951, 10.0, None, 1),
        ("FR", 19952, 20.0, 10.0, 1),
    ]


# ----------------------------------------------------------- vocab overlap


def test_vocab_overlap_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "web", "a b  c"),  # double space → empty token dropped
            (2, "web", "a"),  # repeat token — vocab counts distinct
            (3, "book", "b c d"),
            (4, "blog", "x"),
        ],
        "doc_id LONG, source STRING, text STRING",
    )
    rows = corpusstats.vocab_overlap(docs).collect()
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_common"],
            r["vocab_a"],
            r["vocab_b"],
        )
        for r in rows
    }
    # blog shares nothing → only the (book, web) pair appears.
    assert got == {("book", "web"): (2, 3, 3)}


# ------------------------------------------------------ embedding dot bands


def test_embedding_dot_hist_bands(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.5, 0.5]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r["band"]: r["n_pairs"]
        for r in similarity.embedding_dot_hist(emb, n_groups=1).collect()
    }
    # dots: 1·2 = 0.5 → band 5; 1·3 = −1.0 → band −10; 2·3 = −0.5 → −5.
    assert got == {5: 1, -10: 1, -5: 1}


def test_embedding_dot_hist_sample_mod(spark):
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(1, 5)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    # sample_mod=2 keeps vec_ids 2 and 4 only → one pair, dot 1.0.
    got = {
        r["band"]: r["n_pairs"]
        for r in similarity.embedding_dot_hist(
            emb, n_groups=1, sample_mod=2
        ).collect()
    }
    assert got == {10: 1}
