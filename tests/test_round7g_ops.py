"""Round-7 seventh batch: component density profile, FK integrity
census, balance↔orders correlation inputs, brand price moments,
per-language token moments, and the mutual-kNN curve. Known-value
fixtures — SQL-oracle parity lives in test_oracle_parity via the entry
registry."""

from __future__ import annotations

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    graphalg,
    olap,
    similarity,
)


def _graph(spark, edges, ids):
    v = spark.createDataFrame([(i,) for i in ids], "id LONG")
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    return NetGraph(v, e)


# ------------------------------------------------ component density profile


def test_component_density_profile_clique_vs_path(spark):
    # triangle {1,2,3} (3 edges) + path 4-5-6 (2 edges) + isolate 7.
    g = _graph(
        spark,
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6)],
        [1, 2, 3, 4, 5, 6, 7],
    )
    got = {
        r["size_bits"]: (r["n_components"], r["n_vertices"], r["n_internal_edges"])
        for r in graphalg.component_density_profile(g).collect()
    }
    # sizes 3 and 3 → bits 2; size 1 → bits 1.
    assert got == {2: (2, 6, 5), 1: (1, 1, 0)}


# ------------------------------------------------------ fk integrity census


def test_fk_integrity_census_orphans(spark):
    orders = spark.createDataFrame(
        [(1,), (2,), (3,)], "o_orderkey LONG"
    )
    lineitem = spark.createDataFrame(
        [(1,), (1,), (4,)], "l_orderkey LONG"
    )
    row = olap.fk_integrity_census(orders, lineitem).collect()[0]
    assert row["n_order_keys"] == 3
    assert row["n_lineitem_keys"] == 2  # distinct {1, 4}
    assert row["n_matched"] == 1
    assert row["n_childless_orders"] == 2
    assert row["n_orphan_lineitem_keys"] == 1


# ----------------------------------------------------- custbal order corr


def test_custbal_order_corr_includes_zero_order_customers(spark):
    orders = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "o_orderkey LONG, o_custkey LONG"
    )
    customer = spark.createDataFrame(
        [(10, 1.0), (20, 2.0), (30, 3.0)],
        "c_custkey LONG, c_acctbal DOUBLE",
    )
    row = olap.custbal_order_corr(orders, customer).collect()[0]
    # bal cents: 100, 200, 300; orders: 2, 1, 0.
    assert row["n_customers"] == 3
    assert row["sum_bal"] == 600
    assert row["sum_orders"] == 3
    assert row["sum_bal_sq"] == 140000.0
    assert row["sum_orders_sq"] == 5.0
    assert row["sum_bal_orders"] == 400.0


# ----------------------------------------------------- brand price moments


def test_brand_price_moments_exact(spark):
    part = spark.createDataFrame(
        [(1, "B1", 1.0), (2, "B1", 2.0), (3, "B2", 5.0)],
        "p_partkey LONG, p_brand STRING, p_retailprice DOUBLE",
    )
    got = {
        r["brand"]: (
            r["n_parts"],
            r["sum_cents"],
            r["sum_sq_cents"],
            r["min_cents"],
            r["max_cents"],
        )
        for r in olap.brand_price_moments(part).collect()
    }
    assert got == {
        "B1": (2, 300, 50000.0, 100, 200),
        "B2": (1, 500, 250000.0, 500, 500),
    }


# ----------------------------------------------------- lang token moments


def test_lang_token_moments_sums(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "ab c"),  # tokens ab (2), c (1)
            (2, "en", "defg"),  # token defg (4)
            (3, "fr", "xy"),  # token xy (2)
        ],
        "doc_id LONG, lang STRING, text STRING",
    )
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_tokens"],
            r["sum_tok_len"],
            r["sum_tok_len_sq"],
        )
        for r in corpusstats.lang_token_moments(docs).collect()
    }
    assert got == {"en": (2, 3, 7, 21), "fr": (1, 1, 2, 4)}


# --------------------------------------------------------- knn mutuality


def test_knn_mutuality_pair_and_hub(spark):
    # 1 and 2 are near-identical (mutual rank-1); 3 is far away: its
    # rank-1/2 edges point in, but 1 and 2 reciprocate only at rank 2.
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.99, 0.14]),
            (3, [0.0, 1.0]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r["rank"]: (r["n_edges"], r["n_mutual"])
        for r in similarity.knn_mutuality(emb, k=2).collect()
    }
    # with 3 vectors and k=2 every ordered pair is an edge → all
    # reciprocated somewhere within k.
    assert got == {1: (3, 3), 2: (3, 3)}


def test_knn_mutuality_asymmetric(spark):
    # k=1: 1↔2 mutual; 3's nearest is 2 but 2's nearest is 1 → the
    # rank-1 stratum has 3 edges, 2 mutual.
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.99, 0.14]),
            (3, [0.5, 0.86]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r["rank"]: (r["n_edges"], r["n_mutual"])
        for r in similarity.knn_mutuality(emb, k=1).collect()
    }
    assert got == {1: (3, 2)}
