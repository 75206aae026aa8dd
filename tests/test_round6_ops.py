"""Round-6 operators, pinned on hand-computed fixtures (SQL-oracle
parity for every one of them lives in test_oracle_parity.py /
test_registry_lint.py; these check the semantics themselves):
neighbor Jaccard, resource allocation, two-hop reach, component size
histogram, char trigram profile, token length histogram, quality
deciles, text normalization, embedding norms, dimension variance,
dup-cluster size histogram."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.model import NetGraph
from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    curation,
    dedup,
    graphalg,
    similarity,
    textops,
)


def _graph(spark, vertex_ids, edge_pairs):
    v = spark.createDataFrame([(int(i),) for i in vertex_ids], "id LONG")
    e = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edge_pairs], "src LONG, dst LONG"
    )
    return NetGraph(v, e)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )


def test_neighbor_jaccard_triangle_plus_pendant(spark):
    # K3 {1,2,3} + pendant 3-4. Edge (1,2): N(1)={2,3}, N(2)={1,3},
    # common={3}, union size 2+2-1=3 → 333333 ppm. Edges at vertex 3
    # (deg 3): union 2+3-1=4 → 250000. Edge (3,4): no common → 0.
    g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 1), (3, 4)])
    got = {
        (r["a"], r["b"]): (r["n_common"], r["jaccard_ppm"])
        for r in graphalg.neighbor_jaccard(g).collect()
    }
    assert got[(1, 2)] == (1, 333_333)
    assert got[(1, 3)] == (1, 250_000)
    assert got[(2, 3)] == (1, 250_000)
    assert got[(3, 4)] == (0, 0)
    assert len(got) == 4


def test_neighbor_jaccard_hub_cap_drops_center(spark):
    # star center 0 with leaves 1..4 plus edge 1-2: with the center
    # capped out of wedge service (max_center_degree=3 < deg(0)=4),
    # edge (1,2) loses its only common neighbor and counts 0.
    edges = [(0, i) for i in range(1, 5)] + [(1, 2)]
    g = _graph(spark, list(range(5)), edges)
    uncapped = {
        (r["a"], r["b"]): r["n_common"]
        for r in graphalg.neighbor_jaccard(g, max_center_degree=None).collect()
    }
    capped = {
        (r["a"], r["b"]): r["n_common"]
        for r in graphalg.neighbor_jaccard(g, max_center_degree=3).collect()
    }
    assert uncapped[(1, 2)] == 1
    assert capped[(1, 2)] == 0


def test_resource_allocation_prefers_low_degree_commons(spark):
    # path 1-2-3 and 1-4-3 with extra 2-5: pair (1,3) shares centers 2
    # (deg 3) and 4 (deg 2) → ra = 1e9//3 + 1e9//2.
    g = _graph(
        spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (1, 4), (4, 3), (2, 5)]
    )
    got = {
        (r["a"], r["b"]): (r["ra_ppb"], r["common_neighbors"])
        for r in graphalg.resource_allocation_scores(g, k=10).collect()
    }
    assert got[(1, 3)] == (1_000_000_000 // 3 + 500_000_000, 2)
    # adjacent pairs never appear
    assert (1, 2) not in got


def test_two_hop_reach_directed(spark):
    # 1→2→3→4, plus 1→3: reach(1) = {2,3,4} (3 via both paths counted
    # once), reach(2) = {3,4}, reach(3) = {4}, reach(4) = 0.
    g = _graph(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4), (1, 3)])
    got = {
        r["id"]: r["n_reach_2"] for r in graphalg.two_hop_reach(g).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1, 4: 0}


def test_two_hop_reach_excludes_self_on_cycle(spark):
    # 2-cycle 1↔2: each reaches the other in 1 hop and itself in 2 —
    # the self hit must not count.
    g = _graph(spark, [1, 2], [(1, 2), (2, 1)])
    got = {
        r["id"]: r["n_reach_2"] for r in graphalg.two_hop_reach(g).collect()
    }
    assert got == {1: 1, 2: 1}


def test_component_size_histogram(spark):
    # K3 + one edge pair + two isolated: sizes 3, 2, 1, 1.
    g = _graph(
        spark, [1, 2, 3, 4, 5, 6, 7], [(1, 2), (2, 3), (3, 1), (4, 5)]
    )
    got = {
        r["component_size"]: r["n_components"]
        for r in graphalg.component_size_histogram(g).collect()
    }
    assert got == {3: 1, 2: 1, 1: 2}


def test_char_trigram_profile_counts_and_ties(spark):
    docs = _docs(spark, [("aaab", "xx", "s"), ("ab", "xx", "s")])
    # trigrams of "aaab": aaa, aab; "ab" too short → filtered.
    got = {
        (r["lang"], r["trigram"]): (r["n_occurrences"], r["rank"])
        for r in corpusstats.char_trigram_profile(docs, k=5).collect()
    }
    # counts tie at 1 → rank by trigram ASC
    assert got[("xx", "aaa")] == (1, 1)
    assert got[("xx", "aab")] == (1, 2)
    assert len(got) == 2


def test_token_length_histogram(spark):
    docs = _docs(spark, [("a bb bb ccc", "xx", "s")])
    got = {
        r["token_len"]: (r["n_tokens"], r["n_distinct_tokens"])
        for r in corpusstats.token_length_histogram(docs).collect()
    }
    assert got == {1: (1, 1), 2: (2, 1), 3: (1, 1)}


def test_quality_deciles_partitions_all_docs(spark):
    docs = _docs(
        spark,
        [
            (" ".join(["the a of to and"] * 8), "en", "s"),  # 40 tokens, scored
            ("short doc", "en", "s"),  # < 20 tokens → quality 0 → decile 0
        ],
    )
    rows = curation.quality_deciles(docs).collect()
    assert sum(r["n_docs"] for r in rows) == 2
    deciles = {r["decile"] for r in rows}
    assert all(0 <= d <= 9 for d in deciles)
    assert 0 in deciles  # the zero-quality short doc


def test_normalize_text_canonicalizes(spark):
    docs = spark.createDataFrame(
        [(1, "Hello,   World! 42"), (2, "hello world 42")],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: (r["norm_digest"], r["n_norm_chars"])
           for r in textops.normalize_text(docs).collect()}
    # both normalize to "hello world 42" → identical digests
    assert got[1] == got[2]
    assert got[1][1] == len("hello world 42")


def test_embedding_norms_exact(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {r["vec_id"]: r["norm_sq_scaled"]
           for r in similarity.embedding_norms(emb).collect()}
    assert got[1] == 1_000_000 ** 2
    assert got[2] == 2 * 500_000 ** 2


def test_dim_variance_ranks_spread_dimension_first(spark):
    # dim 0 varies (±1), dim 1 constant → dim 0 must rank first with
    # var_num = n·Σx²−(Σx)² = 2·2e12 − 0; dim 1's var_num = 0.
    emb = spark.createDataFrame(
        [(1, [1.0, 0.25]), (2, [-1.0, 0.25])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = similarity.dim_variance_stats(emb, k=2).collect()
    assert rows[0]["dim"] == 0
    assert rows[0]["var_num"] == 2 * 2 * 10**12
    assert rows[1]["var_num"] == 0


def test_dup_group_size_histogram(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a LONG, doc_b LONG"
    )
    got = {
        r["group_size"]: r["n_groups"]
        for r in dedup.dup_group_size_histogram(pairs).collect()
    }
    assert got == {3: 1, 2: 1}


def test_copurchase_pairs_baskets(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap

    # orders: 1 = {A,B,C}, 2 = {A,B}, 3 = {A,B} with a duplicate B row
    # (must not inflate), 4 = {C}. (A,B) in 3 orders; (A,C)/(B,C) in 1.
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20),
         (3, 10), (3, 20), (3, 20), (4, 30)],
        "l_orderkey LONG, l_partkey LONG",
    )
    got = {
        (r["part_a"], r["part_b"]): r["n_orders"]
        for r in olap.copurchase_pairs(li, k=10, min_orders=1).collect()
    }
    assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 1}
    cut = {
        (r["part_a"], r["part_b"]): r["n_orders"]
        for r in olap.copurchase_pairs(li, k=10, min_orders=2).collect()
    }
    assert cut == {(10, 20): 3}
