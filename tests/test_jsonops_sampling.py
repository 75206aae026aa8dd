"""Unit tests for the round-4 additions: JSON property analytics,
priority sampling, sorted-neighborhood dedup, and the bipartite
type-affinity projection. Cross-engine parity for each lives in
test_oracle_parity.py; these tests pin the operator semantics on
small constructed inputs."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.operators import (
    cohorts,
    dedup,
    jsonops,
    sampling,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


# ---------------------------------------------------------------------------
# jsonops
# ---------------------------------------------------------------------------


def test_extract_prop_handles_malformed_json(spark):
    ev = spark.createDataFrame(
        [
            (1, "click", '{"k": 5}'),
            (2, "click", "not json"),
            (3, "click", '{"other": 1}'),
            (4, "click", None),
        ],
        "event_id long, event_type string, props string",
    )
    got = {r["event_id"]: r["k"] for r in jsonops.extract_prop(ev).collect()}
    assert got == {1: 5, 2: None, 3: None, 4: None}


def test_props_stats_counts_and_extremes(spark):
    ev = spark.createDataFrame(
        [
            (1, "a", '{"k": 1}'),
            (2, "a", '{"k": 9}'),
            (3, "a", '{"k": 9}'),
            (4, "a", "bad"),
            (5, "b", '{"k": 4}'),
        ],
        "event_id long, event_type string, props string",
    )
    rows = {r["event_type"]: r for r in jsonops.props_stats(ev).collect()}
    a = rows["a"]
    assert (a["n_events"], a["n_with_prop"]) == (4, 3)
    assert (a["sum_k"], a["min_k"], a["max_k"], a["n_distinct_k"]) == (19, 1, 9, 2)
    b = rows["b"]
    assert (b["n_events"], b["n_with_prop"], b["sum_k"]) == (1, 1, 4)


def test_props_histogram_buckets(spark):
    ev = spark.createDataFrame(
        [(i, "a", f'{{"k": {v}}}') for i, v in enumerate([0, 9, 10, 19, 20])],
        "event_id long, event_type string, props string",
    )
    got = {
        (r["event_type"], r["bucket"]): r["n"]
        for r in jsonops.props_histogram(ev, bucket_width=10).collect()
    }
    assert got == {("a", 0): 2, ("a", 1): 2, ("a", 2): 1}


# ---------------------------------------------------------------------------
# priority_sample
# ---------------------------------------------------------------------------


def _py_priority_key(doc_id: int, weight: int, seed: int) -> float:
    h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:14], 16)
    h48 = h % 2**48
    return (h48 / 2**48) / (weight + 1.0)


def test_priority_sample_matches_python_reference(spark):
    rows = [(i, f"doc {i}", (i * 37) % 500 + 1) for i in range(200)]
    docs = _docs_df(spark, rows)
    got = sorted(
        r["doc_id"] for r in sampling.priority_sample(docs, k=20, seed=3).collect()
    )
    expect = sorted(
        i
        for i, _, w in sorted(
            rows, key=lambda r: (_py_priority_key(r[0], r[2], 3), r[0])
        )[:20]
    )
    assert got == expect


def test_priority_sample_weight_bias(spark):
    # two strata: weight 10_000 vs weight 1 — the heavy stratum must
    # dominate the selected set (inclusion probability ∝ weight)
    rows = [(i, "x", 10_000 if i < 100 else 1) for i in range(200)]
    docs = _docs_df(spark, rows)
    picked = [
        r["doc_id"] for r in sampling.priority_sample(docs, k=40, seed=0).collect()
    ]
    heavy = sum(1 for i in picked if i < 100)
    assert heavy >= 35


def test_priority_sample_deterministic(spark):
    docs = _docs_df(spark, [(i, "t", i + 1) for i in range(50)])
    a = sorted(r["doc_id"] for r in sampling.priority_sample(docs, k=10).collect())
    b = sorted(
        r["doc_id"]
        for r in sampling.priority_sample(docs.repartition(7), k=10).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs
# ---------------------------------------------------------------------------


def test_sorted_neighborhood_finds_prefix_sharing_dups(spark):
    docs = _docs_df(
        spark,
        [
            (1, "alpha beta gamma delta epsilon", 30),
            (2, "alpha beta gamma delta zeta", 27),  # near-dup of 1, same prefix
            (3, "omega psi chi phi", 17),  # unrelated
        ],
    )
    pairs = dedup.sorted_neighborhood_pairs(
        docs, key_chars=32, block_chars=8, threshold_ppm=500_000
    ).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(1, 2)]
    # |∩|=4, |∪|=6 → 666666 ppm
    assert pairs[0]["jaccard_ppm"] == 666_666


def test_sorted_neighborhood_misses_cross_block_dups(spark):
    # the documented recall dial: identical texts with different first
    # `block_chars` characters land in different blocks → not compared
    docs = _docs_df(
        spark,
        [
            (1, "aaaaaaaa common tail words here", 31),
            (2, "bbbbbbbb common tail words here", 31),
        ],
    )
    assert (
        dedup.sorted_neighborhood_pairs(
            docs, block_chars=8, threshold_ppm=100_000
        ).count()
        == 0
    )


def test_sorted_neighborhood_adjacent_only(spark):
    # three identical-prefix docs in one block: pairs are (sorted)
    # adjacent only — (a,b) and (b,c), never (a,c)
    docs = _docs_df(
        spark,
        [
            (1, "same same a b c", 15),
            (2, "same same a b d", 15),
            (3, "same same a b e", 15),
        ],
    )
    got = {
        (p["doc_a"], p["doc_b"])
        for p in dedup.sorted_neighborhood_pairs(
            docs, threshold_ppm=400_000
        ).collect()
    }
    assert got == {(1, 2), (2, 3)}


# ---------------------------------------------------------------------------
# type_affinity
# ---------------------------------------------------------------------------


def test_type_affinity_counts_shared_users(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, "click"),
            (2, 10, "view"),
            (3, 10, "view"),  # duplicate engagement — still one user
            (4, 11, "click"),
            (5, 11, "view"),
            (6, 12, "click"),
        ],
        "event_id long, user_id long, event_type string",
    )
    rows = {
        (r["type_a"], r["type_b"]): r["n_users"]
        for r in cohorts.type_affinity(ev).collect()
    }
    assert rows == {("click", "view"): 2}


def test_type_affinity_pair_ordering(spark):
    ev = spark.createDataFrame(
        [(1, 1, "b"), (2, 1, "a"), (3, 1, "c")],
        "event_id long, user_id long, event_type string",
    )
    pairs = {
        (r["type_a"], r["type_b"]) for r in cohorts.type_affinity(ev).collect()
    }
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(a < b for a, b in pairs)


# ---------------------------------------------------------------------------
# stratified_priority_sample / lexical_diversity / dup_rate_by_source
# ---------------------------------------------------------------------------


def test_stratified_priority_sample_quota_and_determinism(spark):
    rows = [(i, "x", "a" if i % 2 == 0 else "b", (i * 13) % 97 + 1) for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    )
    out = sampling.stratified_priority_sample(
        docs, k_per_stratum=5, strata_col="lang", seed=1
    )
    got = out.collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert sorted(len(v) for v in by_lang.values()) == [5, 5]
    # repartition-invariant selected set
    got2 = sampling.stratified_priority_sample(
        docs.repartition(11), k_per_stratum=5, strata_col="lang", seed=1
    ).collect()
    assert sorted((r["lang"], r["doc_id"]) for r in got) == sorted(
        (r["lang"], r["doc_id"]) for r in got2
    )


def test_lexical_diversity_ttr(spark):
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    docs = spark.createDataFrame(
        [
            (1, "a b a b", "s1"),
            (2, "a c", "s1"),
            (3, "x x x x", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in corpusstats.lexical_diversity(docs).collect()}
    # s1: 6 tokens, types {a,b,c} = 3 → 500000 ppm
    assert (rows["s1"]["n_tokens"], rows["s1"]["n_types"]) == (6, 3)
    assert rows["s1"]["ttr_ppm"] == 500_000
    # s2: 4 tokens, 1 type → 250000 ppm
    assert rows["s2"]["ttr_ppm"] == 250_000


def test_dup_rate_by_source(spark):
    from big_data_graph_analysis_with_spark_spark.operators import curation

    docs = spark.createDataFrame(
        [
            (1, "same text", "s1"),
            (2, "same text", "s1"),
            (3, "same text", "s1"),
            (4, "unique", "s1"),
            (5, "only one", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in curation.dup_rate_by_source(docs).collect()}
    s1 = rows["s1"]
    assert (s1["n_docs"], s1["n_distinct_texts"], s1["n_dup_rows"]) == (4, 2, 2)
    assert s1["dup_ppm"] == 500_000
    assert rows["s2"]["n_dup_rows"] == 0


# ---------------------------------------------------------------------------
# functions/quantiles.histogram_quantiles
# ---------------------------------------------------------------------------


def test_histogram_quantiles_matches_python_rank_selection(spark):
    from big_data_graph_analysis_with_spark_spark.functions.quantiles import (
        histogram_quantiles,
    )

    vals = [((i * 31) % 17) for i in range(101)]  # heavy ties
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["p_label"]: (r["n_rows"], r["q_value"]) for r in
           histogram_quantiles(df, "v").collect()}
    s = sorted(vals)
    n = len(s)
    for label, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        assert got[label] == (n, s[(n - 1) * num // den])


def test_histogram_quantiles_single_value(spark):
    from big_data_graph_analysis_with_spark_spark.functions.quantiles import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([(7,)] * 5, "v long")
    got = histogram_quantiles(df, "v").collect()
    assert {(r["p_label"], r["n_rows"], r["q_value"]) for r in got} == {
        ("p50", 5, 7), ("p90", 5, 7), ("p99", 5, 7)
    }


# ---------------------------------------------------------------------------
# drift / skew / recent-events
# ---------------------------------------------------------------------------


def test_value_drift_detects_shift(spark):
    from big_data_graph_analysis_with_spark_spark.operators import drift
    import datetime as dt

    # first half: values ~1.00; second half: values ~9.00 → full mass
    # moves buckets, abs_diff_ppm ≈ 1e6 in both occupied buckets
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(hours=i), 1.00 if i < 50 else 9.00)
            for i in range(100)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["bucket"]: r for r in drift.value_drift(ev, n_buckets=10).collect()}
    assert len(out) == 2
    lo, hi = min(out), max(out)
    assert out[lo]["n_first"] == 50 and out[lo]["n_second"] == 0
    assert out[hi]["n_first"] == 0 and out[hi]["n_second"] == 50
    assert out[lo]["abs_diff_ppm"] == 1_000_000
    assert out[hi]["abs_diff_ppm"] == 1_000_000


def test_value_drift_no_shift(spark):
    from big_data_graph_analysis_with_spark_spark.operators import drift
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(hours=i), float(i % 4)) for i in range(80)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = drift.value_drift(ev, n_buckets=4).collect()
    assert all(r["abs_diff_ppm"] == 0 for r in out)


def test_key_skew_profile_ranks_and_shares(spark):
    from big_data_graph_analysis_with_spark_spark.operators import drift

    rows = [(i, 1) for i in range(60)] + [(100 + i, 2) for i in range(30)] + [
        (200 + i, 3) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    out = [
        (r["heavy_rank"], r["user_id"], r["n_rows"], r["share_ppm"])
        for r in drift.key_skew_profile(df, "user_id", k=2)
        .orderBy("heavy_rank")
        .collect()
    ]
    assert out == [(1, 1, 60, 600_000), (2, 2, 30, 300_000)]


def test_recent_events_per_user(spark):
    from big_data_graph_analysis_with_spark_spark.operators import olap
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), 1, "t") for i in range(5)] + [
        (10, base, 2, "t")
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = olap.recent_events_per_user(ev, n=2).collect()
    u1 = sorted(
        (r["recency_rank"], r["event_id"]) for r in out if r["user_id"] == 1
    )
    assert u1 == [(1, 4), (2, 3)]  # two most recent by ts
    u2 = [(r["recency_rank"], r["event_id"]) for r in out if r["user_id"] == 2]
    assert u2 == [(1, 10)]


# ---------------------------------------------------------------------------
# type_purity / embedding_coverage / length_outliers
# ---------------------------------------------------------------------------


def test_type_purity_bounds(spark):
    ev = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "a"), (3, 1, "a"),          # pure user
         (4, 2, "a"), (5, 2, "b"), (6, 2, "c"), (7, 2, "d")],  # uniform user
        "event_id long, user_id long, event_type string",
    )
    got = {r["user_id"]: (r["n_events"], r["hhi_ppm"])
           for r in cohorts.type_purity(ev).collect()}
    assert got[1] == (3, 1_000_000)          # all one type
    assert got[2] == (4, 250_000)            # uniform over 4 types
 

def test_embedding_coverage_split(spark):
    from big_data_graph_analysis_with_spark_spark.operators import similarity

    docs = spark.createDataFrame(
        [(1, "s1"), (2, "s1"), (3, "s2")], "doc_id long, source string"
    )
    emb = spark.createDataFrame([(1, [0.1]), (1, [0.2])], "vec_id long, embedding array<float>")
    got = {(r["source"], r["covered"]): r["n_docs"]
           for r in similarity.embedding_coverage(docs, emb).collect()}
    assert got == {("s1", True): 1, ("s1", False): 1, ("s2", False): 1}


def test_length_outliers_flags_extreme_doc(spark):
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    # 9 docs of 5 tokens (median 5, MAD 0 → any deviation flags with
    # mad 0 ... so use spread): lengths 4..6 plus one 100-token doc
    rows = [(i, " ".join(["w"] * (4 + i % 3)), "en") for i in range(9)]
    rows.append((99, " ".join(["w"] * 100), "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = corpusstats.length_outliers(docs, k=3).collect()
    assert [r["doc_id"] for r in out] == [99]
    assert out[0]["n_tokens"] == 100


def test_sorted_neighborhood_window3_catches_skip_pair(spark):
    # doc 2 sits between near-dups 1 and 3; window=2 (adjacent) only
    # finds (1,2) and (2,3); window=3 additionally compares 1 vs 3
    docs = _docs_df(
        spark,
        [
            (1, "same same a dup words here one", 30),
            (2, "same same m unrelated q x y z", 29),  # sorts between 1 and 3
            (3, "same same z dup words here one", 30),
        ],
    )
    adj = {
        (p["doc_a"], p["doc_b"])
        for p in dedup.sorted_neighborhood_pairs(docs, threshold_ppm=400_000).collect()
    }
    win3 = {
        (p["doc_a"], p["doc_b"])
        for p in dedup.sorted_neighborhood_pairs(
            docs, threshold_ppm=400_000, window=3
        ).collect()
    }
    assert (1, 3) not in adj
    assert (1, 3) in win3
    assert adj <= win3


def test_length_cdf_values(spark):
    from big_data_graph_analysis_with_spark_spark.operators import corpusstats

    docs = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 30)], "doc_id long, n_chars long"
    )
    got = {r["doc_id"]: r["cdf_ppm"] for r in corpusstats.length_cdf(docs).collect()}
    assert got == {1: 500_000, 2: 500_000, 3: 750_000, 4: 1_000_000}


def test_time_profile_epoch_arithmetic(spark):
    from big_data_graph_analysis_with_spark_spark.operators import drift
    import datetime as dt

    # 1970-01-01 was a Thursday (dow 4 with 0=Sunday); hours advance hod
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(1970, 1, 1, 0, 0)),
            (2, dt.datetime(1970, 1, 1, 5, 0)),
            (3, dt.datetime(1970, 1, 4, 0, 0)),  # Sunday → dow 0
            (4, dt.datetime(1970, 1, 4, 0, 30)),
        ],
        "event_id long, ts timestamp",
    )
    got = {(r["dow"], r["hod"]): (r["n_events"], r["share_ppm"])
           for r in drift.time_profile(ev).collect()}
    assert got == {
        (4, 0): (1, 250_000),
        (4, 5): (1, 250_000),
        (0, 0): (2, 500_000),
    }


def test_ego_batch_fanout_caps_and_determinism(spark):
    from big_data_graph_analysis_with_spark_spark.operators import sampling
    from pyspark.sql import functions as F

    # hub 1 with 6 out-neighbors, each with 4 out-neighbors
    edges = [(1, 10 + i) for i in range(6)]
    edges += [(10 + i, 100 + 10 * i + j) for i in range(6) for j in range(4)]
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    seeds = spark.createDataFrame([(1,)], "id LONG")
    out = sampling.ego_batch(e, seeds, fanouts=(3, 2), seed=5).collect()
    hop1 = [(r["src"], r["dst"]) for r in out if r["hop"] == 1]
    hop2 = [(r["src"], r["dst"]) for r in out if r["hop"] == 2]
    assert len(hop1) == 3  # hub capped to fanout 3
    # every hop-2 edge leaves a sampled hop-1 destination, ≤2 each
    h1_dsts = {d for _, d in hop1}
    from collections import Counter

    c = Counter(s for s, _ in hop2)
    assert set(c) <= h1_dsts and all(v <= 2 for v in c.values())
    # deterministic under repartitioning
    again = sampling.ego_batch(
        e.repartition(7), seeds, fanouts=(3, 2), seed=5
    ).collect()
    key = lambda r: (r["seed_id"], r["hop"], r["src"], r["dst"])
    assert sorted(map(key, out)) == sorted(map(key, again))


def test_ego_batch_per_seed_nets(spark):
    from big_data_graph_analysis_with_spark_spark.operators import sampling

    e = spark.createDataFrame([(1, 2), (2, 3), (4, 2)], "src LONG, dst LONG")
    seeds = spark.createDataFrame([(1,), (4,)], "id LONG")
    out = sampling.ego_batch(e, seeds, fanouts=(2, 2), seed=0).collect()
    # both seeds independently pull the 2→3 edge at hop 2
    hop2_seeds = {r["seed_id"] for r in out if r["hop"] == 2}
    assert hop2_seeds == {1, 4}
