"""Round-4 event/corpus curation operators: retention cohorts, windowed
top-k, integer anomaly days, SCD2 history, winsorization, vocabulary
coverage, temporal split, session quantiles — semantic checks on
constructed data (SQL-oracle parity lives in test_oracle_parity.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.operators import (
    cohorts,
    corpusstats,
    merge,
    sampling,
)

UTC = dt.timezone.utc


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, day, value) with `day` an
    integer day index from the epoch (hour 1 of that day)."""
    data = [
        (
            int(eid),
            int(uid),
            et,
            dt.datetime(1970, 1, 1, 1, tzinfo=UTC) + dt.timedelta(days=day),
            float(v),
        )
        for eid, uid, et, day, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE"
    )


def test_retention_offset_zero_is_cohort_size(spark):
    # users 1,2 start day 0 (1 also returns day 1); user 3 starts day 1
    ev = _events(
        spark,
        [
            (1, 1, "view", 0, 0), (2, 2, "view", 0, 0),
            (3, 1, "view", 1, 0), (4, 3, "view", 1, 0),
            (5, 1, "view", 1, 0),  # same user-day → still one active day
        ],
    )
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in cohorts.retention_cohorts(ev).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (1, 0): 1}


def test_topk_per_window_rank_and_tiebreak(spark):
    # one hour: 3×click, 3×view (tie → 'click' ranks first), 1×error
    rows = [(i, 1, t, 0, 0) for i, t in enumerate(
        ["click", "click", "click", "view", "view", "view", "error"]
    )]
    ev = _events(spark, rows)
    got = [
        (r["event_type"], r["n_events"], r["rank"])
        for r in cohorts.topk_per_window(ev, k=2)
        .orderBy("hour", "rank")
        .collect()
    ]
    assert got == [("click", 3, 1), ("view", 3, 2)]


def test_anomaly_days_agrees_with_float_sigma_rule(spark):
    # user 1: 9 quiet days of 2 events, one day of 40 → burst.
    rows = []
    eid = 0
    for day in range(9):
        for _ in range(2):
            rows.append((eid, 1, "view", day, 0)); eid += 1
    for _ in range(40):
        rows.append((eid, 1, "view", 9, 0)); eid += 1
    ev = _events(spark, rows)
    got = cohorts.user_anomaly_days(ev, sigmas=2, min_days=3).collect()
    assert [(r["user_id"], r["day"], r["n_events"]) for r in got] == [(1, 9, 40)]
    # cross-check against the float mean+2σ (population) rule
    counts = np.array([2] * 9 + [40], dtype=float)
    assert counts[9] > counts.mean() + 2 * counts.std()
    assert counts[0] <= counts.mean() + 2 * counts.std()


def test_anomaly_days_min_days_guard(spark):
    # 2 active days → below min_days, never flagged however bursty
    ev = _events(spark, [(0, 1, "view", 0, 0)] + [(i, 1, "view", 1, 0) for i in range(1, 50)])
    assert cohorts.user_anomaly_days(ev, min_days=3).count() == 0


def test_scd2_history_intervals_and_current(spark):
    changes = spark.createDataFrame(
        [
            (1, "a", 0, False), (1, "b", 1, False),            # live: b current
            (2, "x", 0, False), (2, "x2", 1, False), (2, "x3", 2, True),  # deleted
            (3, "only", 0, False),                               # single-version
        ],
        "k LONG, val STRING, v LONG, del BOOLEAN",
    )
    hist = merge.scd2_history(changes, key=["k"], version_col="v", delete_col="del")
    rows = {(r["k"], r["valid_from"]): r for r in hist.collect()}
    assert rows[(1, 0)]["valid_to"] == 1 and not rows[(1, 0)]["is_current"]
    assert rows[(1, 1)]["valid_to"] is None and rows[(1, 1)]["is_current"]
    # deleted key: chain closes, and the open delete row is NOT current
    assert rows[(2, 1)]["valid_to"] == 2
    assert rows[(2, 2)]["valid_to"] is None and not rows[(2, 2)]["is_current"]
    assert rows[(3, 0)]["is_current"]
    # exactly one current row per live key
    cur = hist.filter("is_current").groupBy("k").count().collect()
    assert {r["k"]: r["count"] for r in cur} == {1: 1, 3: 1}


def test_winsorize_bounds_and_identity_inside_band(spark):
    docs = spark.createDataFrame(
        [(i, "t", int(l)) for i, l in enumerate([1, 5, 6, 7, 8, 9, 10, 11, 12, 100])],
        "doc_id LONG, text STRING, n_chars LONG",
    )
    # default p5/p95 on 10 docs: lo rank (10-1)·1 div 20 = 0 → the min
    # itself (no lower clip possible), hi rank 9·19 div 20 = 8 → 12
    got = {r["doc_id"]: r for r in corpusstats.winsorize_lengths(docs).collect()}
    assert got[9]["n_chars_winsorized"] == 12
    for i in range(9):
        assert got[i]["n_chars_winsorized"] == got[i]["n_chars"]
    # wider band (p25/p75): lo rank 9·1 div 4 = 2 → 6, hi rank 6 → 10;
    # both tails clip, interior untouched
    got = {
        r["doc_id"]: r
        for r in corpusstats.winsorize_lengths(docs, lo=(1, 4), hi=(3, 4)).collect()
    }
    assert got[0]["n_chars_winsorized"] == 6
    assert got[1]["n_chars_winsorized"] == 6
    assert got[9]["n_chars_winsorized"] == 10
    assert got[8]["n_chars_winsorized"] == 10  # 12 → 10
    for i in (2, 3, 4, 5, 6):
        assert got[i]["n_chars_winsorized"] == got[i]["n_chars"]


def test_vocab_coverage_monotone_and_total(spark):
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b d")], "doc_id LONG, text STRING"
    )
    rows = corpusstats.vocab_coverage(docs, k=3).orderBy("rank").collect()
    assert [r["token"] for r in rows] == ["a", "b", "c"]  # 3,3 tie → 'a' first
    cums = [r["cum_occ"] for r in rows]
    assert cums == sorted(cums) and cums[-1] == 3 + 3 + 1


def test_temporal_split_no_leakage(spark):
    ev = _events(spark, [(i, 1, "view", i, 0) for i in range(10)])
    got = sampling.temporal_split(ev, train_frac=(4, 5)).collect()
    train_days = {r["day"] for r in got if r["split"] == "train"}
    eval_days = {r["day"] for r in got if r["split"] == "eval"}
    assert train_days and eval_days
    assert max(train_days) < min(eval_days)


def test_session_quantiles_shape(spark):
    from big_data_graph_analysis_with_spark_spark.operators import sessions

    ev = _events(spark, [(i, u, "view", 0, 0) for i, u in enumerate([1, 1, 2, 2, 3])])
    rows = sessions.session_quantiles(ev).collect()
    labels = {r["p_label"] for r in rows}
    assert labels == {"p50", "p90", "p99"}
    for r in rows:
        assert r["n_sessions"] == 3  # 3 users, one session each
        assert r["q_duration_us"] >= 0 and r["q_n_events"] >= 1

def test_round4_plan_shapes(spark):
    """Scale-shape regressions for the round-4 operators: vocabulary
    coverage must cut top-k via TakeOrderedAndProject BEFORE its window;
    term co-occurrence must broadcast the top-vocabulary (and never plan
    a cartesian product); winsorization must broadcast its 1-row cutoff
    pair rather than shuffling the doc table against it."""
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} x", 10 + i) for i in range(40)],
        "doc_id LONG, text STRING, n_chars LONG",
    )
    plan = (
        corpusstats.vocab_coverage(docs, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan

    plan = (
        corpusstats.term_cooccurrence(docs, vocab_k=5, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan

    plan = (
        corpusstats.winsorize_lengths(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan


def test_link_prediction_plan_no_cartesian(spark):
    from big_data_graph_analysis_with_spark_spark.model import NetGraph
    from big_data_graph_analysis_with_spark_spark.operators import graphalg

    v = spark.createDataFrame([(i,) for i in range(20)], "id LONG")
    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 20) for i in range(20)], "src LONG, dst LONG"
    )
    plan = (
        graphalg.link_prediction(NetGraph(v, e), k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan

def test_active_users_explode_forward(spark):
    # user 1 active days 0 and 8; user 2 active day 1.
    # DAU: {0:1, 1:1, 8:1}. WAU(trailing 7): day 0 ← {u1}; day 1 ←
    # {u1(day0), u2(day1)}; day 8 ← {u1(day8)} (day 1 is 7 back — out).
    ev = _events(spark, [(0, 1, "view", 0, 0), (1, 2, "view", 1, 0), (2, 1, "view", 8, 0)])
    got = {r["day"]: (r["dau"], r["wau"], r["mau"]) for r in cohorts.active_users(ev).collect()}
    assert got[0] == (1, 1, 1)
    assert got[1] == (1, 2, 2)
    assert got[8] == (1, 1, 2)  # MAU(8) sees day 0,1,8 → users {1,2}
    assert set(got) == {0, 1, 8}  # only observed days reported


def test_interarrival_quantiles_known_gaps(spark):
    import datetime as dtm

    base = dtm.datetime(1970, 1, 2, tzinfo=UTC)
    rows = []
    # user 1: events at +0s, +10s, +30s → gaps 10s, 20s
    for i, sec in enumerate([0, 10, 30]):
        rows.append((i, 1, "view", base + dtm.timedelta(seconds=sec)))
    # user 2: events at +0s, +5s → gap 5s
    for i, sec in enumerate([0, 5]):
        rows.append((10 + i, 2, "view", base + dtm.timedelta(seconds=sec)))
    ev = spark.createDataFrame(
        [(e, u, t, ts, 0.0) for e, u, t, ts in rows],
        "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP, value DOUBLE",
    )
    got = {r["p_label"]: r for r in cohorts.interarrival_quantiles(ev).collect()}
    # sorted gaps: [5s, 10s, 20s]; all three ranks land on index 1
    # ((3-1)·num div den = 1 for p50/p90/p99) → 10s
    assert got["p50"]["q_gap_us"] == 10_000_000
    assert got["p90"]["q_gap_us"] == 10_000_000
    assert got["p99"]["q_gap_us"] == 10_000_000
    assert got["p50"]["n_gaps"] == 3


def test_token_mad_matches_numpy(spark):
    texts = ["a", "a b", "a b c", "a b c d", "a b c d e f g h i j"]
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id LONG, text STRING, lang STRING",
    )
    row = corpusstats.token_mad(docs).collect()[0]
    counts = np.array([len(t.split()) for t in texts])
    med = int(np.median(counts))
    mad = int(np.median(np.abs(counts - med)))
    assert (row["median_tokens"], row["mad_tokens"], row["n_docs"]) == (med, mad, 5)

def test_morton2_matches_python_interleave(spark):
    from big_data_graph_analysis_with_spark_spark.functions.zorder import morton2

    def py_morton(x, y, bits=21):
        code = 0
        for i in range(bits):
            code |= ((x >> i) & 1) << (2 * i)
            code |= ((y >> i) & 1) << (2 * i + 1)
        return code

    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1_000_000, 2_000_000), ((1 << 21) - 1, (1 << 21) - 1)]
    df = spark.createDataFrame(rows, "x LONG, y LONG")
    got = [
        r["z"] for r in df.select(morton2(F.col("x"), F.col("y")).alias("z"))
        .collect()
    ]
    assert got == [py_morton(x, y) for x, y in rows]
    # locality: interleaving bounds the code of nearby points — the max
    # code of the 2×2 block at (x,y) stays within the dilated envelope
    assert py_morton(2, 2) == 12 and py_morton(3, 3) == 15


def test_embedding_covariance_matches_numpy(spark):
    from big_data_graph_analysis_with_spark_spark.operators import similarity

    vecs = [
        (1, [1.0, 2.0, 3.0]),
        (2, [0.5, -1.0, 2.0]),
        (3, [2.0, 0.0, -3.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<FLOAT>")
    rows = {(r["j"], r["l"]): r for r in similarity.embedding_covariance(emb).collect()}
    X = np.array([v for _, v in vecs], dtype=np.float64)
    d = X.shape[1]
    assert set(rows) == {(j, l) for j in range(d) for l in range(d) if j <= l}
    for (j, l), r in rows.items():
        assert r["n_vecs"] == 3
        assert abs(r["sum_xjxl"] - (X[:, j] * X[:, l]).sum()) < 1e-6
        assert abs(r["sum_xj"] - X[:, j].sum()) < 1e-6
        assert abs(r["sum_xl"] - X[:, l].sum()) < 1e-6

def test_sketch_audits_exact_and_verdicts(spark):
    from big_data_graph_analysis_with_spark_spark.operators import sketches

    ev = _events(spark, [(i, i % 7, "view" if i % 2 else "click", i % 3, 0) for i in range(60)])
    rows = {r["event_type"]: r for r in sketches.distinct_sketch_audit(ev).collect()}
    assert rows["view"]["exact_users"] == 7 and rows["click"]["exact_users"] == 7
    assert all(r["sketch_ok"] for r in rows.values())  # tiny set → HLL exact

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 20))) for i in range(100)],
        "doc_id LONG, text STRING",
    )
    qrows = {r["p_label"]: r for r in sketches.quantile_sketch_audit(docs).collect()}
    assert set(qrows) == {"p50", "p90"}
    # exact values come from the rank-selection convention
    lens = sorted(1 + i % 20 for i in range(100))
    assert qrows["p50"]["exact_value"] == lens[(100 - 1) * 1 // 2]
    assert qrows["p90"]["exact_value"] == lens[(100 - 1) * 9 // 10]
    assert all(r["sketch_ok"] for r in qrows.values())



def test_k_anonymity_flags_small_groups(spark):
    from big_data_graph_analysis_with_spark_spark.operators import curation
    from pyspark.sql import functions as F

    rows = [("en", "a")] * 5 + [("en", "b")] * 2 + [("de", "a")] * 1
    df = spark.createDataFrame(rows, "lang STRING, source STRING")
    got = {
        (r["lang"], r["source"]): r["group_size"]
        for r in curation.k_anonymity_violations(df, ["lang", "source"], k=3).collect()
    }
    assert got == {("en", "b"): 2, ("de", "a"): 1}


def test_type_projection_counts_and_cap(spark):
    from big_data_graph_analysis_with_spark_spark.operators import cohorts
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "click", 0.0, "{}"),
        (2, t0, 10, "view", 0.0, "{}"),
        (3, t0, 10, "click", 0.0, "{}"),   # duplicate type must not double
        (4, t0, 20, "click", 0.0, "{}"),
        (5, t0, 20, "buy", 0.0, "{}"),
        (6, t0, 30, "view", 0.0, "{}"),
        (7, t0, 30, "buy", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    got = {
        (r["type_a"], r["type_b"]): r["n_shared_users"]
        for r in cohorts.type_projection(ev).collect()
    }
    assert got == {("click", "view"): 1, ("buy", "click"): 1, ("buy", "view"): 1}
    # cap: a user touching more than the limit is dropped entirely
    got2 = cohorts.type_projection(ev, max_types_per_user=1).collect()
    assert got2 == []


def test_snapshot_diff_classifies_and_omits_unchanged(spark):
    from big_data_graph_analysis_with_spark_spark.operators import merge

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)],
        "k LONG, v DOUBLE",
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 21.0), (3, 30.0), (5, 50.0)],
        "k LONG, v DOUBLE",
    )
    got = {
        r["k"]: r["change"]
        for r in merge.snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    # 1 unchanged → absent; 3: NULL→30 counts as changed (null-safe eq)
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_churned_users_anti_join_semantics(spark):
    import datetime

    from big_data_graph_analysis_with_spark_spark.operators import cohorts

    def ev(eid, day, user):
        return (eid, datetime.datetime(2024, 1, day, 12), user, "click", 1.0, "{}")

    rows = [
        ev(1, 1, 10), ev(2, 2, 10),             # churned: active early only
        ev(3, 1, 20), ev(4, 9, 20),             # retained: active both halves
        ev(5, 8, 30),                           # late joiner: never "before"
    ]
    e = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    got = {
        r["user_id"]: (r["n_days_before"], r["last_day_before"])
        for r in cohorts.churned_users(e, split=(1, 2)).collect()
    }
    assert set(got) == {10}
    assert got[10][0] == 2  # two distinct active days before the cutoff
