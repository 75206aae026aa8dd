"""Tests for the as-of join, n-gram heavy hitters, and exact quantiles."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.operators import asof, corpusstats


def _asof_frames(spark):
    left = spark.createDataFrame(
        [
            # (event_id, user_id, tus)
            (10, 1, 100),
            (11, 1, 200),
            (12, 1, 50),    # before any right row -> null match
            (13, 2, 100),   # user with no right rows at all
            (14, 1, 150),   # exactly at a right ts -> same-instant match
        ],
        "event_id LONG, user_id LONG, tus LONG",
    )
    right = spark.createDataFrame(
        [
            # (user_id, vtus, view_event_id)
            (1, 90, 900),
            (1, 150, 901),
            (3, 10, 902),   # user with no left rows
        ],
        "user_id LONG, vtus LONG, view_event_id LONG",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _asof_frames(spark)
    got = asof.asof_join(
        left, right, key=["user_id"], left_ts="tus", right_ts="vtus",
        right_payload=["view_event_id"], left_tie="event_id",
    )
    rows = {r["event_id"]: (r["view_event_id"], r["vtus"]) for r in got.collect()}
    assert rows == {
        10: (900, 90),     # latest at-or-before 100 is ts=90
        11: (901, 150),    # latest at-or-before 200 is ts=150
        12: (None, None),  # nothing at-or-before 50
        13: (None, None),  # user 2 has no right rows
        14: (901, 150),    # same-instant row included (>= semantics)
    }
    # every left row survives exactly once (left-join cardinality)
    assert got.count() == left.count()


def test_asof_join_single_shuffle_no_nested_loop(spark):
    left, right = _asof_frames(spark)
    got = asof.asof_join(
        left, right, key=["user_id"], left_ts="tus", right_ts="vtus",
        right_payload=["view_event_id"], left_tie="event_id",
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union-and-carry plan joins nothing — it is window-only
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, "en", t) for i, t in enumerate(texts)],
        "doc_id LONG, lang STRING, text STRING",
    )


def test_top_ngrams_counts_and_tiebreak(spark):
    docs = _docs(spark, [
        "a b c a b",      # grams: "a b" x2, "b c", "c a"
        "a b z",          # grams: "a b", "b z"
        "b c q",          # grams: "b c", "c q"
        "x",              # shorter than n -> no grams
    ])
    got = corpusstats.top_ngrams(docs, n=2, min_docs=2, k=2).collect()
    # "a b": 3 occ / 2 docs; "b c": 2 occ / 2 docs; others 1 doc (filtered)
    assert [(r["gram"], r["n_docs"], r["n_occ"]) for r in got] == [
        ("a b", 2, 3),
        ("b c", 2, 2),
    ]


def test_top_ngrams_uses_partial_topk(spark):
    docs = _docs(spark, ["a b c", "a b d"])
    plan = (
        corpusstats.top_ngrams(docs, n=2, min_docs=1, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_token_quantiles_rank_selection(spark):
    # 11 docs of 1..11 tokens: p50 -> rank (10*1)//2 = 5 (0-based) -> 6
    # tokens; p90 -> (10*9)//10 = 9 -> 10 tokens; p99 -> (10*99)//100
    # = 9 -> 10 tokens.
    docs = _docs(spark, [" ".join(["w"] * n) for n in range(1, 12)])
    got = {
        r["p_label"]: (r["n_docs"], r["q_value"])
        for r in corpusstats.token_quantiles(docs, group="lang").collect()
    }
    assert got == {"p50": (11, 6), "p90": (11, 10), "p99": (11, 10)}


def test_token_quantiles_multi_group(spark):
    rows = [(i, "en", " ".join(["w"] * (i + 1))) for i in range(4)]
    rows += [(10 + i, "fr", " ".join(["w"] * (5 * (i + 1)))) for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")
    got = corpusstats.token_quantiles(docs, group="lang")
    en = {r["p_label"]: r["q_value"] for r in got.filter(F.col("lang") == "en").collect()}
    fr = {r["p_label"]: r["q_value"] for r in got.filter(F.col("lang") == "fr").collect()}
    # en: counts 1,2,3,4 -> p50 at (3*1)//2=1 -> 2; p90 at (3*9)//10=2 -> 3
    assert en == {"p50": 2, "p90": 3, "p99": 3}
    # fr: counts 5,10 -> all quantile ranks 0 -> 5
    assert fr == {"p50": 5, "p90": 5, "p99": 5}


def test_label_centroids_exact_means(spark):
    from big_data_graph_analysis_with_spark_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            (0, [1.0, 2.0], 1),
            (1, [3.0, 4.0], 1),
            (2, [5.0, 6.0], 2),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    got = {
        (r["label"], r["j"]): (r["n_vecs"], r["sum_x"], r["mean_x"])
        for r in similarity.label_centroids(emb).collect()
    }
    assert got == {
        (1, 0): (2, 4.0, 2.0),
        (1, 1): (2, 6.0, 3.0),
        (2, 0): (1, 5.0, 5.0),
        (2, 1): (1, 6.0, 6.0),
    }


def test_approx_sketches_agree_with_exact(spark):
    """The 100 TB paths for cardinality and quantiles are mergeable
    sketches (HLL++ / t-digest via approx_count_distinct /
    approx_percentile); pin their error against the exact operators on
    the fixture so a Spark upgrade that degrades sketch accuracy fails
    loudly rather than silently skewing corpus stats."""
    from tests.conftest import SF0001

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")

    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    exact = words.select(F.countDistinct("w").alias("n")).first()["n"]
    approx = words.select(
        F.approx_count_distinct("w", rsd=0.02).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.06  # 3× the configured rsd

    toks = docs.select(F.size(F.split("text", " ")).alias("n_tokens"))
    ap50, ap90 = toks.select(
        F.percentile_approx("n_tokens", [0.5, 0.9], 10_000).alias("q")
    ).first()["q"]
    # exact baseline computed in Python (summary() is itself a sketch, so
    # it cannot serve as the exact side)
    vals = sorted(r["n_tokens"] for r in toks.collect())
    ex50 = vals[int(0.5 * (len(vals) - 1))]
    ex90 = vals[int(0.9 * (len(vals) - 1))]
    # percentile_approx at accuracy=10k is exact on fixture-sized groups
    assert abs(ap50 - ex50) <= 1 and abs(ap90 - ex90) <= 1


def test_event_micros_timezone_invariant(spark):
    """event_micros must return identical epoch-µs under any session
    timezone for every supported physical shape (ADVICE r3: the previous
    TIMESTAMP_NTZ expression shifted by the session zone's UTC offset).
    2024-03-10 is a US DST-transition day — the worst case — and
    minute=45 pins the ANSI int32 overflow in the minute term
    (minute × 60000000 > 2^31 for minute ≥ 36)."""
    from big_data_graph_analysis_with_spark_spark.functions.eventtime import event_micros

    df = spark.sql(
        "SELECT cast('2024-03-10 07:45:45.123456' as timestamp_ntz) AS ntz,"
        "       1710056745123456789 AS nanos_long"
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        got = {}
        for tz in ("UTC", "America/New_York", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            r = df.select(
                event_micros(df, "ntz").alias("a"),
                event_micros(df, "nanos_long").alias("b"),
            ).first()
            got[tz] = (r["a"], r["b"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got["UTC"] == (1710056745123456, 1710056745123456)
    assert len(set(got.values())) == 1, got
