"""Hand-case and identity tests for the round-10 candidate operators
(mcnemar_inputs, daily_count_autocorr, friedman_rank_inputs,
filter_agreement_census). Registry growth is frozen this round (r9
verdict task 2), so these land as module functions + pre-oracled
candidates only; their DuckDB twins live in test_candidate_oracles.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_graph_analysis_with_spark_spark.operators import (
    curation,
    hypotests,
)


def _orders(spark, rows):
    import pyspark.sql.functions as F

    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))


class TestMcnemar:
    def test_hand_case(self, spark):
        rows = [
            # cust 1: both years; cust 2: 1995 only; cust 3: 1996 only;
            # cust 4: neither (1994 only)
            (1, 1, 10.0, "1995-03-01 00:00:00"),
            (2, 1, 10.0, "1996-03-01 00:00:00"),
            (3, 2, 10.0, "1995-07-01 00:00:00"),
            (4, 3, 10.0, "1996-07-01 00:00:00"),
            (5, 4, 10.0, "1994-07-01 00:00:00"),
        ]
        r = hypotests.mcnemar_inputs(_orders(spark, rows)).collect()[0]
        assert (r["n_00"], r["n_01"], r["n_10"], r["n_11"]) == (1, 1, 1, 1)

    def test_cells_partition_customers(self, spark):
        ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        r = hypotests.mcnemar_inputs(ords).collect()[0]
        n_cust = ords.select("o_custkey").distinct().count()
        assert r["n_00"] + r["n_01"] + r["n_10"] + r["n_11"] == n_cust


class TestDailyCountAutocorr:
    def test_hand_case_with_gap(self, spark):
        # days 0,1,2,4 (day 3 missing) with counts 1,2,3,4
        rows = []
        k = 0
        for day, cnt in [(1, 1), (2, 2), (3, 3), (5, 4)]:
            for _ in range(cnt):
                k += 1
                rows.append((k, k, 1.0, f"1970-01-0{day} 00:00:00"))
        out = {
            r["lag"]: r
            for r in hypotests.daily_count_autocorr(
                _orders(spark, rows), max_lag=2
            ).collect()
        }
        l1 = out[1]
        # lag-1 pairs over PRESENT days: (d0,d1), (d1,d2) — the gap at
        # day 3 drops (d2,d3) and (d3,d4)
        assert (l1["n_terms"], l1["sum_x"], l1["sum_y"]) == (2, 3, 5)
        assert (l1["sum_xx"], l1["sum_yy"], l1["sum_xy"]) == (5, 13, 8)
        l2 = out[2]  # pairs (d0,d2), (d2,d4)
        assert (l2["n_terms"], l2["sum_x"], l2["sum_y"]) == (2, 4, 7)
        assert (l2["sum_xx"], l2["sum_yy"], l2["sum_xy"]) == (10, 25, 15)

    def test_durbin_watson_identity(self, spark):
        # DW numerator Σ(x_t − x_{t+1})² = sum_xx + sum_yy − 2·sum_xy
        ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        out = hypotests.daily_count_autocorr(ords, max_lag=1).collect()[0]
        from big_data_graph_analysis_with_spark_spark.functions.eventtime import (
            event_micros,
        )

        daily = sorted(
            (r["day"], r["x"])
            for r in ords.select(event_micros(ords, "o_orderdate").alias("tus"))
            .selectExpr("tus div 86400000000 as day")
            .groupBy("day")
            .count()
            .withColumnRenamed("count", "x")
            .collect()
        )
        by_day = dict(daily)
        dw = sum(
            (by_day[d] - by_day[d + 1]) ** 2
            for d, _ in daily
            if d + 1 in by_day
        )
        assert dw == out["sum_xx"] + out["sum_yy"] - 2 * out["sum_xy"]


class TestFriedman:
    def test_hand_case_and_tie(self, spark):
        cust = spark.createDataFrame(
            [(1, "A"), (2, "B")], "c_custkey long, c_mktsegment string"
        )
        rows = [
            # month 1: A=1000 cents, B=2000 → doubled ranks 2, 4
            (1, 1, 10.0, "2024-01-05 00:00:00"),
            (2, 2, 20.0, "2024-01-06 00:00:00"),
            # month 2: B silent (zero-filled) → B r2=2, A r2=4
            (3, 1, 30.0, "2024-02-05 00:00:00"),
            # month 3: tie (A=B=5000) → both r2 = 3
            (4, 1, 50.0, "2024-03-05 00:00:00"),
            (5, 2, 50.0, "2024-03-06 00:00:00"),
        ]
        out = {
            r["segment"]: (r["n_blocks"], r["r2_sum"])
            for r in hypotests.friedman_rank_inputs(
                _orders(spark, rows), cust
            ).collect()
        }
        assert out["A"] == (3, 2 + 4 + 3)
        assert out["B"] == (3, 4 + 2 + 3)

    def test_rank_sum_identity(self, spark):
        # Σ_seg r2_sum = n_blocks · k(k+1) — every block hands out
        # doubled ranks summing to k(k+1)
        ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        rows = hypotests.friedman_rank_inputs(ords, cust).collect()
        k = len(rows)
        n_blocks = rows[0]["n_blocks"]
        assert all(r["n_blocks"] == n_blocks for r in rows)
        assert sum(r["r2_sum"] for r in rows) == n_blocks * k * (k + 1)


class TestFilterAgreement:
    def test_hand_case(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "abcd efg"),   # chars 8 ≥ 5 (A); 8 > 3·2 words (¬B)
                (2, "ab"),         # ¬A; 2 ≤ 3·1 (B)
                (3, "abc def"),    # chars 7 ≥ 5 (A); 7 > 3·2? 7>6 (¬B)
                (4, "a b c d e"),  # chars 9 ≥ 5 (A); 9 ≤ 3·5 (B)
                (5, ""),           # ¬A; 0 ≤ 3·1 (B)
            ],
            "doc_id long, text string",
        )
        r = curation.filter_agreement_census(
            docs, min_chars=5, max_avg_word_len=3
        ).collect()[0]
        assert r["n"] == 5
        assert (r["n_11"], r["n_10"], r["n_01"], r["n_00"]) == (1, 2, 2, 0)

    def test_cells_partition_corpus(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        r = curation.filter_agreement_census(docs).collect()[0]
        assert r["n"] == docs.count()
        assert r["n_11"] + r["n_10"] + r["n_01"] + r["n_00"] == r["n"]


class TestJonckheere:
    def test_hand_case_with_tie(self, spark):
        rows = [
            (1, 1, 0.01, "1995-01-01 00:00:00"),
            (2, 1, 0.02, "1995-01-02 00:00:00"),
            (3, 1, 0.02, "1995-01-03 00:00:00"),
            (4, 1, 0.03, "1995-01-04 00:00:00"),
        ]
        ords = _orders(spark, rows).withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") <= 2, "1-URGENT").otherwise("2-HIGH"),
        )
        r = hypotests.jonckheere_trend_inputs(ords).collect()
        assert len(r) == 1
        row = r[0]
        # g={1,2}, h={2,3}: x<y pairs (1,2),(1,3),(2,3); one tie (2,2)
        assert (row["g"], row["h"], row["n_g"], row["n_h"]) == (1, 2, 2, 2)
        assert row["u2"] == 2 * 3 + 1

    def test_python_mirror_and_reversal_identity(self, spark):
        ords = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        got = {
            (r["g"], r["h"]): (r["n_g"], r["n_h"], r["u2"])
            for r in hypotests.jonckheere_trend_inputs(ords).collect()
        }
        vals = [
            (int(r["o_orderpriority"][0]), round(r["o_totalprice"] * 100))
            for r in ords.select("o_orderpriority", "o_totalprice").collect()
        ]
        from collections import defaultdict

        by_g = defaultdict(list)
        for g, v in vals:
            by_g[g].append(v)
        import itertools

        for g, h in itertools.combinations(sorted(by_g), 2):
            lt = ties = 0
            hs = sorted(by_g[h])
            import bisect

            for x in by_g[g]:
                lt += len(hs) - bisect.bisect_right(hs, x)
                ties += bisect.bisect_right(hs, x) - bisect.bisect_left(hs, x)
            u2 = 2 * lt + ties
            n_g, n_h = len(by_g[g]), len(by_g[h])
            assert got[(g, h)] == (n_g, n_h, u2), (g, h)
            # reversal identity: u2(g,h) + u2(h,g) = 2 n_g n_h
            gt = sum(
                len(hs) - (len(hs) - bisect.bisect_left(hs, x))
                for x in by_g[g]
            ) - ties * 0  # gt = #{x>y}
            assert u2 + (2 * (n_g * n_h - lt - ties) + ties) == 2 * n_g * n_h


class TestNgramNovelty:
    def test_hand_case(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "hello world"),   # reference (0 % 4 == 0)
                (1, "hello world"),   # 1 shingle, 0 novel -> decile 0
                (2, "brand new"),     # 1 shingle, 1 novel -> decile 10
                (3, "hello world brand new thing"),  # 3 shingles, 3 novel
            ],
            "doc_id long, text string",
        )
        out = {
            r["novelty_decile"]: (r["n_docs"], r["sum_grams"], r["sum_novel"])
            for r in curation.ngram_novelty_profile(docs).collect()
        }
        assert out[0] == (1, 1, 0)
        assert out[10] == (2, 4, 4)

    def test_totals_partition_candidates(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = curation.ngram_novelty_profile(docs).collect()
        n_cand = docs.filter("doc_id % 4 <> 0").count()
        assert sum(r["n_docs"] for r in rows) == n_cand
        assert all(0 <= r["novelty_decile"] <= 10 for r in rows)
        assert all(r["sum_novel"] <= r["sum_grams"] for r in rows)
