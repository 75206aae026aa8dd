"""Hand-computed micro cases for the distribution-shift / rank-statistic
suite (operators/hypotests.py) and the batch-6 time-series + audit
operators. Every expected value below is derived on paper in the
comments — the oracle-parity harness covers the real tables; these pin
the tie conventions and edge cases."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from big_data_graph_analysis_with_spark_spark.operators import (
    hypotests,
    olap,
    sketches,
)


def _customers(spark, rows):
    return spark.createDataFrame(
        rows, "c_custkey long, c_acctbal double, c_mktsegment string"
    )


def _orders(spark, rows):
    df = spark.createDataFrame(
        rows, "o_custkey long, o_totalprice double, d string"
    )
    return df.withColumn("o_orderdate", F.col("d").cast("timestamp"))


class TestMannWhitney:
    def test_hand_case_with_tie(self, spark):
        # A = {1, 2} cents, B = {2, 3} cents. Pooled doubled avg ranks:
        # 1 -> 2; the tied 2s -> 5 each; 3 -> 8. r2_a = 2 + 5 = 7.
        # U_A (A-wins incl. half-ties) = 0.5 -> u2_a = 1; u2_b = 7.
        cust = _customers(
            spark,
            [
                (1, 0.0, "BUILDING"),
                (2, 0.0, "BUILDING"),
                (3, 0.0, "MACHINERY"),
                (4, 0.0, "MACHINERY"),
            ],
        )
        orders = _orders(
            spark,
            [
                (1, 0.01, "1970-01-01"),
                (2, 0.02, "1970-01-01"),
                (3, 0.02, "1970-01-01"),
                (4, 0.03, "1970-01-01"),
            ],
        )
        r = hypotests.mann_whitney_u(orders, cust).collect()[0]
        assert (r["n_a"], r["n_b"]) == (2, 2)
        assert int(r["r2_a"]) == 7
        assert int(r["u2_a"]) == 1
        assert int(r["u2_b"]) == 7

    def test_u_identity(self, spark):
        # U_A + U_B == n_a * n_b, doubled: u2_a + u2_b == 2 n_a n_b
        cust = _customers(
            spark,
            [(i, 0.0, "BUILDING" if i % 2 else "MACHINERY") for i in range(1, 9)],
        )
        orders = _orders(
            spark,
            [(i, float(i * 7 % 5) + 0.5, "1970-01-01") for i in range(1, 9)],
        )
        r = hypotests.mann_whitney_u(orders, cust).collect()[0]
        assert int(r["u2_a"]) + int(r["u2_b"]) == 2 * r["n_a"] * r["n_b"]


class TestKsTwoSample:
    def test_hand_case(self, spark):
        # A (src0) lengths {1, 2}, B (src1) lengths {2, 3}:
        # sup |cumA*nB - cumB*nA| = 2 at n_chars = 1 (also at 2; min wins)
        docs = spark.createDataFrame(
            [
                (1, "src0", 1),
                (2, "src0", 2),
                (3, "src1", 2),
                (4, "src1", 3),
            ],
            "doc_id long, source string, n_chars long",
        )
        r = hypotests.ks_two_sample(docs).collect()[0]
        assert (r["n_a"], r["n_b"]) == (2, 2)
        assert int(r["d_num"]) == 2
        assert r["at_chars"] == 1

    def test_identical_distributions_zero(self, spark):
        docs = spark.createDataFrame(
            [(i, f"src{i % 2}", (i // 2) % 3) for i in range(12)],
            "doc_id long, source string, n_chars long",
        )
        r = hypotests.ks_two_sample(docs).collect()[0]
        assert int(r["d_num"]) == 0


class TestSpearman:
    def test_perfect_anticorrelation(self, spark):
        # x ranks doubled (2,4,6); y counts 3,2,1 -> doubled (6,4,2);
        # d = (-4, 0, 4) -> sum_d2 = 32 (= 4 * classic 8 for n=3 reversal)
        cust = _customers(
            spark, [(1, 0.01, "B"), (2, 0.02, "B"), (3, 0.03, "B")]
        )
        orders = _orders(
            spark,
            [(1, 1.0, "1970-01-01")] * 3
            + [(2, 1.0, "1970-01-01")] * 2
            + [(3, 1.0, "1970-01-01")] * 1,
        )
        r = hypotests.spearman_rank_corr(cust, orders).collect()[0]
        assert r["n"] == 3
        assert int(r["sum_d2"]) == 32

    def test_zero_order_customers_form_tie_group(self, spark):
        # customers 2 and 3 have no orders -> y = 0 for both (tie pair)
        cust = _customers(
            spark, [(1, 0.01, "B"), (2, 0.02, "B"), (3, 0.03, "B")]
        )
        orders = _orders(spark, [(1, 1.0, "1970-01-01")])
        ties = {
            r["var"]: int(r["tie_sum"])
            for r in hypotests.spearman_tie_terms(cust, orders).collect()
        }
        # x all distinct -> 0; y has a tie group of 2 -> 2^3 - 2 = 6
        assert ties == {"x": 0, "y": 6}


class TestMoodMedian:
    def test_hand_case(self, spark):
        # pooled cents {1..5}, median = rank (5-1)//2 = 2 -> value 3.
        # A = {1, 3}: below 1 / equal 1 / above 0; B = {2, 4, 5}: 1/0/2
        cust = _customers(spark, [(1, 0.0, "A"), (2, 0.0, "B")])
        orders = _orders(
            spark,
            [
                (1, 0.01, "1970-01-01"),
                (1, 0.03, "1970-01-01"),
                (2, 0.02, "1970-01-01"),
                (2, 0.04, "1970-01-01"),
                (2, 0.05, "1970-01-01"),
            ],
        )
        out = {
            r["segment"]: r
            for r in hypotests.mood_median_inputs(orders, cust).collect()
        }
        assert out["A"]["median_cents"] == 3
        assert (out["A"]["n_below"], out["A"]["n_equal"], out["A"]["n_above"]) == (1, 1, 0)
        assert (out["B"]["n_below"], out["B"]["n_equal"], out["B"]["n_above"]) == (1, 0, 2)


class TestQqDeciles:
    def test_type1_quantiles(self, spark):
        # A = 10..100 step 10 (n=10): decile q picks rank (9q)//10;
        # B = the same values doubled -> b = 2a at every decile
        cust = _customers(
            spark, [(1, 0.0, "BUILDING"), (2, 0.0, "MACHINERY")]
        )
        rows = [(1, v / 100.0, "1970-01-01") for v in range(10, 101, 10)]
        rows += [(2, 2 * v / 100.0, "1970-01-01") for v in range(10, 101, 10)]
        orders = _orders(spark, rows)
        out = {
            r["decile"]: r
            for r in hypotests.qq_decile_table(orders, cust).collect()
        }
        assert len(out) == 9
        # q=5 -> 0-indexed rank 4 -> 5th smallest = 50
        assert out[5]["a_cents"] == 50
        assert out[5]["b_cents"] == 100
        for q in range(1, 10):
            assert out[q]["b_cents"] == 2 * out[q]["a_cents"]
            assert out[q]["diff_cents"] == -out[q]["a_cents"]


class TestTieAndBandCensus:
    def test_size_tie_census(self, spark):
        part = spark.createDataFrame(
            [("X", 1), ("X", 1), ("X", 2), ("Y", 5)],
            "p_brand string, p_size int",
        )
        out = {r["brand"]: r for r in hypotests.size_tie_census(part).collect()}
        assert (out["X"]["n"], out["X"]["n_sizes"]) == (3, 2)
        assert (out["X"]["max_tie"], out["X"]["tie_pairs"]) == (2, 1)
        assert out["Y"]["tie_pairs"] == 0

    def test_percent_rank_bands(self, spark):
        # 11 distinct balances: rank i+1, band = (i*10)//10 = i, the
        # last (i=10) clamps into band 9 -> band 9 holds 2 suppliers
        sup = spark.createDataFrame(
            [(i, float(i)) for i in range(11)],
            "s_suppkey long, s_acctbal double",
        )
        out = {
            r["band"]: r["n_suppliers"]
            for r in hypotests.percent_rank_band_census(sup).collect()
        }
        assert out == {**{i: 1 for i in range(9)}, 9: 2}

    def test_band_ties_share_band(self, spark):
        sup = spark.createDataFrame(
            [(1, 1.0), (2, 1.0), (3, 2.0)],
            "s_suppkey long, s_acctbal double",
        )
        out = hypotests.percent_rank_band_census(sup).collect()
        by_band = {r["band"]: r["n_suppliers"] for r in out}
        # tied pair at rank 1 -> band 0 together; value 2 at rank 3 ->
        # band least(9, (2*10)//2) = 9
        assert by_band == {0: 2, 9: 1}


class TestTimeSeries:
    def test_cusum_hand_case(self, spark):
        # daily cents [1, 2, 3], total 6, n 3:
        # s = (3*1-6, 3*3-12, 3*6-18) = (-3, -3, 0) -> max 3 at day 0
        orders = _orders(
            spark,
            [
                (1, 0.01, "1970-01-01"),
                (1, 0.02, "1970-01-02"),
                (1, 0.03, "1970-01-03"),
            ],
        )
        r = olap.revenue_cusum(orders).collect()[0]
        assert (r["n_days"], r["total_cents"]) == (3, 6)
        assert int(r["max_abs_cusum"]) == 3
        assert r["at_day"] == 0  # tie with day 1; min day wins

    def test_acceleration_census(self, spark):
        # daily [1, 3, 2, 2]: d1 = (2, -1, 0), d2 = (-3, 1)
        orders = _orders(
            spark,
            [
                (1, 0.01, "1970-01-01"),
                (1, 0.03, "1970-01-02"),
                (1, 0.02, "1970-01-03"),
                (1, 0.02, "1970-01-04"),
            ],
        )
        r = olap.revenue_acceleration_census(orders).collect()
        assert len(r) == 1
        row = r[0]
        assert row["month"] == 197001
        assert (row["n_up"], row["n_down"], row["n_flat"]) == (1, 1, 0)

    def test_monotone_runs(self, spark):
        # daily [1, 2, 3, 2, 3]: ups at days 2,3,5 -> runs len 2 + len 1
        orders = _orders(
            spark,
            [
                (1, 0.01, "1970-01-01"),
                (1, 0.02, "1970-01-02"),
                (1, 0.03, "1970-01-03"),
                (1, 0.02, "1970-01-04"),
                (1, 0.03, "1970-01-05"),
            ],
        )
        r = olap.revenue_monotone_runs(orders).collect()
        assert len(r) == 1
        row = r[0]
        assert row["month"] == 197001
        assert (row["n_runs"], row["max_run"], row["up_days"]) == (2, 2, 3)


class TestCosupply:
    def test_degrees(self, spark):
        li = spark.createDataFrame(
            [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 2)],
            "l_partkey long, l_suppkey long",
        )
        out = {
            r["degree"]: r["n_suppliers"]
            for r in olap.supplier_cosupply_degree(li).collect()
        }
        # all three suppliers see the other two via part 1
        assert out == {2: 3}

    def test_fanout_cap_excludes_hub_part(self, spark):
        li = spark.createDataFrame(
            [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2)],
            "l_partkey long, l_suppkey long",
        )
        out = {
            r["degree"]: r["n_suppliers"]
            for r in olap.supplier_cosupply_degree(
                li, max_part_suppliers=2
            ).collect()
        }
        # part 1 (3 suppliers) excluded; only part 2 links s1 <-> s2
        assert out == {1: 2}


class TestHashSampleAudit:
    def test_python_mirror(self, spark):
        rows = [(i, "click", float(i)) for i in range(1, 201)]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        r = sketches.hash_sample_estimate_audit(ev).collect()[0]

        def in_sample(eid: int) -> bool:
            h = int(hashlib.md5(str(eid).encode()).hexdigest()[:14], 16)
            return h % 16 == 0

        cents = {i: i * 100 for i in range(1, 201)}
        sampled = [i for i in range(1, 201) if in_sample(i)]
        assert r["n"] == 200
        assert r["n_sample"] == len(sampled)
        assert r["exact_cents"] == sum(cents.values())
        assert r["est_cents"] == 16 * sum(cents[i] for i in sampled)
        assert r["err_cents"] == r["est_cents"] - r["exact_cents"]


class TestKendallBands:
    def test_monotone_all_concordant(self, spark):
        part = spark.createDataFrame(
            [(1, 0.10), (2, 0.20), (3, 0.30)],
            "p_size int, p_retailprice double",
        )
        r = hypotests.kendall_tau_band_inputs(part).collect()[0]
        assert r["n"] == 3
        assert int(r["c_pairs"]) == 3
        assert int(r["d_pairs"]) == 0
        assert int(r["tie_row"]) == 0 and int(r["tie_col"]) == 0

    def test_row_tie_counted(self, spark):
        # two parts share size 1 -> one tied row pair
        part = spark.createDataFrame(
            [(1, 0.10), (1, 0.20), (2, 0.30)],
            "p_size int, p_retailprice double",
        )
        r = hypotests.kendall_tau_band_inputs(part).collect()[0]
        assert int(r["tie_row"]) == 1
        # (1,*) vs (2, highest band) are both concordant
        assert int(r["c_pairs"]) == 2


class TestWilcoxon:
    def test_hand_case(self, spark):
        rows = [
            (1, 1.00, "1995-06-01"),
            (1, 3.00, "1996-06-01"),  # d = +200
            (2, 2.00, "1995-06-01"),
            (2, 1.00, "1996-06-01"),  # d = -100
            (3, 1.00, "1995-06-01"),
            (3, 1.00, "1996-06-01"),  # d = 0 -> dropped
        ]
        orders = _orders(spark, rows)
        r = hypotests.wilcoxon_signed_rank(orders).collect()[0]
        assert (r["n_pairs"], r["n_pos"], r["n_neg"], r["n_zero"]) == (2, 1, 1, 1)
        # |d| ranks doubled: 100 -> 2, 200 -> 4
        assert int(r["w2_pos"]) == 4
        assert int(r["w2_neg"]) == 2
        # identity: w2_pos + w2_neg = n(n+1)
        assert int(r["w2_pos"]) + int(r["w2_neg"]) == 2 * 3


class TestCvm:
    def test_hand_case(self, spark):
        ev = spark.createDataFrame(
            [(1, "purchase", 0.01), (2, "click", 0.02), (3, "error", 9.9)],
            "event_id long, event_type string, value double",
        )
        r = hypotests.cvm_two_sample(ev).collect()[0]
        assert (r["n_a"], r["n_b"]) == (1, 1)
        # v=1: dev=1 weight 1; v=2: dev=0 -> sum 1
        assert int(r["sum_sq_dev"]) == 1

    def test_statistic_non_null_at_fixture_sf(self, spark):
        # sum_sq_dev ~ N*(n_a*n_b)^2 overflows DECIMAL(38,0) to a
        # SILENT NULL around ~1e8 rows/sample (documented bound) — pin
        # that the fixture scales are nowhere near it (r9 ADVICE)
        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        r = hypotests.cvm_two_sample(ev).collect()[0]
        assert r["sum_sq_dev"] is not None and int(r["sum_sq_dev"]) > 0


class TestAbProportions:
    def test_python_mirror_split(self, spark):
        rows = [(i, i % 7, "purchase" if i % 3 == 0 else "view", 1.0)
                for i in range(60)]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, value double"
        )
        out = {r["arm"]: r for r in hypotests.ab_proportion_inputs(ev).collect()}

        def arm_of(uid: int) -> int:
            h = int(hashlib.md5(str(uid).encode()).hexdigest()[:14], 16)
            return h % 2

        exp_events = {0: 0, 1: 0}
        exp_purch = {0: 0, 1: 0}
        exp_users: dict[int, set] = {0: set(), 1: set()}
        for i in range(60):
            a = arm_of(i % 7)
            exp_events[a] += 1
            exp_users[a].add(i % 7)
            if i % 3 == 0:
                exp_purch[a] += 1
        for a in (0, 1):
            if exp_events[a] == 0:
                assert a not in out
                continue
            assert out[a]["n_events"] == exp_events[a]
            assert out[a]["n_purchases"] == exp_purch[a]
            assert out[a]["n_users"] == len(exp_users[a])


class TestMannKendall:
    def test_hand_case(self, spark):
        orders = _orders(
            spark,
            [
                (1, 0.01, "1970-01-01"),
                (1, 0.03, "1970-01-02"),
                (1, 0.02, "1970-01-03"),
            ],
        )
        r = hypotests.mann_kendall_trend(orders).collect()[0]
        assert (r["n_days"], r["s_stat"], r["tie_term"]) == (3, 1, 0)

    def test_tie_term(self, spark):
        orders = _orders(
            spark,
            [(1, 0.01, "1970-01-01"), (1, 0.01, "1970-01-02")],
        )
        r = hypotests.mann_kendall_trend(orders).collect()[0]
        # t=2 -> 2*1*9 = 18; S = 0
        assert (r["s_stat"], r["tie_term"]) == (0, 18)


class TestRunsTest:
    def test_hand_case(self, spark):
        # daily [1, 2, 3, 1, 2]; pooled median 2; drop the two 2-days;
        # remaining signs B, A, B -> 3 runs
        orders = _orders(
            spark,
            [
                (1, 0.01, "1970-01-01"),
                (1, 0.02, "1970-01-02"),
                (1, 0.03, "1970-01-03"),
                (1, 0.01, "1970-01-04"),
                (1, 0.02, "1970-01-05"),
            ],
        )
        r = hypotests.runs_test_inputs(orders).collect()[0]
        assert (r["n_above"], r["n_below"], r["n_runs"]) == (1, 2, 3)


class TestLorenz:
    def test_hand_case(self, spark):
        # revenues [0, 0, 10, 20, 70]: cum at k=1..5 = 0,0,10,30,100
        cust = _customers(
            spark, [(i, 0.0, "B") for i in range(1, 6)]
        )
        orders = _orders(
            spark,
            [
                (3, 0.10, "1970-01-01"),
                (4, 0.20, "1970-01-01"),
                (5, 0.70, "1970-01-01"),
            ],
        )
        out = {
            r["decile"]: r
            for r in olap.lorenz_curve_points(orders, cust).collect()
        }
        # k = (5q)//10: decile 1 has k=0 -> no row
        assert 1 not in out and len(out) == 9
        assert out[10]["cum_cents"] == 100 and out[10]["total_cents"] == 100
        assert out[6]["k_customers"] == 3 and out[6]["cum_cents"] == 10
        assert out[8]["cum_cents"] == 30
        # partial tie group: two zero-revenue customers at k=2
        assert out[4]["cum_cents"] == 0


class TestTukeyFences:
    def test_outlier_flagged(self, spark):
        rows = [("A", v / 100.0) for v in list(range(1, 9)) + [1000]]
        li = spark.createDataFrame(
            rows, "l_returnflag string, l_extendedprice double"
        )
        r = olap.tukey_fence_census(li).collect()[0]
        # n=9: q1 at rank 2 -> 3, q3 at rank 6 -> 7; hi fence 13
        assert (r["n"], r["q1_cents"], r["q3_cents"]) == (9, 3, 7)
        assert (r["n_low"], r["n_high"]) == (0, 1)
