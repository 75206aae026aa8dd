"""Guarantee and identity tests for the round-12-registered operators.

Until round 12 this file ALSO pinned each candidate's DuckDB twin with
the driver's own comparison; at registration (r11 verdict task 1) those
twins moved verbatim into `__spark_entry__.oracle_sql()`, where
tests/test_oracle_parity.py runs the identical comparison for every
registry entry — so the SQL now has exactly one home and this file
keeps only the checks the oracle comparison CANNOT express: hand-
computed cases, algebraic identities, and the deterministic guarantees
(no-false-negative, no-undercount, planted-overlap, exact
apportionment) that hold on ANY input.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from tests.conftest import SF0001


def _read(spark, sf, name):
    return spark.read.parquet(f"{sf}/{name}.parquet")


class TestSurvivalGuarantees:
    def test_km_hand_case(self, spark):
        """3 users: converts day 0, converts day 2, never (censored at
        the horizon)."""
        from big_data_graph_analysis_with_spark_spark.operators import sessions

        t = lambda d, h=0: dt.datetime(2024, 1, 1 + d, h)
        rows = [
            (1, 1, t(0), "view"), (2, 1, t(0, 2), "purchase"),
            (3, 2, t(0), "view"), (4, 2, t(2), "purchase"),
            (5, 3, t(0), "view"), (6, 3, t(3), "click"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        out = {
            r["t_days"]: (r["n_risk"], r["n_events"], r["n_censored"])
            for r in sessions.km_risk_table(ev).collect()
        }
        # durations: u1 = 0 (event), u2 = 2 (event), u3 = 3 (censored)
        assert out == {0: (3, 1, 0), 2: (2, 1, 0), 3: (1, 0, 1)}


class TestRankStatisticIdentities:
    def test_kruskal_wallis_rank_sum_identity(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.kruskal_wallis_inputs(_read(spark, SF0001, "orders"))
        got = {r["g"]: r for r in df.collect()}
        # rank-sum identity: sum of halved doubled rank sums over all
        # groups is N(N+1)/2
        n = sum(r["n_g"] for r in got.values())
        assert sum(int(r["r2_g"]) for r in got.values()) == n * (n + 1)

    def test_brunner_munzel_placement_identity(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.brunner_munzel_inputs(
            _read(spark, SF0001, "orders"), _read(spark, SF0001, "customer")
        )
        rows = {r["segment"]: r for r in df.collect()}
        # placement identity: doubled cross-pair mass counted from both
        # sides is every (a, b) pair twice
        na = rows["BUILDING"]["n_g"]
        nb = rows["MACHINERY"]["n_g"]
        assert (
            int(rows["BUILDING"]["sum_p2"]) + int(rows["MACHINERY"]["sum_p2"])
            == 2 * na * nb
        )

    def test_page_trend_friedman_identities(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.page_trend_inputs(_read(spark, SF0001, "orders"))
        rows = df.collect()
        # Friedman rank identity on the doubled ranks, k = 5 levels
        k = len(rows)
        assert sum(r["r2_sum"] for r in rows) == rows[0]["n_blocks"] * k * (k + 1)
        assert all(r["l2_term"] == r["priority"] * r["r2_sum"] for r in rows)

    def test_dominance_census_partition_identity(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.dominance_census(
            _read(spark, SF0001, "orders"), _read(spark, SF0001, "customer")
        )
        row = df.collect()[0]
        assert (
            row["a_dominated"] + row["b_dominated"] + row["cdf_ties"]
            == row["n_values"]
        )

    def test_ks_one_sample_uniform_sparse_support(self, spark):
        """The r10-advice counterexample: 1 obs at lo, 9 at hi. The sup
        of |F_n − F₀| sits just BELOW hi (F_n = 1/10 while F₀ ≈ 1), so
        the pre-jump D⁻ candidate must win: with lo=100, hi=1099
        (span=1000, n=10) the true d_num is |1·1000 − 999·10| = 8990
        (D = 0.899), not the post-jump-only 990 (D = 0.099)."""
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        rows = [(1.00, "purchase")] + [(10.99, "purchase")] * 9
        ev = spark.createDataFrame(rows, "value double, event_type string")
        got = hypotests.ks_one_sample_uniform(ev).collect()[0]
        assert (got["n"], got["lo_cents"], got["span"]) == (10, 100, 1000)
        assert int(got["d_num"]) == 8990
        assert got["d_arg_cents"] == 1099


class TestSketchGuarantees:
    def test_count_min_never_undercounts(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sketches

        rows = sketches.count_min_audit(_read(spark, SF0001, "events")).collect()
        # CMS deterministic guarantee: never undercounts
        assert all(r["cms_n"] >= r["exact_n"] for r in rows)

    def test_bloom_no_false_negatives(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sketches

        rows = sketches.bloom_filter_audit(
            _read(spark, SF0001, "events")
        ).collect()
        # no-false-negative guarantee: every member probe hits
        assert all(r["bloom_hit"] == 1 for r in rows if r["is_member"] == 1)
        assert len(rows) == 16


class TestAllocationAndCubeInvariants:
    def test_token_mix_allocation_sums_to_budget(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sampling

        df = sampling.token_mix_allocation(_read(spark, SF0001, "documents"))
        # exact-apportionment invariant: allocations sum to the budget
        assert sum(r["alloc"] for r in df.collect()) == 1_000_000

    def test_revenue_cube_layer_identities(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import olap

        rows = olap.revenue_cube(_read(spark, SF0001, "orders")).collect()
        # layer identities: the grand total equals the sum of each
        # single-dimension layer, which equals the sum of the cells
        total = [r for r in rows if r["gid"] == 3]
        assert len(total) == 1
        for gid in (0, 1, 2):
            layer = [r for r in rows if r["gid"] == gid]
            assert sum(r["n"] for r in layer) == total[0]["n"]
            assert (
                sum(r["revenue_cents"] for r in layer)
                == total[0]["revenue_cents"]
            )


class TestWinnowGuarantee:
    def test_planted_overlap_survives(self, spark):
        """The winnowing contract: a shared substring of length
        ≥ k + w − 1 (= 11 at the defaults) yields at least one shared
        fingerprint — even when the surrounding documents differ
        completely."""
        from big_data_graph_analysis_with_spark_spark.operators import dedup

        shared = "qwertyuiopasdfghjkl"  # 19 chars >= k + w - 1
        docs = spark.createDataFrame(
            [
                (1, "zzzz1111 " + shared + " 2222yyyy"),
                (2, "mmmm3333 " + shared + " 4444nnnn"),
                (3, "completely unrelated content here"),
            ],
            "doc_id long, text string",
        )
        fps = dedup.winnow_fingerprints(docs)
        by_doc = {
            r["doc_id"]: set()
            for r in docs.select("doc_id").collect()
        }
        for r in fps.collect():
            by_doc[r["doc_id"]].add(r["fp"])
        assert by_doc[1] & by_doc[2], "planted overlap lost"
