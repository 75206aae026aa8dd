"""Oracle-parity tests for NEXT-ROUND registry candidates.

The driver's 50-slot verification window is full this round, so these
operators cannot take `oracle_sql()` slots yet — but their DuckDB twins
are written and pinned HERE, with the driver's own comparison
(tests/conftest.assert_matches_oracle), against the sf0.001 tables.
Promoting one to the registry next round is a copy-paste of the SQL
plus a q_ wrapper, with a round of pytest evidence already behind it.
Each test's callable mirrors exactly what the q_ wrapper will do.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF0001, assert_matches_oracle


def _read(spark, sf, name):
    return spark.read.parquet(f"{sf}/{name}.parquet")


class TestStatisticsCandidates:
    def test_pettitt_changepoint(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.pettitt_changepoint(_read(spark, SF0001, "orders"))
        assert_matches_oracle(df, """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
              FROM orders GROUP BY 1
            ),
            h AS (SELECT cents, COUNT(*) AS cnt FROM daily GROUP BY 1),
            r2 AS (
              SELECT cents,
                     2 * COALESCE(SUM(cnt) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2
              FROM h
            ),
            ranked AS (
              SELECT d.day,
                     ROW_NUMBER() OVER (ORDER BY d.day) AS t,
                     SUM(r2.r2) OVER (ORDER BY d.day) AS w2,
                     COUNT(*) OVER () AS n
              FROM daily d JOIN r2 USING (cents)
            ),
            dev AS (
              SELECT day, n,
                     ABS(CAST(w2 AS HUGEINT) - CAST(t AS HUGEINT) * (n + 1))
                       AS u_abs
              FROM ranked WHERE t < n
            ),
            m AS (SELECT MAX(u_abs) AS mx FROM dev)
            SELECT CAST(MAX(n) AS BIGINT) AS n_days,
                   CAST(MAX(m.mx) AS BIGINT) AS max_abs_u,
                   CAST(MIN(day) AS BIGINT) AS at_day
            FROM dev JOIN m ON dev.u_abs = m.mx
        """, SF0001)

    def test_seasonal_mann_kendall(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.seasonal_mann_kendall(_read(spark, SF0001, "orders"))
        assert_matches_oracle(df, """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
              FROM orders GROUP BY 1
            ),
            md AS (
              SELECT month(DATE '1970-01-01' + CAST(day AS INTEGER)) AS moy,
                     day, cents
              FROM daily
            ),
            s AS (
              SELECT a.moy,
                     CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                   WHEN b.cents < a.cents THEN -1
                                   ELSE 0 END) AS BIGINT) AS s_stat
              FROM md a JOIN md b ON a.moy = b.moy AND b.day > a.day
              GROUP BY 1
            ),
            n AS (SELECT moy, CAST(COUNT(*) AS BIGINT) AS n_days
                  FROM md GROUP BY 1),
            t AS (
              SELECT moy,
                     CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                       AS tie_term
              FROM (SELECT moy, cents, COUNT(*) AS t FROM md GROUP BY 1, 2)
              GROUP BY 1
            )
            SELECT CAST(n.moy AS BIGINT) AS month_of_year, n.n_days,
                   CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat,
                   t.tie_term
            FROM n LEFT JOIN s ON s.moy = n.moy JOIN t ON t.moy = n.moy
        """, SF0001)

    def test_trimmed_sum_census(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import olap

        df = olap.trimmed_sum_census(_read(spark, SF0001, "lineitem"))
        assert_matches_oracle(df, """
            WITH h AS (
              SELECT l_returnflag AS returnflag,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM lineitem GROUP BY 1, 2
            ),
            c AS (
              SELECT returnflag, cents, cnt,
                     SUM(cnt) OVER (PARTITION BY returnflag
                                    ORDER BY cents) AS cum,
                     SUM(cnt) OVER (PARTITION BY returnflag) AS n
              FROM h
            ),
            b AS (
              SELECT returnflag, MAX(n) AS n,
                     MAX(CASE WHEN cum - cnt <= ((n-1) * 1) // 10
                               AND ((n-1) * 1) // 10 < cum
                              THEN cents END) AS lo_cents,
                     MAX(CASE WHEN cum - cnt <= ((n-1) * 9) // 10
                               AND ((n-1) * 9) // 10 < cum
                              THEN cents END) AS hi_cents
              FROM c
              WHERE (cum - cnt <= ((n-1) * 1) // 10
                     AND ((n-1) * 1) // 10 < cum)
                 OR (cum - cnt <= ((n-1) * 9) // 10
                     AND ((n-1) * 9) // 10 < cum)
              GROUP BY 1
            ),
            k AS (
              SELECT h.returnflag, SUM(h.cnt) AS kept_n,
                     SUM(h.cnt * h.cents) AS kept_sum
              FROM h JOIN b USING (returnflag)
              WHERE h.cents > b.lo_cents AND h.cents < b.hi_cents
              GROUP BY 1
            )
            SELECT b.returnflag,
                   CAST(b.n AS BIGINT) AS n,
                   CAST(b.lo_cents AS BIGINT) AS lo_cents,
                   CAST(b.hi_cents AS BIGINT) AS hi_cents,
                   CAST(COALESCE(k.kept_n, 0) AS BIGINT) AS kept_n,
                   CAST(COALESCE(k.kept_sum, 0) AS BIGINT)
                     AS kept_sum_cents
            FROM b LEFT JOIN k USING (returnflag)
        """, SF0001)

    def test_measure_crossproducts(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import olap

        df = olap.measure_crossproducts(_read(spark, SF0001, "lineitem"))
        assert_matches_oracle(df, """
            WITH t AS (
              SELECT l_returnflag AS returnflag,
                     CAST(ROUND(l_quantity) AS BIGINT) AS q,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
                     CAST(ROUND(l_discount * 10000) AS BIGINT) AS d
              FROM lineitem
            )
            SELECT returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS sum_q,
                   CAST(SUM(p) AS BIGINT) AS sum_p,
                   CAST(SUM(d) AS BIGINT) AS sum_d,
                   CAST(SUM(CAST(p AS HUGEINT) * p) AS BIGINT) AS spp,
                   CAST(SUM(CAST(q AS HUGEINT) * q) AS BIGINT) AS sqq,
                   CAST(SUM(CAST(d AS HUGEINT) * d) AS BIGINT) AS sdd,
                   CAST(SUM(CAST(q AS HUGEINT) * p) AS BIGINT) AS sqp,
                   CAST(SUM(CAST(q AS HUGEINT) * d) AS BIGINT) AS sqd,
                   CAST(SUM(CAST(p AS HUGEINT) * d) AS BIGINT) AS spd
            FROM t GROUP BY 1
        """, SF0001)

    def test_l_diversity_census(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import curation

        cust = _read(spark, SF0001, "customer").select(
            "c_nationkey",
            "c_mktsegment",
            (F.round(F.col("c_acctbal") / 1000).cast("long")).alias("bal_band"),
        )
        df = curation.l_diversity_census(
            cust, ["c_nationkey", "c_mktsegment"], "bal_band"
        )
        assert_matches_oracle(df, """
            WITH t AS (
              SELECT c_nationkey, c_mktsegment,
                     CAST(ROUND(c_acctbal / 1000) AS BIGINT) AS bal_band
              FROM customer
            ),
            cls AS (
              SELECT c_nationkey, c_mktsegment, COUNT(*) AS l
              FROM (SELECT DISTINCT c_nationkey, c_mktsegment, bal_band
                    FROM t)
              GROUP BY 1, 2
            ),
            sz AS (
              SELECT c_nationkey, c_mktsegment, COUNT(*) AS rows_
              FROM t GROUP BY 1, 2
            )
            SELECT CAST(cls.l AS BIGINT) AS l,
                   CAST(COUNT(*) AS BIGINT) AS n_groups,
                   CAST(SUM(sz.rows_) AS BIGINT) AS n_rows
            FROM cls JOIN sz USING (c_nationkey, c_mktsegment)
            GROUP BY 1
        """, SF0001)

    def test_zipf_rank_freq_points(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import (
            corpusstats,
        )

        df = corpusstats.zipf_rank_freq_points(
            _read(spark, SF0001, "documents")
        )
        assert_matches_oracle(df, r"""
            WITH words AS (
              SELECT UNNEST(string_split_regex(lower(text), '\s+')) AS tok
              FROM documents
            ),
            vocab AS (
              SELECT tok, COUNT(*) AS freq FROM words
              WHERE tok <> '' GROUP BY 1
            ),
            fh AS (SELECT freq, COUNT(*) AS cnt FROM vocab GROUP BY 1),
            c AS (
              SELECT freq, cnt,
                     SUM(cnt) OVER (ORDER BY freq DESC) AS cum,
                     SUM(cnt) OVER () AS v
              FROM fh
            ),
            p AS (
              SELECT c.*, q.decile,
                     GREATEST(1, (v * q.decile) // 10) AS want
              FROM c, (SELECT UNNEST(range(0, 11)) AS decile) q
            )
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(want AS BIGINT) AS rank,
                   CAST(freq AS BIGINT) AS freq
            FROM p WHERE cum - cnt < want AND want <= cum
        """, SF0001)


class TestIvmCandidates:
    """End-to-end IVM candidate queries: state materialized from the
    pre-1998 slice, a CDC insert batch from 1998+, maintained result
    compared against the plain recompute over ALL orders."""

    def test_ivm_orders_rollup(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import merge

        orders = _read(spark, SF0001, "orders")
        cents = F.round(F.col("o_totalprice") * 100).cast("long")
        old = orders.filter(F.year("o_orderdate") < 1998)
        new = orders.filter(F.year("o_orderdate") >= 1998)
        state = old.groupBy(F.col("o_custkey").alias("key")).agg(
            F.count("*").cast("long").alias("n"),
            F.sum(cents).cast("long").alias("sum_cents"),
        )
        cdc = new.select(
            F.lit("I").alias("op"),
            F.col("o_custkey").alias("key"),
            F.lit(None).cast("long").alias("old_cents"),
            cents.alias("new_cents"),
        )
        df = merge.maintain_group_aggregate(state, cdc)
        assert_matches_oracle(df, """
            SELECT o_custkey AS key,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM orders GROUP BY 1
        """, SF0001)

    def test_ivm_distinct_priorities(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import merge

        orders = _read(spark, SF0001, "orders")
        old = orders.filter(F.year("o_orderdate") < 1998)
        new = orders.filter(F.year("o_orderdate") >= 1998)
        aux = old.groupBy(
            F.col("o_custkey").alias("key"),
            F.col("o_orderpriority").alias("v"),
        ).agg(F.count("*").cast("long").alias("m"))
        cdc = new.select(
            F.lit("I").alias("op"),
            F.col("o_custkey").alias("key"),
            F.lit(None).cast("string").alias("old_v"),
            F.col("o_orderpriority").alias("new_v"),
        )
        _, view = merge.maintain_distinct_count(aux, cdc)
        assert_matches_oracle(view, """
            SELECT o_custkey AS key,
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
                     AS n_distinct
            FROM orders GROUP BY 1
        """, SF0001)

    def test_ivm_histogram_median(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import merge

        orders = _read(spark, SF0001, "orders")
        cents = F.round(F.col("o_totalprice") * 100).cast("long")
        old = orders.filter(F.year("o_orderdate") < 1998)
        new = orders.filter(F.year("o_orderdate") >= 1998)
        hist = old.groupBy(
            F.col("o_orderpriority").alias("key"), cents.alias("cents")
        ).agg(F.count("*").cast("long").alias("w"))
        cdc = new.select(
            F.lit("I").alias("op"),
            F.col("o_orderpriority").alias("key"),
            F.lit(None).cast("long").alias("old_cents"),
            cents.alias("new_cents"),
        )
        maintained = merge.maintain_value_histogram(hist, cdc)
        df = merge.quantile_from_histogram(maintained, 5)
        assert_matches_oracle(df, """
            WITH h AS (
              SELECT o_orderpriority AS key,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS w
              FROM orders GROUP BY 1, 2
            ),
            c AS (
              SELECT key, cents, w,
                     SUM(w) OVER (PARTITION BY key ORDER BY cents) AS cum,
                     SUM(w) OVER (PARTITION BY key) AS n
              FROM h
            )
            SELECT key, CAST(n AS BIGINT) AS n,
                   CAST(cents AS BIGINT) AS q_cents
            FROM c
            WHERE cum - w <= ((n - 1) * 5) // 10
              AND ((n - 1) * 5) // 10 < cum
        """, SF0001)


class TestSamplingAndJsonCandidates:
    def test_poisson_bootstrap_sums(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sampling

        df = sampling.poisson_bootstrap_sums(
            _read(spark, SF0001, "events"), n_resamples=8
        )
        ts = sampling.poisson1_thresholds_56()
        case = "CASE " + " ".join(
            f"WHEN u < {t} THEN {k}" for k, t in enumerate(ts)
        ) + f" ELSE {len(ts)} END"
        assert_matches_oracle(df, f"""
            WITH t AS (
              SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                     b.b,
                     (('0x' || substr(md5(
                        CAST(b.b AS VARCHAR) || ':' ||
                        CAST(event_id AS VARCHAR)), 1, 14))::BIGINT) AS u
              FROM events, (SELECT UNNEST(range(0, 8)) AS b) b
              WHERE value IS NOT NULL AND event_id IS NOT NULL
            ),
            w AS (SELECT b, cents, {case} AS w FROM t)
            SELECT CAST(b AS BIGINT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(w) AS BIGINT) AS n_eff,
                   CAST(SUM(w * cents) AS BIGINT) AS boot_cents
            FROM w GROUP BY 1
        """, SF0001)

    def test_block_bootstrap_daily_sums(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sampling

        df = sampling.block_bootstrap_daily_sums(
            _read(spark, SF0001, "orders"), n_resamples=8, block_len=30
        )
        assert_matches_oracle(df, """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
              FROM orders GROUP BY 1
            ),
            idx AS (
              SELECT ROW_NUMBER() OVER (ORDER BY day) - 1 AS i,
                     SUM(cents) OVER (ORDER BY day) AS prefix
              FROM daily
            ),
            sc AS (SELECT COUNT(*) AS n, MAX(prefix) AS total FROM idx),
            picks AS (
              SELECT sc.n, sc.total, b.b, j.j,
                     (('0x' || substr(md5(
                        CAST(b.b AS VARCHAR) || ':' ||
                        CAST(j.j AS VARCHAR)), 1, 14))::BIGINT) % sc.n AS s
              FROM sc,
                   (SELECT UNNEST(range(0, 8)) AS b) b,
                   LATERAL (SELECT UNNEST(range(0, CAST((sc.n + 29) // 30
                            AS BIGINT))) AS j) j
            ),
            sums AS (
              SELECT p.b,
                     hi.prefix
                     - CASE WHEN p.s = 0 THEN 0 ELSE lo.prefix END
                     + CASE WHEN p.s + 29 >= p.n THEN p.total ELSE 0 END
                       AS block_cents
              FROM picks p
              JOIN idx lo ON lo.i = (p.s - 1 + p.n) % p.n
              JOIN idx hi ON hi.i = (p.s + 29) % p.n
            )
            SELECT CAST(b AS BIGINT) AS b,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(COUNT(*) * 30 AS BIGINT) AS n_days_eff,
                   CAST(SUM(block_cents) AS BIGINT) AS boot_cents
            FROM sums GROUP BY 1
        """, SF0001)

    def test_props_variant_stats(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import jsonops

        df = jsonops.props_variant_stats(_read(spark, SF0001, "events"))
        assert_matches_oracle(df, """
            WITH t AS (
              SELECT event_type,
                     CAST(json_extract(props, '$.k') AS BIGINT) AS k
              FROM events
            )
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(k) AS BIGINT) AS n_with_prop,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MIN(k) AS BIGINT) AS min_k,
                   CAST(MAX(k) AS BIGINT) AS max_k,
                   CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
            FROM t GROUP BY 1
        """, SF0001)


class TestSurvivalCandidate:
    def test_km_risk_table(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sessions

        df = sessions.km_risk_table(_read(spark, SF0001, "events"))
        assert_matches_oracle(df, """
            WITH pu AS (
              SELECT user_id,
                     MIN(epoch_us(ts)) AS t0,
                     MIN(CASE WHEN event_type = 'purchase'
                              THEN epoch_us(ts) END) AS tp
              FROM events GROUP BY 1
            ),
            hz AS (SELECT MAX(epoch_us(ts)) AS hz FROM events),
            d AS (
              SELECT (COALESCE(tp, hz.hz) - t0) // 86400000000 AS t_days,
                     tp IS NOT NULL AS event
              FROM pu, hz
            ),
            h AS (
              SELECT t_days,
                     SUM(CASE WHEN event THEN 1 ELSE 0 END) AS n_events,
                     SUM(CASE WHEN NOT event THEN 1 ELSE 0 END)
                       AS n_censored
              FROM d GROUP BY 1
            )
            SELECT CAST(t_days AS BIGINT) AS t_days,
                   CAST(SUM(n_events + n_censored) OVER ()
                        - COALESCE(SUM(n_events + n_censored) OVER (
                            ORDER BY t_days
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING
                          ), 0) AS BIGINT) AS n_risk,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(n_censored AS BIGINT) AS n_censored
            FROM h
        """, SF0001)

    def test_km_hand_case(self, spark):
        """3 users: converts day 0, converts day 2, never (censored at
        the horizon)."""
        import datetime as dt

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


class TestRound10Candidates:
    """Round-10 batch — landed mid-freeze (r9 verdict task 2), so these
    wire into the registry only after the staleness tail clears. All
    final output columns are BIGINT on the oracle side (the dtype-drift
    lint applies to candidates the moment they are promoted)."""

    def test_mcnemar_inputs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.mcnemar_inputs(_read(spark, SF0001, "orders"))
        assert_matches_oracle(df, """
            WITH flags AS (
              SELECT o_custkey,
                     MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1
                         ELSE 0 END) AS a,
                     MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1
                         ELSE 0 END) AS b
              FROM orders GROUP BY 1
            )
            SELECT CAST(COALESCE(SUM(CASE WHEN a = 0 AND b = 0 THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_00,
                   CAST(COALESCE(SUM(CASE WHEN a = 0 AND b = 1 THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_01,
                   CAST(COALESCE(SUM(CASE WHEN a = 1 AND b = 0 THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_10,
                   CAST(COALESCE(SUM(CASE WHEN a = 1 AND b = 1 THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_11
            FROM flags
        """, SF0001)

    def test_daily_count_autocorr(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.daily_count_autocorr(_read(spark, SF0001, "orders"))
        assert_matches_oracle(df, """
            WITH daily AS (
              SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                     COUNT(*) AS x
              FROM orders GROUP BY 1
            ),
            lags AS (SELECT UNNEST(range(1, 8)) AS lag)
            SELECT CAST(l.lag AS BIGINT) AS lag,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(a.x) AS BIGINT) AS sum_x,
                   CAST(SUM(b.x) AS BIGINT) AS sum_y,
                   CAST(SUM(a.x * a.x) AS BIGINT) AS sum_xx,
                   CAST(SUM(b.x * b.x) AS BIGINT) AS sum_yy,
                   CAST(SUM(a.x * b.x) AS BIGINT) AS sum_xy
            FROM lags l
            JOIN daily a ON TRUE
            JOIN daily b ON b.day = a.day + l.lag
            GROUP BY 1
        """, SF0001)

    def test_friedman_rank_inputs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.friedman_rank_inputs(
            _read(spark, SF0001, "orders"), _read(spark, SF0001, "customer")
        )
        assert_matches_oracle(df, """
            WITH cells AS (
              SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                     c_mktsegment AS segment,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS v
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1, 2
            ),
            spine AS (
              SELECT m.ym, s.segment
              FROM (SELECT DISTINCT ym FROM cells) m,
                   (SELECT DISTINCT segment FROM cells) s
            ),
            full_cells AS (
              SELECT spine.ym, spine.segment, COALESCE(cells.v, 0) AS v
              FROM spine LEFT JOIN cells
                ON spine.ym = cells.ym AND spine.segment = cells.segment
            ),
            h AS (
              SELECT ym, v, COUNT(*) AS cnt FROM full_cells GROUP BY 1, 2
            ),
            r2 AS (
              SELECT ym, v,
                     2 * COALESCE(SUM(cnt) OVER (
                       PARTITION BY ym ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2
              FROM h
            )
            SELECT f.segment,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(r2.r2) AS BIGINT) AS r2_sum
            FROM full_cells f JOIN r2 ON f.ym = r2.ym AND f.v = r2.v
            GROUP BY 1
        """, SF0001)

    def test_filter_agreement_census(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import curation

        df = curation.filter_agreement_census(_read(spark, SF0001, "documents"))
        assert_matches_oracle(df, """
            WITH f AS (
              SELECT length(text) >= 500 AS a,
                     length(text) <= 8 * (length(text)
                       - length(replace(text, ' ', '')) + 1) AS b
              FROM documents
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COALESCE(SUM(CASE WHEN a AND b THEN 1 ELSE 0
                                     END), 0) AS BIGINT) AS n_11,
                   CAST(COALESCE(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0
                                     END), 0) AS BIGINT) AS n_10,
                   CAST(COALESCE(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0
                                     END), 0) AS BIGINT) AS n_01,
                   CAST(COALESCE(SUM(CASE WHEN NOT a AND NOT b THEN 1
                                     ELSE 0 END), 0) AS BIGINT) AS n_00
            FROM f
        """, SF0001)

    def test_jonckheere_trend_inputs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.jonckheere_trend_inputs(_read(spark, SF0001, "orders"))
        assert_matches_oracle(df, """
            WITH hist AS (
              SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM orders GROUP BY 1, 2
            ),
            spine AS (
              SELECT v.cents, gg.g
              FROM (SELECT DISTINCT cents FROM hist) v,
                   (SELECT DISTINCT g FROM hist) gg
            ),
            grid AS (
              SELECT spine.g, spine.cents, COALESCE(hist.cnt, 0) AS cnt
              FROM spine LEFT JOIN hist
                ON spine.g = hist.g AND spine.cents = hist.cents
            ),
            cum AS (
              SELECT g, cents, cnt,
                     COALESCE(SUM(cnt) OVER (
                       PARTITION BY g ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS cum_lt
              FROM grid
            ),
            sizes AS (SELECT g, SUM(cnt) AS n FROM hist GROUP BY 1),
            pair_u AS (
              SELECT lo.g, hi.g AS h,
                     SUM(hi.cnt * (2 * lo.cum_lt + lo.cnt)) AS u2
              FROM cum lo JOIN cum hi
                ON lo.cents = hi.cents AND lo.g < hi.g
              GROUP BY 1, 2
            )
            SELECT p.g, p.h,
                   CAST(sg.n AS BIGINT) AS n_g,
                   CAST(sh.n AS BIGINT) AS n_h,
                   CAST(p.u2 AS BIGINT) AS u2
            FROM pair_u p
            JOIN sizes sg ON sg.g = p.g
            JOIN sizes sh ON sh.g = p.h
        """, SF0001)

    def test_ngram_novelty_profile(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import curation

        df = curation.ngram_novelty_profile(_read(spark, SF0001, "documents"))
        assert_matches_oracle(df, """
            WITH words AS (
              SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents
            ),
            shing AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(range(len(w) - 2),
                            i -> array_to_string(w[i+1:i+3], ' ')))
                       AS shingle
              FROM words WHERE len(w) >= 3
              UNION ALL
              SELECT doc_id, text AS shingle FROM words WHERE len(w) < 3
            ),
            ref AS (
              SELECT DISTINCT shingle FROM shing WHERE doc_id % 4 = 0
            ),
            per_doc AS (
              SELECT s.doc_id,
                     COUNT(*) AS n_grams,
                     COUNT(*) - COUNT(r.shingle) AS n_novel
              FROM shing s LEFT JOIN ref r ON r.shingle = s.shingle
              WHERE s.doc_id % 4 <> 0
              GROUP BY 1
            )
            SELECT CAST((n_novel * 10) // n_grams AS BIGINT)
                     AS novelty_decile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_grams) AS BIGINT) AS sum_grams,
                   CAST(SUM(n_novel) AS BIGINT) AS sum_novel
            FROM per_doc GROUP BY 1
        """, SF0001)


class TestRound10CandidatesB:
    """Round-10 second wave — same freeze discipline as
    TestRound10Candidates: twins pinned here with the driver's own
    comparison, promoted to `queries()`/`oracle_sql()` only once the
    staleness tail clears. All final oracle columns BIGINT."""

    def test_kruskal_wallis_inputs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.kruskal_wallis_inputs(_read(spark, SF0001, "orders"))
        got = {r["g"]: r for r in df.collect()}
        # rank-sum identity: sum of halved doubled rank sums over all
        # groups is N(N+1)/2
        n = sum(r["n_g"] for r in got.values())
        assert sum(int(r["r2_g"]) for r in got.values()) == n * (n + 1)
        assert_matches_oracle(df, """
            WITH vals AS (
              SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS g,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            ),
            hist AS (SELECT g, cents, COUNT(*) AS cnt_g FROM vals GROUP BY 1, 2),
            pooled AS (SELECT cents, SUM(cnt_g) AS cnt FROM hist GROUP BY 1),
            ranked AS (
              SELECT cents, cnt,
                     COALESCE(SUM(cnt) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb
              FROM pooled
            ),
            ties AS (SELECT SUM(cnt * cnt * cnt - cnt) AS t3 FROM pooled)
            SELECT h.g,
                   CAST(SUM(h.cnt_g) AS BIGINT) AS n_g,
                   CAST(SUM(h.cnt_g * (2 * r.cb + r.cnt + 1)) AS BIGINT) AS r2_g,
                   CAST(t.t3 AS BIGINT) AS t3_minus_t_pooled
            FROM hist h JOIN ranked r USING (cents), ties t
            GROUP BY h.g, t.t3
        """, SF0001)

    def test_mood_scale_inputs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.mood_scale_inputs(
            _read(spark, SF0001, "orders"), _read(spark, SF0001, "customer")
        )
        assert_matches_oracle(df, """
            WITH seg AS (
              SELECT c_custkey, c_mktsegment FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            ),
            tagged AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     c_mktsegment AS segment
              FROM orders JOIN seg ON o_custkey = c_custkey
            ),
            hist AS (
              SELECT segment, cents, COUNT(*) AS cnt_g
              FROM tagged GROUP BY 1, 2
            ),
            pooled AS (SELECT cents, SUM(cnt_g) AS cnt FROM hist GROUP BY 1),
            ranked AS (
              SELECT cents, cnt,
                     COALESCE(SUM(cnt) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cb,
                     SUM(cnt) OVER () AS n
              FROM pooled
            )
            SELECT h.segment,
                   CAST(SUM(h.cnt_g) AS BIGINT) AS n_g,
                   CAST(SUM(h.cnt_g * (2 * r.cb + r.cnt - r.n)
                            * (2 * r.cb + r.cnt - r.n)) AS BIGINT) AS m4_g
            FROM hist h JOIN ranked r USING (cents)
            GROUP BY h.segment
        """, SF0001)

    def test_cochran_q_inputs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.cochran_q_inputs(_read(spark, SF0001, "events"))
        assert_matches_oracle(df, """
            WITH per_user AS (
              SELECT user_id,
                     MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f0,
                     MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f1,
                     MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS f2
              FROM events
              WHERE event_type IN ('view', 'click', 'purchase')
              GROUP BY 1
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(3 AS BIGINT) AS k_treatments,
                   CAST(COALESCE(SUM(f0 + f1 + f2), 0) AS BIGINT) AS sum_r,
                   CAST(COALESCE(SUM((f0 + f1 + f2) * (f0 + f1 + f2)), 0)
                        AS BIGINT) AS sum_r2,
                   CAST(COALESCE(SUM(f0), 0) * COALESCE(SUM(f0), 0)
                        + COALESCE(SUM(f1), 0) * COALESCE(SUM(f1), 0)
                        + COALESCE(SUM(f2), 0) * COALESCE(SUM(f2), 0)
                        AS BIGINT) AS sum_c2
            FROM per_user
        """, SF0001)

    def test_token_mix_allocation(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sampling

        df = sampling.token_mix_allocation(_read(spark, SF0001, "documents"))
        # exact-apportionment invariant: allocations sum to the budget
        assert sum(r["alloc"] for r in df.collect()) == 1_000_000
        assert_matches_oracle(df, """
            WITH per AS (
              SELECT lang AS domain, CAST(SUM(n_chars) AS BIGINT) AS weight
              FROM documents GROUP BY 1
            ),
            tot AS (SELECT SUM(weight) AS total_w FROM per),
            scaled AS (
              SELECT domain, weight,
                     (1000000 * weight) // total_w AS quota,
                     (1000000 * weight) % total_w AS rem_num
              FROM per, tot
            ),
            ranked AS (
              SELECT *,
                     ROW_NUMBER() OVER (ORDER BY rem_num DESC, domain ASC)
                       AS rem_rank,
                     1000000 - SUM(quota) OVER () AS leftover
              FROM scaled
            )
            SELECT domain, CAST(weight AS BIGINT) AS weight,
                   CAST(quota + CASE WHEN rem_rank <= leftover THEN 1
                                ELSE 0 END AS BIGINT) AS alloc
            FROM ranked
        """, SF0001)

    def test_kcore_census(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import graphalg
        from big_data_graph_analysis_with_spark_spark.sources import tpch_graph
        from big_data_graph_analysis_with_spark_spark.sources.tpch_graph import (
            graph_sql,
        )

        og, _ = tpch_graph.derive_graphs(spark, SF0001)
        df = graphalg.kcore_census(og, k=3, rounds=8)
        ctes = """
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM og_edges WHERE src <> dst
),
e_0 AS MATERIALIZED (SELECT a, b FROM und)"""
        for r in range(1, 9):
            ctes += f""",
deg_{r} AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT a AS id FROM e_{r - 1}
    UNION ALL SELECT b FROM e_{r - 1}
  ) GROUP BY id
),
keep_{r} AS (SELECT id FROM deg_{r} WHERE deg >= 3),
e_{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e_{r - 1} e
  JOIN keep_{r} ka ON ka.id = e.a
  JOIN keep_{r} kb ON kb.id = e.b
)"""
        body = f""", {ctes.strip()}
SELECT CAST((SELECT COUNT(*) FROM
              (SELECT a AS id FROM e_8 UNION SELECT b FROM e_8)) AS BIGINT)
         AS n_nodes,
       CAST((SELECT COUNT(*) FROM e_8) AS BIGINT) AS n_edges
"""
        assert_matches_oracle(df, graph_sql(body), SF0001)


class TestRound10CandidatesC:
    """Round-10 third wave — same freeze discipline. All final oracle
    columns BIGINT."""

    _GRAPH = None

    def _graph(self, spark):
        from big_data_graph_analysis_with_spark_spark.sources import tpch_graph

        if TestRound10CandidatesC._GRAPH is None:
            TestRound10CandidatesC._GRAPH = tpch_graph.derive_graphs(
                spark, SF0001
            )[0]
        return TestRound10CandidatesC._GRAPH

    _DEG_CTES = """
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM og_edges WHERE src <> dst
),
deg AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT a AS id FROM und UNION ALL SELECT b FROM und
  ) GROUP BY id
),
annotated AS (
  SELECT u.a, u.b, x.deg AS da, y.deg AS db
  FROM und u JOIN deg x ON x.id = u.a JOIN deg y ON y.id = u.b
)"""

    def test_degree_assortativity_inputs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import graphalg
        from big_data_graph_analysis_with_spark_spark.sources.tpch_graph import (
            graph_sql,
        )

        df = graphalg.degree_assortativity_inputs(self._graph(spark))
        assert_matches_oracle(df, graph_sql(f""", {self._DEG_CTES.strip()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(COALESCE(SUM(da + db), 0) AS BIGINT) AS s_sum,
       CAST(COALESCE(SUM(da * db), 0) AS BIGINT) AS s_prod,
       CAST(COALESCE(SUM(da * da + db * db), 0) AS BIGINT) AS s_sq
FROM annotated
"""), SF0001)

    def test_rich_club_census(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import graphalg
        from big_data_graph_analysis_with_spark_spark.sources.tpch_graph import (
            graph_sql,
        )

        df = graphalg.rich_club_census(self._graph(spark))
        assert_matches_oracle(df, graph_sql(f""", {self._DEG_CTES.strip()},
node_hist AS (
  SELECT length(bin(deg)) AS degree_bits, COUNT(*) AS n_nodes
  FROM deg GROUP BY 1
),
edge_hist AS (
  SELECT length(bin(LEAST(da, db))) AS degree_bits, COUNT(*) AS n_edges
  FROM annotated GROUP BY 1
),
merged AS (
  SELECT COALESCE(n.degree_bits, e.degree_bits) AS degree_bits,
         COALESCE(n.n_nodes, 0) AS n_nodes,
         COALESCE(e.n_edges, 0) AS n_edges
  FROM node_hist n FULL OUTER JOIN edge_hist e USING (degree_bits)
)
SELECT CAST(degree_bits AS BIGINT) AS degree_bits,
       CAST(SUM(n_nodes) OVER (ORDER BY degree_bits DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_nodes_ge,
       CAST(SUM(n_edges) OVER (ORDER BY degree_bits DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_edges_ge
FROM merged
"""), SF0001)

    def test_brunner_munzel_inputs(self, spark):
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
        assert_matches_oracle(df, """
            WITH seg AS (
              SELECT c_custkey, c_mktsegment FROM customer
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            ),
            tagged AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     c_mktsegment AS segment
              FROM orders JOIN seg ON o_custkey = c_custkey
            ),
            hist AS (
              SELECT cents,
                     SUM(CASE WHEN segment = 'BUILDING' THEN 1 ELSE 0 END)
                       AS cnt_a,
                     SUM(CASE WHEN segment = 'MACHINERY' THEN 1 ELSE 0 END)
                       AS cnt_b
              FROM tagged GROUP BY 1
            ),
            cum AS (
              SELECT cents, cnt_a, cnt_b,
                     COALESCE(SUM(cnt_a) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cuma_lt,
                     COALESCE(SUM(cnt_b) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumb_lt
              FROM hist
            )
            SELECT 'BUILDING' AS segment,
                   CAST(SUM(cnt_a) AS BIGINT) AS n_g,
                   CAST(COALESCE(SUM(cnt_a * (2 * cumb_lt + cnt_b)), 0)
                        AS BIGINT) AS sum_p2,
                   CAST(COALESCE(SUM(cnt_a * (2 * cumb_lt + cnt_b)
                                     * (2 * cumb_lt + cnt_b)), 0)
                        AS BIGINT) AS sum_p2_sq
            FROM cum
            UNION ALL
            SELECT 'MACHINERY' AS segment,
                   CAST(SUM(cnt_b) AS BIGINT) AS n_g,
                   CAST(COALESCE(SUM(cnt_b * (2 * cuma_lt + cnt_a)), 0)
                        AS BIGINT) AS sum_p2,
                   CAST(COALESCE(SUM(cnt_b * (2 * cuma_lt + cnt_a)
                                     * (2 * cuma_lt + cnt_a)), 0)
                        AS BIGINT) AS sum_p2_sq
            FROM cum
        """, SF0001)


class TestRound10CandidatesD:
    """Round-10 fourth wave — same freeze discipline. All final oracle
    columns BIGINT."""

    def test_count_min_audit(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sketches

        df = sketches.count_min_audit(_read(spark, SF0001, "events"))
        rows = df.collect()
        # CMS deterministic guarantee: never undercounts
        assert all(r["cms_n"] >= r["exact_n"] for r in rows)
        h = ("(('0x' || substr(md5(CAST((CAST(r AS VARCHAR) || ':' || "
             "CAST(user_id AS VARCHAR)) AS VARCHAR)), 1, 14))::BIGINT) % 256")
        assert_matches_oracle(df, f"""
            WITH hist AS (
              SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
            ),
            rows_r AS (SELECT UNNEST(range(4)) AS r),
            cells AS (
              SELECT r, {h} AS b, SUM(n) AS cell
              FROM hist, rows_r GROUP BY 1, 2
            ),
            tracked AS (
              SELECT user_id, n FROM hist
              ORDER BY n DESC, user_id ASC LIMIT 8
            ),
            probes AS (
              SELECT t.user_id, t.n, r.r, {h.replace("user_id", "t.user_id").replace("AS VARCHAR) || ':'", "AS VARCHAR) || ':'")} AS b
              FROM tracked t, rows_r r
            )
            SELECT p.user_id,
                   CAST(p.n AS BIGINT) AS exact_n,
                   CAST(MIN(c.cell) AS BIGINT) AS cms_n
            FROM probes p JOIN cells c ON c.r = p.r AND c.b = p.b
            GROUP BY 1, 2
        """, SF0001)

    def test_ks_one_sample_uniform(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.ks_one_sample_uniform(_read(spark, SF0001, "events"))
        assert_matches_oracle(df, """
            WITH hist AS (
              SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
                     COUNT(*) AS cnt
              FROM events WHERE event_type = 'purchase' GROUP BY 1
            ),
            cum AS (
              SELECT cents, cnt,
                     SUM(cnt) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum,
                     SUM(cnt) OVER () AS n,
                     MIN(cents) OVER () AS lo,
                     MAX(cents) OVER () AS hi
              FROM hist
            ),
            scored AS (
              -- max of the post-jump D+ and pre-jump D- candidates; the
              -- D- term also covers support gaps (sup lands just below
              -- the next observed value)
              SELECT cents, n, lo, hi - lo + 1 AS span,
                     GREATEST(
                       ABS(cum * (hi - lo + 1) - (cents - lo + 1) * n),
                       ABS((cum - cnt) * (hi - lo + 1) - (cents - lo) * n)
                     ) AS dev
              FROM cum
            )
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(lo AS BIGINT) AS lo_cents,
                   CAST(span AS BIGINT) AS span,
                   CAST(dev AS BIGINT) AS d_num,
                   CAST(cents AS BIGINT) AS d_arg_cents
            FROM scored ORDER BY dev DESC, cents ASC LIMIT 1
        """, SF0001)

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


class TestRound11Candidates:
    """Round-11 wave — registry stays frozen at 312 (r10 verdict task
    1), so these land as candidates: module operators + DuckDB twins
    pinned here with the driver's own comparison, promotable in r12.
    All final oracle columns BIGINT."""

    def test_page_trend_inputs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.page_trend_inputs(_read(spark, SF0001, "orders"))
        rows = df.collect()
        # Friedman rank identity on the doubled ranks, k = 5 levels
        k = len(rows)
        assert sum(r["r2_sum"] for r in rows) == rows[0]["n_blocks"] * k * (k + 1)
        assert all(r["l2_term"] == r["priority"] * r["r2_sum"] for r in rows)
        assert_matches_oracle(df, """
            WITH cells AS (
              SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                     CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS v
              FROM orders GROUP BY 1, 2
            ),
            spine AS (
              SELECT m.ym, s.prio
              FROM (SELECT DISTINCT ym FROM cells) m,
                   (SELECT DISTINCT prio FROM cells) s
            ),
            full_cells AS (
              SELECT spine.ym, spine.prio, COALESCE(cells.v, 0) AS v
              FROM spine LEFT JOIN cells
                ON spine.ym = cells.ym AND spine.prio = cells.prio
            ),
            h AS (
              SELECT ym, v, COUNT(*) AS cnt FROM full_cells GROUP BY 1, 2
            ),
            r2 AS (
              SELECT ym, v,
                     2 * COALESCE(SUM(cnt) OVER (
                       PARTITION BY ym ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) + cnt + 1 AS r2
              FROM h
            ),
            sums AS (
              SELECT f.prio AS priority,
                     CAST(COUNT(*) AS BIGINT) AS n_blocks,
                     CAST(SUM(r2.r2) AS BIGINT) AS r2_sum
              FROM full_cells f JOIN r2 ON f.ym = r2.ym AND f.v = r2.v
              GROUP BY 1
            )
            SELECT priority, n_blocks, r2_sum,
                   CAST(priority * r2_sum AS BIGINT) AS l2_term
            FROM sums
        """, SF0001)

    def test_dominance_census(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import hypotests

        df = hypotests.dominance_census(
            _read(spark, SF0001, "orders"), _read(spark, SF0001, "customer")
        )
        row = df.collect()[0]
        assert (
            row["a_dominated"] + row["b_dominated"] + row["cdf_ties"]
            == row["n_values"]
        )
        assert_matches_oracle(df, """
            WITH tagged AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                     c_mktsegment AS segment
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            ),
            hist AS (
              SELECT cents,
                     SUM(CASE WHEN segment = 'BUILDING' THEN 1 ELSE 0
                         END) AS cnt_a,
                     SUM(CASE WHEN segment = 'MACHINERY' THEN 1 ELSE 0
                         END) AS cnt_b
              FROM tagged GROUP BY 1
            ),
            cum AS (
              SELECT cents,
                     SUM(cnt_a) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_a,
                     SUM(cnt_b) OVER (ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_b,
                     SUM(cnt_a) OVER () AS n_a,
                     SUM(cnt_b) OVER () AS n_b
              FROM hist
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
                   CAST(MAX(n_a) AS BIGINT) AS n_a,
                   CAST(MAX(n_b) AS BIGINT) AS n_b,
                   CAST(COALESCE(SUM(CASE WHEN CAST(cum_a AS HUGEINT) * n_b
                       > CAST(cum_b AS HUGEINT) * n_a THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS a_dominated,
                   CAST(COALESCE(SUM(CASE WHEN CAST(cum_a AS HUGEINT) * n_b
                       < CAST(cum_b AS HUGEINT) * n_a THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS b_dominated,
                   CAST(COALESCE(SUM(CASE WHEN CAST(cum_a AS HUGEINT) * n_b
                       = CAST(cum_b AS HUGEINT) * n_a THEN 1 ELSE 0 END), 0)
                       AS BIGINT) AS cdf_ties
            FROM cum
        """, SF0001)

    def test_bloom_filter_audit(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import sketches

        df = sketches.bloom_filter_audit(_read(spark, SF0001, "events"))
        rows = df.collect()
        # no-false-negative guarantee: every member probe hits
        assert all(r["bloom_hit"] == 1 for r in rows if r["is_member"] == 1)
        assert len(rows) == 16
        h = ("(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || "
             "CAST({x} AS VARCHAR)), 1, 14))::BIGINT) % 512")
        assert_matches_oracle(df, f"""
            WITH ids AS (SELECT DISTINCT user_id FROM events),
            rws AS (SELECT UNNEST(range(3)) AS r),
            bits AS (
              SELECT DISTINCT r, {h.format(x="user_id")} AS b
              FROM ids, rws
            ),
            heavy AS (
              SELECT user_id AS probe_id, 1 AS is_member
              FROM events GROUP BY user_id
              ORDER BY COUNT(*) DESC, user_id ASC LIMIT 8
            ),
            outsiders AS (
              SELECT mx + x AS probe_id, 0 AS is_member
              FROM (SELECT COALESCE(MAX(user_id), 0) AS mx FROM ids),
                   (SELECT UNNEST(range(1, 9)) AS x)
            ),
            probes AS (
              SELECT * FROM heavy UNION ALL SELECT * FROM outsiders
            ),
            pb AS (
              SELECT probe_id, is_member, r,
                     {h.format(x="probe_id")} AS b
              FROM probes, rws
            )
            SELECT pb.probe_id,
                   CAST(MAX(pb.is_member) AS BIGINT) AS is_member,
                   CAST(CASE WHEN COUNT(bits.b) = 3 THEN 1 ELSE 0
                        END AS BIGINT) AS bloom_hit
            FROM pb LEFT JOIN bits ON bits.r = pb.r AND bits.b = pb.b
            GROUP BY 1
        """, SF0001)

    def test_winnow_overlap_pairs(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import dedup

        df = dedup.winnow_overlap_pairs(_read(spark, SF0001, "documents"))
        assert_matches_oracle(df, """
            WITH d AS (
              SELECT doc_id, text FROM documents
              WHERE text IS NOT NULL AND length(text) > 0
            ),
            pos AS (
              SELECT doc_id, text,
                     GREATEST(length(text) - 7, 1) AS n_grams,
                     UNNEST(generate_series(1,
                       GREATEST(length(text) - 7, 1))) AS i
              FROM d
            ),
            grams AS (
              SELECT doc_id, i, n_grams,
                     ('0x' || substr(md5(substr(text, CAST(i AS INT), 8)),
                       1, 14))::BIGINT AS h
              FROM pos
            ),
            wins AS (
              SELECT doc_id, i, n_grams,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
              FROM grams
            ),
            fps AS (
              SELECT DISTINCT doc_id, wmin AS fp
              FROM wins WHERE i <= GREATEST(n_grams - 3, 1)
            ),
            keep AS (
              SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 64
            ),
            kfps AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM kfps a JOIN kfps b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING COUNT(*) >= 2
        """, SF0001)

    def test_winnow_guarantee_planted_overlap(self, spark):
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

    def test_revenue_cube(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import olap

        df = olap.revenue_cube(_read(spark, SF0001, "orders"))
        rows = df.collect()
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
        assert_matches_oracle(df, """
            SELECT CAST(GROUPING(year, priority) AS BIGINT) AS gid,
                   CAST(COALESCE(year, -1) AS BIGINT) AS year,
                   CAST(COALESCE(priority, -1) AS BIGINT) AS priority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS revenue_cents
            FROM (
              SELECT year(o_orderdate) AS year,
                     CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                       AS priority,
                     CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            )
            GROUP BY CUBE (year, priority)
        """, SF0001)

    def test_source_copy_matrix(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import dedup

        df = dedup.source_copy_matrix(_read(spark, SF0001, "documents"))
        assert_matches_oracle(df, """
            WITH d AS (
              SELECT doc_id, text, source FROM documents
              WHERE text IS NOT NULL AND length(text) > 0
            ),
            pos AS (
              SELECT doc_id, text,
                     GREATEST(length(text) - 7, 1) AS n_grams,
                     UNNEST(generate_series(1,
                       GREATEST(length(text) - 7, 1))) AS i
              FROM d
            ),
            grams AS (
              SELECT doc_id, i, n_grams,
                     ('0x' || substr(md5(substr(text, CAST(i AS INT), 8)),
                       1, 14))::BIGINT AS h
              FROM pos
            ),
            wins AS (
              SELECT doc_id, i, n_grams,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
              FROM grams
            ),
            fps AS (
              SELECT DISTINCT doc_id, wmin AS fp
              FROM wins WHERE i <= GREATEST(n_grams - 3, 1)
            ),
            keep AS (
              SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 64
            ),
            kfps AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp)),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     COUNT(*) AS n_shared
              FROM kfps a JOIN kfps b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            tagged AS (
              SELECT LEAST(sa.source, sb.source) AS source_a,
                     GREATEST(sa.source, sb.source) AS source_b,
                     p.n_shared
              FROM pairs p
              JOIN d sa ON sa.doc_id = p.doc_a
              JOIN d sb ON sb.doc_id = p.doc_b
              WHERE sa.source <> sb.source
            )
            SELECT source_a, source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(n_shared) AS BIGINT) AS n_shared_fps
            FROM tagged GROUP BY 1, 2
        """, SF0001)
