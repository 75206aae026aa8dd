"""Round-9 operators: salted-join demo + graph quantile-sketch audit."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from big_data_graph_analysis_with_spark_spark.operators import olap, sketches
from big_data_graph_analysis_with_spark_spark.sources import tpch_graph

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_skewed(spark):
    # deliberately skewed: type 'hot' carries 12 of 16 rows
    rows = [("hot", float(v)) for v in [1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 30]]
    rows += [("cold", 10.0), ("cold", 20.0), ("warm", 5.0), ("warm", 5.0)]
    return spark.createDataFrame(rows, "event_type string, value double")


class TestSkewSaltedEnrich:
    def test_counts_match_unsalted_semantics(self, events_skewed):
        got = {
            r["event_type"]: (r["n_events"], r["n_above_mean"])
            for r in olap.skew_salted_enrich(events_skewed).collect()
        }
        # hot: mean = 51/12 = 4.25 -> only 30 above; cold: mean 15 -> 20
        # above; warm: mean 5 -> none strictly above
        assert got == {"hot": (12, 1), "cold": (2, 1), "warm": (2, 0)}

    def test_salt_invariance(self, events_skewed):
        one = sorted(
            map(tuple, olap.skew_salted_enrich(events_skewed, salt=1).collect())
        )
        many = sorted(
            map(tuple, olap.skew_salted_enrich(events_skewed, salt=8).collect())
        )
        assert one == many

    def test_real_events_nonempty_and_consistent(self, spark):
        ev = spark.read.parquet(f"{SF0001}/events.parquet")
        out = olap.skew_salted_enrich(ev)
        rows = out.collect()
        assert rows
        totals = {r["event_type"]: r["n_events"] for r in rows}
        expect = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
        }
        assert totals == expect
        for r in rows:
            assert 0 <= r["n_above_mean"] <= r["n_events"]


class TestGraphDegreeQuantileAudit:
    def test_matches_brute_force_median(self, spark):
        og, pg = tpch_graph.derive_graphs(spark, SF0001)
        out = {
            r["graph"]: r
            for r in sketches.graph_degree_quantile_audit(
                og.edges, pg.edges
            ).collect()
        }
        assert set(out) == {"og", "pg"}
        for tag, edges in (("og", og.edges), ("pg", pg.edges)):
            degs = sorted(
                r["deg"]
                for r in edges.groupBy("src")
                .agg(F.count("*").alias("deg"))
                .collect()
            )
            n = len(degs)
            assert out[tag]["n_sources"] == n
            # shared rank convention: value at 0-indexed rank (n-1)*1 div 2
            assert out[tag]["exact_p50"] == degs[(n - 1) * 1 // 2]
            # GK at accuracy 10000 has <=0.01% rank error; the [p40, p60]
            # window is +-10% of ranks, so the verdict must hold
            assert out[tag]["sketch_ok"] is True


class TestMaybeBroadcast:
    def test_small_frame_gets_hint(self, spark):
        from big_data_graph_analysis_with_spark_spark.functions.joins import (
            maybe_broadcast,
        )

        df = maybe_broadcast(spark.range(10))
        assert "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    def test_huge_frame_left_to_aqe(self, spark):
        from big_data_graph_analysis_with_spark_spark.functions.joins import (
            maybe_broadcast,
        )

        # range stats = 8 bytes x 1e9 rows ~ 8 GB estimate, no job runs;
        # the gate must NOT hint it (a forced hint here would OOM a real
        # executor — the exact failure mode of the round-8 finding)
        df = maybe_broadcast(spark.range(1_000_000_000))
        assert (
            "ResolvedHint"
            not in df._jdf.queryExecution().analyzed().toString()
        )

    def test_gated_join_still_broadcasts_small_side(self, spark):
        from big_data_graph_analysis_with_spark_spark.functions.joins import (
            maybe_broadcast,
        )

        fact = spark.range(10_000).withColumnRenamed("id", "k")
        dim = spark.range(50).withColumnRenamed("id", "k")
        joined = fact.join(maybe_broadcast(dim), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert joined.count() == 50


class TestWeightedPriceMedian:
    def test_matches_unit_expansion_brute_force(self, spark):
        rows = [
            # flag A: units expand to [100]*1 + [200]*3 + [300]*2 ->
            # 6 units, 0-indexed target (6-1)//2 = 2 -> value 200
            ("A", 1.00, 1.0), ("A", 2.00, 3.0), ("A", 3.00, 2.0),
            # flag B: [500]*4 + [900]*1 -> target (5-1)//2 = 2 -> 500
            ("B", 5.00, 4.0), ("B", 9.00, 1.0),
        ]
        li = spark.createDataFrame(
            rows,
            "l_returnflag string, l_extendedprice double, l_quantity double",
        )
        from big_data_graph_analysis_with_spark_spark.operators import olap

        got = {
            r["returnflag"]: (r["total_units"], r["wmedian_price_cents"])
            for r in olap.weighted_price_median(li).collect()
        }
        assert got == {"A": (6, 200), "B": (5, 500)}

    def test_real_lineitem_median_is_a_present_price(self, spark):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        from big_data_graph_analysis_with_spark_spark.operators import olap

        out = olap.weighted_price_median(li).collect()
        flags = {r["l_returnflag"] for r in li.select("l_returnflag").distinct().collect()}
        assert {r["returnflag"] for r in out} == flags
        cents = {
            (r["l_returnflag"], int(round(r["l_extendedprice"] * 100)))
            for r in li.select("l_returnflag", "l_extendedprice").collect()
        }
        for r in out:
            assert (r["returnflag"], r["wmedian_price_cents"]) in cents


def test_no_forced_broadcast_on_sf_proportional_tables():
    """Regression lint for the round-8 scale finding: customer/supplier/
    part scale linearly with SF, so a bare F.broadcast() on them is a
    latent executor OOM (an explicit hint overrides AQE's size check).
    They must route through functions/joins.maybe_broadcast. Bare hints
    stay legal for nation/region and bounded frames."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    pkg = root / "big_data_graph_analysis_with_spark_spark"
    offenders = []
    for path in list(pkg.rglob("*.py")) + [root / "__spark_entry__.py"]:
        src = path.read_text()
        # collapse whitespace so multi-line F.broadcast(\n  customer...
        # forms are caught too
        flat = re.sub(r"\s+", " ", src)
        for table in ("customer", "supplier", "part"):
            if re.search(rf"F\.broadcast\( ?{table}\b", flat):
                offenders.append((str(path.relative_to(root)), table))
    assert not offenders, (
        f"bare F.broadcast on sf-proportional tables: {offenders} — "
        "use functions/joins.maybe_broadcast"
    )


class TestSimrankBucketModWide:
    def test_wide_is_strict_subset_with_identical_scores(self, spark):
        from big_data_graph_analysis_with_spark_spark.operators import simrank

        og, pg = tpch_graph.derive_graphs(spark, SF0001)
        base = {
            (r["pg_id"], r["og_id"]): r["score"]
            for r in simrank.simrank(
                pg, og, rounds=1, attr_bucket=True
            ).collect()
        }
        wide = {
            (r["pg_id"], r["og_id"]): r["score"]
            for r in simrank.simrank(
                pg, og, rounds=1, attr_bucket=True, bucket_mod=8
            ).collect()
        }
        # the residue restriction drops whole child pairs, never
        # individual contributions: subset rows, identical scores
        assert set(wide) <= set(base)
        assert all(base[k] == v for k, v in wide.items())
        # id-equal pairs (the true matches in the MitM workload) share
        # a residue class by construction and must all survive
        id_equal = {k for k in base if k[0] == k[1]}
        assert id_equal <= set(wide)
