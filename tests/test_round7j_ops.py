"""Round-7 tenth batch: stack/UNPIVOT metrics, set-signature rollup,
token-class census, and activity span histogram. Known-value fixtures —
SQL-oracle parity lives in test_oracle_parity via the entry registry."""

from __future__ import annotations

import datetime

from big_data_graph_analysis_with_spark_spark.operators import (
    corpusstats,
    olap,
    sessions,
)


def _ts(y, m, d):
    return datetime.datetime(y, m, d)


# --------------------------------------------------------- part metrics long


def test_part_metrics_long_stack(spark):
    part = spark.createDataFrame(
        [(1, 5, 1.0), (2, 3, 2.5)],
        "p_partkey LONG, p_size INT, p_retailprice DOUBLE",
    )
    got = {
        r["metric"]: (r["n_parts"], r["total"], r["min_v"], r["max_v"])
        for r in olap.part_metrics_long(part).collect()
    }
    assert got == {
        "size": (2, 8, 3, 5),
        "retail_cents": (2, 350, 100, 250),
    }


# --------------------------------------------------- nation segment signature


def test_nation_segment_signature_sorted(spark):
    customer = spark.createDataFrame(
        [(1, 1, "HOUSE"), (2, 1, "AUTO"), (3, 1, "AUTO"), (4, 2, "AUTO")],
        "c_custkey LONG, c_nationkey INT, c_mktsegment STRING",
    )
    nation = spark.createDataFrame(
        [(1, "FR"), (2, "DE")], "n_nationkey INT, n_name STRING"
    )
    got = {
        r["nation"]: (r["n_segments"], r["signature"])
        for r in olap.nation_segment_signature(customer, nation).collect()
    }
    assert got == {"FR": (2, "AUTO,HOUSE"), "DE": (1, "AUTO")}


# ----------------------------------------------------------- token class mix


def test_token_class_mix_classes(spark):
    docs = spark.createDataFrame(
        [(1, "web", "abc 123 a1 %!")],
        "doc_id LONG, source STRING, text STRING",
    )
    row = corpusstats.token_class_mix(docs).collect()[0]
    assert (row["n_digit"], row["n_alpha"], row["n_mixed"], row["n_other"]) == (
        1,
        1,
        1,
        1,
    )


# -------------------------------------------------------- activity span hist


def test_activity_span_hist_spans(spark):
    events = spark.createDataFrame(
        [
            (1, 1, _ts(1970, 1, 1)),
            (2, 1, _ts(1970, 1, 8)),  # span 7
            (3, 2, _ts(1970, 1, 5)),  # same-day → span 0
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP",
    )
    got = {
        r["span_days"]: r["n_users"]
        for r in sessions.activity_span_hist(events).collect()
    }
    assert got == {7: 1, 0: 1}
