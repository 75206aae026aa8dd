"""Unit tests for SimRank / matching / stats on a hand-computed fixture.

Fixture graph (both og and pg): 0→1, 0→2, 1→3, 2→3 (diamond). pg node 2
is modified (props differs) → identity pairs are (0,0),(1,1),(3,3).

Hand-computed Jacobi round 1 (C=1, round₂):
  from (0,0): children {1,2}×{1,2} → (1,1),(1,2),(2,1),(2,2) contrib 1
  from (1,1): (3,3) contrib 1;  from (3,3): no children
  in-degrees: 1↦1, 2↦1, 3↦2  ⇒ (1,2)=(2,1)=(2,2)=1.0, (3,3)=0.25
  identity pairs stay 1.0 (not recomputed) ⇒
  sr₁ = {(0,0):1,(1,1):1,(3,3):1,(1,2):1,(2,1):1,(2,2):1}
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.model import EDGE_SCHEMA, VERTEX_SCHEMA, NetGraph
from big_data_graph_analysis_with_spark_spark.operators import matching, simrank, stats
from big_data_graph_analysis_with_spark_spark.sources.sinks import stats_to_yaml, write_yaml_stats


def v(id, children=1, props=2, current_depth=1, prop_value_range=10,
      max_depth=3, max_branching_factor=4, max_properties=5,
      stored_value=0.5, valuable_data=False):
    return (id, children, props, current_depth, prop_value_range, max_depth,
            max_branching_factor, max_properties, stored_value, valuable_data)


def e(src, dst):
    return (src, dst, 0, src, dst, None, 0.1)


@pytest.fixture(scope="module")
def diamond(spark):
    og_v = [v(0), v(1, children=2), v(2, children=3, valuable_data=True),
            v(3, valuable_data=True)]
    pg_v = [v(0), v(1, children=2), v(2, children=3, props=99, valuable_data=True),
            v(3, valuable_data=True)]
    edges = [e(0, 1), e(0, 2), e(1, 3), e(2, 3)]
    og = NetGraph(spark.createDataFrame(og_v, VERTEX_SCHEMA),
                  spark.createDataFrame(edges, EDGE_SCHEMA))
    pg = NetGraph(spark.createDataFrame(pg_v, VERTEX_SCHEMA),
                  spark.createDataFrame(edges, EDGE_SCHEMA))
    return og, pg


def scores_dict(df):
    return {(r["pg_id"], r["og_id"]): r["score"] for r in df.collect()}


def test_init_scores_identity_only(spark, diamond):
    og, pg = diamond
    got = scores_dict(simrank.init_scores(pg, og))
    assert got == {(0, 0): 1.0, (1, 1): 1.0, (3, 3): 1.0}


def test_simrank_round1_hand_computed(spark, diamond):
    og, pg = diamond
    got = scores_dict(simrank.simrank(pg, og, rounds=1))
    assert got == {
        (0, 0): 1.0, (1, 1): 1.0, (3, 3): 1.0,
        (1, 2): 1.0, (2, 1): 1.0, (2, 2): 1.0,
    }


def test_simrank_round_with_match_pruning(spark, diamond):
    og, pg = diamond
    r1 = simrank.simrank(pg, og, rounds=1)
    matches = spark.createDataFrame(
        [(1, 1, 1.0)], "pg_id LONG, og_id LONG, score DOUBLE"
    )
    got = scores_dict(simrank.simrank_round(r1, pg, og, matches=matches))
    # pairs with pg or og side = 1 are pruned from recomputation;
    # identity pairs always kept. Round-2 propagation of sr₁:
    #   (3,3) gets contrib from (1,1)+(2,2)+(1,2)+(2,1) = 4 → 4/(2·2)=1.0
    # but pairs into pg/og node 1 are pruned; (3,3) is identity → 1.0.
    # (1,2),(2,1),(2,2) receive nothing (parents (0,*) only propagate to
    # children pairs; (0,0)→(1,1),(1,2),(2,1),(2,2); prune removes *,1 and 1,*)
    assert got[(3, 3)] == 1.0
    assert (1, 2) not in got  # pg side 1 pruned
    assert (2, 1) not in got  # og side 1 pruned
    assert got[(2, 2)] == 1.0  # recomputed from (0,0) contrib: 1/(1·1)


def test_best_match_prefers_attribute_ties(spark, diamond):
    og, pg = diamond
    # pg 2 (children=3, props=99) vs og 1 (children=2) and og 2
    # (children=3, props=2): og 2 matches on children+max_* (3 attrs),
    # og 1 only on max_* (2 attrs) → og 2 wins.
    best = scores_dict(matching.best_match(simrank.simrank(pg, og, 1), pg, og))
    assert best == {(0, 0): 1.0, (1, 1): 1.0, (2, 2): 1.0, (3, 3): 1.0}


def test_merge_matches_max_merge(spark):
    cur = spark.createDataFrame(
        [(2, 5, 0.5), (7, 7, 0.9)], "pg_id LONG, og_id LONG, score DOUBLE"
    )
    new = spark.createDataFrame(
        [(2, 2, 1.0), (7, 8, 0.4), (9, 9, 0.3)],
        "pg_id LONG, og_id LONG, score DOUBLE",
    )
    got = scores_dict(matching.merge_matches(cur, new))
    assert got == {(2, 2): 1.0, (7, 7): 0.9, (9, 9): 0.3}


def test_merge_matches_tie_prefers_smaller_og_id(spark):
    cur = spark.createDataFrame([(1, 9, 0.5)], "pg_id LONG, og_id LONG, score DOUBLE")
    new = spark.createDataFrame([(1, 3, 0.5)], "pg_id LONG, og_id LONG, score DOUBLE")
    assert scores_dict(matching.merge_matches(cur, new)) == {(1, 3): 0.5}


def test_classification_and_uncovered(spark, diamond):
    og, pg = diamond
    matches = spark.createDataFrame(
        [(0, 0, 1.0), (2, 3, 0.8), (3, 3, 0.05)],
        "pg_id LONG, og_id LONG, score DOUBLE",
    )
    cc = matching.match_class_counts(matches, 0.1).collect()[0]
    # above threshold: (0,0) TP, (2,3) FP; (3,3) below threshold
    assert cc["n_true_positive"] == 1 and cc["n_false_positive"] == 1
    # valuable og nodes: 2, 3; matched PG ids: {0, 2, 3} (the reference
    # diffs against accumulator keys = pg ids, Main.scala:164-167) → {}
    unc = [r["id"] for r in matching.uncovered_valuable(matches, og).collect()]
    assert unc == []
    # false-positive divergence case: pg 2 matched to og 3 → og 3 counts
    # as covered via pg-key 3? no — only pg ids {2}: uncovered = {3}
    fp_only = spark.createDataFrame(
        [(2, 3, 0.8)], "pg_id LONG, og_id LONG, score DOUBLE"
    )
    unc2 = sorted(
        r["id"] for r in matching.uncovered_valuable(fp_only, og).collect()
    )
    assert unc2 == [3]
    vm = scores_dict(matching.valuable_matches(matches, og))
    assert set(vm) == {(2, 3), (3, 3)}


def test_walk_classification(spark, diamond):
    og, pg = diamond
    matches = spark.createDataFrame(
        [(0, 0, 1.0), (2, 3, 0.8)], "pg_id LONG, og_id LONG, score DOUBLE"
    )
    classified = matching.classify_matches(matches, 0.1)
    walks = spark.createDataFrame(
        [
            (0, 0, [0, 1]),      # visits TP 0, no FP → successful
            (0, 1, [0, 2, 3]),   # visits TP 0 and FP 2 → unsuccessful
            (0, 2, [1, 0]),      # same visited set as walk 0 → deduped
            (1, 3, [1, 3]),      # visits nothing matched → neither
        ],
        "partition_key LONG, walk_id LONG, visited ARRAY<LONG>",
    )
    counts = {
        r["partition_key"]: (r["n_successful"], r["n_unsuccessful"])
        for r in stats.walk_counts(stats.classify_walks(walks, classified)).collect()
    }
    assert counts == {0: (1, 1), 1: (0, 0)}


def test_assemble_stats_and_yaml(spark, diamond, tmp_path):
    og, pg = diamond
    matches = spark.createDataFrame(
        [(0, 0, 1.0), (2, 3, 0.8)], "pg_id LONG, og_id LONG, score DOUBLE"
    )
    walks = spark.createDataFrame(
        [(0, 0, [0, 1])], "partition_key LONG, walk_id LONG, visited ARRAY<LONG>"
    )
    s = stats.assemble_stats(og, matches, walks, 0.1)
    assert s["numTruePositiveMatches"] == "1"
    assert s["numFalsePositiveMatches"] == "1"
    assert s["valuableOriginalNodeIds"] == "[2, 3]"
    # valuable og {2,3} minus matched pg ids {0,2} (Main.scala:164-167)
    assert s["uncoveredValuableNodeIds"] == "[3]"
    assert s["totalSuccessfulWalks"] == "1"
    out = tmp_path / "stats.yaml"
    write_yaml_stats(spark, s, str(out))
    text = out.read_text()
    assert text.splitlines()[0].startswith("valuableOriginalNodeIds:")
    assert "numTruePositiveMatches: '1'" in text


def test_simrank_fixpoint_converges(spark, diamond):
    og, pg = diamond
    scores, rounds = simrank.simrank_fixpoint(pg, og, max_rounds=8, attr_bucket=False)
    assert 1 <= rounds <= 8
    got = scores_dict(scores)
    # fixpoint must be stable under one more round
    again = scores_dict(simrank.simrank_round(scores, pg, og))
    assert got == again
    # identity pairs always survive at 1.0
    for pair in [(0, 0), (1, 1), (3, 3)]:
        assert got[pair] == 1.0
