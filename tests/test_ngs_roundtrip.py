"""Property-based round-trip: serialize_graph ∘ parse_graph_text = id
(S8 ↔ S1-S3), over hypothesis-generated graphs with negative /
tiny-magnitude doubles (the cases the reference's own tests single out,
`MitMStatSimTest.scala:25-28`)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_graph_analysis_with_spark_spark.model import EDGE_SCHEMA, VERTEX_SCHEMA, NetGraph
from big_data_graph_analysis_with_spark_spark.sources.ngs_text import (
    parse_graph_text,
    serialize_graph,
)

finite_double = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)
tiny_double = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e-3, max_value=1e-3
)


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    ids = list(range(n))  # id 0 must exist (init node)
    vrows = []
    for i in ids:
        vrows.append(
            (
                i,
                draw(st.integers(0, 7)),
                draw(st.integers(0, 19)),
                1,
                draw(st.integers(0, 99)),
                draw(st.integers(0, 4)),
                draw(st.integers(0, 6)),
                draw(st.integers(0, 19)),
                draw(st.one_of(finite_double, tiny_double)),
                draw(st.booleans()),
            )
        )
    n_edges = draw(st.integers(0, min(6, n * n)))
    erows = []
    seen = set()
    for _ in range(n_edges):
        s = draw(st.sampled_from(ids))
        d = draw(st.sampled_from(ids))
        if (s, d) in seen:
            continue
        seen.add((s, d))
        erows.append(
            (
                s,
                d,
                draw(st.integers(0, 19)),
                draw(st.integers(0, 99)),
                draw(st.integers(0, 99)),
                draw(st.one_of(st.none(), st.integers(0, 99))),
                draw(st.one_of(finite_double, tiny_double)),
            )
        )
    return vrows, erows


@given(graphs())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_serialize_parse_roundtrip(spark, g):
    vrows, erows = g
    graph = NetGraph(
        spark.createDataFrame(vrows, VERTEX_SCHEMA),
        spark.createDataFrame(erows, EDGE_SCHEMA),
    )
    text = serialize_graph(graph)
    back = parse_graph_text(spark, text)
    got_v = sorted(map(tuple, back.vertices.collect()))
    want_v = sorted(map(tuple, graph.vertices.collect()))
    assert got_v == pytest.approx(want_v)
    got_e = sorted(
        (r["src"], r["dst"], r["action_type"], r["from_field"], r["to_field"],
         r["resulting_value"]) for r in back.edges.collect()
    )
    want_e = sorted((r[0], r[1], r[2], r[3], r[4], r[5]) for r in erows)
    assert got_e == want_e
