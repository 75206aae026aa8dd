"""`.ngs` Java-serialization source tests (S4): binary and text dumps
of the same graph must load to identical DataFrames; error paths mirror
`MitMStatSimTest.scala:16-18`."""

from __future__ import annotations

import pytest

from big_data_graph_analysis_with_spark_spark.sources.ngs_java import load_graph_from_ngs
from big_data_graph_analysis_with_spark_spark.sources.ngs_text import (
    GraphParseError,
    load_graph,
)
from tests.conftest import REF_INPUT


@pytest.mark.parametrize(
    "ngs,txt",
    [
        ("Graph20.0.ngs", "Graph20.0.txt"),
        ("Graph200.ngs", "Graph200.txt"),
        ("Graph200.ngs.perturbed", "Graph200.txt.perturbed"),
    ],
)
def test_ngs_equals_text(spark, ngs, txt):
    g = load_graph_from_ngs(spark, f"{REF_INPUT}/{ngs}")
    t = load_graph(spark, f"{REF_INPUT}/{txt}")
    assert sorted(map(tuple, g.vertices.collect())) == sorted(
        map(tuple, t.vertices.collect())
    )
    assert sorted(map(tuple, g.edges.collect())) == sorted(
        map(tuple, t.edges.collect())
    )


def test_missing_ngs_raises(spark):
    with pytest.raises(GraphParseError):
        load_graph_from_ngs(spark, "/root/repo/nope.ngs")


def test_garbage_ngs_raises(spark, tmp_path):
    p = tmp_path / "bad.ngs"
    p.write_bytes(b"not a java stream at all")
    with pytest.raises(GraphParseError):
        load_graph_from_ngs(spark, str(p))
