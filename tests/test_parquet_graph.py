"""Parquet graph storage round-trip (S4 scale-path replacement)."""

from __future__ import annotations

from big_data_graph_analysis_with_spark_spark.sources.ngs_text import load_graph
from big_data_graph_analysis_with_spark_spark.sources.parquet_graph import (
    read_graph_parquet,
    write_graph_parquet,
)
from tests.conftest import REF_INPUT


def test_roundtrip(spark, tmp_path):
    g = load_graph(spark, f"{REF_INPUT}/Graph20.0.txt")
    path = str(tmp_path / "g20")
    write_graph_parquet(g, path)
    back = read_graph_parquet(spark, path)
    assert sorted(map(tuple, back.vertices.collect())) == sorted(
        map(tuple, g.vertices.collect())
    )
    assert sorted(map(tuple, back.edges.collect())) == sorted(
        map(tuple, g.edges.collect())
    )
    assert back.init_id == g.init_id
