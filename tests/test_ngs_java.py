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


def test_byte_field_class_parses():
    """A serialized class with byte fields must decode values AND keep
    the cursor in sync (regression: the old 'B' branch skipped the
    cursor bump for nonzero bytes and returned None for zero)."""
    import struct

    from big_data_graph_analysis_with_spark_spark.sources.ngs_java import _Reader

    buf = bytearray()
    buf += struct.pack(">HH", 0xACED, 5)  # stream magic + version
    buf += bytes([0x73, 0x72])  # TC_OBJECT, TC_CLASSDESC
    name = b"Foo"
    buf += struct.pack(">H", len(name)) + name
    buf += struct.pack(">q", 1)  # serialVersionUID
    buf += bytes([0x02])  # SC_SERIALIZABLE
    buf += struct.pack(">H", 3)  # 3 fields: byte a, byte b, int c
    for code, fname in ((b"B", b"a"), (b"B", b"b"), (b"I", b"c")):
        buf += code + struct.pack(">H", len(fname)) + fname
    buf += bytes([0x78, 0x70])  # TC_ENDBLOCKDATA (annotation), TC_NULL (parent)
    buf += struct.pack(">b", 0)  # a = 0
    buf += struct.pack(">b", -7)  # b = -7 (nonzero: would desync before)
    buf += struct.pack(">i", 42)  # c = 42 (reads garbage if cursor slipped)

    (obj,) = _Reader(bytes(buf)).parse_stream()
    assert obj.values == {"a": 0, "b": -7, "c": 42}


def test_missing_ngs_raises(spark):
    with pytest.raises(GraphParseError):
        load_graph_from_ngs(spark, "/root/repo/nope.ngs")


def test_garbage_ngs_raises(spark, tmp_path):
    p = tmp_path / "bad.ngs"
    p.write_bytes(b"not a java stream at all")
    with pytest.raises(GraphParseError):
        load_graph_from_ngs(spark, str(p))
