"""`.ngs` binary graph source (SURVEY.md §2 row S4).

The reference's `loadGraphFromNGS` (`HelperFunction.scala:127-178`)
reads a Java-serialized `List[NetGraphComponent]` via
`ObjectInputStream` and partitions it into nodes/edges. Spark-side we
cannot instantiate those Scala classes (they're not on our classpath),
so this module implements a minimal reader for the **Java Object
Serialization Stream Protocol** (a published format: stream magic
``ACED 0005``, tagged contents, handle back-references) covering the
subset Scala 2.13 collection serialization emits:

* TC_OBJECT / TC_CLASSDESC / TC_REFERENCE / TC_STRING / TC_NULL /
  TC_CLASS / TC_BLOCKDATA(LONG) / TC_ENDBLOCKDATA / TC_ARRAY
* ``SC_WRITE_METHOD`` object annotations (how
  ``scala.collection.generic.DefaultSerializationProxy`` carries list
  elements), module proxies (``None$``, ``List$``, ``SerializeEnd$``).

Graph interpretation mirrors the reference: every element of the
top-level list whose class ends in ``NodeObject`` becomes a vertex row
(the NetGameSim-side class carries two extra list fields,
``childrenObjects``/``properties``, which the reference discards on
load — so do we); every ``Action`` becomes an edge with endpoints
re-canonicalized to the embedded nodes' ids
(`HelperFunction.scala:145-149`).

Driver-side parse (the files are single serialized blobs — no
record-splittable structure to distribute); the output is a normal
NetGraph whose downstream processing is fully distributed. For
at-scale graph storage use parquet_graph.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from ..model import EDGE_SCHEMA, VERTEX_SCHEMA, NetGraph
from .ngs_text import GraphParseError

TC_NULL = 0x70
TC_REFERENCE = 0x71
TC_CLASSDESC = 0x72
TC_OBJECT = 0x73
TC_STRING = 0x74
TC_ARRAY = 0x75
TC_CLASS = 0x76
TC_BLOCKDATA = 0x77
TC_ENDBLOCKDATA = 0x78
TC_BLOCKDATALONG = 0x7A
TC_LONGSTRING = 0x7C

SC_WRITE_METHOD = 0x01
SC_SERIALIZABLE = 0x02
SC_EXTERNALIZABLE = 0x04

BASE_HANDLE = 0x7E0000


@dataclass
class JClassDesc:
    name: str
    suid: int
    flags: int
    fields: list[tuple[str, str, str | None]]  # (typecode, name, sig)
    parent: "JClassDesc | None"


@dataclass
class JObject:
    cls: JClassDesc
    values: dict[str, Any] = field(default_factory=dict)
    annotation: list[Any] = field(default_factory=list)

    @property
    def classname(self) -> str:
        return self.cls.name


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.handles: list[Any] = []

    # -- primitives ------------------------------------------------------
    def u1(self) -> int:
        v = self.d[self.i]
        self.i += 1
        return v

    def u2(self) -> int:
        v = struct.unpack_from(">H", self.d, self.i)[0]
        self.i += 2
        return v

    def i4(self) -> int:
        v = struct.unpack_from(">i", self.d, self.i)[0]
        self.i += 4
        return v

    def i8(self) -> int:
        v = struct.unpack_from(">q", self.d, self.i)[0]
        self.i += 8
        return v

    def f8(self) -> float:
        v = struct.unpack_from(">d", self.d, self.i)[0]
        self.i += 8
        return v

    def f4(self) -> float:
        v = struct.unpack_from(">f", self.d, self.i)[0]
        self.i += 4
        return v

    def utf(self) -> str:
        n = self.u2()
        s = self.d[self.i : self.i + n].decode("utf-8", errors="replace")
        self.i += n
        return s

    def new_handle(self, obj: Any) -> Any:
        self.handles.append(obj)
        return obj

    # -- protocol --------------------------------------------------------
    def parse_stream(self) -> list[Any]:
        if self.u2() != 0xACED or self.u2() != 5:
            raise GraphParseError("not a Java serialization stream")
        out = []
        while self.i < len(self.d):
            out.append(self.content())
        return out

    def content(self) -> Any:
        tc = self.u1()
        if tc == TC_NULL:
            return None
        if tc == TC_REFERENCE:
            return self.handles[self.i4() - BASE_HANDLE]
        if tc == TC_STRING:
            return self.new_handle(self.utf())
        if tc == TC_LONGSTRING:
            n = self.i8()
            s = self.d[self.i : self.i + n].decode("utf-8", errors="replace")
            self.i += n
            return self.new_handle(s)
        if tc == TC_CLASSDESC:
            return self.class_desc_body()
        if tc == TC_CLASS:
            desc = self.any_class_desc()
            return self.new_handle(desc)
        if tc == TC_OBJECT:
            return self.object_body()
        if tc == TC_ARRAY:
            return self.array_body()
        if tc == TC_BLOCKDATA:
            n = self.u1()
            b = self.d[self.i : self.i + n]
            self.i += n
            return ("blockdata", b)
        if tc == TC_BLOCKDATALONG:
            n = self.i4()
            b = self.d[self.i : self.i + n]
            self.i += n
            return ("blockdata", b)
        raise GraphParseError(f"unsupported serialization tag 0x{tc:02x} at {self.i - 1}")

    def any_class_desc(self) -> JClassDesc | None:
        tc = self.u1()
        if tc == TC_NULL:
            return None
        if tc == TC_REFERENCE:
            return self.handles[self.i4() - BASE_HANDLE]
        if tc == TC_CLASSDESC:
            return self.class_desc_body()
        raise GraphParseError(f"unexpected tag 0x{tc:02x} for classDesc")

    def class_desc_body(self) -> JClassDesc:
        name = self.utf()
        suid = self.i8()
        desc = JClassDesc(name, suid, 0, [], None)
        self.new_handle(desc)
        desc.flags = self.u1()
        nfields = self.u2()
        for _ in range(nfields):
            tcode = chr(self.u1())
            fname = self.utf()
            sig = None
            if tcode in ("L", "["):
                sig = self.content()  # TC_STRING or TC_REFERENCE
            desc.fields.append((tcode, fname, sig))
        # classAnnotation: contents until TC_ENDBLOCKDATA
        while self.d[self.i] != TC_ENDBLOCKDATA:
            self.content()
        self.i += 1
        desc.parent = self.any_class_desc()
        return desc

    def _prim(self, tcode: str) -> Any:
        if tcode == "I":
            return self.i4()
        if tcode == "J":
            return self.i8()
        if tcode == "D":
            return self.f8()
        if tcode == "F":
            return self.f4()
        if tcode == "Z":
            return bool(self.u1())
        if tcode == "B":
            v = struct.unpack_from(">b", self.d, self.i)[0]
            self.i += 1
            return v
        if tcode == "S":
            v = struct.unpack_from(">h", self.d, self.i)[0]
            self.i += 2
            return v
        if tcode == "C":
            return chr(self.u2())
        raise GraphParseError(f"unknown primitive type {tcode}")

    def object_body(self) -> JObject:
        desc = self.any_class_desc()
        obj = JObject(desc)
        self.new_handle(obj)
        # classdata: superclass first
        chain: list[JClassDesc] = []
        c = desc
        while c is not None:
            chain.append(c)
            c = c.parent
        for cd in reversed(chain):
            if cd.flags & SC_SERIALIZABLE:
                for tcode, fname, _sig in cd.fields:
                    if tcode in ("L", "["):
                        obj.values[fname] = self.content()
                    else:
                        obj.values[fname] = self._prim(tcode)
                if cd.flags & SC_WRITE_METHOD:
                    while self.d[self.i] != TC_ENDBLOCKDATA:
                        obj.annotation.append(self.content())
                    self.i += 1
            elif cd.flags & SC_EXTERNALIZABLE:
                while self.d[self.i] != TC_ENDBLOCKDATA:
                    obj.annotation.append(self.content())
                self.i += 1
        return obj

    def array_body(self) -> list[Any]:
        desc = self.any_class_desc()
        arr: list[Any] = []
        self.new_handle(arr)
        n = self.i4()
        tcode = desc.name[1] if desc and desc.name.startswith("[") else "L"
        for _ in range(n):
            if tcode in ("L", "["):
                arr.append(self.content())
            else:
                arr.append(self._prim(tcode))
        return arr


# ---------------------------------------------------------------------------
# graph interpretation
# ---------------------------------------------------------------------------


def _iter_elements(top: list[Any]):
    """Flatten serialization-proxy annotations into the element stream
    (blockdata size prefixes and SerializeEnd markers skipped)."""
    for item in top:
        if isinstance(item, JObject):
            if item.classname.endswith("DefaultSerializationProxy"):
                for el in item.annotation:
                    if isinstance(el, JObject):
                        yield el
            else:
                yield item


def _node_row(o: JObject) -> tuple:
    v = o.values
    return (
        int(v["id"]),
        int(v["children"]),
        int(v["props"]),
        int(v["currentDepth"]),
        int(v["propValueRange"]),
        int(v["maxDepth"]),
        int(v["maxBranchingFactor"]),
        int(v["maxProperties"]),
        float(v["storedValue"]),
        bool(v["valuableData"]),
    )


def _option_int(v: Any) -> int | None:
    if v is None:
        return None
    if isinstance(v, JObject):
        if v.classname.endswith("None$") or v.classname.endswith(
            "ModuleSerializationProxy"
        ):
            return None
        if "value" in v.values:
            inner = v.values["value"]
            if isinstance(inner, JObject) and "value" in inner.values:
                inner = inner.values["value"]
            return int(inner) if inner is not None else None
    if isinstance(v, int):
        return v
    return None


def load_graph_from_ngs(spark: SparkSession, path: str, init_id: int = 0) -> NetGraph:
    """Read a `.ngs` Java-serialized NetGameSim graph (S4).

    Local filesystem paths only (the reference's HDFS/S3 branch is
    covered by the text/parquet sources)."""
    try:
        with open(path.removeprefix("file:"), "rb") as f:
            data = f.read()
    except OSError as e:
        raise GraphParseError(f"cannot read NGS file {path}: {e}") from e

    top = _Reader(data).parse_stream()
    nodes: list[tuple] = []
    edges: list[tuple] = []
    for el in _iter_elements(top):
        cn = el.classname
        if cn.endswith("NodeObject"):
            nodes.append(_node_row(el))
        elif cn.endswith("Action"):
            v = el.values
            src = v.get("fromNode")
            dst = v.get("toNode")
            if not isinstance(src, JObject) or not isinstance(dst, JObject):
                continue
            edges.append(
                (
                    int(src.values["id"]),
                    int(dst.values["id"]),
                    int(v.get("actionType", 0)),
                    int(v.get("fromId", 0)),
                    int(v.get("toId", 0)),
                    _option_int(v.get("resultingValue")),
                    float(v.get("cost", 0.0)),
                )
            )

    if not nodes:
        raise GraphParseError(f"no NodeObject elements found in {path}")
    g = NetGraph(
        spark.createDataFrame(nodes, VERTEX_SCHEMA),
        spark.createDataFrame(edges, EDGE_SCHEMA),
        init_id,
    )
    if not any(n[0] == init_id for n in nodes):
        raise GraphParseError(f"graph has no init node (id={init_id})")
    return g
