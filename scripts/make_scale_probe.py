"""Synthesize an N×-scale replica of a testdata SF directory.

The sandbox ships sf0.001/sf0.01/sf0.1 only, so every "at 100 TB" claim
in SCALING.md was argued from plan shape alone. This script builds the
missing empirical rung (round-8 verdict task 3): a 10× replica of sf0.1
("sf1-probe") produced by unioning N key-shifted copies of each table,
so heavy-hitter suites can be timed one scale decade apart and the
observed exponent recorded.

Replication rules (TPC-H scaling semantics):
* nation/region are constant-sized — copied through unchanged.
* Every sf-proportional table is replicated N times with ALL entity
  keys offset by copy·KEY_STRIDE, applied consistently across tables
  (c_custkey and o_custkey shift together, o_orderkey and l_orderkey,
  p_partkey/l_partkey, s_suppkey/l_suppkey, events user_id, …) so FK
  joins land exactly as in the source copy.
* documents: every token in copy i>0 gets an `_i` suffix, so shingle
  sets across copies are DISJOINT — near-dup group sizes stay at their
  sf0.1 values and the dedup probe measures scan/shuffle scaling, not
  an artificial pair blowup from 10 verbatim replicas.
* embeddings: copy i>0 vectors get a small deterministic per-row bias
  so ANN candidates don't degenerate to exact ties.

Timestamps/values are left as-is: the probe measures plan scaling, not
data drift. Output is plain parquet, one file per table, readable by
both Spark and the DuckDB oracles.

Usage: python scripts/make_scale_probe.py SRC_SF_DIR DEST_DIR [N]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

#: key offset between copies — far above any sf0.1 key, multiple of 8
#: (so the graph's id-arithmetic attribute buckets stay aligned mod 8)
KEY_STRIDE = 10_000_000

#: per-table key columns that shift by copy·KEY_STRIDE
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
CONSTANT = ["nation", "region"]


def replicate(con, src: str, dest: str, table: str, n: int) -> int:
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
        ).fetchall()
    ]
    shift = set(SHIFT[table])
    parts = []
    for i in range(n):
        off = i * KEY_STRIDE
        sel = []
        for c in cols:
            if c in shift:
                sel.append(f"({c} + {off}) AS {c}")
            elif table == "documents" and c == "text" and i > 0:
                # disjoint shingles per copy: suffix every token
                sel.append(
                    rf"regexp_replace(text, '(\S+)', '\1_{i}', 'g') AS text"
                )
            elif table == "documents" and c == "n_chars" and i > 0:
                sel.append(
                    rf"CAST(length(regexp_replace(text, '(\S+)', "
                    rf"'\1_{i}', 'g')) AS BIGINT) AS n_chars"
                )
            elif table == "embeddings" and c == "embedding" and i > 0:
                sel.append(
                    f"list_transform(embedding, x -> CAST(x + "
                    f"((vec_id % 997) * 0.00001) AS FLOAT)) AS embedding"
                )
            else:
                sel.append(c)
        parts.append(
            f"SELECT {', '.join(sel)} FROM '{src}/{table}.parquet'"
        )
    union = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({union}) TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
    )
    return con.execute(
        f"SELECT COUNT(*) FROM '{dest}/{table}.parquet'"
    ).fetchone()[0]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_probe"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    Path(dest).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in CONSTANT:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied through (constant-sized)")
    for t in SHIFT:
        rows = replicate(con, src, dest, t, n)
        print(f"{t}: {rows} rows ({n}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
