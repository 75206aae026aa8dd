"""Simulate the driver's verify pass against __spark_entry__.py.

Runs entry(spark) as a smoke check, then every queries()[name] at the
given SF dir, comparing row-count / sorted columns / order-insensitive
values against oracle_sql()[name] via DuckDB (rows-only when no oracle).
Exit 0 iff everything matches. Oracle-backed queries must also return
>0 rows at the verification SF — a 0=0 hash match verifies nothing
(round-5 verdict: the ktruss/source_overlap vacuous slots). Usage:

    python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import importlib
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from big_data_graph_analysis_with_spark_spark import (  # noqa: E402
    get_spark,
    quiet_window_warns,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _dtype_drift(got_col, want_col) -> bool:
    """True iff the oracle surfaces float64 while Spark returns an
    integral/integral-valued-decimal column — values may be identical
    but the REAL driver hashes serialized forms ("17764676" vs
    "17764676.0") and diverges (the 8 red r9 rows). The numeric
    fallback below would mask it, so it must hard-fail here."""
    if want_col.dtype.kind != "f":
        return False
    if got_col.dtype.kind in "iu":
        return True
    if got_col.dtype.kind == "O":
        from decimal import Decimal

        nonnull = got_col.dropna()
        return len(nonnull) > 0 and all(
            isinstance(v, (Decimal, int)) and v == int(v) for v in nonnull
        )
    return False


def compare(got, want) -> str | None:
    if sorted(got.columns) != sorted(want.columns):
        return f"columns {sorted(got.columns)} != {sorted(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, ignore_index=True)
    w = want[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        gv, wv = g[c], w[c]
        if _dtype_drift(gv, wv):
            return (
                f"DTYPE DRIFT column {c}: oracle float64 vs Spark "
                "integral/decimal — driver hash would diverge; cast "
                "the oracle output to BIGINT"
            )
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            if not np.allclose(
                gv.astype(float), wv.astype(float), atol=0, rtol=0, equal_nan=True
            ):
                return f"float column {c} differs"
        elif not (gv.astype(str) == wv.astype(str)).all():
            return f"column {c} differs"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    entry_mod = importlib.import_module("__spark_entry__")
    if os.environ.get("PLAIN_SESSION"):
        # emulate a driver that builds a bare SparkSession with none of
        # our session-factory configs — the contract must still work
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("driver_sim_plain")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="driver_sim")
    # WindowExec "No Partition Defined" WARNs come from the queries that
    # intentionally window a dimension-bounded frame (Pareto cut, LAG
    # growth frames, quantile ranks over distinct values); suppress just
    # that logger so this run's stderr surfaces real warnings.
    quiet_window_warns(spark)

    t0 = time.time()
    rows = entry_mod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s  schema ok")
    assert len(rows) >= 0

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                got = df.toPandas()
                err = compare(got, oracle(oracles[name], sf_dir))
                if err is None and len(got) == 0:
                    # hard-fail only at the driver's verification SF —
                    # at tinier fixtures (sf0.001) an empty-but-hash-
                    # matching result can be legitimate (e.g. a churn
                    # window with no churned users in 1/10 the events)
                    if "sf0.01" in sf_dir.rstrip("/").split("/")[-1]:
                        err = "VACUOUS: oracle-backed query returned 0 rows"
                    else:
                        print(f"  [warn] {name}: 0 rows at {sf_dir} (non-driver SF)")
            else:
                n = df.count()
                err = None if n >= 0 else "negative count"
                name += " (rows-only)"
        except Exception as e:  # noqa: BLE001
            err = f"EXCEPTION {type(e).__name__}: {e}"
        status = "OK " if err is None else "FAIL"
        print(f"  [{status}] {name:28s} {time.time()-t0:6.1f}s  {err or ''}")
        if err:
            failures.append((name, err))
    print(f"{len(qs)-len(failures)}/{len(qs)} queries match at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
