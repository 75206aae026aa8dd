"""Verify a subset of entry queries against their oracles.

Same comparison as driver_sim.py, but only for the names given —
the fast inner loop when developing one operator. Usage:

    python scripts/check_query.py name [name ...] [--sf DIR]
"""

from __future__ import annotations

import importlib
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from driver_sim import compare, oracle  # noqa: E402

from big_data_graph_analysis_with_spark_spark import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    entry_mod = importlib.import_module("__spark_entry__")
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    spark = get_spark(app_name="check_query")
    failures = []
    for name in args:
        if name not in qs:
            print(f"  [FAIL] {name}: not in queries()")
            failures.append(name)
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                err = compare(df.toPandas(), oracle(oracles[name], sf_dir))
            else:
                err = None if df.count() >= 0 else "negative count"
                name += " (rows-only)"
        except Exception as e:  # noqa: BLE001
            err = f"EXCEPTION {type(e).__name__}: {e}"
        print(f"  [{'OK ' if err is None else 'FAIL'}] {name:28s} "
              f"{time.time()-t0:6.1f}s  {err or ''}")
        if err:
            failures.append(name)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
