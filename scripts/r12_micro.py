"""Per-query microbenchmark for the r12 optimization round.

Times individual `__spark_entry__.q_*` queries in ONE process with the
noop sink (guide §1.4: full materialization of every column, no result
transfer) and job labels (§1.5), min-of-N (default 2). Replicates the
bench's ambient state: the graph base tables are derived and persisted
first (bench.py's `graph_ingest` does the same, and later q_* calls hit
the cache through logical-plan canonicalization), unless --cold.

Usage:
  python scripts/r12_micro.py q_local_bridges q_dyad_census ...
  python scripts/r12_micro.py --cold q_mann_whitney_u
  python scripts/r12_micro.py --explain q_dyad_census   # plan to stdout
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS = int(os.environ.get("R12_MICRO_ITERS", "2"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    cold = "--cold" in args
    explain_only = "--explain" in args
    names = [a for a in args if not a.startswith("--")]

    import __spark_entry__ as entry
    from big_data_graph_analysis_with_spark_spark import get_spark

    extra = json.loads(os.environ.get("R12_EXTRA_CONF", "{}"))
    spark = get_spark(app_name="r12_micro", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    if not cold:
        from big_data_graph_analysis_with_spark_spark.sources import tpch_graph

        og, pg = tpch_graph.derive_graphs(spark, SF_DIR)
        for df in (og.vertices, og.edges, pg.vertices, pg.edges):
            df.persist().count()

    timings: dict[str, float] = {}
    for name in names:
        fn = getattr(entry, name)
        if explain_only:
            df = fn(spark, SF_DIR)
            print(f"==== {name} ====")
            print(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
            continue
        best = float("inf")
        for it in range(ITERS):
            spark.sparkContext.setJobDescription(f"{name}#{it}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = min(best, dt)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 2)
        print(f"[micro] {name}: {best:.2f}s", file=sys.stderr)
    if not explain_only:
        print(json.dumps({"sf_dir": SF_DIR, "iters": ITERS,
                          "cold": cold, "timings": timings}))


if __name__ == "__main__":
    main()
