"""Plan-only audit: parquet-scan multiplicity per registry query in a
BARE session (no cached graph tables — the driver's context). Flags
queries whose physical plan scans ≥ threshold parquet files, i.e.
duplicated upstream subtrees (r12 optimization sweep)."""
import os, sys, json
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
THRESH = int(os.environ.get("R12_SCAN_THRESH", "5"))

import __spark_entry__ as entry
from big_data_graph_analysis_with_spark_spark import get_spark

spark = get_spark(app_name="r12_scan_audit")
spark.sparkContext.setLogLevel("ERROR")

rows = []
for name, fn in entry.queries().items():
    try:
        df = fn(spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as exc:
        rows.append((name, -1, f"ERR {type(exc).__name__}"))
        continue
    n = plan.count("Scan parquet")
    rows.append((name, n, ""))
rows.sort(key=lambda r: -r[1])
for name, n, err in rows:
    if n >= THRESH or err:
        print(f"{n:4d}  {name} {err}")
print(json.dumps({"checked": len(rows)}))
