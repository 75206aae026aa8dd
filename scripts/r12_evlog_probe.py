"""Event-log probe: run one operator, then aggregate stage wall/task
time from the Spark event log to see where an iterative op spends time."""
import json, os, sys, time, glob
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from big_data_graph_analysis_with_spark_spark import get_spark
from big_data_graph_analysis_with_spark_spark.sources import tpch_graph
from big_data_graph_analysis_with_spark_spark.operators import graphalg

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/r12_evlog"
os.makedirs(EVDIR, exist_ok=True)
for f in glob.glob(EVDIR + "/*"):
    os.remove(f)

spark = get_spark(app_name="r12_evlog", extra_conf={
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": EVDIR,
})
spark.sparkContext.setLogLevel("ERROR")
og, pg = tpch_graph.derive_graphs(spark, SF_DIR)
for df in (og.vertices, og.edges, pg.vertices, pg.edges):
    df.persist().count()

extra = og.edges.filter(
    (F.col("dst") % 7 == 0) & (F.col("src") != F.col("dst"))
).select(F.col("dst").alias("src"), F.col("src").alias("dst"))

op = os.environ.get("R12_OP", "scc")
t0 = time.perf_counter()
if op == "scc":
    graphalg.scc_components(og, extra_edges=extra).agg(
        F.countDistinct("scc_id")).collect()
elif op == "mis":
    graphalg.maximal_independent_set(og, rounds=6).count()
elif op == "bowtie":
    graphalg.bowtie_census(og, extra_edges=extra).collect()
print(f"wall={time.perf_counter()-t0:.2f}s", flush=True)
spark.stop()

ev = glob.glob(EVDIR + "/*")[0]
jobs = {}       # jobId -> (submit, end)
stages = []     # (duration_ms, task_ms, name, numTasks)
sub = {}
for line in open(ev):
    try:
        e = json.loads(line)
    except Exception:
        continue
    t = e.get("Event")
    if t == "SparkListenerStageSubmitted":
        si = e["Stage Info"]
        sub[si["Stage ID"]] = si
    elif t == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        d = si.get("Completion Time", 0) - si.get("Submission Time", 0)
        stages.append((d, si["Stage Name"], si["Number of Tasks"]))
    elif t == "SparkListenerJobStart":
        jobs[e["Job ID"]] = [e.get("Submission Time", 0), None,
                             e.get("Properties", {}).get("spark.job.description", "")]
    elif t == "SparkListenerJobEnd":
        if e["Job ID"] in jobs:
            jobs[e["Job ID"]][1] = e.get("Completion Time", 0)

tot = sum(d for d, *_ in stages)
print(f"n_stages={len(stages)} sum_stage_wall={tot/1000:.2f}s")
from collections import Counter, defaultdict
by = defaultdict(lambda: [0, 0])
for d, name, nt in stages:
    key = name.split("$")[0][:60]
    by[key][0] += d
    by[key][1] += 1
for k, (d, c) in sorted(by.items(), key=lambda x: -x[1][0])[:15]:
    print(f"{d/1000:7.2f}s  n={c:3d}  {k}")
# job gaps: time not covered by any job = driver/planning time
ivals = sorted((s, e2) for s, e2, _ in jobs.values() if e2)
merged = []
for s, e2 in ivals:
    if merged and s <= merged[-1][1]:
        merged[-1][1] = max(merged[-1][1], e2)
    else:
        merged.append([s, e2])
covered = sum(e2 - s for s, e2 in merged)
span = merged[-1][1] - merged[0][0] if merged else 0
print(f"n_jobs={len(jobs)} job_covered={covered/1000:.2f}s span={span/1000:.2f}s gaps={(span-covered)/1000:.2f}s")
