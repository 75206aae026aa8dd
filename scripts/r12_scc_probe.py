"""Probe: where does scc_components spend time at sf0.1? Counts _ckpt
materializations and phase wall-clock via monkeypatch."""
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from big_data_graph_analysis_with_spark_spark import get_spark
from big_data_graph_analysis_with_spark_spark.sources import tpch_graph
from big_data_graph_analysis_with_spark_spark.operators import graphalg

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="r12_scc_probe")
spark.sparkContext.setLogLevel("ERROR")
og, pg = tpch_graph.derive_graphs(spark, SF_DIR)
for df in (og.vertices, og.edges, pg.vertices, pg.edges):
    df.persist().count()

stats = {"n_ckpt": 0, "t_ckpt": 0.0}
orig = graphalg._ckpt
def patched(df):
    t0 = time.perf_counter()
    out = orig(df)
    stats["n_ckpt"] += 1
    stats["t_ckpt"] += time.perf_counter() - t0
    return out
graphalg._ckpt = patched

extra = og.edges.filter(
    (F.col("dst") % 7 == 0) & (F.col("src") != F.col("dst"))
).select(F.col("dst").alias("src"), F.col("src").alias("dst"))

for rep in range(2):
    stats["n_ckpt"] = 0; stats["t_ckpt"] = 0.0
    t0 = time.perf_counter()
    graphalg.scc_components(og, extra_edges=extra).agg(
        F.countDistinct("scc_id")).collect()
    wall = time.perf_counter() - t0
    print(f"rep{rep}: scc wall={wall:.2f}s ckpts={stats['n_ckpt']} "
          f"t_ckpt={stats['t_ckpt']:.2f}s", flush=True)

t0 = time.perf_counter()
graphalg.maximal_independent_set(og, rounds=6).count()
print(f"mis wall={time.perf_counter()-t0:.2f}s ckpts={stats['n_ckpt']}")
