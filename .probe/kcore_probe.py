import sys, time
sys.path.insert(0, "/root/repo")
from big_data_graph_analysis_with_spark_spark import get_spark
from big_data_graph_analysis_with_spark_spark.operators import graphalg
from big_data_graph_analysis_with_spark_spark.sources import tpch_graph

sf = sys.argv[1]
spark = get_spark()
og, pg = tpch_graph.derive_graphs(spark, sf)
t0 = time.time()
und = graphalg.undirected_edges(og)
n = und.count()
print(f"und edges: {n} ({time.time()-t0:.1f}s)", flush=True)
t0 = time.time()
print("kcore:", graphalg.kcore_census(og, k=3, rounds=8).collect(), flush=True)
print(f"kcore time: {time.time()-t0:.1f}s", flush=True)
