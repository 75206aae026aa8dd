import sys, time
sys.path.insert(0, "/root/repo")
from big_data_graph_analysis_with_spark_spark import get_spark
from big_data_graph_analysis_with_spark_spark.operators import (
    graphalg, hypotests, sampling)
from big_data_graph_analysis_with_spark_spark.sources import tpch_graph

sf = sys.argv[1]
ops = sys.argv[2].split(",") if len(sys.argv) > 2 else None
spark = get_spark()
orders = spark.read.parquet(f"{sf}/orders.parquet")
cust = spark.read.parquet(f"{sf}/customer.parquet")
docs = spark.read.parquet(f"{sf}/documents.parquet")
evs = spark.read.parquet(f"{sf}/events.parquet")

def t(name, fn):
    if ops and name not in ops:
        return
    t0 = time.time()
    fn()
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)

t("kruskal", lambda: hypotests.kruskal_wallis_inputs(orders).count())
t("mood_scale", lambda: hypotests.mood_scale_inputs(orders, cust).count())
t("cochran", lambda: hypotests.cochran_q_inputs(evs).count())
t("token_mix", lambda: sampling.token_mix_allocation(docs).count())
if not ops or "kcore" in ops:
    t0 = time.time()
    og, pg = tpch_graph.derive_graphs(spark, sf)
    print(f"derive_graphs: {time.time()-t0:.1f}s", flush=True)
    t("kcore", lambda: graphalg.kcore_census(og, k=3, rounds=8).count())
print("DONE", flush=True)
