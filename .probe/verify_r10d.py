import sys
sys.path.insert(0, "/root/repo")
import tests.test_candidate_oracles as T
from big_data_graph_analysis_with_spark_spark import get_spark

spark = get_spark()
cls = T.TestRound10CandidatesD()
for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    T.SF0001 = sf
    for name in ["test_count_min_audit", "test_ks_one_sample_uniform"]:
        getattr(cls, name)(spark)
        print(f"{sf} {name}: OK", flush=True)
print("all green")
