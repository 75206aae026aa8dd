import sys
sys.path.insert(0, "/root/repo")
import tests.test_candidate_oracles as T
from big_data_graph_analysis_with_spark_spark import get_spark

spark = get_spark()
cls = T.TestRound10CandidatesC()
for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    T.SF0001 = sf
    T.TestRound10CandidatesC._GRAPH = None
    for name in ["test_degree_assortativity_inputs", "test_rich_club_census",
                 "test_brunner_munzel_inputs"]:
        getattr(cls, name)(spark)
        print(f"{sf} {name}: OK", flush=True)
print("all green")
