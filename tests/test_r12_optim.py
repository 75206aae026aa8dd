"""Round-12 OPTIMIZATION regression tests: internals changed for plan
shape, values pinned unchanged.

1. `dedup.simhash_signatures` now aggregates directly over token
   occurrences (one doc_id shuffle with map-side combine) instead of a
   (doc_id, word) pre-count followed by a second shuffle. The signed
   sums are integer-identical: Σ_occurrences (2·bit−1) ==
   Σ_distinct cnt·(2·bit−1). Pinned: signature values against a python
   mirror, and the one-exchange plan shape.
2. `similarity.embedding_covariance` generates the d·(d+1)/2 component
   pairs per row (nested transform over the embedding array) instead
   of a vec_id self-join of the exploded component table. Pinned: no
   vec_id exchange in the plan, and exact sufficient statistics on a
   hand-checkable fixture.
3. `functions.bloom` hashes with seeded native xxhash64 (engine-local;
   the md5 hash56 family cost a string concat + md5 + hex conv per row
   per hash on the probe side). The no-false-negative safety and the
   pruned-join ≡ plain-join identity are already pinned in
   tests/test_skew_ivf.py; here we pin that build and probe agree on
   the family (an inserted key's bits are all set).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from big_data_graph_analysis_with_spark_spark.operators import dedup, similarity


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestSimhashSingleShuffle:
    def test_signature_values_match_python_mirror(self, spark):
        rows = [
            (1, "a b a c"),
            (2, "b b b"),
            (3, "x"),
            (4, "a a b c d e f g"),
        ]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        got = {
            r["doc_id"]: r["simhash"]
            for r in dedup.simhash_signatures(docs, bits=8).collect()
        }

        def h56(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)

        for doc_id, text in rows:
            sums = [0] * 8
            for w in text.split(" "):
                h = h56(w)
                for k in range(8):
                    sums[k] += 2 * ((h >> k) & 1) - 1
            want = sum(1 << k for k in range(8) if sums[k] > 0)
            assert got[doc_id] == want, (doc_id, got[doc_id], want)

    def test_one_exchange_before_signatures(self, spark):
        docs = spark.createDataFrame(
            [(i, f"t{i % 3} t{i % 5}") for i in range(20)],
            "doc_id LONG, text STRING",
        )
        plan = _plan(dedup.simhash_signatures(docs, bits=8))
        assert plan.count("Exchange") == 1, plan


class TestCovarianceNoSelfJoin:
    def test_no_vec_id_exchange(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [0.5, -1.0])],
            "vec_id LONG, embedding ARRAY<FLOAT>",
        )
        plan = _plan(similarity.embedding_covariance(emb))
        assert "hashpartitioning(vec_id" not in plan, plan

    def test_exact_stats_on_hand_fixture(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [0.5, -1.0]), (3, [0.0, 3.0])],
            "vec_id LONG, embedding ARRAY<FLOAT>",
        )
        rows = {
            (r["j"], r["l"]): r
            for r in similarity.embedding_covariance(emb).collect()
        }
        assert set(rows) == {(0, 0), (0, 1), (1, 1)}
        for r in rows.values():
            assert r["n_vecs"] == 3
        assert rows[(0, 0)]["sum_xj"] == 1.5
        assert rows[(0, 0)]["sum_xjxl"] == 1.25  # 1 + 0.25 + 0
        assert rows[(0, 1)]["sum_xj"] == 1.5
        assert rows[(0, 1)]["sum_xl"] == 4.0
        assert rows[(0, 1)]["sum_xjxl"] == 1.5  # 2 − 0.5 + 0
        assert rows[(1, 1)]["sum_xjxl"] == 14.0  # 4 + 1 + 9

    def test_empty_and_null_embeddings_contribute_nothing(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0]), (2, []), (3, None)],
            "vec_id LONG, embedding ARRAY<FLOAT>",
        )
        rows = similarity.embedding_covariance(emb).collect()
        assert len(rows) == 1
        assert rows[0]["n_vecs"] == 1 and rows[0]["sum_xjxl"] == 1.0


class TestBloomFamilyAgreement:
    def test_every_inserted_key_hits_all_its_bits(self, spark):
        from big_data_graph_analysis_with_spark_spark.functions import bloom

        keys = spark.range(0, 1000).select(F.col("id").alias("k"))
        filt = bloom.build_bloom(keys, "k")
        probe = keys.crossJoin(F.broadcast(filt))
        misses = probe.filter(~bloom.might_contain("k")).count()
        assert misses == 0
