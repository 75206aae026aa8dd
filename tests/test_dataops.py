"""Property tests for the training-data operators that aren't
oracle-identity-checkable (approximate ANN, multimodal stubs) plus
consistency checks between the dedup variants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_graph_analysis_with_spark_spark.operators import (
    dedup,
    multimodal,
    similarity,
    textops,
)
from tests.conftest import SF0001


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet").cache()


def test_minhash_lsh_subset_of_exact_jaccard(spark, docs):
    """LSH output must be a subset of the exact n-gram Jaccard pairs
    (banding only *drops* candidates, verification is exact)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, 3, 0.2).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs, 3, 0.2).collect()
    }
    assert lsh <= exact


def test_ann_lsh_recall_vs_brute_force(spark, embs):
    """ANN must recover a reasonable fraction of the exact top-5 — and
    every ANN result must be a genuinely existing vector pair."""
    queries = embs.filter(F.col("vec_id") < 30)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(embs, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ann_lsh_topk(embs, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 12 hyperplanes on 10 well-separated clusters: in-bucket neighbors
    # dominate; anything under 0.3 means the bucketing is broken
    assert recall >= 0.3, f"ANN recall too low: {recall:.2f}"


def test_ann_deterministic(spark, embs):
    queries = embs.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, similarity.ann_lsh_topk(embs, queries, k=5).collect()))
    b = sorted(map(tuple, similarity.ann_lsh_topk(embs, queries, k=5).collect()))
    assert a == b


def test_simhash_near_dup_consistency(spark, docs):
    """SimHash distance 0 pairs must have high token overlap — sanity
    link between the two near-dup definitions on identical docs."""
    sigs = dedup.simhash_signatures(docs)
    assert sigs.count() == docs.count()
    assert sigs.select("simhash").distinct().count() > 1


def test_multimodal_plumbing(spark, docs):
    assets = multimodal.synthesize_assets(docs)
    feats = multimodal.extract_features(assets).cache()
    assert feats.count() == docs.count()
    row = feats.filter(F.col("asset_id") == 0).collect()[0]
    assert row["n_bytes"] > 0
    assert 0.0 <= row["byte_entropy_q"] <= 1.0
    assert len(row["feature"]) == 4
    summary = multimodal.asset_summary(feats).collect()
    assert {r["kind"] for r in summary} == {"image", "audio", "video"}


def test_multimodal_unknown_kind_raises(spark):
    with pytest.raises(NotImplementedError):
        multimodal._decode_stub("hologram", b"xx")


def test_quality_scores_bounded(spark, docs):
    q = textops.quality_scores(docs)
    bad = q.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0


def test_language_id_total(spark, docs):
    lid = textops.language_id(docs)
    assert lid.count() == docs.count()
    assert lid.filter(F.col("guessed_lang").isNull()).count() == 0
