"""End-to-end corpus cleaning: the composed training-data pipeline.

One declarative plan chaining the individual operators a pretraining
corpus pass runs — quality scoring, language ID, MinHash-LSH near-dup
resolution — into a single "surviving documents" relation. The point
of expressing it as ONE DataFrame (rather than a driver loop over the
pieces) is that Catalyst sees the whole pipeline: the three document
scans share the cache, filters push into each branch, and the final
join graph is planned globally.

Survival rule: a document survives iff
  * quality ≥ threshold (textops.quality_scores), AND
  * it is the canonical copy of its near-dup group (minimum doc_id),
    or belongs to no group.

Scale: the quality/language branches are narrow maps; the dedup branch
is the banded MinHash path (linear candidate generation); the final
assembly is id-equi-joins — near-dup groups are ≪ corpus, so the
group join broadcasts. Nothing here is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dup_groups, minhash_lsh_pairs
from .textops import language_id, quality_scores


def clean_corpus(
    docs: DataFrame,
    quality_threshold: float = 0.2,
    n: int = 3,
    jaccard_threshold: float = 0.2,
) -> DataFrame:
    """(doc_id, lang, guessed_lang, quality, n_tokens) of surviving
    documents — quality-gated, near-dup-canonical."""
    q = quality_scores(docs).select("doc_id", "quality", "n_tokens")
    lid = language_id(docs).select("doc_id", "guessed_lang")
    groups = dup_groups(minhash_lsh_pairs(docs, n, jaccard_threshold))
    return (
        docs.select("doc_id", "lang")
        .join(q, on="doc_id")
        .join(lid, on="doc_id")
        .join(groups, on="doc_id", how="left")
        .filter(
            (F.col("quality") >= quality_threshold)
            & (F.col("group_id").isNull() | (F.col("group_id") == F.col("doc_id")))
        )
        .select("doc_id", "lang", "guessed_lang", "quality", "n_tokens")
    )


def prepare_corpus(
    docs: DataFrame,
    quality_threshold: float = 0.2,
    n: int = 3,
    jaccard_threshold: float = 0.2,
    weights: dict[str, float] | None = None,
    default_rate: float = 1.0,
    mix_seed: int = 0,
    n_shards: int = 8,
    shard_seed: int = 0,
) -> DataFrame:
    """(doc_id, lang, quality, shard, pos): the full corpus-preparation
    pass — clean (quality gate + near-dup canonical), mixture-reweight
    per language, deterministic shard shuffle — as ONE declarative
    plan. Catalyst plans the whole chain globally: the mixture filter
    is a narrow CASE over the survivors relation (it composes into the
    same stage as the final clean join), and only the shard window adds
    a shuffle beyond clean_corpus itself.
    """
    from .sampling import mixture_sample, shard_assignments

    survivors = clean_corpus(docs, quality_threshold, n, jaccard_threshold)
    mixed = mixture_sample(
        survivors, weights or {}, strata_col="lang",
        default_rate=default_rate, seed=mix_seed,
    )
    return shard_assignments(
        mixed, n_shards=n_shards, seed=shard_seed, keep=("lang", "quality")
    ).select("doc_id", "lang", "quality", "shard", "pos")
