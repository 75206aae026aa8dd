"""Shaping documents into training sequences: chunking and packing.

The two operators every LLM-pretraining data pipeline runs after
dedup/filtering:

* :func:`doc_chunks` — split each document into consecutive
  ``max_tokens``-token chunks (context-length enforcement). Pure
  higher-order array functions over the whitespace tokenization —
  whole-stage codegen, no shuffle at all (narrow map + explode).
* :func:`pack_documents` — assign documents to fixed-token-budget
  packs ("concat then chop" sequence packing). A truly greedy global
  first-fit is inherently sequential; the distributed formulation
  buckets documents by a deterministic hash, orders each bucket by
  (hash, doc_id), and assigns each document to the pack its running
  token offset starts in. One window aggregation per bucket — packs
  never cross buckets, so at 100 TB each bucket's window sort is
  local to its hash partition (no global sort, no driver state), and
  membership is a pure function of the corpus content: stable across
  partitionings, engines, and re-runs.
* :func:`length_buckets` — group documents of similar token counts
  into fixed-size training batches (padding-efficiency batching: a
  batch pads every member to its longest, so batching long with short
  wastes compute ∝ the length spread). Documents are CASE-assigned to
  the half-open boundary bucket their token count falls in, ordered
  inside each bucket by the seeded hash (so batch composition is a
  shuffled but deterministic function of the corpus), and numbered
  into ``batch_size``-row batches by one per-bucket window — the same
  single-shuffle discipline as packing.

Both are exactly mirrored by DuckDB oracles (plans/doc_oracles.py):
integer arithmetic only, and the shared 56-bit MD5 hash for ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash56

#: seed for the packing hash order (any fixed value; documented so the
#: oracle uses the same one)
PACK_SEED = 7
#: pack_id = bucket * PACK_STRIDE + pack_within_bucket; collision-free
#: while a bucket holds < PACK_STRIDE packs (≥ budget·1e6 tokens/bucket)
PACK_STRIDE = 1_000_000


def doc_chunks(docs: DataFrame, max_tokens: int = 64) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_text): consecutive
    whitespace-token chunks of ≤ max_tokens each. Every document emits
    ≥ 1 chunk (empty text becomes one empty chunk — dropping rows
    silently would make downstream joins lossy)."""
    m = max_tokens
    words = F.split(F.col("text"), " ")
    n_chunks = F.expr(f"(size(split(text, ' ')) + {m - 1}) div {m}")
    chunked = docs.select(
        "doc_id",
        words.alias("w"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("w"), F.col("chunk_id") * m + 1, m)
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_documents(
    docs: DataFrame, budget: int = 512, n_buckets: int = 8
) -> DataFrame:
    """(doc_id, n_tokens, pack_id, offset_in_pack): fixed-budget
    sequence packing. Documents are hash-bucketed, ordered by
    (hash, doc_id) within each bucket, and concatenated; a document
    belongs to the pack its first token lands in (packs may overflow by
    the tail of a straddling document — the standard concat-then-chop
    trade-off; budget-strict consumers chop at read time)."""
    h = hash56("doc_id", seed=PACK_SEED)
    base = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        h.alias("h"),
        (h % n_buckets).cast("long").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start")
    return base.select("doc_id", "n_tokens", "bucket", start).select(
        "doc_id",
        "n_tokens",
        (
            F.col("bucket") * PACK_STRIDE + F.expr(f"start div {budget}")
        ).cast("long").alias("pack_id"),
        (F.col("start") % budget).cast("long").alias("offset_in_pack"),
    )


def length_buckets(
    docs: DataFrame,
    boundaries: tuple[int, ...] = (16, 64, 256),
    batch_size: int = 32,
) -> DataFrame:
    """(doc_id, n_tokens, bucket, batch_id, pos_in_batch): group
    similar-length documents into fixed-size batches.

    Bucket k holds token counts in [boundaries[k-1], boundaries[k])
    (bucket 0 = below the first boundary, bucket len(boundaries) = at
    or above the last). Within a bucket, documents are ordered by the
    seeded 56-bit hash then doc_id (deterministic shuffle) and chopped
    into batches of `batch_size`; the final partial batch per bucket
    remains (trainers drop or pad it). One shuffle (the per-bucket
    window); everything else is a narrow CASE map.
    """
    assert list(boundaries) == sorted(set(boundaries)) and boundaries
    n_tokens = F.size(F.split("text", " ")).cast("long")
    bucket = F.lit(len(boundaries))
    for k in range(len(boundaries) - 1, -1, -1):
        bucket = F.when(n_tokens < boundaries[k], F.lit(k)).otherwise(bucket)
    base = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        bucket.cast("long").alias("bucket"),
        hash56("doc_id", seed=PACK_SEED).alias("h"),
    )
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    rn = F.row_number().over(w) - 1
    return base.select(
        "doc_id",
        "n_tokens",
        "bucket",
        (
            F.col("bucket") * PACK_STRIDE
            + (rn / batch_size).cast("long")
        ).cast("long").alias("batch_id"),
        (rn % batch_size).cast("long").alias("pos_in_batch"),
    )
