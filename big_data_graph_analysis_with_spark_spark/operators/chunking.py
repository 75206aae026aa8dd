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
