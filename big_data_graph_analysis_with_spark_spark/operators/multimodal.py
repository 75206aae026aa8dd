"""Multimodal column plumbing: images/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side machinery here is real and tested — schema, batching,
partition sizing, UDF signatures. Codec calls are import-guarded: the
image path upgrades itself to a real PIL decode (grayscale → 8×8
thumbnail → pixel stats) whenever `PIL` is importable, and falls back
to the deterministic byte-statistics stub per-asset when the library is
absent OR the payload doesn't decode — the behavior a production
curation stage wants anyway, since real corpora carry corrupt images.
The audio path REALLY decodes integer-PCM WAV through the stdlib
`wave` reader (always available — sample-domain stats, u8 centering),
falling back per-asset for other containers; video remains stubbed
(`pyav`/decord absent here) behind the same guard pattern.

Scale notes: binary payloads dominate row size, so
`spark.sql.files.maxPartitionBytes` (set in session.py) bounds task
memory; `mapInPandas` streams Arrow record batches so a task never
holds more than `arrow.maxRecordsPerBatch` assets; feature outputs are
narrow rows that shuffle cheaply while payloads stay columnar-pruned
away (never read unless the decode stage runs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id LONG, kind STRING, data BINARY, "
    "width LONG, height LONG, sample_rate LONG, n_frames LONG"
)

FEATURE_SCHEMA = (
    "asset_id LONG, kind STRING, n_bytes LONG, byte_mean DOUBLE, "
    "byte_entropy_q DOUBLE, feature ARRAY<DOUBLE>"
)


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Build a deterministic multimodal asset table from `documents`
    (the container has no real media): text bytes as payload, kind
    round-robined, plausible metadata derived from doc_id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("data"),
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id") % 1920 + 1).alias("width"),
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id") % 1080 + 1).alias("height"),
        F.when(F.col("doc_id") % 3 == 1, F.lit(16_000)).alias("sample_rate"),
        F.when(F.col("doc_id") % 3 == 2, F.col("doc_id") % 300 + 1).alias("n_frames"),
    )


def _decode_image_real(payload: bytes) -> list[float] | None:
    """Real image decode, active whenever PIL is importable.

    Returns the same 4-dim layout as the stub but computed over decoded
    pixels (count, mean, max, min of the 8×8 grayscale thumbnail) with
    the true byte length in slot 0. Returns None — caller falls back to
    the stub — when PIL is missing or the payload is not a decodable
    image.
    """
    try:
        from PIL import Image  # import-guarded optional dependency
    except ImportError:
        return None
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            px = list(im.convert("L").resize((8, 8)).getdata())
    except Exception:
        return None  # corrupt/unsupported payload → stub fallback
    return [
        float(len(payload)),
        round(sum(px) / len(px), 6),
        float(max(px)),
        float(min(px)),
    ]


def _decode_audio_real(payload: bytes) -> list[float] | None:
    """Real PCM WAV decode via the stdlib `wave` reader — no external
    dependency, so unlike the image path this codec is ALWAYS active;
    only non-WAV / corrupt / float-format payloads fall back to the
    stub. Emits the shared 4-slot layout computed over decoded SAMPLES:
    [payload bytes, mean sample amplitude, max sample, min sample]
    (8-bit audio is centered to signed before the stats, matching how
    every resampler treats u8 PCM)."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as w:
            sampwidth = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except Exception:
        return None  # not a WAV / truncated header → stub fallback
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sampwidth)
    if dtype is None or not raw:
        return None
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sampwidth == 1:
        x = x - 128.0
    return [
        float(len(payload)),
        round(float(x.mean()), 6),
        float(x.max()),
        float(x.min()),
    ]


def _decode_stub(kind: str, payload: bytes) -> list[float]:
    """Fallback decoder: deterministic 4-dim byte-statistics vector.

    Used when the kind's real codec is unavailable or declines the
    payload (image → PIL absent/corrupt bytes; audio → non-WAV or
    float-format PCM, since the stdlib reader covers integer WAV only;
    video → decord/pyav don't ship in this container); raises for
    unknown kinds exactly as a real decoder would for unsupported
    codecs.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    mean = sum(payload) / n
    mx, mn = max(payload), min(payload)
    return [float(n), round(mean, 6), float(mx), float(mn)]


def extract_features(assets: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + featurize every asset via Arrow-batched mapInPandas.

    The kernel sees pandas batches (zero-copy from Arrow for the binary
    column), emits narrow feature rows; Spark handles partitioning and
    the Python worker pool. This is the pattern a real decode stage
    (resize / frame-sample / fingerprint) drops into unchanged.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(kind: str, payload: bytes) -> list[float]:
            if kind == "image":
                real = _decode_image_real(payload)
                if real is not None:
                    return real
            elif kind == "audio":
                real = _decode_audio_real(payload)
                if real is not None:
                    return real
            return _decode_stub(kind, payload)

        for pdf in batches:
            feats = [
                decode(k, bytes(d) if d is not None else b"")
                for k, d in zip(pdf["kind"], pdf["data"])
            ]
            n_bytes = [int(f[0]) for f in feats]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "byte_mean": [f[1] for f in feats],
                    "byte_entropy_q": [
                        (f[2] - f[3]) / 255.0 for f in feats  # range proxy
                    ],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(kernel, FEATURE_SCHEMA)


def asset_summary(features: DataFrame) -> DataFrame:
    """Per-kind rollup of the extracted features — the query a curation
    pipeline runs to QA a multimodal batch."""
    return features.groupBy("kind").agg(
        F.count("*").cast("long").alias("n_assets"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.round(
            F.sum(F.col("byte_mean").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_byte_mean"),
    )
