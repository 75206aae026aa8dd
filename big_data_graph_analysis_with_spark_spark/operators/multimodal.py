"""Multimodal column plumbing: images/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side machinery here is real and tested — schema, batching,
partition sizing, UDF signatures — and so are two codecs that need no
external library: binary PPM (P6) images decode through a pure-numpy
reader, and integer-PCM WAV through the stdlib `wave` reader, so real
pixel/sample-domain decodes run end-to-end in this container
(`synthesize_media_assets` builds genuine containers to prove it),
and so is a minimal RIFF/AVI reader for uncompressed DIB video frames
— all three modalities decode for real in this container. Other image
formats upgrade to PIL whenever it is importable; compressed video
(H.264 etc.) needs `pyav`/decord, absent here; any payload no codec
accepts falls back per-asset to the deterministic byte-statistics stub
— the behavior a production curation stage wants anyway, since real
corpora carry corrupt media.

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


def synthesize_media_assets(docs: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Like `synthesize_assets`, but the payloads are GENUINE media
    containers, so the real codecs run end-to-end in this environment:
    image assets carry an 8×8 binary PPM (P6), audio assets a 16-bit
    PCM WAV (2,000 samples @ 16 kHz), both deterministically seeded by
    doc_id; video assets a minimal RIFF/AVI container of uncompressed
    8×8 DIB frames — so ALL THREE real codecs run end-to-end here.

    Built with the same Arrow-batched mapInPandas shape as the decode
    stage — payload construction is a fixture/benchmark aid, not a hot
    operator, but it still streams batch-wise and never gathers assets
    on the driver.
    """
    import io
    import wave

    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def ppm(doc_id: int) -> bytes:
            rng = np.random.default_rng([7, doc_id])
            px = rng.integers(0, 256, size=8 * 8 * 3, dtype=np.uint8)
            return b"P6\n8 8\n255\n" + px.tobytes()

        def avi(doc_id: int) -> bytes:
            import struct

            rng = np.random.default_rng([13, doc_id])
            n_frames = int(doc_id % 4 + 2)
            avih = struct.pack(
                "<14I", 100_000, 0, 0, 0, n_frames, 0, 1, 0, 8, 8,
                0, 0, 0, 0,
            )
            hdrl = (
                b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl"
                + b"avih" + struct.pack("<I", len(avih)) + avih
            )
            movi_frames = b""
            for _ in range(n_frames):
                raw = rng.integers(
                    0, 256, size=8 * 8 * 3, dtype=np.uint8
                ).tobytes()
                movi_frames += b"00db" + struct.pack("<I", len(raw)) + raw
            movi = (
                b"LIST" + struct.pack("<I", 4 + len(movi_frames)) + b"movi"
                + movi_frames
            )
            body = b"AVI " + hdrl + movi
            return b"RIFF" + struct.pack("<I", len(body)) + body

        def wav(doc_id: int) -> bytes:
            rng = np.random.default_rng([11, doc_id])
            samples = rng.integers(-20_000, 20_000, size=2_000, dtype=np.int16)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16_000)
                w.writeframes(samples.tobytes())
            return buf.getvalue()

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                m = doc_id % 3
                if m == 0:
                    rows.append(
                        (doc_id, "image", ppm(doc_id), 8, 8, None, None)
                    )
                elif m == 1:
                    rows.append(
                        (doc_id, "audio", wav(doc_id), None, None, 16_000, None)
                    )
                else:
                    rows.append(
                        (
                            doc_id,
                            "video",
                            avi(doc_id),
                            8,
                            8,
                            None,
                            doc_id % 4 + 2,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "kind", "data",
                    "width", "height", "sample_rate", "n_frames",
                ],
            )

    return docs.select("doc_id", "text").mapInPandas(build, ASSET_SCHEMA)


def _decode_ppm(payload: bytes) -> list[float] | None:
    """Real decode of a binary PPM (P6, maxval ≤ 255) in pure numpy —
    no external library, so a REAL image decode path is always active
    in this container. Grayscale is the per-pixel channel mean; stats
    layout matches the other codecs: [bytes, mean, max, min]."""
    import numpy as np

    if not payload.startswith(b"P6"):
        return None
    try:
        # header = magic, width, height, maxval as whitespace-separated
        # tokens ('#' comments legal between any of them), then ONE
        # whitespace byte, then raw RGB
        tokens: list[int] = []
        i = 2
        while len(tokens) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
        i += 1  # the single whitespace after maxval
        w, h, maxval = tokens
        if maxval > 255 or w <= 0 or h <= 0:
            return None
        raw = payload[i : i + w * h * 3]
        if len(raw) != w * h * 3:
            return None
        px = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        gray = px.astype(np.float64).mean(axis=1)
    except (ValueError, IndexError):
        return None
    return [
        float(len(payload)),
        round(float(gray.mean()), 6),
        float(gray.max()),
        float(gray.min()),
    ]


def _decode_avi(payload: bytes) -> list[float] | None:
    """Real decode of a minimal RIFF/AVI container carrying
    uncompressed DIB frames ('00db'/'00dc' chunks) — the published
    RIFF chunk grammar, parsed in pure numpy/struct, so a REAL video
    path runs in this container too. Stats are over per-frame
    grayscale (channel mean): [bytes, mean over all frames, max
    frame-mean, min frame-mean] — the frame-summary layout a
    frame-sampling stage feeds from. Declines (→ stub) anything that
    is not RIFF/AVI, has no frames, or whose frame sizes don't match
    w·h·3."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    dims: list[int] = []
    frames: list[bytes] = []

    def walk(off: int, end: int) -> None:
        while off + 8 <= end:
            cid = payload[off : off + 4]
            size = struct.unpack("<I", payload[off + 4 : off + 8])[0]
            data = off + 8
            if data + size > len(payload):
                raise ValueError("truncated chunk")
            if cid == b"LIST":
                walk(data + 4, data + size)
            elif cid == b"avih" and size >= 56:
                vals = struct.unpack("<14I", payload[data : data + 56])
                dims[:] = [vals[8], vals[9]]
            elif cid in (b"00db", b"00dc"):
                frames.append(payload[data : data + size])
            off = data + size + (size % 2)

    try:
        walk(12, len(payload))
    except (ValueError, struct.error):
        return None
    if not dims or not frames:
        return None
    w, h = dims
    if w <= 0 or h <= 0 or any(len(f) != w * h * 3 for f in frames):
        return None
    means = []
    for f in frames:
        px = np.frombuffer(f, dtype=np.uint8).reshape(-1, 3)
        means.append(float(px.astype(np.float64).mean()))
    return [
        float(len(payload)),
        round(float(np.mean(means)), 6),
        round(max(means), 6),
        round(min(means), 6),
    ]


def _decode_image_real(payload: bytes) -> list[float] | None:
    """Real image decode: the dependency-free PPM reader first (always
    available, deterministic across environments), then PIL for every
    other format whenever it is importable.

    Returns the same 4-dim layout as the stub but computed over decoded
    pixels with the true byte length in slot 0. Returns None — caller
    falls back to the stub — when no codec accepts the payload.
    """
    ppm = _decode_ppm(payload)
    if ppm is not None:
        return ppm
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
            elif kind == "video":
                real = _decode_avi(payload)
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
