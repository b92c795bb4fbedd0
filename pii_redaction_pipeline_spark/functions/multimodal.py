"""Multimodal column operators: opaque binary payloads + typed metadata.

Audio is first-class here (the graft payload): feature extraction over the
WAV `bytes` column is real — frame energies, zero-crossing rate, peak —
computed with numpy inside mapInPandas (Arrow-batched, bytes never leave
the executor). Image/video decode is STUBBED: the container has no
codec libraries, so `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake (seeded by content hash)
exercises the identical Spark-side plumbing — schema, batch shape,
partitioning — that a real decoder would use.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .audio import decode_wav_bytes

FRAME_MS = 100
N_FRAMES = 20  # frame-sample: first N_FRAMES frames of FRAME_MS each

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("decode_ok", T.BooleanType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_ms", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("peak", T.DoubleType(), True),
    T.StructField("zero_crossing_rate", T.DoubleType(), True),
    T.StructField("frame_energies", T.ArrayType(T.DoubleType()), True),
    T.StructField("error", T.StringType(), True),
])


def audio_features(clips: DataFrame) -> DataFrame:
    """mapInPandas feature extractor over (clip_id, bytes, sr_hz, codec).
    Projects only the needed columns (bytes stays executor-side; output
    carries features, not payloads)."""
    src = clips.select("clip_id", "bytes", "codec")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for cid, payload, codec in zip(b["clip_id"], b["bytes"], b["codec"]):
                if payload is None or codec != "wav":
                    rows.append((cid, False, 0, 0.0, 0.0, 0.0, 0.0, [],
                                 f"undecodable codec: {codec}"))
                    continue
                try:
                    pcm, sr = decode_wav_bytes(bytes(payload))
                    n = len(pcm)
                    frame = max(1, int(sr * FRAME_MS / 1000))
                    usable = pcm[: frame * min(N_FRAMES, n // frame)]
                    energies = (
                        (usable.reshape(-1, frame).astype(np.float64) ** 2)
                        .mean(axis=1).tolist() if len(usable) >= frame else [])
                    zcr = float(np.mean(np.abs(np.diff(np.signbit(pcm))))) \
                        if n > 1 else 0.0
                    rows.append((
                        cid, True, n, n / sr * 1000.0,
                        float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))),
                        float(np.max(np.abs(pcm))), zcr, energies, None))
                except Exception as e:
                    rows.append((cid, False, 0, 0.0, 0.0, 0.0, 0.0, [],
                                 str(e)[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_FEATURES_SCHEMA.fields])

    return src.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, float]:
    """STUB: no image codecs in this container. With fake=True returns a
    deterministic (width, height, mean_luma) derived from the content
    hash, so the Spark plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires a codec library not present in this "
            "environment; pass fake=True for the deterministic test double")
    h = hashlib.md5(payload or b"").digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, h[2] / 255.0


def image_features(df: DataFrame, payload_col: str = "bytes",
                   fake: bool = True) -> DataFrame:
    """mapInPandas over binary payloads with the stubbed decoder — the
    batch shape / schema contract a real decoder would plug into."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for cid, payload in zip(b["clip_id"], b[payload_col]):
                w, h, luma = decode_image(
                    bytes(payload) if payload is not None else b"", fake=fake)
                rows.append((cid, w, h, luma))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return df.select("clip_id", payload_col).mapInPandas(
        extract, schema=IMAGE_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("ts_ms", T.DoubleType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])


def sample_video_frames(payload: bytes, n_frames: int,
                        fake: bool = False) -> list[tuple[int, int, float]]:
    """STUB: no video codecs in this container. With fake=True returns
    deterministic per-frame (width, height, mean_luma) tuples derived
    from the content hash + frame index — the contract a real
    frame-sampler (seek → decode keyframe → downscale) would fill."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires a codec library not present in this "
            "environment; pass fake=True for the deterministic test double")
    out = []
    for k in range(n_frames):
        h = hashlib.md5((payload or b"") + k.to_bytes(4, "little")).digest()
        out.append((64 + h[0] % 192, 64 + h[1] % 192, h[2] / 255.0))
    return out


def video_frame_features(df: DataFrame, payload_col: str = "bytes",
                         n_frames: int = 4, fps: float = 1.0,
                         fake: bool = True) -> DataFrame:
    """Frame-sampling operator shape: one binary payload row explodes to
    n_frames feature rows (mapInPandas — the payload never leaves the
    executor, and the 1→N row fan-out happens inside the Arrow batch,
    which is how a real ffmpeg-backed sampler would plug in)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for cid, payload in zip(b["clip_id"], b[payload_col]):
                frames = sample_video_frames(
                    bytes(payload) if payload is not None else b"",
                    n_frames, fake=fake)
                for k, (w, h, luma) in enumerate(frames):
                    rows.append((cid, k, k * 1000.0 / fps, w, h, luma))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              VIDEO_FRAMES_SCHEMA.fields])

    return df.select("clip_id", payload_col).mapInPandas(
        extract, schema=VIDEO_FRAMES_SCHEMA)
