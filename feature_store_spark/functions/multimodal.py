"""Multimodal (audio / video) column plumbing.

Images are first-class in this engine (``functions/images.py``); audio and
video follow the same pattern: opaque ``binary`` payloads + typed metadata
columns, feature extraction as Arrow-batched pandas UDFs over
``mapInPandas``-shaped batches.  The actual codecs (ffmpeg/libsndfile) are
NOT in this container, so the decode steps are stubbed: real decoders raise
``NotImplementedError`` with the dependency named, and a clearly-marked
deterministic fake implements the same signature so the Spark-side plumbing
— schema, partitioning, batch shape, payload-drop-before-shuffle — is real
and tested end-to-end.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)

VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sampled_frame_phashes", T.ArrayType(T.LongType())),
    ]
)


def decode_audio(data: bytes, sample_rate: int = 16_000) -> np.ndarray:
    """Decode an audio payload to float32 PCM.  Real codecs unavailable."""
    raise NotImplementedError(
        "audio decode requires libsndfile/ffmpeg (not in this container); "
        "use fake_decode_audio for the deterministic test path"
    )


def fake_decode_audio(data: bytes) -> np.ndarray:
    """Deterministic FAKE decoder (clearly marked): payload is
    zlib-compressed int16 PCM written by fake_encode_audio."""
    return np.frombuffer(zlib.decompress(data), dtype=np.int16).astype(
        np.float32
    ) / 32768.0


def fake_encode_audio(pcm: np.ndarray) -> bytes:
    return zlib.compress((pcm * 32767).astype(np.int16).tobytes(), 6)


def decode_video_frames(data: bytes, every_n: int = 30) -> list[np.ndarray]:
    """Sample every-n-th frame of a video payload.  Real codecs unavailable."""
    raise NotImplementedError(
        "video decode requires ffmpeg (not in this container); "
        "use fake_decode_video_frames for the deterministic test path"
    )


def fake_decode_video_frames(data: bytes) -> list[np.ndarray]:
    """Deterministic FAKE video: payload is zlib of concatenated 8x8x3
    uint8 frames (n_frames inferred from length)."""
    raw = np.frombuffer(zlib.decompress(data), dtype=np.uint8)
    n = len(raw) // (8 * 8 * 3)
    return list(raw[: n * 192].reshape(n, 8, 8, 3))


def fake_encode_video(frames: list[np.ndarray]) -> bytes:
    return zlib.compress(np.stack(frames).astype(np.uint8).tobytes(), 6)


@F.pandas_udf(AUDIO_FEATURES_SCHEMA)
def audio_features_udf(data: pd.Series) -> pd.DataFrame:
    """binary audio → (duration, rms, zero crossings); Arrow-batched.
    Uses the deterministic fake decoder (see module docstring)."""
    out = {"duration_s": [], "rms": [], "zero_crossings": []}
    for buf in data:
        if buf is None:
            for v in out.values():
                v.append(None)
            continue
        pcm = fake_decode_audio(bytes(buf))
        out["duration_s"].append(len(pcm) / 16_000.0)
        out["rms"].append(float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0)
        out["zero_crossings"].append(int(np.sum(np.abs(np.diff(np.sign(pcm))) > 0)))
    return pd.DataFrame(out)


@F.pandas_udf(VIDEO_FEATURES_SCHEMA)
def video_features_udf(data: pd.Series) -> pd.DataFrame:
    """binary video → (frame count, per-sampled-frame pHashes)."""
    from feature_store_spark.functions.images import phash64

    out = {"n_frames": [], "sampled_frame_phashes": []}
    for buf in data:
        if buf is None:
            out["n_frames"].append(None)
            out["sampled_frame_phashes"].append(None)
            continue
        frames = fake_decode_video_frames(bytes(buf))
        out["n_frames"].append(len(frames))
        out["sampled_frame_phashes"].append(
            [phash64(f) for f in frames[:: max(len(frames) // 3, 1)]]
        )
    return pd.DataFrame(out)


def with_audio_features(df, bytes_col: str = "audio_bytes"):
    """Attach audio features and DROP the payload before any shuffle."""
    keep = [c for c in df.columns if c != bytes_col]
    return df.withColumn("__a", audio_features_udf(F.col(bytes_col))).select(
        *keep, "__a.*"
    )


def with_video_features(df, bytes_col: str = "video_bytes"):
    """Attach video features and DROP the payload before any shuffle."""
    keep = [c for c in df.columns if c != bytes_col]
    return df.withColumn("__v", video_features_udf(F.col(bytes_col))).select(
        *keep, "__v.*"
    )
