"""Multimodal column plumbing: image / audio / video as opaque binary
columns with typed metadata (task brief).

The container has no media libraries, so the *decoders* are
deterministic fakes or clearly-marked stubs — but the Spark-side
plumbing is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning of large binary columns.

Real deployments replace the ``_decode_*`` kernels with
PIL/torchaudio/PyAV behind the same function signatures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .images import decode_image, phash64

_AUD_MAGIC = b"SBAU"
_VID_MAGIC = b"SBVD"


# ---------------------------------------------------------------------------
# Deterministic fake codecs (same contract as real ones)
# ---------------------------------------------------------------------------

def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """Fake audio container: int16 PCM + zlib."""
    head = _AUD_MAGIC + struct.pack("<II", sample_rate, len(samples))
    return head + zlib.compress(samples.astype("<i2").tobytes(), 6)


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != _AUD_MAGIC:
        raise ValueError("not an SBAU payload")
    sr, n = struct.unpack("<II", data[4:12])
    pcm = np.frombuffer(zlib.decompress(data[12:]), dtype="<i2")[:n]
    return pcm, sr


def decode_audio_real(data: bytes):  # pragma: no cover
    """Seam for a real decoder (soundfile/torchaudio) — unavailable."""
    raise NotImplementedError(
        "real audio decode needs soundfile/ffmpeg; use decode_audio"
    )


def encode_video(frames: np.ndarray, fps: int) -> bytes:
    """Fake video container: n_frames × h × w × 3 uint8 + zlib."""
    n, h, w, _ = frames.shape
    head = _VID_MAGIC + struct.pack("<IHHB", n, w, h, fps)
    return head + zlib.compress(frames.tobytes(), 6)


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != _VID_MAGIC:
        raise ValueError("not an SBVD payload")
    n, w, h, fps = struct.unpack("<IHHB", data[4:13])
    raw = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    return raw.reshape(n, h, w, 3), fps


def decode_video_real(data: bytes):  # pragma: no cover
    """Seam for a real decoder (PyAV/ffmpeg) — unavailable."""
    raise NotImplementedError("real video decode needs PyAV; use decode_video")


# ---------------------------------------------------------------------------
# Spark operators (mapInPandas over binary columns)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("phash", T.LongType()),
    T.StructField("mean_rgb", T.ArrayType(T.DoubleType())),
])


def image_features(df: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Decode + feature-extract images per Arrow batch."""
    def _k(it):
        for pdf in it:
            ids, ws, hs, phs, means = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                px = decode_image(bytes(blob))
                ids.append(i)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                phs.append(phash64(px))
                means.append([float(x) for x in px.mean(axis=(0, 1))])
            yield pd.DataFrame({
                "id": ids,
                "w": pd.array(ws, dtype="int32"),
                "h": pd.array(hs, dtype="int32"),
                "phash": pd.array(phs, dtype="int64"),
                "mean_rgb": means,
            })

    return df.mapInPandas(_k, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  id_col: str = "image_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """Nearest-neighbor resize → re-encoded (lossless) payloads."""
    from .images import encode_image

    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ])

    def _k(it):
        for pdf in it:
            ids, blobs = [], []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                px = decode_image(bytes(blob))
                ys = (np.arange(out_h) * px.shape[0] // out_h)
                xs = (np.arange(out_w) * px.shape[1] // out_w)
                small = px[ys][:, xs]
                ids.append(i)
                blobs.append(encode_image(small, "png"))
            yield pd.DataFrame({
                "id": ids, "bytes": blobs,
                "w": pd.array([out_w] * len(ids), dtype="int32"),
                "h": pd.array([out_h] * len(ids), dtype="int32"),
            })

    return df.mapInPandas(_k, schema=schema)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_sec", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
])


def audio_features(df: DataFrame, id_col: str = "audio_id",
                   bytes_col: str = "bytes") -> DataFrame:
    def _k(it):
        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                pcm, sr = decode_audio(bytes(blob))
                rows.append((
                    i, sr, len(pcm), len(pcm) / sr,
                    float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))),
                ))
            yield pd.DataFrame(
                rows, columns=["id", "sample_rate", "n_samples",
                               "duration_sec", "rms"],
            ).astype({"sample_rate": "int32", "n_samples": "int64"})

    return df.mapInPandas(_k, schema=AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_phash", T.LongType()),
])


def sample_video_frames(df: DataFrame, every_n: int = 2,
                        id_col: str = "video_id",
                        bytes_col: str = "bytes") -> DataFrame:
    """Frame-sample: one output row per kept frame (1:N fan-out)."""
    def _k(it):
        for pdf in it:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                frames, _fps = decode_video(bytes(blob))
                for j in range(0, len(frames), every_n):
                    rows.append((i, j, phash64(frames[j])))
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "frame_phash"]
            ).astype({"frame_idx": "int32", "frame_phash": "int64"})

    return df.mapInPandas(_k, schema=FRAME_SAMPLE_SCHEMA)
