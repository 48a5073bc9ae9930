"""Image payload codec + invariants (SURVEY.md F16, BASELINE.json input_hint).

The corpus table carries ``(image_id, bytes, w, h, fmt, caption,
phash)``.  The container has no image libraries (no PIL/libjpeg), so
the *codec* here is a deterministic stand-in with the same contract a
real one would have:

* ``fmt='png'``  — lossless: zlib-compressed raw RGB.
* ``fmt='jpeg'`` — lossy: uniform quantization (step 4) then zlib;
  decode dequantizes to bin centers.  Max per-channel error 2 →
  PSNR ≥ 40 dB guaranteed, which is exactly the input_hint invariant
  for lossy formats.
* ``fmt='webp'`` — lossy: quantization step 2 (higher quality).

A real deployment swaps ``encode_image``/``decode_image`` for
PIL/turbojpeg behind the same signatures — the Spark-side plumbing
(binary column, Arrow batches, ``mapInPandas`` shape) is identical.
``decode_image_real`` marks that seam and raises ``NotImplementedError``
when PIL is absent.

All math is numpy over whole Arrow batches — no per-row Python in the
Spark path beyond the per-cell loop inside the vectorized wrappers
(bodies are opaque variable-length blobs; numpy handles the pixels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"SBIM"
_QUANT = {"png": 1, "jpeg": 4, "webp": 2}


def _pixels_for_id(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixels derived from the image id (seeded)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. Deterministic."""
    q = _QUANT[fmt]
    h, w, _ = pixels.shape
    if q == 1:
        payload = pixels.tobytes()
    else:
        payload = (pixels // q).astype(np.uint8).tobytes()
    body = zlib.compress(payload, level=6)
    header = _MAGIC + struct.pack("<HHB", w, h, q)
    return header + body


def decode_image(data: bytes) -> np.ndarray:
    """Decode to (h, w, 3) uint8. Lossy fmts return bin centers."""
    if data[:4] != _MAGIC:
        raise ValueError("not an SBIM payload")
    w, h, q = struct.unpack("<HHB", data[4:9])
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
    px = raw.reshape(h, w, 3)
    if q > 1:
        px = (px.astype(np.uint16) * q + q // 2).clip(0, 255).astype(np.uint8)
    return px


def decode_image_real(data: bytes) -> np.ndarray:  # pragma: no cover
    """Seam for a real decoder (PIL). Not available in this container."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode needs PIL; use decode_image (deterministic codec)"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash over an 8×8 downsample of the gray image.

    Signed int64 (Spark LongType has no unsigned variant).
    """
    gray = pixels.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    # block-mean downsample to 8×8 (pad to a multiple of 8 by edge-repeat)
    ph = (-h) % 8
    pw = (-w) % 8
    if ph or pw:
        gray = np.pad(gray, ((0, ph), (0, pw)), mode="edge")
    bh, bw = gray.shape[0] // 8, gray.shape[1] // 8
    small = gray.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (small > small.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------------------
# Vectorized wrappers
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def phash_udf(data: pd.Series) -> pd.Series:
    return data.map(lambda b: phash64(decode_image(b)))


@F.pandas_udf(T.DoubleType())
def psnr_vs_oracle_udf(data: pd.Series, image_id: pd.Series,
                       w: pd.Series, h: pd.Series) -> pd.Series:
    """PSNR of the decoded payload vs the oracle (regenerated) pixels.

    This is the per-row invariant check from BASELINE.json input_hint:
    ≥40 dB for lossy formats, inf for lossless.
    """
    out = np.empty(len(data), dtype=np.float64)
    for i, (blob, iid, ww, hh) in enumerate(
        zip(data.values, image_id.values, w.values, h.values)
    ):
        decoded = decode_image(blob)
        oracle = _pixels_for_id(iid, int(ww), int(hh))
        out[i] = psnr(oracle, decoded)
    return pd.Series(out)


def decode_stats_schema() -> T.StructType:
    return T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("mean_lum", T.DoubleType()),
    ])


def decode_stats(df):
    """mapInPandas operator: decode binary payloads → per-image stats.

    Demonstrates the multimodal plumbing shape: opaque binary column in,
    typed feature columns out, whole Arrow batches, no driver collect.
    """
    def _batches(it):
        for pdf in it:
            n = len(pdf)
            phs = np.empty(n, dtype=np.int64)
            ps = np.empty(n, dtype=np.float64)
            lum = np.empty(n, dtype=np.float64)
            for i, (blob, iid, ww, hh) in enumerate(
                zip(pdf["bytes"], pdf["image_id"], pdf["w"], pdf["h"])
            ):
                px = decode_image(blob)
                phs[i] = phash64(px)
                ps[i] = psnr(_pixels_for_id(iid, int(ww), int(hh)), px)
                lum[i] = float(px.mean())
            yield pd.DataFrame({
                "image_id": pdf["image_id"],
                "w": pdf["w"].astype("int32"),
                "h": pdf["h"].astype("int32"),
                "fmt": pdf["fmt"],
                "phash": phs,
                "psnr_db": ps,
                "mean_lum": lum,
            })

    return df.mapInPandas(_batches, schema=decode_stats_schema())
