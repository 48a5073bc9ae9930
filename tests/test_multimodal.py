"""Multimodal plumbing: binary columns through mapInPandas — schemas,
fan-out shapes, deterministic codecs, stubbed real decoders."""

import numpy as np
import pytest

from starbelly_spark.functions.images import _pixels_for_id, encode_image
from starbelly_spark.functions.multimodal import (
    audio_features,
    decode_audio,
    decode_audio_real,
    decode_video,
    decode_video_real,
    encode_audio,
    encode_video,
    image_features,
    resize_images,
    sample_video_frames,
)


def test_audio_roundtrip():
    pcm = (np.sin(np.linspace(0, 100, 8000)) * 20000).astype(np.int16)
    out, sr = decode_audio(encode_audio(pcm, 16000))
    assert sr == 16000 and np.array_equal(out, pcm)


def test_video_roundtrip():
    rng = np.random.Generator(np.random.PCG64(1))
    frames = rng.integers(0, 256, size=(6, 8, 10, 3), dtype=np.uint8)
    out, fps = decode_video(encode_video(frames, 24))
    assert fps == 24 and np.array_equal(out, frames)


def test_real_decoders_are_marked_stubs():
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"x")
    with pytest.raises(NotImplementedError):
        decode_video_real(b"x")


def test_image_features_and_resize(spark):
    rows = [
        (f"img{i}", encode_image(_pixels_for_id(f"img{i}", 20, 16), "png"))
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    feats = image_features(df).collect()
    assert len(feats) == 5
    assert all(r.w == 20 and r.h == 16 and len(r.mean_rgb) == 3
               for r in feats)

    small = resize_images(df, 8, 8).collect()
    assert all(r.w == 8 and r.h == 8 for r in small)
    from starbelly_spark.functions.images import decode_image

    assert decode_image(bytes(small[0].bytes)).shape == (8, 8, 3)


def test_audio_features(spark):
    pcm = (np.ones(4000) * 1000).astype(np.int16)
    df = spark.createDataFrame(
        [("a1", encode_audio(pcm, 8000))], "audio_id string, bytes binary"
    )
    r = audio_features(df).collect()[0]
    assert r.sample_rate == 8000 and r.n_samples == 4000
    assert r.duration_sec == 0.5 and abs(r.rms - 1000.0) < 1e-6


def test_video_frame_sampling_fanout(spark):
    rng = np.random.Generator(np.random.PCG64(2))
    frames = rng.integers(0, 256, size=(10, 8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("v1", encode_video(frames, 30))], "video_id string, bytes binary"
    )
    out = sample_video_frames(df, every_n=3).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [
        0, 3, 6, 9
    ]
