"""Image codec invariants (BASELINE.json input_hint): decoded-pixel
allclose / PSNR ≥ 40 dB for lossy formats, exact caption equality."""

import math

import numpy as np

from starbelly_spark.functions.images import (
    _pixels_for_id,
    decode_image,
    encode_image,
    phash64,
    psnr,
)
from starbelly_spark.sources.synthetic_web import WebConfig, fetch_one, image_meta


def test_png_lossless_roundtrip():
    px = _pixels_for_id("img_0_3", 20, 20)
    blob = encode_image(px, "png")
    assert np.array_equal(decode_image(blob), px)
    assert psnr(px, decode_image(blob)) == math.inf


def test_lossy_psnr_at_least_40db():
    for fmt in ("jpeg", "webp"):
        px = _pixels_for_id(f"x_{fmt}", 32, 24)
        dec = decode_image(encode_image(px, fmt))
        assert psnr(px, dec) >= 40.0, fmt
        # allclose within the quantization step
        assert np.max(np.abs(px.astype(int) - dec.astype(int))) <= 2


def test_phash_deterministic_and_sensitive():
    a = _pixels_for_id("a", 32, 32)
    b = _pixels_for_id("b", 32, 32)
    assert phash64(a) == phash64(a)
    assert phash64(a) != phash64(b)
    # lossy encode must not change the phash (perceptual stability)
    assert phash64(decode_image(encode_image(a, "jpeg"))) == phash64(a)


def test_fetch_image_page_carries_caption_and_phash():
    cfg = WebConfig(n_hosts=4, total_pages=200)
    # page 3 on host 1 is an image page (page % 7 == 3)
    r = fetch_one(cfg, "http://h1.example/p3")
    image_id, w, h, fmt, caption = image_meta(cfg, 1, 3)
    assert r["image_id"] == image_id
    assert r["caption"] == caption
    if r["status_code"] == 200:
        px = decode_image(r["body"])
        oracle = _pixels_for_id(image_id, w, h)
        assert psnr(oracle, px) >= 40.0
        assert r["phash"] == phash64(oracle)


def test_fetch_deterministic():
    cfg = WebConfig()
    a = fetch_one(cfg, "http://h0.example/p0")
    b = fetch_one(cfg, "http://h0.example/p0")
    assert a == b
