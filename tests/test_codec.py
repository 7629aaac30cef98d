"""Codec invariants from BASELINE.json input_hint: bitwise for lossless,
PSNR >= 40 dB for lossy, exact caption round-trip through the pipeline."""

import numpy as np

from ecg_feature_engineering_ray.functions.codec import (
    decode_image,
    encode_image,
    mean_luminance,
    phash64,
    psnr,
    resize_nearest,
)


def _img(seed=0, h=48, w=64):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_bitwise_roundtrip():
    px = _img(1)
    dec, fmt = decode_image(encode_image(px, "png"))
    assert fmt == "png"
    assert np.array_equal(dec, px)


def test_jpeg_psnr_at_least_40db():
    for seed in range(5):
        px = _img(seed)
        dec, fmt = decode_image(encode_image(px, "jpeg"))
        assert fmt == "jpeg"
        assert psnr(px, dec) >= 40.0, psnr(px, dec)


def test_decode_is_deterministic():
    px = _img(7)
    b1 = encode_image(px, "jpeg")
    b2 = encode_image(px, "jpeg")
    assert b1 == b2
    d1, _ = decode_image(b1)
    d2, _ = decode_image(b2)
    assert np.array_equal(d1, d2)


def test_phash_and_luminance_stable():
    px = _img(3)
    assert phash64(px) == phash64(px.copy())
    assert 0.0 <= mean_luminance(px) <= 1.0


def test_resize_shapes():
    px = _img(4, 64, 64)
    out = resize_nearest(px, 32, 16)
    assert out.shape == (32, 16, 3)
