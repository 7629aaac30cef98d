"""Deterministic image codec (PIL-free container stand-in).

The north-star input table carries images as opaque ``bytes`` with a ``fmt``
column ('png' = lossless, 'jpeg' = lossy).  Real PNG/JPEG libraries are not
in this container, so the engine ships its own deterministic codec with the
SAME invariant surface the spec demands (BASELINE.json input_hint):

- fmt='png'  → zlib-compressed raw RGB; decode is **bitwise** exact.
- fmt='jpeg' → quantized (step=2) + zlib; decode is lossy with
  **PSNR ≥ 40 dB** guaranteed (uniform quantization error ≤ 1 LSB →
  MSE ≤ 1/3 → PSNR ≥ 10·log10(255²·3) ≈ 53 dB).

Container layout (little-endian): magic ``b'EFR1'`` | fmt u8 (0=png,1=jpeg)
| h u16 | w u16 | zlib(payload).  The codec is the pluggable seam where a
real image library would slot in (see stages/decode.py).

Reference analog: WFDB/.mat signal loading + ADC-gain normalization
(/root/reference/resample.py:10-52, extract_HRV.py:29-33).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"EFR1"
_FMT_CODE = {"png": 0, "jpeg": 1}
_FMT_NAME = {0: "png", 1: "jpeg"}
JPEG_QUANT_STEP = 2
# The uint8 re-quantization below ((p//q)*q + q//2) is overflow-free only
# when the top bin's center fits in a byte; q=2 satisfies it, but e.g. q=5
# gives 255+2=257 and would WRAP in uint8.  Guard statically so a future
# constant change fails at import, not by corrupting payloads.
assert (255 // JPEG_QUANT_STEP) * JPEG_QUANT_STEP + JPEG_QUANT_STEP // 2 <= 255, (
    "JPEG_QUANT_STEP would overflow uint8 re-quantization — widen the dtype"
)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. 'png' lossless, 'jpeg' lossy (quantized)."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w, _ = pixels.shape
    if fmt == "jpeg":
        q = JPEG_QUANT_STEP
        # uint8 arithmetic: (p//q)*q + q//2 ≤ 255 — no int32 temporary
        payload = (pixels // q) * q + q // 2
    elif fmt == "png":
        payload = pixels
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    header = MAGIC + struct.pack("<BHH", _FMT_CODE[fmt], h, w)
    return header + zlib.compress(payload.tobytes(), level=1)


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode container bytes → ((h, w, 3) uint8 pixels, fmt name)."""
    if data[:4] != MAGIC:
        raise ValueError("bad magic — not an EFR1 container")
    code, h, w = struct.unpack("<BHH", data[4:9])
    raw = zlib.decompress(data[9:])
    pixels = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    return pixels, _FMT_NAME[code]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images.

    Integer diff/square (exact in int32), f64 accumulator only — avoids
    full-image float64 temporaries (DRAM-bandwidth ceiling under 24-way
    actor concurrency; bitwise-identical result)."""
    d = a.astype(np.int16) - b
    mse = np.mean(d.astype(np.int32) ** 2, dtype=np.float64)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def _channel_sums(pixels: np.ndarray) -> tuple[int, int, int]:
    """Exact per-channel int sums via three strided slice reductions — ~8×
    faster than ``mean(axis=(0,1))`` (strided pairwise-float reduce) for the
    same exact integers (uint8 sums fit int64)."""
    f = pixels.reshape(-1, 3)
    return (int(f[:, 0].sum(dtype=np.int64)),
            int(f[:, 1].sum(dtype=np.int64)),
            int(f[:, 2].sum(dtype=np.int64)))


def mean_luminance(pixels: np.ndarray) -> float:
    """Derived scalar channel v = mean(pixels)/255 — the stand-in 'signal value'
    every reference statistic replays over (FIXTURES.md F1)."""
    return float(pixels.mean() / 255.0)


def channel_means(pixels: np.ndarray) -> tuple[float, float, float]:
    """Per-channel derived scalars (R, G, B mean / 255) — the multi-channel
    analog of the reference's 12 per-lead signals (extract_LONG.py:46-51):
    each channel is an independent series every v-based statistic replays
    over.  Exact: uint8 sums are integers in float64, and the division
    sequence (S/(h·w), then /255) matches the previous float-mean form
    BITWISE (test_codec has the identity gate)."""
    n = pixels.shape[0] * pixels.shape[1]
    s = _channel_sums(pixels)
    return float(s[0] / n / 255.0), float(s[1] / n / 255.0), float(s[2] / n / 255.0)


def derive_scalars(pixels: np.ndarray) -> tuple[float, float, float, float]:
    """(v, v_r, v_g, v_b) in ONE integer pass — the decode stage's hot
    kernel (previously two strided float-mean passes per image).  Bitwise
    equal to ``(mean_luminance(px), *channel_means(px))``: all sums are
    exact integers in float64 and the division sequences are identical."""
    n = pixels.shape[0] * pixels.shape[1]
    s0, s1, s2 = _channel_sums(pixels)
    return (
        float((s0 + s1 + s2) / (n * 3) / 255.0),
        float(s0 / n / 255.0),
        float(s1 / n / 255.0),
        float(s2 / n / 255.0),
    )


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual-hash stand-in: 8×8 mean-threshold bitmap of the
    downsampled grayscale image (aHash — public algorithm).

    The grayscale plane is built as (R+G+B in uint16)/3.0 — bitwise equal to
    ``mean(axis=2, dtype=f64)`` (3-element sums are exact in both) at ~5×
    the speed; the block means stay on the float64 path so the hash value is
    unchanged vs every stored fixture phash."""
    h, w, _ = pixels.shape
    g = (pixels[:, :, 0].astype(np.uint16) + pixels[:, :, 1] + pixels[:, :, 2]) / 3.0
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    g = g[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (g > g.mean()).astype(np.uint64).ravel()
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    val = np.uint64(np.bitwise_or.reduce(bits * weights))
    return int(val.astype(np.int64))  # signed int64 for the Arrow column


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (multimodal transform stage)."""
    h, w, _ = pixels.shape
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ri][:, ci]
