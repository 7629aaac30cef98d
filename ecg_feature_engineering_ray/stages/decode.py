"""Image decode/validate stage — stateful actor pool.

The canonical ``map_batches(Cls, concurrency=N)`` stage: per-actor setup in
``__init__`` (codec tables, invariant thresholds — the seam where a real
image library / model would load once per worker, reference analog
/root/reference/challenge2020/get_model.py:11-17), per-batch vectorized work
in ``__call__``.

Input: the raw event table (input_hint schema).  Output: the SHUFFLE-SAFE
projection — ``bytes`` is decoded, validated and REDUCED to derived scalar
channels here so the image payload never enters a shuffle (SURVEY.md §7.4):

    image_id, ts, caption, phash, fmt, w, h,
    v              — mean decoded luminance in [0,1]  (the 'signal value')
    v_r, v_g, v_b  — per-channel means (≙ the reference's 12 per-lead
                     signals, extract_LONG.py:46-51 — one derived series per
                     channel for multi-channel feature families)
    psnr_ok  — per-row invariant: bitwise roundtrip (png) / PSNR≥40 dB (jpeg)

Rows failing decode are dropped and counted (reference analog: error-index
accumulators, preprocess-300hz.py:188-288).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions.codec import decode_image, derive_scalars, encode_image, phash64, psnr
from ..functions.text import hamming64

PSNR_MIN_DB = 40.0
PHASH_MAX_HAMMING_LOSSY = 6  # aHash bits near the mean can flip under quantization


class DecodeValidate:
    """Actor-pool callable: decode ``bytes``, validate invariants, derive v.

    Per-row checks (input_hint invariants): container decodes; lossless rows
    round-trip bitwise / lossy rows within PSNR bound; the stored ``phash``
    matches the aHash recomputed from the decoded pixels (content-integrity
    check — a corrupted payload with an intact header fails here).
    """

    def __init__(self, psnr_min_db: float = PSNR_MIN_DB, verify_phash: bool = True,
                 verify_roundtrip: bool = True):
        self.psnr_min_db = psnr_min_db
        self.verify_phash = verify_phash
        # re-encode roundtrip proves CANONICAL encoding — an extra invariant
        # beyond corruption detection (zlib's adler32 already fails loudly on
        # corrupt payloads at decode).  It costs a full zlib compress per
        # image (>50% of stage CPU), so throughput pipelines disable it and
        # rely on decode + phash content verification (the reference's load
        # path has no roundtrip either, resample.py:10-52).
        self.verify_roundtrip = verify_roundtrip
        self.n_bad = 0  # per-actor error accumulator (emitted in stats stage)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        stored_ph = np.asarray(batch.column("phash").combine_chunks())
        v = np.empty(len(blobs))
        vr = np.empty(len(blobs))
        vg = np.empty(len(blobs))
        vb = np.empty(len(blobs))
        ok = np.zeros(len(blobs), dtype=bool)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            try:
                px, dec_fmt = decode_image(blob)
                v[i], vr[i], vg[i], vb[i] = derive_scalars(px)
                if not self.verify_roundtrip:
                    ok[i] = dec_fmt == fmt
                elif fmt == "png":
                    # lossless: re-encode must be byte-identical
                    ok[i] = dec_fmt == "png" and encode_image(px, "png") == blob
                else:
                    # lossy: decode(encode(decode)) within PSNR bound
                    px2, _ = decode_image(encode_image(px, "jpeg"))
                    ok[i] = dec_fmt == "jpeg" and psnr(px, px2) >= self.psnr_min_db
                if ok[i] and self.verify_phash:
                    ph = phash64(px)
                    if fmt == "png":
                        ok[i] = ph == int(stored_ph[i])
                    else:  # lossy: decoded pixels may flip near-threshold bits
                        ok[i] = hamming64(ph, int(stored_ph[i])) <= PHASH_MAX_HAMMING_LOSSY
            except Exception:
                v[i] = np.nan
                self.n_bad += 1
        keep = ~np.isnan(v)
        out = pa.table(
            {
                "image_id": batch.column("image_id"),
                "ts": batch.column("ts"),
                "caption": batch.column("caption"),
                "phash": batch.column("phash"),
                "fmt": batch.column("fmt"),
                "w": batch.column("w"),
                "h": batch.column("h"),
                "v": pa.array(v, pa.float64()),
                "v_r": pa.array(vr, pa.float64()),
                "v_g": pa.array(vg, pa.float64()),
                "v_b": pa.array(vb, pa.float64()),
                "psnr_ok": pa.array(ok),
            }
        )
        return out.filter(pa.array(keep))


def decode_stage(
    ds: Dataset,
    concurrency: int | tuple[int, int] = (2, 8),
    batch_size: int = 1024,
    num_cpus: float = 1.0,
    verify_roundtrip: bool = True,
) -> Dataset:
    """Attach the decode/validate actor pool.  ``batch_size`` bounds the
    binary payload held per task (~1024 rows × ≤50 KB ≈ 50 MB); the OUTPUT
    blocks are tiny (bytes dropped), so downstream stages should coalesce
    before a shuffle (see partition.grouped_sorted_apply pre_shuffle_blocks)."""
    return ds.map_batches(
        DecodeValidate,
        fn_constructor_kwargs={"verify_roundtrip": verify_roundtrip},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=num_cpus,
    )
