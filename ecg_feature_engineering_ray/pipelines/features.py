"""The point-in-time feature vector — replaying the reference's per-record
statistics over an entity's event-prefix at an as-of timestamp.

``pit_feature_vector(prefix)`` receives the ts-ordered prefix (all events of
the entity with ts ≤ as_of) as {"ts": µs int array, "v": value array,
"phash": ...} and emits a fixed-length float64 vector named by
``PIT_FEATURE_NAMES``.  The series roles mirror the reference:

- ``u = Δts`` in ms ≙ RR intervals → HRV block (sdnn, max/min/mean RR,
  density, pNN50, RMSSD, SampEn ×2 — /root/reference/HRV_features.py:92-153)
- ``v`` (decoded mean luminance) ≙ signal amplitude → order stats, zero
  crossings, zigzag (/root/reference/LONG_features.py:35-119), Variability /
  CoV / MAD / CDF over u (/root/reference/QRS_features.py:325-538)
- session structure from the 30 s gap rule ≙ beat segmentation
  (/root/reference/extract_SHORT.py:56-95)

The single-threaded test oracle (tests/oracle.py) re-implements this vector
independently; engine output must be np.allclose per (entity, as_of_ts).
"""

from __future__ import annotations

import numpy as np

from ..functions.entropy import sampen_hrv
from ..functions.stats import (
    kurtosis,
    pnn_fraction,
    rmssd,
    skewness,
    zero_crossings,
    zigzag,
)

SESSION_GAP_US = 30_000_000
PNN_THRESH_MS = 50.0
SAMPEN_MAX_N = 400  # O(n²) cap — part of the spec, applied in oracle too

PIT_FEATURE_NAMES = [
    # HRV block over u = Δts ms (9 ≙ HRV_features.py feature set)
    "n_events",
    "sdnn",
    "max_rr",
    "min_rr",
    "mean_rr",
    "r_density",
    "pnn50",
    "rmssd",
    "sampen_1",
    "sampen_2",
    # value-channel block over v
    "v_mean",
    "v_std",
    "v_min",
    "v_max",
    "v_median",
    "v_skew",
    "v_kurt",
    "v_zero_cross",
    "v_zigzag",
    "v_last",
    # session block (gap 30 s)
    "n_sessions",
    "mean_session_len",
    "last_session_len",
]


def make_pit_feature_fn(sampen_max_n: int = SAMPEN_MAX_N):
    """Feature fn with a configurable SampEn series cap.

    The default (400) bounds worst-case O(n²) work for interactive tests;
    reference parity on full-length records (ECG series have thousands of
    beats, /root/reference/QRS_features.py:59-246 runs on all of them) uses a
    higher cap — the scaling benchmark exercises that regime.
    """

    def fn(prefix: dict[str, np.ndarray]) -> np.ndarray:
        return pit_feature_vector(prefix, sampen_max_n=sampen_max_n)

    return fn


def pit_feature_vector(prefix: dict[str, np.ndarray], sampen_max_n: int = SAMPEN_MAX_N) -> np.ndarray:
    ts = np.asarray(prefix["ts"], dtype=np.int64)
    v = np.asarray(prefix["v"], dtype=np.float64)
    n = ts.size
    out = np.full(len(PIT_FEATURE_NAMES), np.nan)
    out[0] = n
    if n == 0:
        return out

    u = np.diff(ts).astype(np.float64) / 1000.0  # Δts in ms ≙ RR intervals
    if u.size:
        du = np.diff(u)
        out[1] = u.std()                                   # sdnn (population, ≙ np.std)
        out[2] = u.max()
        out[3] = u.min()
        out[4] = u.mean()
        span_ms = (ts[-1] - ts[0]) / 1000.0
        out[5] = u.size / span_ms if span_ms > 0 else np.nan   # event density ≙ Rdensity
        out[6] = pnn_fraction(du, PNN_THRESH_MS)           # pNN50 analog
        out[7] = rmssd(du)
        se = sampen_hrv(u, max_n=sampen_max_n)
        out[8], out[9] = se[0], se[1]

    out[10] = v.mean()
    out[11] = v.std()
    out[12] = v.min()
    out[13] = v.max()
    out[14] = np.median(v)
    out[15] = skewness(v)
    out[16] = kurtosis(v)
    out[17] = zero_crossings(v - v.mean())
    out[18] = zigzag(v)
    out[19] = v[-1]

    brk = np.diff(ts) > SESSION_GAP_US
    n_sessions = 1 + int(brk.sum())
    out[20] = n_sessions
    out[21] = n / n_sessions
    last_start = int(np.flatnonzero(brk)[-1] + 1) if brk.any() else 0
    out[22] = n - last_start
    return out
