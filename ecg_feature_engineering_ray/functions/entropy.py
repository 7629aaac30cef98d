"""Sample-entropy kernels (pure numpy).

Two variants mirroring the reference:

- :func:`sampen_hrv` — the HRV extractor's SampEn (m=2, r=0.2·σ) returning a
  2-vector with the reference's sentinel substitutions NaN→-2, Inf→-1
  (/root/reference/HRV_features.py:133-140).
- :func:`sampen2` — the full estimator with per-m match counts (m up to 3,
  r=0.2, optional normalization), the reference's largest single kernel
  (/root/reference/QRS_features.py:59-246); wrapper semantics of ``SampleEn``
  (None→100, short series→zeros, /root/reference/QRS_features.py:305-322).

Both are O(n²) per entity — callers cap the series length (``max_n``) to
bound worst-case work on hot entities; the cap is part of the engine spec
and is applied identically in the test oracle.
"""

from __future__ import annotations

import numpy as np


def _count_matches(x: np.ndarray, m: int, r: float) -> int:
    """Number of pairs i<j whose length-m templates are Chebyshev-within r.

    Diagonal sweep: for pair offset d, the boolean vector
    ``v[i] = |x[i] - x[i+d]| <= r`` answers every pair on that diagonal at
    once, and a length-m template match is just m consecutive Trues —
    m-1 shifted ANDs.  Working set is O(n) (a few KB), so 32 concurrent
    SampEn workers stay cache-resident instead of sharing 2 MB 3-D
    temporaries through L3/DRAM (the old row-blocked kernel lost ~20%
    per-core throughput at 32-way).  Counts are exact — identical float
    comparisons, no reordering."""
    n = x.size
    n_t = n - m + 1
    if n_t <= 1:
        return 0
    total = 0
    for d in range(1, n_t):
        v = np.abs(x[: n - d] - x[d:]) <= r
        w = v
        for k in range(1, m):
            w = w[: v.size - k] & v[k:]
        total += int(np.count_nonzero(w[: n_t - d]))
    return total


def sampen_hrv(x: np.ndarray, m: int = 2, r_frac: float = 0.2, max_n: int = 3000) -> np.ndarray:
    """SampEn at template lengths m and m+1 with HRV sentinels.

    Returns [sampen_m, sampen_m1]; NaN→-2.0, +Inf→-1.0 as the reference does
    (/root/reference/HRV_features.py:135-139).
    """
    x = np.asarray(x, dtype=np.float64)[:max_n]
    out = np.full(2, -2.0)
    if x.size < m + 2:
        return out
    r = r_frac * x.std()
    bm = _count_matches(x, m, r)          # matches at length m
    am = _count_matches(x, m + 1, r)      # matches at length m+1
    b1 = _count_matches(x, m - 1, r) if m >= 2 else bm
    vals = []
    # sampen at lengths m and m+1: -ln(matches_len+1 / matches_len)
    for num, den in ((bm, b1), (am, bm)):
        if den == 0:
            vals.append(np.nan)
        elif num == 0:
            vals.append(np.inf)
        else:
            vals.append(-np.log(num / den))
    arr = np.array(vals, dtype=np.float64)
    arr[np.isnan(arr)] = -2.0
    arr[np.isinf(arr)] = -1.0
    return arr


def sampen2(x: np.ndarray, mm: int = 3, r: float = 0.2, normalize: bool = False,
            max_n: int = 2000) -> list[list[float | None]]:
    """Per-m sample entropy table [[m, sampen, stderr-ish], ...] for m=0..mm.

    Mirrors the output contract of the reference's ``sampen2``
    (/root/reference/QRS_features.py:59-246): entropy is None when no
    matches exist at that template length (the caller substitutes 100,
    /root/reference/QRS_features.py:317).
    """
    x = np.asarray(x, dtype=np.float64)[:max_n]
    n = x.size
    if normalize and n:
        s = x.std()
        x = (x - x.mean()) / s if s else x - x.mean()
    out: list[list[float | None]] = []
    prev = None
    for m in range(mm + 1):
        cnt = _count_matches(x, m + 1, r) if n >= m + 1 else 0
        if m == 0:
            out.append([0, None, None])
            prev = cnt
            continue
        if prev and cnt:
            e = -np.log(cnt / prev)
            out.append([m, float(e), float(1.0 / np.sqrt(max(cnt, 1)))])
        else:
            out.append([m, None, None])
        prev = cnt
    return out


def sample_entropy_feature(x: np.ndarray, mm: int = 3, r: float = 0.2) -> np.ndarray:
    """``SampleEn`` wrapper semantics: 100 for None, zeros when too short
    (/root/reference/QRS_features.py:305-322). Returns mm values (m=1..mm)."""
    if x.size < 5:
        return np.zeros(mm)
    table = sampen2(x, mm=mm, r=r)
    out = np.empty(mm)
    for m in range(1, mm + 1):
        e = table[m][1]
        out[m - 1] = 100.0 if e is None else e
    return out
