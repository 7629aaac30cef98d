"""Discrete wavelet transform in pure numpy (db6 / db7).

Re-statement of the reference's wavelet usage — denoising filter
(``WTfilt_1d``: db6 5-level decomposition, zero D1/D2/A5, reconstruct,
/root/reference/utils.py:66-79) and per-sub-band statistics (``WaveletStat``:
db7 7-level, max/min/mean/median/std/energy-per-length per band,
/root/reference/LONG_features.py:243-262).

pywt is not in this container, so the DWT is implemented directly with the
published Daubechies filter coefficients and **periodic** signal extension
(pywt ``mode='periodization'`` semantics: each level halves the length
exactly).  The engine and the single-threaded test oracle share this spec.
"""

from __future__ import annotations

import numpy as np

# Published Daubechies orthonormal scaling filters (||lo|| = 1, sum = sqrt(2)).
_DB_LO = {
    6: np.array([
        0.11154074335008017, 0.4946238903983854, 0.7511339080215775, 0.3152503517092432,
        -0.22626469396516913, -0.12976686756709563, 0.09750160558707936, 0.02752286553001629,
        -0.031582039318031156, 0.0005538422009938016, 0.004777257511010651, -0.00107730108499558,
    ]),
    7: np.array([
        0.07785205408506236, 0.39653931948230575, 0.7291320908465551, 0.4697822874053586,
        -0.14390600392910627, -0.22403618499416572, 0.07130921926705004, 0.0806126091510659,
        -0.03802993693503463, -0.01657454163101562, 0.012550998556013784, 0.00042957797300470274,
        -0.0018016407039998328, 0.0003537138000010399,
    ]),
}


def _filters(order: int) -> tuple[np.ndarray, np.ndarray]:
    lo = _DB_LO[order]
    k = np.arange(lo.size)
    hi = ((-1.0) ** k) * lo[::-1]
    return lo, hi


def _dwt_period(x: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One DWT level, periodic boundary: a_k = Σ_i lo[i]·x[(2k+i) mod n].

    With orthonormal filters this analysis operator is orthogonal, so the
    adjoint (:func:`_idwt_period`) reconstructs exactly — a tested invariant.
    """
    n = x.size
    if n % 2:
        x = np.concatenate([x, x[-1:]])
        n += 1
    L = lo.size
    idx = (2 * np.arange(n // 2)[:, None] + np.arange(L)[None, :]) % n
    X = x[idx]
    return X @ lo, X @ hi


def wavedec(x: np.ndarray, order: int, level: int) -> list[np.ndarray]:
    """[cA_L, cD_L, ..., cD_1] like pywt.wavedec (periodization mode)."""
    lo, hi = _filters(order)
    a = np.asarray(x, dtype=np.float64)
    details: list[np.ndarray] = []
    for _ in range(level):
        if a.size < 2:
            break
        a, d = _dwt_period(a, lo, hi)
        details.append(d)
    return [a] + details[::-1]


def _idwt_period(a: np.ndarray, d: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Adjoint of :func:`_dwt_period`: x[(2k+i) mod n] += lo[i]·a_k + hi[i]·d_k."""
    n = 2 * a.size
    L = lo.size
    out = np.zeros(n)
    idx = (2 * np.arange(a.size)[:, None] + np.arange(L)[None, :]) % n
    np.add.at(out, idx.ravel(), (np.outer(a, lo) + np.outer(d, hi)).ravel())
    return out


def waverec(coeffs: list[np.ndarray], order: int, out_len: int | None = None) -> np.ndarray:
    lo, hi = _filters(order)
    a = coeffs[0]
    for d in coeffs[1:]:
        a = _idwt_period(a[: d.size], d, lo, hi)
    if out_len is not None:
        a = a[:out_len]
    return a


def wt_denoise(x: np.ndarray, order: int = 6, level: int = 5) -> np.ndarray:
    """``WTfilt_1d`` analog: decompose, zero A_L (trend) and D1/D2 (noise),
    reconstruct (/root/reference/utils.py:66-79)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2 ** level:
        return x.copy()
    coeffs = wavedec(x, order, level)
    coeffs[0] = np.zeros_like(coeffs[0])      # approximation (baseline wander)
    for i in (len(coeffs) - 1, len(coeffs) - 2):  # D1, D2 (high-frequency noise)
        if i >= 1:
            coeffs[i] = np.zeros_like(coeffs[i])
    return waverec(coeffs, order, out_len=x.size)


def wavelet_stat(x: np.ndarray, order: int = 7, level: int = 7, min_len: int = 1664) -> np.ndarray:
    """Per-sub-band max,min,mean,median,std,energy/len over (level+1) bands
    → 6·(level+1) features; all-zeros when the series is shorter than
    ``min_len`` (/root/reference/LONG_features.py:243-262)."""
    n_feats = 6 * (level + 1)
    x = np.asarray(x, dtype=np.float64)
    if x.size < min_len:
        return np.zeros(n_feats)
    coeffs = wavedec(x, order, level)
    out = np.zeros(n_feats)
    for i, c in enumerate(coeffs):
        if c.size == 0:
            continue
        out[6 * i : 6 * i + 6] = [
            c.max(), c.min(), c.mean(), np.median(c), c.std(), float((c**2).sum() / c.size),
        ]
    return out


def wavelet_stat_names(level: int = 7) -> list[str]:
    stats = ["max", "min", "mean", "median", "std", "energy"]
    names = []
    for i in range(level + 1):
        band = f"A{level}" if i == 0 else f"D{level + 1 - i}"
        names += [f"wt_{band}_{s}" for s in stats]
    return names
