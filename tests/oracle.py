"""Single-threaded numpy oracle for the flagship PIT feature vector.

INDEPENDENT re-implementation of ecg_feature_engineering_ray.pipelines.
features.pit_feature_vector — plain loops and direct formulas, no engine
stage code — used to verify that the distributed engine computes the same
thing (FIXTURES.md F4).  Only the codec (the data FORMAT) is shared.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ecg_feature_engineering_ray.functions.codec import decode_image

SESSION_GAP_US = 30_000_000
PNN_THRESH_MS = 50.0
SAMPEN_MAX_N = 400


import functools


@functools.lru_cache(maxsize=4)
def decode_events(events_dir: str) -> pd.DataFrame:
    tbl = pq.read_table(events_dir)
    df = tbl.to_pandas()
    vs = []
    for blob in df["bytes"]:
        px, _ = decode_image(blob)
        vs.append(px.mean() / 255.0)
    df["v"] = vs
    return df[["image_id", "ts", "v", "caption", "phash", "fmt"]]


def _sampen_pair(x: np.ndarray, m: int, r: float, max_n: int = SAMPEN_MAX_N) -> list[float]:
    """Explicit O(n²) sample entropy at lengths m and m+1, HRV sentinels.

    Counting uses a direct numpy pairwise-distance broadcast (blocked rows of
    the n×n Chebyshev matrix) — mathematically the textbook definition,
    structurally unlike the engine's diagonal-sweep kernel."""
    x = x[:max_n]
    if x.size < m + 2:
        return [-2.0, -2.0]

    def count(mm: int) -> int:
        n = x.size - mm + 1
        if n < 2:
            return 0
        emb = np.lib.stride_tricks.sliding_window_view(x, mm)  # (n, mm)
        c = 0
        blk = max(1, 2_000_000 // max(1, n * mm))
        for i0 in range(0, n, blk):
            sub = emb[i0 : i0 + blk]
            d = np.abs(sub[:, None, :] - emb[None, :, :]).max(axis=2)
            rows = np.arange(i0, i0 + sub.shape[0])[:, None]
            cols = np.arange(n)[None, :]
            c += int(np.count_nonzero((d <= r) & (cols > rows)))
        return c

    b1 = count(m - 1) if m >= 2 else count(m)
    bm = count(m)
    am = count(m + 1)
    out = []
    for num, den in ((bm, b1), (am, bm)):
        if den == 0:
            out.append(-2.0)  # NaN sentinel
        elif num == 0:
            out.append(-1.0)  # Inf sentinel
        else:
            out.append(-math.log(num / den))
    return out


def oracle_feature_row(ts_us: np.ndarray, v: np.ndarray) -> dict[str, float]:
    """Feature vector for one (entity, as_of) prefix — direct formulas."""
    out: dict[str, float] = {name: float("nan") for name in ORACLE_FEATURE_NAMES}
    n = len(ts_us)
    out["n_events"] = n
    if n == 0:
        return out
    ts_us = np.sort(np.asarray(ts_us, dtype=np.int64))
    v = np.asarray(v, dtype=np.float64)

    u = (ts_us[1:] - ts_us[:-1]) / 1000.0
    if len(u):
        du = u[1:] - u[:-1]
        out["sdnn"] = float(np.sqrt(np.mean((u - u.mean()) ** 2)))
        out["max_rr"] = float(u.max())
        out["min_rr"] = float(u.min())
        out["mean_rr"] = float(u.mean())
        span = (ts_us[-1] - ts_us[0]) / 1000.0
        out["r_density"] = len(u) / span if span > 0 else float("nan")
        out["pnn50"] = (
            float(sum(1 for d in du if abs(d) >= PNN_THRESH_MS)) / len(du) if len(du) else float("nan")
        )
        out["rmssd"] = float(np.sqrt(np.mean(du**2))) if len(du) else float("nan")
        ut = u[:SAMPEN_MAX_N]  # r from the same truncated series the engine uses
        r = 0.2 * float(np.sqrt(np.mean((ut - ut.mean()) ** 2)))
        se = _sampen_pair(u, 2, r)
        out["sampen_1"], out["sampen_2"] = se

    out["v_mean"] = float(v.mean())
    out["v_std"] = float(np.sqrt(np.mean((v - v.mean()) ** 2)))
    out["v_min"] = float(v.min())
    out["v_max"] = float(v.max())
    out["v_median"] = float(np.median(v))
    m2 = float(np.mean((v - v.mean()) ** 2))
    m3 = float(np.mean((v - v.mean()) ** 3))
    m4 = float(np.mean((v - v.mean()) ** 4))
    out["v_skew"] = m3 / m2**1.5 if m2 > 0 else 0.0
    out["v_kurt"] = m4 / m2**2 - 3.0 if m2 > 0 else -3.0

    # zero crossings about the mean — explicit scan, zeros carry prior sign
    c = v - v.mean()
    zc = 0
    prev = 0
    for x in c:
        s = 1 if x > 0 else (-1 if x < 0 else prev)
        if prev != 0 and s != 0 and s != prev:
            zc += 1
        if s != 0:
            prev = s
    out["v_zero_cross"] = zc

    # zigzag — direction changes, flats skipped
    zz = 0
    prev_d = 0
    for i in range(1, len(v)):
        d = 1 if v[i] > v[i - 1] else (-1 if v[i] < v[i - 1] else 0)
        if d != 0:
            if prev_d != 0 and d != prev_d:
                zz += 1
            prev_d = d
    out["v_zigzag"] = zz
    out["v_last"] = float(v[-1])

    sessions = 1
    last_start = 0
    for i in range(1, n):
        if ts_us[i] - ts_us[i - 1] > SESSION_GAP_US:
            sessions += 1
            last_start = i
    out["n_sessions"] = sessions
    out["mean_session_len"] = n / sessions
    out["last_session_len"] = n - last_start
    return out


ORACLE_FEATURE_NAMES = [
    "n_events", "sdnn", "max_rr", "min_rr", "mean_rr", "r_density", "pnn50",
    "rmssd", "sampen_1", "sampen_2",
    "v_mean", "v_std", "v_min", "v_max", "v_median", "v_skew", "v_kurt",
    "v_zero_cross", "v_zigzag", "v_last",
    "n_sessions", "mean_session_len", "last_session_len",
]


def oracle_pit_features(events_dir: str, queries_path: str) -> pd.DataFrame:
    """Brute-force PIT features for every query row."""
    ev = decode_events(events_dir)
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    q = pq.read_table(queries_path).to_pandas()
    q["as_of_us"] = q["as_of_ts"].astype("datetime64[us]").astype("int64")
    rows = []
    for _, row in q.iterrows():
        sub = ev[(ev.image_id == row.image_id) & (ev.ts_us <= row.as_of_us)].sort_values("ts_us")
        feats = oracle_feature_row(sub.ts_us.values, sub.v.values)
        feats["image_id"] = row.image_id
        feats["as_of_ts"] = row.as_of_ts
        rows.append(feats)
    return pd.DataFrame(rows)


def oracle_channel_stats(events_dir: str) -> pd.DataFrame:
    """Independent per-channel stats: decode each blob single-threaded,
    per-event R/G/B means (exact integer sums), per-image mean/min/max."""
    tbl = pq.read_table(events_dir)
    df = tbl.to_pandas()
    for i, ch in enumerate("rgb"):
        vals = []
        for blob in df["bytes"]:
            px, _ = decode_image(blob)
            vals.append(px[:, :, i].astype(np.float64).mean() / 255.0)
        df[f"c_{ch}"] = vals
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    rows = []
    for image_id, g in df.sort_values("ts_us").groupby("image_id"):
        row = {"image_id": image_id, "n_events": len(g)}
        for ch in "rgb":
            x = g[f"c_{ch}"].to_numpy()
            row[f"mean_{ch}"] = x.mean()
            row[f"min_{ch}"] = x.min()
            row[f"max_{ch}"] = x.max()
        rows.append(row)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Independent family-vector oracle (LONG / QRS / SHORT compositions).
# Direct formulas and plain loops — no engine stats/spectral/wavelet code.
# Shared with the engine: numpy primitives (fft, percentile, median) and the
# published db7 coefficients; everything else is re-derived.
# ---------------------------------------------------------------------------

_DB7_LO = np.array([
    0.07785205408506236, 0.39653931948230575, 0.7291320908465551, 0.4697822874053586,
    -0.14390600392910627, -0.22403618499416572, 0.07130921926705004, 0.0806126091510659,
    -0.03802993693503463, -0.01657454163101562, 0.012550998556013784, 0.00042957797300470274,
    -0.0018016407039998328, 0.0003537138000010399,
])


def _o_dwt_level(x):
    """One periodization-mode db7 level via explicit periodic gather."""
    lo = _DB7_LO
    hi = ((-1.0) ** np.arange(lo.size)) * lo[::-1]
    if x.size % 2:
        x = np.concatenate([x, x[-1:]])
    n = x.size
    a = np.empty(n // 2)
    d = np.empty(n // 2)
    for k in range(n // 2):
        seg = x[(2 * k + np.arange(lo.size)) % n]
        a[k] = float(seg @ lo)
        d[k] = float(seg @ hi)
    return a, d


def _o_wavelet_stats(x, level=7, min_len=1664):
    if x.size < min_len:
        return [0.0] * (6 * (level + 1))
    a = x.astype(np.float64)
    details = []
    for _ in range(level):
        if a.size < 2:
            break
        a, d = _o_dwt_level(a)
        details.append(d)
    bands = [a] + details[::-1]
    out = []
    for c in bands:
        out += [c.max(), c.min(), c.mean(), float(np.median(c)), c.std(),
                float((c ** 2).sum() / c.size)]
    out += [0.0] * (6 * (level + 1) - len(out))
    return out


def _o_psd(x, fs=300.0, nfft=None):
    n = x.size
    if n == 0:
        return np.array([0.0]), np.array([0.0])
    if nfft is None or nfft < n:
        nfft = n if nfft is None else nfft
    X = np.fft.rfft(x, n=nfft)
    p = (np.abs(X) ** 2) / (fs * n)
    if nfft % 2 == 0:
        p[1:-1] *= 2
    else:
        p[1:] *= 2
    return np.fft.rfftfreq(nfft, d=1.0 / fs), p


def _o_moments(t):
    m = t.mean()
    m2 = float(np.mean((t - m) ** 2))
    sk = float(np.mean((t - m) ** 3) / m2 ** 1.5) if m2 > 0 else 0.0
    ku = float(np.mean((t - m) ** 4) / m2 ** 2 - 3.0) if m2 > 0 else -3.0
    return m2, sk, ku


def _o_zero_cross(v):
    c = v - v.mean()
    zc, prev = 0, 0
    for x in c:
        s = 1 if x > 0 else (-1 if x < 0 else prev)
        if prev != 0 and s != 0 and s != prev:
            zc += 1
        if s != 0:
            prev = s
    return zc


def _o_zigzag(v):
    zz, prev_d = 0, 0
    for i in range(1, len(v)):
        d = 1 if v[i] > v[i - 1] else (-1 if v[i] < v[i - 1] else 0)
        if d != 0:
            if prev_d != 0 and d != prev_d:
                zz += 1
            prev_d = d
    return zz


def _o_autocorr(v, lags):
    out = []
    for k in range(lags):
        if v.size - k < 2:
            out += [0.0] * (lags - k)
            break
        a, b = v[: v.size - k], v[k:]
        sa = np.sqrt(np.mean((a - a.mean()) ** 2))
        sb = np.sqrt(np.mean((b - b.mean()) ** 2))
        if sa == 0 or sb == 0:
            out.append(0.0)
        else:
            out.append(float(np.mean((a - a.mean()) * (b - b.mean())) / (sa * sb)))
    return out


def oracle_long_vector(v):
    """LONG family (order stats, zero-cross, SNR, total+band power ×3,
    autocorr 12, zigzag ×2, wavelet 48) — direct formulas."""
    ps = np.percentile(v, [1, 5, 10, 25, 75, 90, 95, 99, 50])
    p1, p5, p10, p25, p75, p90, p95, p99, med = ps
    m2, sk, ku = _o_moments(v)
    freqs, pxx = _o_psd(v)
    hi = pxx[freqs >= 5.0].sum()
    lo = pxx[freqs < 5.0].sum()
    snr = float(lo / hi) if hi > 0 else 0.0
    _, pxx_tot = _o_psd(v, nfft=max(4500, v.size))
    bands = (0.0, 1.5, 4.0, 8.0, 20.0, 100.0, 150.0)
    bp = [float(pxx[(freqs >= bands[i]) & (freqs < bands[i + 1])].sum()) for i in range(6)]
    out = [v.max() - v.min(), m2, sk, ku, med, p1, p5, p10, p25, p75, p90, p95, p99,
           p75 - p25, p90 - p10, p95 - p5, p99 - p1,
           float(_o_zero_cross(v)), snr, float(pxx_tot.sum())]
    out += bp * 3
    out += _o_autocorr(v, 12)
    out += [float(_o_zigzag(v))] * 2
    out += _o_wavelet_stats(v, min_len=64)
    return out


def _o_basic(t, trimmed):
    t = t[1:-1] if trimmed else t
    if t.size == 0:
        return [0.0] * (15 if trimmed else 11)
    p5, p25, p75, p95 = np.percentile(t, [5, 25, 75, 95])
    m2, sk, ku = _o_moments(t)
    out = [t.mean()]
    if trimmed:
        out += [60000.0 / t.mean() if t.mean() != 0 else 0.0, float(t.size)]
    out += [float(t.max() - t.min()), m2, sk, ku, float(np.median(t)), float(t.min()),
            float(p5), float(p25), float(p75), float(p95)]
    if trimmed:
        out += [float(p75 - p25), float(p95 - p5)]
        return out
    return out[:11]


def _o_sampen_qrs(u, mm=3, r=0.2):
    """SampleEn wrapper semantics; pair counting by whole pairwise Chebyshev
    matrices (the textbook definition — unlike the engine's diagonal sweep)."""
    if u.size < 5:
        return [0.0] * mm
    x = u[:2000]
    counts = []
    for m in range(1, mm + 2):
        n_t = x.size - m + 1
        if n_t < 2:
            counts.append(0)
            continue
        emb = np.lib.stride_tricks.sliding_window_view(x, m)
        c = 0
        blk = max(1, 4_000_000 // max(1, n_t * m))
        for i0 in range(0, n_t, blk):
            sub = emb[i0 : i0 + blk]
            d = np.abs(sub[:, None, :] - emb[None, :, :]).max(axis=2)
            rows = np.arange(i0, i0 + sub.shape[0])[:, None]
            cols = np.arange(n_t)[None, :]
            c += int(np.count_nonzero((d <= r) & (cols > rows)))
        counts.append(c)
    out = []
    for m in range(1, mm + 1):
        prev, cnt = counts[m - 1], counts[m]
        out.append(float(-math.log(cnt / prev)) if prev and cnt else 100.0)
    return out


def oracle_qrs_vector(ts_us, v):
    u = np.diff(ts_us).astype(np.float64) / 1000.0
    if u.size == 0:
        return [0.0] * len(oracle_qrs_names())
    # 3-point rolling median preprocess
    rm = u.copy()
    for i in range(1, u.size - 1):
        rm[i] = float(np.median(u[i - 1 : i + 2]))
    b1 = _o_basic(u, True)
    b2 = _o_basic(rm, False)
    b3 = _o_basic(np.diff(u[1:-1]) if u.size >= 4 else np.array([]), False)
    # first-match descending two-sided bins on RAW u (QRS_features.py:261-294:
    # edges 240±offset sorted descending, strict `>`)
    bins = []
    for intervals in ([1, 4, 8, 16, 32, 64, 128, 240], [8, 32, 64, 128, 240]):
        edges = sorted([240 + i for i in intervals] + [240 - i for i in intervals],
                       reverse=True)
        cnt = [0] * len(edges)
        for val in u:
            for bi, e in enumerate(edges):
                if val > e:
                    cnt[bi] += 1
                    break
        bins += [float(c) for c in cnt] + [c / u.size for c in cnt]
    # yuxi
    med = float(np.median(u))
    yux = [0.0, 0.0, 0.0]
    if med != 0:
        r = u / med
        yux[0] = float(np.count_nonzero(np.abs(r - 1) <= 0.05)) / u.size
        near2 = np.abs(r - 2) <= 0.1
        if u.size >= 2:
            s2 = (u[:-1] + u[1:]) / med
            hit = np.abs(s2 - 2) <= 0.1
            near2[:-1] |= hit
            near2[1:] |= hit
        yux[1] = float(np.count_nonzero(near2)) / u.size
        yux[2] = float(np.count_nonzero(np.abs(r - 3) <= 0.15000000000000002)) / u.size
    # variability
    var5 = [0.0] * 5
    if u.size >= 3:
        d = np.diff(u)
        var5[0] = float(u.std())
        var5[1] = float(np.count_nonzero(np.abs(d) > 50))
        var5[2] = var5[1] / d.size
        denom = float(np.mean(u[:-1] + u[1:]))
        step = float(np.mean(np.sqrt(d[:-1] ** 2 + d[1:] ** 2))) if d.size >= 2 else 0.0
        var5[3] = step / denom if denom != 0 else 0.0
        if d.size >= 2:
            sd1 = np.sqrt(0.5 * np.var(d))
            sd2sq = 2 * np.var(u) - 0.5 * np.var(d)
            sd2 = np.sqrt(sd2sq) if sd2sq > 0 else 0.0
            var5[4] = float(sd1 / sd2) if sd2 != 0 else 0.0
    # CoV
    t = u[1:-1]
    cov1 = float(t.std() / t.mean()) if t.size and t.mean() != 0 else 0.0
    dt = np.diff(t)
    cov2 = float(dt.std() / dt.mean()) if dt.size and dt.mean() != 0 else 0.0
    mad = float(np.median(np.abs(u - np.median(u)))) if u.size else 0.0
    # CDF mean: 60 bins over [100, 400] (np.histogram edge semantics)
    edges = np.linspace(100.0, 400.0, 61)
    sel = u[(u >= 100.0) & (u <= 400.0)]
    bidx = np.minimum(np.searchsorted(edges, sel, side="right") - 1, 59)
    hist = np.bincount(bidx, minlength=60)
    cdf_mean = float((np.cumsum(hist) / u.size).mean())
    return (b1 + b2 + b3 + bins + yux + var5 + [cov1, cov2, mad, cdf_mean]
            + _o_sampen_qrs(u) + _o_autocorr(u, 3))


def oracle_qrs_names():
    from ecg_feature_engineering_ray.pipelines.feature_families import QRS_NAMES
    return QRS_NAMES


def _o_session_25(ts_seg, sv):
    """25 per-session values, scalar re-derivation (oracle twin of
    feature_families._session_series — same zone definitions, independent
    code path)."""
    import math

    n = len(sv)
    dur_ms = (ts_seg[-1] - ts_seg[0]) / 1000.0

    def zmax(a, b):
        b = min(max(b, a + 1), n)
        best_i, best = a, sv[a]
        for i in range(a, b):
            if sv[i] > best:
                best_i, best = i, sv[i]
        return best_i, float(best)

    def zmin(a, b):
        best_i, best = a, sv[a]
        for i in range(a, b):
            if sv[i] < best:
                best_i, best = i, sv[i]
        return best_i, float(best)

    p_a = math.floor(0.1 * n)
    p_idx, p_pk = zmax(p_a, math.floor(0.2 * n))
    t_a = math.floor(0.4 * n)
    t_idx, t_pk = zmax(t_a, math.floor(0.6 * n))
    r_idx, r_pk = zmax(0, n)
    p_b = min(max(math.floor(0.2 * n), p_a + 1), n)
    if p_b < r_idx:
        q_idx, q_pk = zmin(p_b, r_idx)
    else:
        q_idx = max(r_idx - 1, 0)
        q_pk = float(sv[q_idx])
    t_a_c = min(max(math.floor(0.6 * n), t_a + 1), n)  # noqa: F841  (zone end unused)
    if r_idx < t_a:
        s_idx, s_pk = zmin(r_idx, t_a)
    else:
        s_idx = min(r_idx, n - 1)
        s_pk = float(sv[s_idx])

    area = sum(abs(float(x)) for x in sv[q_idx:r_idx]) + sum(abs(float(x)) for x in sv[r_idx:s_idx])
    qt = float(t_idx - q_idx)
    vent = 60000.0 * max(n - 1, 0) / dur_ms if dur_ms > 0 else 0.0
    seg = sv[q_idx:t_idx]
    if len(seg):
        mu = sum(float(x) for x in seg) / len(seg)
        thr = mu + (t_pk - mu) / 50.0
        nf, fw = 0, 0.0
        if len(seg) >= 2:
            sgn = [1 if float(x) > thr else (-1 if float(x) < thr else 0) for x in seg]
            crossings = [i for i in range(len(seg) - 1) if sgn[i] * sgn[i + 1] < 0]
            nf = len(crossings)
            if nf >= 2:
                fw = sum(crossings[i + 1] - crossings[i] for i in range(nf - 1)) / (nf - 1)
    else:
        nf, fw = 0, 0.0
    st_i, rs_i = float(t_idx - s_idx), float(s_idx - r_idx)
    rs_a, st_a = r_pk - s_pk, t_pk - s_pk
    return [r_pk, area,
            float(r_idx - p_idx), float(s_idx - q_idx), qt, qt / n, vent,
            float(nf), float(fw),
            r_pk - q_pk, rs_a, st_a, p_pk - q_pk, q_pk - s_pk, r_pk - p_pk, r_pk - t_pk,
            st_i, rs_i,
            t_pk, p_pk, q_pk, r_pk, s_pk,
            rs_a / rs_i if rs_i != 0 else 0.0,
            st_a / st_i if st_i != 0 else 0.0]


def oracle_short_vector(ts_us, v, gap_us=30_000_000):
    starts = [0]
    for i in range(1, len(ts_us)):
        if ts_us[i] - ts_us[i - 1] > gap_us:
            starts.append(i)
    ends = starts[1:] + [len(ts_us)]
    feats = [_o_session_25(ts_us[s:e], v[s:e]) for s, e in zip(starts, ends)]
    m = np.asarray(feats)
    out = []
    for j in range(m.shape[1]):
        col = m[:, j]
        out += [float(col.mean()), float(col.max()), float(col.min()), float(col.std()),
                float(np.percentile(col, 25)), float(np.percentile(col, 75))]
    return out


HRV_FAMILY_SAMPEN_MAX_N = 3000  # family pipeline runs the uncapped-default kernel


def oracle_hrv_vector(ts_us, v):
    """HRV family vector — flagship-oracle formulas, but SampEn at the
    family pipeline's cap (3000), not the flagship's 400."""
    row = oracle_feature_row(np.asarray(ts_us), np.asarray(v))
    ts_us = np.sort(np.asarray(ts_us, dtype=np.int64))
    u = (ts_us[1:] - ts_us[:-1]) / 1000.0
    if len(u):
        ut = u[:HRV_FAMILY_SAMPEN_MAX_N]
        r = 0.2 * float(np.sqrt(np.mean((ut - ut.mean()) ** 2)))
        se = _sampen_pair(u, 2, r, max_n=HRV_FAMILY_SAMPEN_MAX_N)
        row["sampen_1"], row["sampen_2"] = se
    return [row[k] for k in
            ["sdnn", "max_rr", "min_rr", "mean_rr", "r_density", "pnn50", "rmssd",
             "sampen_1", "sampen_2"]]


@functools.lru_cache(maxsize=4)
def decode_events_channels(events_dir: str) -> pd.DataFrame:
    """decode_events + per-channel means (independent single-thread loop)."""
    tbl = pq.read_table(events_dir)
    df = tbl.to_pandas()
    vs, crs, cgs, cbs = [], [], [], []
    for blob in df["bytes"]:
        px, _ = decode_image(blob)
        vs.append(px.mean() / 255.0)
        crs.append(px[:, :, 0].astype(np.float64).mean() / 255.0)
        cgs.append(px[:, :, 1].astype(np.float64).mean() / 255.0)
        cbs.append(px[:, :, 2].astype(np.float64).mean() / 255.0)
    df["v"], df["v_r"], df["v_g"], df["v_b"] = vs, crs, cgs, cbs
    return df[["image_id", "ts", "v", "v_r", "v_g", "v_b", "caption"]]


def oracle_family_table(events_dir: str, family: str, channels=("v",)) -> pd.DataFrame:
    """Per (entity × caption label) family vectors — the family_features
    oracle.  v-based families (long/short) replicate per channel."""
    from ecg_feature_engineering_ray.pipelines.feature_families import (
        HRV_NAMES, LONG_NAMES, QRS_NAMES, SHORT_NAMES,
    )

    ev = decode_events_channels(events_dir)
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    names = {"hrv": HRV_NAMES, "long": LONG_NAMES, "qrs": QRS_NAMES, "short": SHORT_NAMES}[family]
    v_based = family in ("long", "short")
    use_ch = channels if v_based else ("v",)
    rows = []
    for image_id, g in ev.sort_values("ts_us").groupby("image_id"):
        ts = g.ts_us.values
        vec = []
        colnames = []
        for ch in use_ch:
            vv = g[ch].values.astype(np.float64)
            if family == "hrv":
                vec += oracle_hrv_vector(ts, vv)
            elif family == "long":
                vec += oracle_long_vector(vv)
            elif family == "qrs":
                vec += oracle_qrs_vector(ts, vv)
            else:
                vec += oracle_short_vector(ts, vv)
            tag = f"{family}_" if (ch == "v" or not v_based) else f"{family}_{ch}_"
            colnames += [tag + nm for nm in names]
        for lab in g.caption.iloc[0].split(","):
            rows.append({"image_id": image_id, "label": lab,
                         **dict(zip(colnames, vec))})
    return pd.DataFrame(rows)


_DB6_LO = np.array([
    0.11154074335008017, 0.4946238903983854, 0.7511339080215775, 0.3152503517092432,
    -0.22626469396516913, -0.12976686756709563, 0.09750160558707936, 0.02752286553001629,
    -0.031582039318031156, 0.0005538422009938016, 0.004777257511010651, -0.00107730108499558,
])


def _o_dwt_level_db6(x):
    lo = _DB6_LO
    hi = ((-1.0) ** np.arange(lo.size)) * lo[::-1]
    if x.size % 2:
        x = np.concatenate([x, x[-1:]])
    n = x.size
    a = np.empty(n // 2)
    d = np.empty(n // 2)
    for k in range(n // 2):
        seg = x[(2 * k + np.arange(lo.size)) % n]
        a[k] = float(seg @ lo)
        d[k] = float(seg @ hi)
    return a, d


def _o_idwt_level_db6(a, d):
    lo = _DB6_LO
    hi = ((-1.0) ** np.arange(lo.size)) * lo[::-1]
    n = 2 * a.size
    out = np.zeros(n)
    for k in range(a.size):
        idx = (2 * k + np.arange(lo.size)) % n
        np.add.at(out, idx, a[k] * lo + d[k] * hi)
    return out


def oracle_wt_denoise(x, level=5):
    """WTfilt analog: db6 periodization decompose, zero A_L and D1/D2,
    adjoint reconstruct — independent loop implementation."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2 ** level:
        return x.copy()
    a = x
    details = []
    for _ in range(level):
        if a.size < 2:
            break
        a, d = _o_dwt_level_db6(a)
        details.append(d)
    coeffs = [np.zeros_like(a)] + details[::-1]
    for i in (len(coeffs) - 1, len(coeffs) - 2):
        if i >= 1:
            coeffs[i] = np.zeros_like(coeffs[i])
    rec = coeffs[0]
    for d in coeffs[1:]:
        rec = _o_idwt_level_db6(rec[: d.size], d)
    return rec[: x.size]


def _o_zero_cross_threshold(x, threshold=0.0):
    """Sign-change count about an absolute threshold, zeros carry prior sign."""
    zc, prev = 0, 0
    for val in x - threshold:
        s = 1 if val > 0 else (-1 if val < 0 else prev)
        if prev != 0 and s != 0 and s != prev:
            zc += 1
        if s != 0:
            prev = s
    return zc


def oracle_corpus_windows(events_dir: str, window=32, overlap=16,
                          oversample=None, seed=5) -> pd.DataFrame:
    """Independent corpus-windowing replay: explicit window loop, direct
    spectrogram formula, md5 split/oversampling arithmetic."""
    import hashlib

    weights = oversample or {}
    ev = decode_events(events_dir)
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    rows = []
    step = window - overlap
    for image_id, g in ev.sort_values("ts_us").groupby("image_id"):
        labels = g.caption.iloc[0].split(",")
        split = ("train" if int(hashlib.md5(f"split|{image_id}".encode()).hexdigest()[:2], 16) < 204
                 else "test")
        series = g.v.values.astype(np.float64)
        n = series.size
        wid, start = 0, 0
        plan = []
        while start < n:
            if start + window <= n:
                plan.append((wid, start, start + window))
            else:
                plan.append((wid, start, n))
                break
            wid += 1
            start += step
        for wid, ws, we in plan:
            w = np.zeros(window)
            w[: we - ws] = series[ws:we]
            # spectrogram tile mean: boxcar frames nperseg=8 hop=4
            nperseg, hop, fs = 8, 4, 300.0
            x = w if w.size >= nperseg else np.pad(w, (0, nperseg - w.size))
            n_frames = 1 + (x.size - nperseg) // hop
            frames = np.stack([x[i * hop : i * hop + nperseg] for i in range(n_frames)])
            p = (np.abs(np.fft.rfft(frames, axis=1)) ** 2) / (fs * nperseg)
            tile = np.log10(p.T + 1e-12)
            spec_mean = float(tile.mean())
            spec_checksum = float(np.round(np.ascontiguousarray(tile).reshape(-1).sum(), 6))
            for lab in labels:
                reps = weights.get(lab, 1)
                h = int(hashlib.md5(f"{seed}|{image_id}|{wid}|{lab}".encode()).hexdigest()[:8], 16)
                n_copies = int(reps) + (1 if h / 0xFFFFFFFF < reps - int(reps) else 0)
                for _ in range(max(n_copies, 0)):
                    rows.append({"image_id": image_id, "window_id": wid, "label": lab,
                                 "split": split, "n_rows": we - ws,
                                 "v_mean": round(float(w.mean()), 6),
                                 "spec_power": round(spec_mean, 6),
                                 "spec_checksum": spec_checksum})
    return pd.DataFrame(rows)


def oracle_custom_featurespec(events_dir: str) -> pd.DataFrame:
    """Independent replay of the FeatureSpec demo query: v_mean, v_p90,
    u_max_ms, session-scoped sess_len rolled up mean/max/min/std."""
    ev = decode_events(events_dir)
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    rows = []
    for image_id, g in ev.sort_values("ts_us").groupby("image_id"):
        ts = g.ts_us.values
        v = g.v.values.astype(np.float64)
        u = np.diff(ts).astype(np.float64) / 1000.0
        brks = [0] + [i for i in range(1, len(ts)) if ts[i] - ts[i - 1] > SESSION_GAP_US]
        ends = brks[1:] + [len(ts)]
        sl = np.array([float(e - s) for s, e in zip(brks, ends)])
        rows.append({
            "image_id": image_id,
            "v_mean": float(v.mean()),
            "v_p90": float(np.percentile(v, 90)),
            "u_max_ms": float(u.max()) if u.size else float("nan"),
            "sess_len_mean": float(sl.mean()), "sess_len_max": float(sl.max()),
            "sess_len_min": float(sl.min()), "sess_len_std": float(sl.std()),
        })
    return pd.DataFrame(rows)


def oracle_deep_scores(events_dir: str, seed: int = 7) -> pd.DataFrame:
    """Independent single-threaded replay of the deterministic stand-in
    model: same seeded weights (the 'checkpoint'), per-image loop, explicit
    4×4 pooling and softmax — no engine stage code."""
    rng = np.random.default_rng(seed)
    w1 = rng.normal(size=(16, 32))
    w2 = rng.normal(size=(32, 9))
    tbl = pq.read_table(events_dir)
    df = tbl.to_pandas()
    preds = []
    for blob in df["bytes"]:
        px, _ = decode_image(blob)
        g = px.astype(np.float64).mean(axis=2) / 255.0
        h, w = g.shape
        qh, qw = max(h // 4, 1), max(w // 4, 1)
        pooled = np.empty(16)
        for bi in range(4):
            for bj in range(4):
                pooled[bi * 4 + bj] = g[bi * qh : (bi + 1) * qh, bj * qw : (bj + 1) * qw].mean()
        logits = np.tanh(pooled @ w1) @ w2
        z = logits - logits.max()
        p = np.exp(z)
        p /= p.sum()
        preds.append(int(np.argmax(p)))
    out = df[["image_id", "ts"]].copy()
    out["pred_class"] = np.array(preds, dtype=np.int32)
    return out


def oracle_thumbnails(events_dir: str) -> pd.DataFrame:
    """Independent thumbnail-size replay: decode, explicit nearest-neighbor
    16×16 gather, re-encode with the shared codec (the data format)."""
    from ecg_feature_engineering_ray.functions.codec import encode_image

    tbl = pq.read_table(events_dir)
    df = tbl.to_pandas()
    sizes = []
    for blob, fmt in zip(df["bytes"], df["fmt"]):
        px, _ = decode_image(blob)
        h, w, _c = px.shape
        thumb = np.empty((16, 16, 3), dtype=np.uint8)
        for i in range(16):
            for j in range(16):
                thumb[i, j] = px[min(i * h // 16, h - 1), min(j * w // 16, w - 1)]
        sizes.append(len(encode_image(thumb, fmt)))
    out = df[["image_id", "ts"]].copy()
    out["thumb_bytes"] = np.array(sizes, dtype=np.int64)
    return out


def _oracle_lloyd(sf_dir: str, k: int, iters: int, scale: float):
    """Single-threaded exact fixed-point Lloyd training — shared by the
    k-means and IVF oracles.  Returns (vec_id, X, C): ids ascending, the
    float64 vector matrix in that order, and the trained (k, d) centroids."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(tbl.column("vec_id").combine_chunks()), kind="stable")
    vec_id = np.asarray(tbl.column("vec_id").combine_chunks())[order]
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )[order]
    Q = np.rint(X * scale).astype(np.int64)
    if not np.array_equal(vec_id[:k], np.arange(k)):  # fail-loud, matching
        # the engine's init guard: sparse ids would silently pick different
        # init rows via searchsorted and the two sides would diverge
        raise ValueError(f"oracle_kmeans expects vec_ids 0..{k - 1} present; got {vec_id[:k]}")
    C = X[np.searchsorted(vec_id, np.arange(k))].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = Q[m].sum(axis=0, dtype=np.int64) / (m.sum() * scale)
    return vec_id, X, C


def oracle_kmeans(sf_dir: str, k: int = 8, iters: int = 5, scale: float = 2.0**20) -> pd.DataFrame:
    """Independent single-threaded Lloyd k-means over the embeddings table.

    Mirrors the DETERMINISTIC contract of queries.kmeans_embeddings without
    touching any engine stage code: init = vectors with vec_id < k (sorted),
    per-iteration centroid update in exact fixed-point arithmetic
    (sum of rint(x*scale) int64 / (count*scale)) so the result is
    independent of summation order; empty clusters keep their previous
    centroid; assignment breaks distance ties toward the lower cluster id
    (np.argmin).  Distances are computed with the same broadcast expression
    the engine uses so the 64-element pairwise sums match bit-for-bit.
    """
    vec_id, X, C = _oracle_lloyd(sf_dir, k, iters, scale)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d2, axis=1)
    best = d2[np.arange(len(X)), assign]
    r = np.copysign(np.floor(np.abs(best) * 1e6 + 0.5) / 1e6, best)
    return pd.DataFrame({
        "vec_id": vec_id.astype(np.int64),
        "cluster": assign.astype(np.int64),
        "dist_sq": r,
    })


def oracle_knn_ivf(sf_dir: str, n_lists: int = 16, n_probe: int = 4, k: int = 5,
                   iters: int = 5, scale: float = 2.0**20, n_queries: int = 3) -> pd.DataFrame:
    """Independent single-threaded IVF search with KMEANS-TRAINED lists.

    Twin of queries.knn_ivf: centroids from the shared exact fixed-point
    Lloyd trainer, L2-normalized; every vector assigned to its max-cosine
    centroid (argmax → lowest cid on ties); per query the ``n_probe``
    highest-cosine lists are searched (stable sort → lowest cid on ties),
    excluding self; global top-k by (sim desc, neighbor_id asc) with
    1-based rank, sims rounded to 6 digits.  All float expressions use the
    same numpy broadcasts as the engine so values match bit-for-bit.
    """
    vec_id, X, C = _oracle_lloyd(sf_dir, n_lists, iters, scale)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    Vn = X / np.linalg.norm(X, axis=1, keepdims=True)
    assign = np.argmax(Vn @ Cn.T, axis=1)
    qm = vec_id < n_queries
    q_ids = vec_id[qm]
    Qn = X[qm] / np.linalg.norm(X[qm], axis=1, keepdims=True)
    rows = []
    for j, qid in enumerate(q_ids):
        plist = np.argsort(-(Qn[j] @ Cn.T), kind="stable")[:n_probe]
        mask = np.isin(assign, plist) & (vec_id != qid)
        sims = Qn[j] @ Vn[mask].T
        cand = vec_id[mask]
        top = np.lexsort((cand, -sims))[:k]
        r = np.copysign(np.floor(np.abs(sims[top]) * 1e6 + 0.5) / 1e6, sims[top])
        for rank, (nb, sv) in enumerate(zip(cand[top], r), 1):
            rows.append((int(qid), int(nb), float(sv), rank))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim", "rank"])


def oracle_pq(sf_dir: str, m: int = 4, k: int = 16, iters: int = 5,
              scale: float = 2.0**20) -> pd.DataFrame:
    """Independent single-threaded product-quantization twin of
    queries.pq_codes: per subspace, the same exact fixed-point Lloyd
    contract as ``_oracle_lloyd`` (init = vec_id < k, int64 sufficient
    statistics, empty clusters keep their centroid), then argmin code
    assignment (ties to the lower code) and the per-row reconstruction
    error summed across subspaces in subspace order — the identical numpy
    broadcast expressions the engine uses, so values match bit-for-bit
    (the engine's float32 subvector round-trip is exact because the source
    embeddings are float32)."""
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(tbl.column("vec_id").combine_chunks()), kind="stable")
    vec_id = np.asarray(tbl.column("vec_id").combine_chunks())[order]
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl.column("embedding").to_pylist()]
    )[order]
    if not np.array_equal(vec_id[:k], np.arange(k)):
        raise ValueError(f"oracle_pq expects vec_ids 0..{k - 1} present; got {vec_id[:k]}")
    dsub = X.shape[1] // m
    out = {"vec_id": vec_id.astype(np.int64)}
    tot = np.zeros(len(X), dtype=np.float64)
    for mi in range(m):
        Xs = X[:, mi * dsub:(mi + 1) * dsub].copy()
        Q = np.rint(Xs * scale).astype(np.int64)
        C = Xs[np.searchsorted(vec_id, np.arange(k))].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(k):
                mm = assign == j
                if mm.any():
                    C[j] = Q[mm].sum(axis=0, dtype=np.int64) / (mm.sum() * scale)
        d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        out[f"code_{mi}"] = a.astype(np.int64)
        tot += d2[np.arange(len(Xs)), a]
    out["recon_err"] = np.copysign(np.floor(np.abs(tot) * 1e6 + 0.5) / 1e6, tot)
    return pd.DataFrame(out)
