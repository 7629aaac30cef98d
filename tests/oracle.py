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


def decode_events(events_dir: str) -> pd.DataFrame:
    tbl = pq.read_table(events_dir)
    df = tbl.to_pandas()
    vs = []
    for blob in df["bytes"]:
        px, _ = decode_image(blob)
        vs.append(px.mean() / 255.0)
    df["v"] = vs
    return df[["image_id", "ts", "v", "caption", "phash", "fmt"]]


def _sampen_pair(x: np.ndarray, m: int, r: float) -> list[float]:
    """Explicit O(n²) sample entropy at lengths m and m+1, HRV sentinels.

    Counting uses a direct numpy pairwise-distance broadcast (whole n×n
    Chebyshev matrix at once) — mathematically the textbook definition,
    structurally unlike the engine's blocked kernel."""
    x = x[:SAMPEN_MAX_N]
    if x.size < m + 2:
        return [-2.0, -2.0]

    def count(mm: int) -> int:
        n = x.size - mm + 1
        if n < 2:
            return 0
        emb = np.lib.stride_tricks.sliding_window_view(x, mm)  # (n, mm)
        d = np.abs(emb[:, None, :] - emb[None, :, :]).max(axis=2)  # Chebyshev
        iu = np.triu_indices(n, k=1)
        return int(np.count_nonzero(d[iu] <= r))

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
