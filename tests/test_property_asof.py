"""Property-based check of the as-of merge against brute force (hypothesis).

Random event/query sets — including empty sides, ties, duplicates of query
timestamps and single-row entities — must agree with an O(n·q) brute force.
Runs on the pure-table kernel (no Ray round-trip per example)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ecg_feature_engineering_ray.stages.asof import asof_merge_table

entities = st.sampled_from(["a", "b", "c"])
ts_vals = st.integers(min_value=0, max_value=50)


@st.composite
def asof_case(draw):
    n_ev = draw(st.integers(0, 12))
    n_q = draw(st.integers(1, 8))
    events = [
        (draw(entities), draw(ts_vals), float(draw(st.integers(-5, 5))))
        for _ in range(n_ev)
    ]
    queries = [(draw(entities), draw(ts_vals)) for _ in range(n_q)]
    return events, queries


def _build_table(events, queries):
    rows = [(e, t, v, 0) for e, t, v in events] + [(e, t, None, 1) for e, t in queries]
    rows.sort(key=lambda r: (r[0], r[1], r[3]))
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.string()),
            "__ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us")),
            "v": pa.array([r[2] for r in rows], pa.float64()),
            "__side": pa.array([r[3] for r in rows], pa.int8()),
        }
    )


@settings(max_examples=150, deadline=None)
@given(asof_case())
def test_asof_merge_matches_brute_force(case):
    events, queries = case
    tbl = _build_table(events, queries)
    out = asof_merge_table(
        tbl, "k", "__ts",
        aggs={"n": ("v", "count"), "s": ("v", "sum"), "mn": ("v", "min"), "last": ("v", "last")},
        left_cols=["k", "__ts"],
    )
    got = out.to_pandas()
    got["ts_us"] = got["__ts"].astype("datetime64[us]").astype("int64")
    got = got.sort_values(["k", "ts_us"]).reset_index(drop=True)

    want = []
    for e, t in sorted(queries):
        pre = [v for (ee, tt, v) in events if ee == e and tt <= t]
        want.append(
            (e, t, len(pre), sum(pre) if pre else None,
             min(pre) if pre else None,
             [v for (ee, tt, v) in sorted(events, key=lambda r: (r[1],)) if ee == e and tt <= t][-1] if pre else None)
        )
    want.sort(key=lambda r: (r[0], r[1]))

    assert len(got) == len(want)
    for i, (e, t, n, s, mn, last) in enumerate(want):
        row = got.iloc[i]
        assert row["k"] == e and row["ts_us"] == t
        assert row["n"] == n
        if n == 0:
            assert np.isnan(row["s"]) and np.isnan(row["mn"]) and np.isnan(row["last"])
        else:
            assert np.isclose(row["s"], s)
            assert np.isclose(row["mn"], mn)
            assert np.isclose(row["last"], last)


# ---------------------------------------------------------------------------
# window kernels vs pandas on random entity layouts
# ---------------------------------------------------------------------------

import pandas as pd

from ecg_feature_engineering_ray.stages.window import (
    _row_entity_start,
    lag_column,
    prefix_mean,
    rolling_mean,
)


@st.composite
def entity_series(draw):
    n = draw(st.integers(1, 40))
    ents = sorted(draw(st.lists(st.sampled_from("abcd"), min_size=n, max_size=n)))
    vals = [float(draw(st.integers(-9, 9))) for _ in range(n)]
    return ents, vals


@settings(max_examples=100, deadline=None)
@given(entity_series(), st.integers(1, 5))
def test_window_kernels_match_pandas(case, k):
    ents, vals = case
    tbl = pa.table({"e": pa.array(ents), "v": pa.array(vals, pa.float64())})
    rs = _row_entity_start(tbl, "e")
    v = np.asarray(tbl.column("v").combine_chunks())
    df = pd.DataFrame({"e": ents, "v": vals})

    got_lag = lag_column(v, rs, k)
    want_lag = df.groupby("e").v.shift(k).values
    assert np.allclose(got_lag, want_lag, equal_nan=True)

    got_rm = rolling_mean(v, rs, k)
    want_rm = df.groupby("e").v.rolling(k, min_periods=1).mean().reset_index(level=0, drop=True).values
    assert np.allclose(got_rm, want_rm)

    got_pm = prefix_mean(v, rs)
    want_pm = df.groupby("e").v.expanding().mean().reset_index(level=0, drop=True).values
    assert np.allclose(got_pm, want_pm)


@settings(max_examples=100, deadline=None)
@given(asof_case(), st.integers(1, 20))
def test_windowed_asof_matches_brute_force(case, window):
    events, queries = case
    tbl = _build_table(events, queries)
    out = asof_merge_table(
        tbl, "k", "__ts",
        aggs={"wn": ("v", "wcount"), "ws": ("v", "wsum"), "wmx": ("v", "wmax")},
        left_cols=["k", "__ts"],
        window_us=window,
    )
    got = out.to_pandas()
    got["ts_us"] = got["__ts"].astype("datetime64[us]").astype("int64")
    got = got.sort_values(["k", "ts_us"]).reset_index(drop=True)
    want = []
    for e, t in sorted(queries):
        win = [v for (ee, tt, v) in events if ee == e and t - window <= tt <= t]
        want.append((e, t, len(win), sum(win) if win else None, max(win) if win else None))
    want.sort(key=lambda r: (r[0], r[1]))
    assert len(got) == len(want)
    for i, (e, t, n, s, mx) in enumerate(want):
        row = got.iloc[i]
        assert row["k"] == e and row["ts_us"] == t and row["wn"] == n
        if n == 0:
            assert np.isnan(row["ws"]) and np.isnan(row["wmx"])
        else:
            assert np.isclose(row["ws"], s) and np.isclose(row["wmx"], mx)
