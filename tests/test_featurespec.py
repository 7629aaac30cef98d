"""FeatureSpec registry: custom UDFs fused into one bucket pass."""

import numpy as np

from ecg_feature_engineering_ray.api import FeatureSpec, extract_features

from .oracle import decode_events


def test_custom_specs_match_pandas(fixture_events):
    events_dir, _ = fixture_events
    specs = [
        FeatureSpec("v_mean", lambda s: s["v"].mean()),
        FeatureSpec("v_p90", lambda s: np.percentile(s["v"], 90)),
        FeatureSpec("u_max_ms", lambda s: s["u"].max() if s["u"].size else np.nan, inputs=("u",)),
        FeatureSpec(
            "v_minmax", lambda s: np.array([s["v"].min(), s["v"].max()]), width=2
        ),
        FeatureSpec("sess_len", lambda s: float(s["v"].size), scope="session"),
    ]
    got = extract_features(events_dir, specs, num_buckets=8).to_pandas().set_index("image_id").sort_index()

    ev = decode_events(events_dir)
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    for eid, g in list(ev.groupby("image_id"))[:12]:
        g = g.sort_values("ts_us")
        v = g.v.values
        u = np.diff(g.ts_us.values) / 1000.0
        row = got.loc[eid]
        assert np.isclose(row.v_mean, v.mean())
        assert np.isclose(row.v_p90, np.percentile(v, 90))
        assert np.isclose(row.u_max_ms, u.max())
        assert np.isclose(row.v_minmax_0, v.min()) and np.isclose(row.v_minmax_1, v.max())
        # session rollup: lengths of gap-bursts
        brk = np.flatnonzero(np.diff(g.ts_us.values) > 30_000_000) + 1
        lens = np.diff(np.concatenate(([0], brk, [len(g)])))
        assert np.isclose(row.sess_len_mean, lens.mean())
        assert np.isclose(row.sess_len_max, lens.max())
