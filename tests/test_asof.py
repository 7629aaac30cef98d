"""As-of join correctness vs an INDEPENDENT brute-force oracle (pandas loop),
including tie-at-event, before-first-event and unknown-entity paths, plus the
zero-temporal-leakage property (FIXTURES.md invariant 4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ecg_feature_engineering_ray.sources.readers import read_events
from ecg_feature_engineering_ray.stages.asof import asof_join


def _brute_force(events: pd.DataFrame, queries: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, q in queries.iterrows():
        pre = events[(events.image_id == q.image_id) & (events.ts <= q.as_of_ts)]
        rows.append(
            {
                "image_id": q.image_id,
                "as_of_ts": q.as_of_ts,
                "n_events": len(pre),
                "mean_phash": pre.phash.mean() if len(pre) else np.nan,
                "last_phash": pre.sort_values("ts").phash.iloc[-1] if len(pre) else None,
                "min_phash": pre.phash.min() if len(pre) else None,
            }
        )
    return pd.DataFrame(rows)


def _run_engine(events_dir: str, queries_path: str) -> pd.DataFrame:
    left = ray.data.read_parquet(queries_path)
    right = read_events(events_dir, columns=["image_id", "ts", "phash"])
    out = asof_join(
        left,
        right,
        key="image_id",
        left_ts="as_of_ts",
        right_ts="ts",
        aggs={
            "n_events": ("phash", "count"),
            "mean_phash": ("phash", "mean"),
            "last_phash": ("phash", "last"),
            "min_phash": ("phash", "min"),
        },
        left_cols=[],
        num_buckets=8,
    )
    return out.to_pandas()


def test_asof_matches_brute_force(fixture_events, fixture_queries):
    events_dir, _ = fixture_events
    events = pq.read_table(events_dir, columns=["image_id", "ts", "phash"]).to_pandas()
    queries = pq.read_table(fixture_queries).to_pandas()

    got = _run_engine(events_dir, fixture_queries)
    want = _brute_force(events, queries)

    key = ["image_id", "as_of_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) == len(queries)
    assert (got.image_id.values == want.image_id.values).all()
    assert (got.n_events.values == want.n_events.values).all()
    assert np.allclose(got.mean_phash.values, want.mean_phash.values, equal_nan=True)
    lw = want.last_phash.astype("float64")
    lg = got.last_phash.astype("float64")
    assert np.allclose(lg.values, lw.values, equal_nan=True)


def test_zero_temporal_leakage(fixture_events, fixture_queries, tmp_path):
    """Perturbing any row with ts > t0 leaves the feature at (e, t0) identical."""
    events_dir, _ = fixture_events
    base = _run_engine(events_dir, fixture_queries)

    # pick a query with events before AND after it, mutate every future row
    queries = pq.read_table(fixture_queries).to_pandas()
    events = pq.read_table(events_dir).to_pandas()
    target = None
    for _, q in queries.iterrows():
        e = events[events.image_id == q.image_id]
        if len(e[e.ts <= q.as_of_ts]) >= 2 and len(e[e.ts > q.as_of_ts]) >= 2:
            target = q
            break
    assert target is not None

    mutated = events.copy()
    future = (mutated.image_id == target.image_id) & (mutated.ts > target.as_of_ts)
    mutated.loc[future, "phash"] = 123456789
    mdir = tmp_path / "mutated"
    mdir.mkdir()
    pq.write_table(pa.Table.from_pandas(mutated, preserve_index=False), str(mdir / "frag-0.parquet"))

    got = _run_engine(str(mdir), fixture_queries)
    key = ["image_id", "as_of_ts"]
    b = base.set_index(key).sort_index()
    g = got.set_index(key).sort_index()
    sel = (target.image_id, target.as_of_ts)
    assert b.loc[sel, "n_events"] == g.loc[sel, "n_events"]
    assert np.isclose(b.loc[sel, "mean_phash"], g.loc[sel, "mean_phash"])
    assert b.loc[sel, "last_phash"] == g.loc[sel, "last_phash"]


def test_out_of_order_arrival_equals_sorted(fixture_events, fixture_queries, tmp_path):
    """Shuffled-arrival input produces identical results (invariant 5)."""
    events_dir, _ = fixture_events
    base = _run_engine(events_dir, fixture_queries)

    events = pq.read_table(events_dir)
    rng = np.random.default_rng(7)
    perm = rng.permutation(events.num_rows)
    shuffled = events.take(pa.array(perm))
    sdir = tmp_path / "shuffled"
    sdir.mkdir()
    # write as 3 fragments cut at arbitrary points
    cuts = [0, events.num_rows // 3, 2 * events.num_rows // 3, events.num_rows]
    for i in range(3):
        pq.write_table(shuffled.slice(cuts[i], cuts[i + 1] - cuts[i]), str(sdir / f"frag-{i}.parquet"))

    got = _run_engine(str(sdir), fixture_queries)
    key = ["image_id", "as_of_ts"]
    b = base.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    assert (b.n_events.values == g.n_events.values).all()
    assert np.allclose(b.mean_phash.values, g.mean_phash.values, equal_nan=True)


def test_self_join_equals_two_input_join(fixture_events, fixture_queries):
    """asof_self_join (single read, both sides tagged per batch) must be
    row-for-row identical to the two-input asof_join on the same split."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ecg_feature_engineering_ray.sources.readers import read_events
    from ecg_feature_engineering_ray.stages.asof import asof_join, asof_self_join

    events_dir, _ = fixture_events
    ds = read_events(events_dir, columns=["image_id", "ts", "fmt", "phash"])
    aggs = {"n_png": ("phash", "count"), "last_ph": ("phash", "last")}

    self_out = asof_self_join(
        ds, key="image_id", ts_col="ts",
        left_mask=lambda b: pc.equal(b.column("fmt"), "jpeg"),
        right_mask=lambda b: pc.equal(b.column("fmt"), "png"),
        aggs=aggs, left_cols=["phash"], num_buckets=4,
    ).to_pandas()

    left = ds.filter(expr="fmt == 'jpeg'").select_columns(["image_id", "ts", "phash"])
    right = ds.filter(expr="fmt == 'png'").select_columns(["image_id", "ts", "phash"])
    two_out = asof_join(
        left, right, key="image_id", left_ts="ts", right_ts="ts",
        aggs=aggs, left_cols=["phash"], num_buckets=4,
    ).to_pandas()

    key_cols = ["image_id", "ts", "phash"]
    a = self_out.sort_values(key_cols).reset_index(drop=True)
    b = two_out.sort_values(key_cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, equal_nan=True), c
        else:
            assert (pd_isnull_safe(av) == pd_isnull_safe(bv)).all(), c


def pd_isnull_safe(v):
    import pandas as pd

    return pd.Series(v).fillna(-1)
