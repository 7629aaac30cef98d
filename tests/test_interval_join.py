"""interval_join vs a brute-force pandas containment oracle.

Random per-entity non-overlapping intervals; covers closed='both' vs 'left',
how='inner' vs 'left', rows outside every interval, entities with no
intervals, null left timestamps, null interval bounds, and the fail-loud
overlap validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from ecg_feature_engineering_ray.stages.joins import interval_join


def _ds(tbl: pa.Table, blocks: int = 3):
    return ray.data.from_arrow(tbl).repartition(blocks)


def _collect(ds) -> pd.DataFrame:
    t = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    cols = sorted(t.column_names)
    return t.to_pandas()[cols].sort_values(cols).reset_index(drop=True)


def _make_inputs(seed: int = 11):
    rng = np.random.default_rng(seed)
    # intervals: per entity, k non-overlapping [lo, hi] windows with gaps
    rows_r = []
    for ent in range(12):  # entity 11 gets no intervals at all
        if ent == 11:
            continue
        t = rng.integers(0, 50)
        for j in range(rng.integers(1, 5)):
            width = int(rng.integers(5, 30))
            rows_r.append((ent, int(t), int(t + width), ent * 100 + j))
            t += width + int(rng.integers(2, 20))  # gap ≥ 2 → closed='both' safe
    right = pa.table({
        "ent": pa.array([r[0] for r in rows_r], pa.int64()),
        "lo": pa.array([pd.Timestamp(r[1], unit="s") for r in rows_r], pa.timestamp("us")),
        "hi": pa.array([pd.Timestamp(r[2], unit="s") for r in rows_r], pa.timestamp("us")),
        "seg_id": pa.array([r[3] for r in rows_r], pa.int64()),
    })
    n_l = 500
    ents = rng.integers(0, 12, n_l)
    ts = rng.integers(0, 200, n_l).astype("float64")
    ts[rng.random(n_l) < 0.03] = np.nan  # null event timestamps
    left = pa.table({
        "ent": pa.array(ents, pa.int64()),
        "ts": pa.array([None if np.isnan(x) else pd.Timestamp(int(x), unit="s") for x in ts],
                       pa.timestamp("us")),
        "ev": pa.array(np.arange(n_l), pa.int64()),
    })
    return left, right


def _oracle(left: pa.Table, right: pa.Table, how: str, closed: str) -> pd.DataFrame:
    lp = left.to_pandas()
    rp = right.to_pandas()
    merged = lp.merge(rp, on="ent", how="left")
    if closed == "both":
        hit = (merged["ts"] >= merged["lo"]) & (merged["ts"] <= merged["hi"])
    else:
        hit = (merged["ts"] >= merged["lo"]) & (merged["ts"] < merged["hi"])
    hits = merged[hit.fillna(False)][["ent", "ts", "ev", "lo", "hi", "seg_id"]]
    if how == "inner":
        return hits.reset_index(drop=True)
    missed = lp[~lp["ev"].isin(hits["ev"])].copy()
    for c in ("lo", "hi", "seg_id"):
        missed[c] = pd.NA
    out = pd.concat([hits, missed[["ent", "ts", "ev", "lo", "hi", "seg_id"]]])
    return out.reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("closed", ["both", "left"])
def test_interval_join_matches_bruteforce(how, closed):
    left, right = _make_inputs()
    got = _collect(interval_join(
        _ds(left), _ds(right), key="ent", left_ts="ts",
        right_lo="lo", right_hi="hi",
        left_cols=["ev"], right_cols=["lo", "hi", "seg_id"],
        how=how, closed=closed, num_buckets=6,
    ))
    exp = _oracle(left, right, how, closed)
    cols = sorted(exp.columns)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp), f"{how}/{closed}: {len(got)} vs {len(exp)} rows"
    for c in cols:
        g, e = got[c], exp[c]
        assert g.isna().equals(e.isna().reset_index(drop=True)), f"{how}/{closed}: null mask {c}"
        gv, ev = g.dropna(), e.dropna()
        assert list(gv) == list(ev), f"{how}/{closed}: values {c}"


def test_interval_join_rejects_overlap():
    left = pa.table({"ent": pa.array([1], pa.int64()),
                     "ts": pa.array([pd.Timestamp(3, unit="s")], pa.timestamp("us")),
                     "ev": pa.array([0], pa.int64())})
    right = pa.table({
        "ent": pa.array([1, 1], pa.int64()),
        "lo": pa.array([pd.Timestamp(0, unit="s"), pd.Timestamp(5, unit="s")], pa.timestamp("us")),
        "hi": pa.array([pd.Timestamp(5, unit="s"), pd.Timestamp(9, unit="s")], pa.timestamp("us")),
        "seg_id": pa.array([0, 1], pa.int64()),
    })
    # [0,5] and [5,9] share the boundary point under closed='both' → raise
    ds = interval_join(_ds(left, 1), _ds(right, 1), key="ent", left_ts="ts",
                       right_lo="lo", right_hi="hi", left_cols=["ev"],
                       right_cols=["seg_id"], closed="both", num_buckets=2)
    with pytest.raises(Exception, match="overlapping"):
        ds.materialize()
    # under closed='left' the shared boundary is legal
    ds2 = interval_join(_ds(left, 1), _ds(right, 1), key="ent", left_ts="ts",
                        right_lo="lo", right_hi="hi", left_cols=["ev"],
                        right_cols=["seg_id"], closed="left", num_buckets=2)
    assert ds2.count() == 1
