"""shuffle_join / broadcast_range_join vs pandas-merge oracles.

Covers: duplicate keys on BOTH sides (m×n expansion), how='left' unmatched
rows, null join keys (never match; left-kept under how='left'), right-column
name collision suffixing, band containment edges ([lo, hi) half-open), and
out-of-band rows under inner vs left."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from ecg_feature_engineering_ray.stages.joins import broadcast_range_join, shuffle_join


def _ds(tbl: pa.Table, blocks: int = 3):
    return ray.data.from_arrow(tbl).repartition(blocks)


def _collect(ds) -> pd.DataFrame:
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    cols = sorted(t.column_names)
    return t.to_pandas()[cols].sort_values(cols).reset_index(drop=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def join_inputs():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    lk = rng.integers(0, 60, n_l).astype("float64")
    lk[rng.random(n_l) < 0.05] = np.nan  # null join keys on the left
    rk = rng.integers(0, 80, n_r).astype("float64")  # dup keys on the right too
    rk[rng.random(n_r) < 0.05] = np.nan
    left = pa.table({
        "k": pa.array([None if np.isnan(x) else int(x) for x in lk], pa.int64()),
        "lv": pa.array(rng.integers(0, 1000, n_l), pa.int64()),
        "tag": pa.array(rng.choice(["a", "b", "c"], n_l)),
    })
    right = pa.table({
        "k": pa.array([None if np.isnan(x) else int(x) for x in rk], pa.int64()),
        "rv": pa.array(np.round(rng.random(n_r), 6)),
        "tag": pa.array(rng.choice(["x", "y"], n_r)),  # collides with left 'tag'
    })
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
def test_shuffle_join_matches_pandas(join_inputs, how):
    left, right = join_inputs
    got = _collect(
        shuffle_join(
            _ds(left), _ds(right), on="k",
            left_cols=["lv", "tag"], right_cols=["rv", "tag"],
            how=how, num_buckets=8,
        )
    )
    lp = left.to_pandas()
    rp = right.to_pandas().rename(columns={"rv": "rv", "tag": "tag_r"})
    # pandas merge matches NaN==NaN (non-SQL); drop null keys to form the
    # SQL-semantics oracle — inner drops both sides, left keeps left nulls
    rp = rp.dropna(subset=["k"])
    if how == "inner":
        lp = lp.dropna(subset=["k"])
    exp = lp.merge(rp, on="k", how=how)
    if how == "inner":
        # arrow int64-with-nulls → pandas float64; post-dropna the oracle is
        # all-int while the engine output is int64
        exp["k"] = exp["k"].astype("int64")
    assert _norm(exp).equals(got), f"{how} join diverges from pandas merge"


def test_shuffle_join_mxn_expansion():
    # one key, 3 left × 4 right rows → exactly 12 output rows
    left = pa.table({"k": pa.array([5, 5, 5], pa.int64()), "lv": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([5] * 4, pa.int64()), "rv": pa.array([10, 20, 30, 40], pa.int64())})
    got = _collect(shuffle_join(_ds(left, 2), _ds(right, 2), on="k",
                                left_cols=["lv"], right_cols=["rv"], num_buckets=4))
    assert len(got) == 12
    assert sorted(got["lv"].unique()) == [1, 2, 3]
    assert sorted(got["rv"].unique()) == [10, 20, 30, 40]


def test_shuffle_join_full_outer_matches_pandas(join_inputs):
    left, right = join_inputs
    got = _collect(
        shuffle_join(_ds(left), _ds(right), on="k",
                     left_cols=["lv"], right_cols=["rv"], how="full", num_buckets=8)
    )
    lp = left.to_pandas()[["k", "lv"]]
    rp = right.to_pandas()[["k", "rv"]]
    # SQL FULL OUTER: null keys never match but every row survives — split
    # the pandas oracle into matched (non-null keys) + both null-key tails
    ln, rn = lp[lp.k.isna()], rp[rp.k.isna()]
    exp = pd.concat([
        lp.dropna(subset=["k"]).merge(rp.dropna(subset=["k"]), on="k", how="outer"),
        ln.assign(rv=np.nan),
        rn.assign(lv=np.nan)[["k", "lv", "rv"]],
    ])
    assert len(got) == len(exp)
    g, e = _norm(got), _norm(exp.reset_index(drop=True))
    for c in ["k", "lv", "rv"]:
        ga, ea = g[c].astype("float64"), e[c].astype("float64")
        assert ga.isna().equals(ea.isna()) and np.allclose(ga.fillna(-1), ea.fillna(-1))
    # unmatched rows of each side carry nulls on the other side
    assert got.loc[got.lv.isna(), "rv"].notna().any() or (right.column("k").null_count == 0)


def test_shuffle_join_left_keeps_null_keys(join_inputs):
    left, right = join_inputs
    got = _collect(
        shuffle_join(_ds(left), _ds(right), on="k",
                     left_cols=["lv"], right_cols=["rv"], how="left", num_buckets=8)
    )
    n_null_left = left.column("k").null_count
    assert (got["k"].isna()).sum() == n_null_left
    assert got.loc[got["k"].isna(), "rv"].isna().all()


@pytest.fixture(scope="module")
def bands():
    return pa.table({
        "band": ["lo", "mid", "hi"],
        "lo": [0.0, 10.0, 50.0],
        "hi": [10.0, 50.0, 100.0],
    })


def test_range_join_edges_and_oob(bands):
    # values at band edges, inside, below-all, above-all, and null
    x = pa.table({"v": pa.array([0.0, 9.999999, 10.0, 49.999999, 50.0, 99.999999,
                                 100.0, -1.0, None], pa.float64())})
    inner = _collect(broadcast_range_join(_ds(x, 2), "v", bands))
    # [lo, hi) half-open: 100.0, -1.0 and null fall out
    assert len(inner) == 6
    exp = {0.0: "lo", 9.999999: "lo", 10.0: "mid", 49.999999: "mid",
           50.0: "hi", 99.999999: "hi"}
    for v, b in zip(inner["v"], inner["band"]):
        assert exp[v] == b

    left = _collect(broadcast_range_join(_ds(x, 2), "v", bands, how="left"))
    assert len(left) == 9
    oob = left[left["v"].isin([100.0, -1.0]) | left["v"].isna()]
    assert oob["band"].isna().all()


def test_range_join_rejects_overlap():
    bad = pa.table({"band": ["a", "b"], "lo": [0.0, 5.0], "hi": [6.0, 10.0]})
    with pytest.raises(ValueError, match="non-overlapping"):
        broadcast_range_join(_ds(pa.table({"v": [1.0]})), "v", bad)
