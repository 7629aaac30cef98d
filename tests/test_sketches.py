"""Round-4 aggregate classes: hopping windows, KMV distinct sketch,
stratified sampling, histogram aggregate.

The driver's DuckDB hash gate proves engine == oracle; these tests prove the
SEMANTICS are right independently of the SQL (window multiplicity, sketch
error bound on a known-cardinality input, per-stratum rates, histogram mass
conservation)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ecg_feature_engineering_ray.pipelines.queries import (
    _HOP_N,
    _KMV_K,
    _STRAT_DEFAULT,
    _STRAT_RATES,
    QUERIES,
)

from .conftest import SF_DIR


def _df(name, sf_dir=SF_DIR):
    res = QUERIES[name](sf_dir)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    return res


def test_hopping_window_mass(ray_session):
    """Every event lands in exactly width/hop windows: total n_events over
    all (window, type) cells == _HOP_N x table rows, and per-type totals
    scale the same way."""
    out = _df("hopping_window_counts")
    ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_type"])
    assert out["n_events"].sum() == _HOP_N * ev.num_rows
    per_type = out.groupby("event_type")["n_events"].sum()
    import collections

    truth = collections.Counter(ev.column("event_type").to_pylist())
    for t, n in truth.items():
        assert per_type[t] == _HOP_N * n
    # hop-aligned starts, 4 consecutive windows cover each event
    assert (out["window_start_us"] % 3_600_000_000 == 0).all()


def test_kmv_error_bound_high_cardinality(ray_session, tmp_path):
    """On a synthetic table with KNOWN distinct cardinality >> k, the KMV
    estimate is within the published error envelope (std err ~ 1/sqrt(k-2),
    ~6.3% at k=256; gate at 4 sigma = 25%)."""
    rng = np.random.default_rng(7)
    n_distinct = 20_000
    vals = rng.choice(n_distinct, size=120_000).astype(np.float64) / 100.0
    tbl = pa.table({
        "event_type": pa.array(["a"] * len(vals)),
        "value": pa.array(vals),
        # unused columns the query does not read
        "event_id": pa.array(np.arange(len(vals))),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    out = _df("approx_distinct_kmv", str(d))
    true_distinct = len(np.unique(np.rint(vals * 100)))
    est = int(out.loc[out["event_type"] == "a", "est_distinct"].iloc[0])
    assert abs(est - true_distinct) / true_distinct < 0.25
    assert int(out["n_hashes"].iloc[0]) == _KMV_K


def test_kmv_exact_below_k(ray_session, tmp_path):
    """distinct < k -> the sketch is EXACT (it holds every distinct hash)."""
    vals = (np.arange(100) % 37).astype(np.float64)
    tbl = pa.table({
        "event_type": pa.array(["x"] * 100),
        "value": pa.array(vals),
        "event_id": pa.array(np.arange(100)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    out = _df("approx_distinct_kmv", str(d))
    assert int(out["est_distinct"].iloc[0]) == 37
    assert int(out["n_hashes"].iloc[0]) == 37


def test_stratified_rates(ray_session):
    """Per-stratum keep decisions match the md5 threshold exactly, and the
    sampled fraction per stratum tracks its configured rate."""
    out = _df("stratified_sample_docs").set_index("lang")
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"])
    ids = docs.column("doc_id").to_pylist()
    langs = docs.column("lang").to_pylist()
    expect: dict[str, int] = {}
    for i, lang in zip(ids, langs):
        rate = _STRAT_RATES.get(lang, _STRAT_DEFAULT)
        cut = int(np.floor(rate * 65536 + 0.5))
        if int(hashlib.md5(f"strat|{i}".encode()).hexdigest()[:4], 16) < cut:
            expect[lang] = expect.get(lang, 0) + 1
    for lang, n in expect.items():
        assert int(out.loc[lang, "n_sampled"]) == n
    # strata with zero survivors produce no row; all rows must be expected
    assert set(out.index) == set(expect)


def test_histogram_mass_and_bounds(ray_session):
    out = _df("value_histogram")
    ev = pq.read_table(f"{SF_DIR}/events.parquet", columns=["value"])
    assert out["n_events"].sum() == ev.num_rows
    assert out["bin"].between(0, 31).all()
    v = np.asarray(ev.column("value").combine_chunks(), dtype=np.float64)
    # clamped-edge bins: bin 31 holds everything >= 496
    top = int(out.loc[out["bin"] == 31, "n_events"].sum()) if (out["bin"] == 31).any() else 0
    assert top == int((v >= 496.0).sum())
