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


def test_heavy_hitters_planted(ray_session, tmp_path):
    """A planted boilerplate token crossing the 2n/k threshold is found with
    its EXACT corpus count; tokens below threshold never appear."""
    rng = np.random.default_rng(11)
    docs = []
    for i in range(400):
        words = [f"w{rng.integers(0, 5000)}" for _ in range(40)]
        if i % 2 == 0:
            words[::7] = ["BOILER"] * len(words[::7])  # ~6 plants x 200 docs
        docs.append(" ".join(words))
    tbl = pa.table({"doc_id": pa.array(np.arange(len(docs))),
                    "text": pa.array(docs)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    out = _df("heavy_hitter_tokens", str(d))
    # exact truth
    from collections import Counter

    c = Counter(t for s in docs for t in s.split(" "))
    n = sum(c.values())
    truth = {t: m for t, m in c.items() if m * 256 > n}
    assert "BOILER" in truth  # the plant actually crosses the threshold
    got = dict(zip(out["token"], out["n_occurrences"]))
    assert got == truth


def test_heavy_hitters_sketch_row_bound(ray_session):
    """Pass-1 sketch emits at most k+1 rows per batch (pigeonhole) — the
    bound that makes the exchange O(k x blocks) instead of O(vocabulary)."""
    import pyarrow.compute as pc

    from ecg_feature_engineering_ray.pipelines.queries import _HH_K

    texts = pa.table({"text": pa.array([" ".join(f"t{i}" for i in range(2000))] * 3)})
    flat = pc.list_flatten(pc.split_pattern(texts.column("text"), " "))
    ni = len(flat)
    cnt = pa.table({"token": flat}).group_by("token").aggregate([("token", "count")])
    keep = cnt.filter(pc.greater(pc.multiply(cnt.column("token_count"), _HH_K), ni))
    assert keep.num_rows <= _HH_K
