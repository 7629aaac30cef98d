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


def test_per_group_top_k_vs_brute(ray_session):
    """top_docs_per_lang == a pandas brute force (independent of the SQL
    oracle): per lang, the k longest docs with doc_id tiebreak, ranked."""
    import pandas as pd

    from ecg_feature_engineering_ray.pipelines.queries import _TOPDOC_K

    out = _df("top_docs_per_lang").reset_index(drop=True)
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    brute = (
        docs.sort_values(["lang", "n_chars", "doc_id"],
                         ascending=[True, False, True])
        .groupby("lang").head(_TOPDOC_K).reset_index(drop=True)
    )
    brute["len_rank"] = brute.groupby("lang").cumcount() + 1
    merged = brute[["lang", "doc_id", "n_chars", "len_rank"]]
    pd.testing.assert_frame_equal(
        out.sort_values(["lang", "len_rank"]).reset_index(drop=True),
        merged.sort_values(["lang", "len_rank"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_capped_sample_is_hash_minimal(ray_session):
    """capped_docs_per_source keeps exactly the k smallest md5 row hashes
    per source, rank-contiguous — brute-forced with hashlib directly."""
    from ecg_feature_engineering_ray.pipelines.queries import _CAP_K

    out = _df("capped_docs_per_source")
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    docs["h"] = [
        int(hashlib.md5(f"cap|{i}".encode()).hexdigest()[:15], 16)
        for i in docs["doc_id"]
    ]
    for src, grp in out.groupby("source"):
        assert len(grp) <= _CAP_K
        assert sorted(grp["sample_rank"]) == list(range(1, len(grp) + 1))
        truth = (
            docs[docs["source"] == src]
            .sort_values(["h", "doc_id"]).head(_CAP_K)["doc_id"].tolist()
        )
        got = grp.sort_values("sample_rank")["doc_id"].tolist()
        assert got == truth


def test_per_group_top_k_block_invariant(ray_session):
    """The mergeable partial prune is sound: result is identical when the
    input arrives as many tiny blocks (every block prunes independently)."""
    import ray.data

    from ecg_feature_engineering_ray.stages.groupagg import per_group_top_k

    rng = np.random.default_rng(7)
    n = 3000
    tbl = pa.table({
        "g": pa.array(rng.integers(0, 13, n).astype(str)),
        "score": pa.array(rng.integers(-1000, 1000, n)),
        "id": pa.array(np.arange(n)),
    })

    def run(num_blocks):
        ds = ray.data.from_arrow(tbl).repartition(num_blocks)
        out = per_group_top_k(ds, "g", ["score", "id"], 7, 4,
                              rank_name="r").to_pandas()
        return out.sort_values(["g", "r"]).reset_index(drop=True)

    a, b = run(1), run(64)
    assert a.equals(b)
    brute = (
        tbl.to_pandas().sort_values(["g", "score", "id"])
        .groupby("g").head(7).reset_index(drop=True)
    )
    brute["r"] = brute.groupby("g").cumcount() + 1
    assert a[["g", "score", "id", "r"]].equals(
        brute.sort_values(["g", "r"]).reset_index(drop=True)[["g", "score", "id", "r"]]
    )


def test_grouped_quantiles_vs_numpy(ray_session):
    """value_quantiles_by_type == numpy linear-interpolated percentiles over
    the cents-scaled values (independent of the SQL oracle), and the
    count-merge spine never ships rows: each partial is (group, cent, n)."""
    out = _df("value_quantiles_by_type").set_index("event_type")
    ev = pq.read_table(f"{SF_DIR}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["cent"] = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        got = out.loc[et]
        assert got["n_events"] == len(g)
        for q in (25, 50, 75, 90):
            want = np.percentile(g["cent"].to_numpy(dtype=np.float64), q,
                                 method="linear") / 100.0
            assert abs(got[f"p{q}"] - want) < 5e-7, (et, q)
