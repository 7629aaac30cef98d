"""Round-5 curation operators: benchmark decontamination, Gopher-style
repetition filtering, sequence packing.

The driver's DuckDB hash gate proves engine == oracle; these tests prove
the SEMANTICS independently of the SQL (set-overlap truth from a pure
Python recount, repetition ratios on constructed pathological docs, packed
offsets forming one contiguous global token axis)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ecg_feature_engineering_ray.pipelines.queries import (
    _DECON_BENCH_MOD,
    _DECON_N,
    _PACK_SEQ,
    QUERIES,
)

from .conftest import SF_DIR


def _df(name, sf_dir=SF_DIR):
    res = QUERIES[name](sf_dir)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    return res


def _grams(text: str, n: int) -> set[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}


def test_decontaminate_matches_set_recount(ray_session):
    """Engine output == a pure-Python string-set recount of shared n-grams
    (no hashing, no SQL) over the same parquet."""
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    bench: set[str] = set()
    for d, t in zip(ids, texts):
        if d % _DECON_BENCH_MOD == 0:
            bench |= _grams(t, _DECON_N)
    truth = {}
    for d, t in zip(ids, texts):
        if d % _DECON_BENCH_MOD != 0:
            k = len(_grams(t, _DECON_N) & bench)
            if k:
                truth[d] = k
    out = _df("decontaminate_docs")
    got = dict(zip(out["doc_id"], out["n_shared"]))
    assert got == truth
    assert truth, "fixture must exercise a non-empty overlap"
    # no benchmark doc may appear in the flagged output
    assert all(d % _DECON_BENCH_MOD != 0 for d in got)


def test_repetition_filter_pathological_docs(ray_session, tmp_path):
    """Constructed docs with known ratios: an all-same-token doc (top ratio
    1.0, dup-trigram ratio (n-2-1)/(n-2) -> drop) vs an all-distinct doc
    (top ratio 1/n, dup ratio 0 -> keep), plus a short doc with < 3 tokens
    (no trigrams -> dup ratio 0)."""
    n = 40
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            " ".join(["spam"] * n),
            " ".join(f"w{i}" for i in range(n)),
            "a b",
        ]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = _df("doc_repetition_filter", str(tmp_path)).set_index("doc_id")
    assert out.loc[1, "top_tok_ratio"] == 1.0
    assert out.loc[1, "dup_tri_ratio"] == round((n - 2 - 1) / (n - 2), 6)
    assert out.loc[1, "keep"] == 0
    assert out.loc[2, "top_tok_ratio"] == 1.0 / n
    assert out.loc[2, "dup_tri_ratio"] == 0.0
    assert out.loc[2, "keep"] == 1
    assert out.loc[3, "n_tokens"] == 2
    assert out.loc[3, "dup_tri_ratio"] == 0.0


def test_repetition_filter_real_table_ratios(ray_session):
    """On the fixture corpus: ratios live in [0, 1], n_tokens matches a
    direct split count, and keep is exactly the threshold predicate."""
    out = _df("doc_repetition_filter")
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    lens = {d: len(t.split(" ")) for d, t in
            zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())}
    assert len(out) == docs.num_rows
    assert (out["top_tok_ratio"] > 0).all() and (out["top_tok_ratio"] <= 1).all()
    assert (out["dup_tri_ratio"] >= 0).all() and (out["dup_tri_ratio"] <= 1).all()
    assert all(lens[d] == n for d, n in zip(out["doc_id"], out["n_tokens"]))
    want_keep = ((out["top_tok_ratio"] <= 0.2) & (out["dup_tri_ratio"] <= 0.1))
    assert (out["keep"] == want_keep.astype(np.int64)).all()


def test_pack_sequences_contiguous_global_axis(ray_session):
    """tok_start in doc_id order is the exclusive prefix sum of n_tokens —
    one gapless global token axis — and each doc's sequence range is the
    floor-division of its [start, end) token span by the sequence length."""
    out = _df("pack_sequences").sort_values("doc_id").reset_index(drop=True)
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    assert len(out) == docs.num_rows
    nt = out["n_tokens"].to_numpy()
    start = out["tok_start"].to_numpy()
    assert start[0] == 0
    assert (start[1:] == np.cumsum(nt)[:-1]).all()
    assert (out["seq_start"].to_numpy() == start // _PACK_SEQ).all()
    assert (out["seq_end"].to_numpy() == (start + nt - 1) // _PACK_SEQ).all()
    # doc_id order == packing order regardless of block layout
    assert (np.diff(out["doc_id"].to_numpy()) > 0).all()
