"""Near-dup clustering (connected components over shared winnowing
fingerprints).

The driver's DuckDB recursive-CTE gate proves engine == oracle on the
fixture tables; these tests prove the ITERATIVE algorithm itself against a
brute-force union-find oracle on a planted graph whose components chain
across many fingerprint buckets (forcing multiple global label-propagation
rounds), plus the empty-edge early return."""

from __future__ import annotations

import string

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ecg_feature_engineering_ray.functions.text import rolling_fingerprint
from ecg_feature_engineering_ray.pipelines.queries import QUERIES


def _rand_text(rng, n):
    return "".join(rng.choice(list(string.ascii_lowercase + " "), size=n))


def _write_docs(tmp_path, texts):
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def _union_find_truth(texts):
    """Brute-force oracle: union docs sharing ANY kept fingerprint; report
    (doc -> (component min, component size)) for docs with >= 1 edge, i.e.
    sharing a fingerprint with at least one OTHER doc."""
    fps = [set(rolling_fingerprint(t)) for t in texts]
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_fp: dict[int, list[int]] = {}
    for i, s in enumerate(fps):
        for h in s:
            by_fp.setdefault(h, []).append(i)
    in_edge = set()
    for members in by_fp.values():
        if len(members) > 1:
            in_edge.update(members)
            for m in members[1:]:
                ra, rb = find(members[0]), find(m)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for i in sorted(in_edge):
        comp.setdefault(find(i), []).append(i)
    truth = {}
    for root, members in comp.items():
        lo = min(members)
        for m in members:
            truth[m] = (lo, len(members))
    return truth


def test_dup_clusters_chained_components(ray_session, tmp_path):
    """Planted chains A-B-C-D-E (consecutive docs share a 100-char block,
    ends share nothing) must collapse to ONE component each with the min
    doc_id canonical — requires label propagation across fingerprint
    buckets, not just within-bucket grouping."""
    rng = np.random.default_rng(7)
    texts = []
    # 4 chains of 5 docs; consecutive pair (i, i+1) shares block b_i
    for c in range(4):
        blocks = [_rand_text(rng, 100) for _ in range(4)]
        for j in range(5):
            left = blocks[j - 1] if j > 0 else _rand_text(rng, 100)
            right = blocks[j] if j < 4 else _rand_text(rng, 100)
            texts.append(left + _rand_text(rng, 40) + right)
    # plus isolated docs (unique text, no shared fingerprints)
    for _ in range(10):
        texts.append(_rand_text(rng, 200))

    truth = _union_find_truth(texts)
    # the plant must actually produce 4 five-doc components
    sizes = sorted({v for v in truth.values()}, key=lambda t: t[0])
    assert [s for _, s in sizes] == [5, 5, 5, 5], sizes

    res = QUERIES["dup_clusters"](_write_docs(tmp_path, texts))
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    got = {
        int(r.doc_id): (int(r.canonical_id), int(r.cluster_size))
        for r in df.itertuples()
    }
    assert got == truth


def test_dup_clusters_no_shared_fingerprints(ray_session, tmp_path):
    """A corpus of unique documents has no candidate edges: the operator
    returns zero rows through the early-return path."""
    rng = np.random.default_rng(13)
    texts = [_rand_text(rng, 120) for _ in range(8)]
    assert not _union_find_truth(texts)  # fixture really is edge-free
    res = QUERIES["dup_clusters"](_write_docs(tmp_path, texts))
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) == 0
    assert list(df.columns) == ["doc_id", "canonical_id", "cluster_size"]
