"""ANN: brute-force baseline vs IVF scale path — structure + recall."""

SF = "/root/testdata/sf0.001"


def test_knn_topk_structure():
    from ecg_feature_engineering_ray.pipelines.queries import QUERIES

    df = QUERIES["knn_topk"](SF).to_pandas()
    assert set(df.columns) == {"query_id", "neighbor_id", "sim", "rank"}
    assert (df.groupby("query_id")["rank"].max() == 5).all()
    # sims sorted descending within each query
    for _, g in df.groupby("query_id"):
        s = g.sort_values("rank").sim.values
        assert (s[:-1] >= s[1:] - 1e-12).all()
        assert not (g.neighbor_id == g.query_id).any()


def test_knn_ivf_recall_vs_bruteforce():
    from ecg_feature_engineering_ray.pipelines.queries import QUERIES

    brute = QUERIES["knn_topk"](SF).to_pandas()
    ivf = QUERIES["knn_ivf"](SF).to_pandas()
    recalls = []
    for qid, g in brute.groupby("query_id"):
        want = set(g.neighbor_id)
        got = set(ivf[ivf.query_id == qid].neighbor_id)
        recalls.append(len(want & got) / len(want))
    mean_recall = sum(recalls) / len(recalls)
    # 4 of 16 KMEANS-TRAINED probe lists: neighbors concentrate into the
    # query's lists (measured 0.87 on this fixture vs ~0.2-0.5 with the
    # untrained first-n_lists-vectors index of rounds ≤ 4)
    assert mean_recall >= 0.5, mean_recall
    # every IVF hit must be a genuine vector id with sane cosine
    assert ivf.sim.between(-1.000001, 1.000001).all()


def test_sign_lsh_near_dup_recall(tmp_path):
    """Planted near-duplicates must be recovered by the sign-LSH dedup
    (recall vs ground truth), and reported cosines must match brute force."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecg_feature_engineering_ray.pipelines.queries import embedding_near_dups

    rng = np.random.default_rng(5)
    n_base, n_dup = 200, 30
    V = rng.normal(size=(n_base, 64)).astype(np.float32)
    dups = (V[:n_dup] + rng.normal(scale=0.01, size=(n_dup, 64))).astype(np.float32)
    allv = np.vstack([V, dups])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(allv)), pa.int64()),
            "embedding": pa.array(list(allv), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(allv), np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    out = embedding_near_dups(str(tmp_path), threshold=0.9).to_pandas()
    found = set(zip(out.vec_a, out.vec_b))
    planted = {(i, n_base + i) for i in range(n_dup)}
    recall = len(found & planted) / n_dup
    assert recall >= 0.9, f"sign-LSH recall {recall} below 0.9 on planted dups"

    # cosines reported must equal brute-force cosine (verify stage is exact)
    Vn = allv.astype(np.float64)
    Vn = Vn / np.linalg.norm(Vn, axis=1, keepdims=True)
    for a, b, c in zip(out.vec_a, out.vec_b, out.cosine):
        assert abs(float(Vn[a] @ Vn[b]) - c) < 1e-5
