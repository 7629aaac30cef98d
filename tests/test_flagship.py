"""Flagship PIT pipeline vs the single-threaded oracle, plus checkpoint,
resume, skew and determinism invariants (FIXTURES.md §invariants)."""

import os

import numpy as np
import pandas as pd
import pytest

from ecg_feature_engineering_ray.pipelines.features import PIT_FEATURE_NAMES
from ecg_feature_engineering_ray.pipelines.flagship import (
    pit_features,
    pit_features_checkpointed,
)
from ecg_feature_engineering_ray.stages.partition import detect_hot_keys
from ecg_feature_engineering_ray.state.checkpoint import (
    completed_buckets,
    partition_paths,
    read_manifests,
    read_output,
)

from .oracle import oracle_pit_features


@pytest.fixture(scope="module")
def engine_result(fixture_events, fixture_queries):
    events_dir, _ = fixture_events
    ds = pit_features(events_dir, fixture_queries, num_buckets=8)
    return ds.to_pandas()


@pytest.fixture(scope="module")
def oracle_result(fixture_events, fixture_queries):
    events_dir, _ = fixture_events
    return oracle_pit_features(events_dir, fixture_queries)


def _aligned(engine: pd.DataFrame, oracle: pd.DataFrame):
    key = ["image_id", "as_of_ts"]
    e = engine.sort_values(key).reset_index(drop=True)
    o = oracle.sort_values(key).reset_index(drop=True)
    assert len(e) == len(o)
    assert (e.image_id.values == o.image_id.values).all()
    return e, o


def test_flagship_matches_oracle(engine_result, oracle_result):
    e, o = _aligned(engine_result, oracle_result)
    for name in PIT_FEATURE_NAMES:
        assert np.allclose(
            e[name].values, o[name].values, rtol=1e-9, atol=1e-12, equal_nan=True
        ), f"feature {name} diverges"


def test_flagship_covers_all_queries(engine_result, fixture_queries):
    import pyarrow.parquet as pq

    n_queries = pq.read_metadata(fixture_queries).num_rows
    assert len(engine_result) == n_queries


def test_checkpointed_equals_streaming(engine_result, fixture_events, fixture_queries, tmp_path):
    events_dir, _ = fixture_events
    out_dir = str(tmp_path / "ckpt")
    manifests = pit_features_checkpointed(events_dir, fixture_queries, out_dir, num_buckets=8)
    assert manifests, "first run must commit partitions"
    for m in manifests:
        assert m["rows"] >= 0 and m["input_fragments"] and "watermark_us" in m
        assert m["rows_per_s"] is None or m["rows_per_s"] >= 0

    got = read_output(out_dir).to_pandas()
    key = ["image_id", "as_of_ts"]
    a = got.sort_values(key).reset_index(drop=True)
    b = engine_result.sort_values(key).reset_index(drop=True)
    for name in PIT_FEATURE_NAMES:
        assert np.allclose(a[name].values, b[name].values, equal_nan=True)


def test_resume_skips_completed_and_reproduces(fixture_events, fixture_queries, tmp_path):
    events_dir, _ = fixture_events
    full_dir = str(tmp_path / "full")
    pit_features_checkpointed(events_dir, fixture_queries, full_dir, num_buckets=8)
    full = read_output(full_dir).to_pandas()

    # simulate a crash: copy output, delete 3 partitions, resume
    resume_dir = str(tmp_path / "resume")
    os.makedirs(resume_dir)
    import shutil

    for f in os.listdir(full_dir):
        shutil.copy(os.path.join(full_dir, f), resume_dir)
    victims = sorted(completed_buckets(resume_dir))[:3]
    for b in victims:
        data, man = partition_paths(resume_dir, b)
        os.remove(data)
        os.remove(man)

    before = completed_buckets(resume_dir)
    manifests = pit_features_checkpointed(events_dir, fixture_queries, resume_dir, num_buckets=8)
    recomputed = {m["bucket"] for m in manifests}
    assert recomputed == set(victims), "resume must recompute exactly the missing partitions"
    assert before.isdisjoint(recomputed)

    key = ["image_id", "as_of_ts"]
    a = read_output(resume_dir).to_pandas().sort_values(key).reset_index(drop=True)
    b = full.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for name in PIT_FEATURE_NAMES:
        assert np.allclose(a[name].values, b[name].values, equal_nan=True)


def test_hot_entity_isolated_and_correct(fixture_events, engine_result, oracle_result):
    """The planted hot entity (30% of rows) gets a dedicated bucket and its
    features still match the oracle."""
    events_dir, manifest = fixture_events
    from ecg_feature_engineering_ray.sources.readers import read_events

    ds = read_events(events_dir, columns=["image_id"])
    hot = detect_hot_keys(ds, "image_id", hot_frac=0.10)
    assert manifest["hot_entity"] in hot

    e, o = _aligned(engine_result, oracle_result)
    mask = e.image_id == manifest["hot_entity"]
    assert mask.any()
    for name in PIT_FEATURE_NAMES:
        assert np.allclose(e[name].values[mask], o[name].values[mask], equal_nan=True)


def test_determinism_two_runs(fixture_events, fixture_queries):
    events_dir, _ = fixture_events
    a = pit_features(events_dir, fixture_queries, num_buckets=8).to_pandas()
    b = pit_features(events_dir, fixture_queries, num_buckets=4).to_pandas()
    key = ["image_id", "as_of_ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    for name in PIT_FEATURE_NAMES:
        va, vb = a[name].values, b[name].values
        assert ((va == vb) | (np.isnan(va) & np.isnan(vb))).all(), name


def test_backfill_late_fragment(fixture_events, fixture_queries, tmp_path):
    """A late-arriving fragment invalidates exactly the touched partitions and
    the backfilled output equals a from-scratch run over all fragments."""
    import shutil

    import pyarrow.parquet as pq

    from ecg_feature_engineering_ray.state.backfill import (
        invalidate_for_fragments,
        late_rows_below_watermark,
    )

    events_dir, _ = fixture_events
    # hold back part of one fragment as the "late" arrival
    frags = sorted(os.listdir(events_dir))
    staged = tmp_path / "staged_events"
    staged.mkdir()
    for f in frags[:-1]:
        shutil.copy(os.path.join(events_dir, f), staged)
    late_path = tmp_path / "late.parquet"
    pq.write_table(pq.read_table(os.path.join(events_dir, frags[-1])), str(late_path))

    out_dir = str(tmp_path / "out")
    m1 = pit_features_checkpointed(str(staged), fixture_queries, out_dir, num_buckets=8)
    assert m1

    # the held-back fragment contains rows below committed watermarks
    assert late_rows_below_watermark(out_dir, [str(late_path)]) > 0

    # late fragment lands in the dataset dir; invalidate + recompute
    shutil.copy(str(late_path), os.path.join(str(staged), frags[-1]))
    invalidated = invalidate_for_fragments(out_dir, [str(late_path)])
    assert invalidated
    m2 = pit_features_checkpointed(str(staged), fixture_queries, out_dir, num_buckets=8)
    assert {m["bucket"] for m in m2} == invalidated

    # compare to scratch run over the full data
    scratch_dir = str(tmp_path / "scratch")
    pit_features_checkpointed(str(staged), fixture_queries, scratch_dir, num_buckets=8)
    key = ["image_id", "as_of_ts"]
    a = read_output(out_dir).to_pandas().sort_values(key).reset_index(drop=True)
    b = read_output(scratch_dir).to_pandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for name in PIT_FEATURE_NAMES:
        va, vb = a[name].values, b[name].values
        assert ((va == vb) | (np.isnan(va) & np.isnan(vb))).all(), name


def test_bucket_plan_atoms_bounded_and_placed(fixture_events, fixture_queries):
    """Plan invariants for the sub-bucket salting: (a) every salted entity's
    k is ceil(cost/atom_target) capped at max_salt — no atom exceeds
    ~(bucket share)/granularity, (b) the LPT heavy threshold tracks the atom
    size so the placement map is NON-empty (a granularity that outruns the
    threshold silently degrades to hash-luck placement — the bug this
    guards), (c) k never exceeds max_salt."""
    from ecg_feature_engineering_ray.pipelines.flagship import compute_bucket_plan

    events_dir, manifest = fixture_events
    for granularity in (1, 4):
        cfg = compute_bucket_plan(
            events_dir, fixture_queries, num_buckets=16,
            max_salt=6, granularity=granularity,
        )
        assert all(1 < k <= 6 for k in cfg["salt"].values())
        assert cfg["plan"], "LPT placement must not be empty when costs vary"
    # finer granularity ⇒ at least as many entities split, never fewer
    g1 = compute_bucket_plan(events_dir, fixture_queries, num_buckets=16, granularity=1)
    g4 = compute_bucket_plan(events_dir, fixture_queries, num_buckets=16, granularity=4)
    assert set(g1["salt"]) <= set(g4["salt"])
    assert all(g4["salt"][k] >= v for k, v in g1["salt"].items())


def test_checkpointed_salted_plan_resume_and_balance(
    fixture_events, fixture_queries, oracle_result, tmp_path
):
    """The checkpointed path gets the SAME cost-model salting as the
    throughput path: plan+salt persist in the run config, the hot entity's
    work lands in >1 partition (makespan probe), resume reuses the committed
    plan, and a conflicting plan is rejected like a num_buckets mismatch."""
    import pyarrow.parquet as pq

    from ecg_feature_engineering_ray.pipelines.flagship import compute_bucket_plan
    from ecg_feature_engineering_ray.state.backfill import load_run_config

    events_dir, manifest = fixture_events
    hot = manifest["hot_entity"]
    cfg = compute_bucket_plan(events_dir, fixture_queries, num_buckets=64, max_salt=4)
    assert cfg["salt"].get(hot, 1) > 1, "hot entity must be salted at this bucket count"

    out_dir = str(tmp_path / "salted")
    pit_features_checkpointed(
        events_dir, fixture_queries, out_dir, num_buckets=64, bucket_plan=cfg
    )
    rc = load_run_config(out_dir)
    assert rc["plan"] and rc["salt"].get(hot, 1) > 1, "plan+salt must persist"

    # makespan probe: the salted hot entity's queries spread over >1 partition
    hot_parts = 0
    for f in sorted(os.listdir(out_dir)):
        if f.endswith(".parquet"):
            ids = pq.read_table(os.path.join(out_dir, f), columns=["image_id"])
            if (ids.column("image_id").to_pandas() == hot).any():
                hot_parts += 1
    assert hot_parts >= 2, "salting must split the hot entity across partitions"

    # values still exact vs the oracle
    key = ["image_id", "as_of_ts"]
    a = read_output(out_dir).to_pandas().sort_values(key).reset_index(drop=True)
    o = oracle_result.sort_values(key).reset_index(drop=True)
    assert len(a) == len(o)
    for name in PIT_FEATURE_NAMES:
        assert np.allclose(a[name].values, o[name].values, rtol=1e-9, atol=1e-12, equal_nan=True), name

    # a conflicting plan on resume is a hard error
    with pytest.raises(ValueError, match="bucket_plan differs"):
        pit_features_checkpointed(
            events_dir, fixture_queries, out_dir, num_buckets=64,
            bucket_plan={"plan": {}, "salt": {}},
        )

    # resume with no plan argument reuses the committed plan: recompute one
    # victim partition, byte-equal output
    victims = sorted(completed_buckets(out_dir))[:1]
    for b in victims:
        data, man = partition_paths(out_dir, b)
        os.remove(data)
        os.remove(man)
    m2 = pit_features_checkpointed(events_dir, fixture_queries, out_dir, num_buckets=64)
    assert {m["bucket"] for m in m2} == set(victims)
    a2 = read_output(out_dir).to_pandas().sort_values(key).reset_index(drop=True)
    for name in PIT_FEATURE_NAMES:
        va, vb = a2[name].values, a[name].values
        assert ((va == vb) | (np.isnan(va) & np.isnan(vb))).all(), name


def test_commit_partition_idempotent_retry(tmp_path):
    """A replayed commit task (worker lost after manifest write) must be a
    no-op returning the committed manifest; only CONTENT mismatch raises."""
    import time as _time

    import pyarrow as pa

    from ecg_feature_engineering_ray.state.checkpoint import commit_partition

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    m1 = commit_partition(str(tmp_path), 0, t, ["frag"], 5, _time.time())
    m2 = commit_partition(str(tmp_path), 0, t, ["frag"], 5, _time.time())
    assert m2["rows"] == m1["rows"] == 3
    with pytest.raises(FileExistsError, match="refusing to overwrite"):
        commit_partition(
            str(tmp_path), 0, pa.table({"a": pa.array([1], pa.int64())}),
            ["frag"], 5, _time.time(),
        )


def test_salting_splits_hot_entity_and_stays_correct(fixture_events, fixture_queries, oracle_result):
    """Forcing aggressive salting (tiny cost target via huge bucket count)
    must split the hot entity's queries across salt groups and still match
    the oracle exactly."""
    from ecg_feature_engineering_ray.pipelines.flagship import compute_bucket_plan

    events_dir, manifest = fixture_events
    cfg = compute_bucket_plan(events_dir, fixture_queries, num_buckets=64, max_salt=4)
    assert cfg["salt"].get(manifest["hot_entity"], 1) > 1, "hot entity must be salted"

    got = pit_features(
        events_dir, fixture_queries, num_buckets=64, bucket_plan=cfg
    ).to_pandas()
    key = ["image_id", "as_of_ts"]
    e = got.sort_values(key).reset_index(drop=True)
    o = oracle_result.sort_values(key).reset_index(drop=True)
    assert len(e) == len(o)
    for name in PIT_FEATURE_NAMES:
        assert np.allclose(e[name].values, o[name].values, rtol=1e-9, atol=1e-12, equal_nan=True), name
