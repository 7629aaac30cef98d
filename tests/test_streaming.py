"""Streaming ring-buffer stage vs the batch sorted-bucket engine.

With allowed lateness covering the fixture's out-of-order plant, every row
is emitted and the streaming lag/session values must equal the batch
engine's (computed on fully sorted data).  With zero lateness, genuinely
late rows are counted dropped."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ecg_feature_engineering_ray.sources.readers import read_events
from ecg_feature_engineering_ray.stages.decode import decode_stage
from ecg_feature_engineering_ray.stages.streaming import streaming_lag_sessionize


def _decoded_arrival_order(events_dir):
    # decode in arrival order (fragments preserve arrival; no sort anywhere)
    ds = decode_stage(read_events(events_dir), concurrency=1, batch_size=512)
    return ds.select_columns(["image_id", "ts", "v"])


def _batch_reference(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    df["lag_ms"] = df.groupby("image_id").ts.diff().dt.total_seconds() * 1000.0
    df["v_lag1"] = df.groupby("image_id").v.shift(1)
    gap = df.groupby("image_id").ts.diff().dt.total_seconds() > 30.0
    df["session_id"] = gap.fillna(False).groupby(df.image_id).cumsum().astype(int)
    return df


def test_streaming_matches_batch_with_lateness(fixture_events):
    events_dir, _ = fixture_events
    ds = _decoded_arrival_order(events_dir)
    raw = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])

    # generous lateness — the whole stream replays, nothing dropped.
    # the emitted stream is a Dataset (no driver accumulation); the flush
    # tail + late count come from finalize() after consumption
    emitted_ds, finalize = streaming_lag_sessionize(
        ray.data.from_arrow(raw), num_actors=3, allowed_lateness_us=10**15
    )
    parts = [pa.table(b) for b in emitted_ds.iter_batches(batch_format="pyarrow")]
    tail, late = finalize()
    got = pa.concat_tables(parts + [tail])
    assert late == 0
    assert got.num_rows == raw.num_rows

    want = _batch_reference(raw)
    g = got.to_pandas().sort_values(["image_id", "ts"]).reset_index(drop=True)
    assert (g.image_id.values == want.image_id.values).all()
    assert np.allclose(g.lag_ms.values, want.lag_ms.values, equal_nan=True)
    assert np.allclose(g.v_lag1.values, want.v_lag1.values, equal_nan=True)
    assert (g.session_id.values == want.session_id.values).all()


def _args(rows):
    """(id, ts, v) tuples → the array-handoff ingest arguments."""
    ids = [r[0] for r in rows]
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    vs = np.array([r[2] for r in rows], dtype=np.float64)
    return ids, ts, vs


def test_ingest_is_idempotent_and_memo_bounded(ray_session):
    """A replayed (batch, key) — a Ray task retry — must return the memoized
    emission without touching state, and the memo must stay bounded."""
    from ecg_feature_engineering_ray.stages.streaming import EntityStateActor

    a = EntityStateActor.remote(allowed_lateness_us=0, seen_cap=2)
    rows = [("e1", 1_000_000, 1.0), ("e1", 2_000_000, 2.0)]
    first = ray.get(a.ingest.remote(*_args(rows), "k1"))
    replay = ray.get(a.ingest.remote(*_args(rows), "k1"))
    assert repr(replay) == repr(first)  # memoized — not re-ingested (repr: NaN-safe)
    # re-ingesting WITHOUT the memo would count both rows late (ts <= wm);
    # the late counter must be untouched by the replay
    assert replay["late_dropped"] == first["late_dropped"] == 0

    # FIFO eviction at seen_cap=2: after two more keys, k1 is forgotten and
    # its (now stale) rows fall to the watermark instead of replaying
    ray.get(a.ingest.remote(*_args([("e1", 3_000_000, 3.0)]), "k2"))
    ray.get(a.ingest.remote(*_args([("e1", 4_000_000, 4.0)]), "k3"))
    evicted = ray.get(a.ingest.remote(*_args(rows), "k1"))
    assert evicted["late_dropped"] == 2  # state was consulted, not the memo

    # row-bounded memo: entries evict once total memoized rows exceed the
    # cap, even when the entry count is far under seen_cap
    b = EntityStateActor.remote(allowed_lateness_us=0, seen_cap=100,
                                seen_rows_cap=3)
    r1 = [("e1", 1_000_000, 1.0), ("e1", 2_000_000, 2.0)]
    r2 = [("e1", 3_000_000, 3.0), ("e1", 4_000_000, 4.0)]
    ray.get(b.ingest.remote(*_args(r1), "ka"))
    ray.get(b.ingest.remote(*_args(r2), "kb"))  # 4 memoized rows > 3 → "ka" evicted
    evicted_b = ray.get(b.ingest.remote(*_args(r1), "ka"))
    assert evicted_b["late_dropped"] == 2  # state consulted, not the memo
    replay_b = ray.get(b.ingest.remote(*_args(r2), "kb"))  # newest entry kept
    assert replay_b["late_dropped"] == 0  # memo hit — untouched by eviction


def test_memo_key_offsets_distinguish_identical_payloads():
    """Content keys treat byte-identical batches as retries; offset keys
    treat them as distinct deliveries (advice: true duplicates must hit the
    watermark path when the source provides delivery offsets)."""
    from ecg_feature_engineering_ray.stages.streaming import _batch_memo_key

    ids = pa.array(["e1", "e1"], pa.string())
    ts = np.array([1_000_000, 2_000_000], dtype=np.int64)
    vs = np.array([1.0, 2.0], dtype=np.float64)

    # content keying: identical arrays → identical key (retry-stable)
    assert _batch_memo_key(ids, ts, vs) == _batch_memo_key(ids, ts, vs)
    # any field differing → different key
    assert _batch_memo_key(ids, ts, vs) != _batch_memo_key(ids, ts, vs + 1.0)

    # offset keying: same payload, different offsets → DIFFERENT keys;
    # same offsets (a retry) → same key
    o1 = np.array([10, 11], dtype=np.int64)
    o2 = np.array([12, 13], dtype=np.int64)
    assert _batch_memo_key(ids, ts, vs, offsets=o1) == _batch_memo_key(ids, ts, vs, offsets=o1)
    assert _batch_memo_key(ids, ts, vs, offsets=o1) != _batch_memo_key(ids, ts, vs, offsets=o2)


def test_streaming_zero_lateness_drops_late_rows(fixture_events):
    events_dir, _ = fixture_events
    ds = _decoded_arrival_order(events_dir)
    raw = pa.concat_tables([pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")])
    emitted_ds, finalize = streaming_lag_sessionize(
        ray.data.from_arrow(raw), num_actors=3, allowed_lateness_us=0
    )
    parts = [pa.table(b) for b in emitted_ds.iter_batches(batch_format="pyarrow")]
    tail, late = finalize()
    got = pa.concat_tables(parts + [tail])
    # the fixture plants ~10% out-of-order rows → some must be dropped
    assert late > 0
    assert got.num_rows + late >= raw.num_rows
