"""Streaming lag/sessionize with per-entity ring buffers (stateful actors).

The batch engine answers ordered-window semantics with the sorted-bucket
pass (stages/partition.py) — right for bounded replays.  For UNBOUNDED
arrival-ordered streams the same semantics need per-entity state that lives
across batches: this module implements it with raw ``@ray.remote`` actors —
the documented "last resort" (SURVEY.md §2.10 mapping: T4 ring buffers).

Topology: entities are hash-pinned to one of N ``EntityStateActor``s (state
never crosses workers); each actor keeps, per entity:

- a pending min-heap of rows not yet past the watermark
  (``watermark = max_ts_seen − allowed_lateness``) — absorbs out-of-order
  arrival up to the configured lateness;
- a ring buffer of the last K emitted events (lag features, deque semantics
  ≙ the reference's whole-record array, HRV_features.py:106);
- the open session (gap rule, ≙ beat segmentation, extract_SHORT.py:56).

Rows older than the watermark at arrival are counted ``late_dropped``
(backfill for those is the batch path, state/backfill.py).  ``flush()``
drains everything at end-of-stream.
"""

from __future__ import annotations

import heapq
from collections import deque

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import md5_u64

SESSION_GAP_US = 30_000_000


@ray.remote
class EntityStateActor:
    def __init__(self, allowed_lateness_us: int, ring_size: int = 8, gap_us: int = SESSION_GAP_US):
        self.lateness = allowed_lateness_us
        self.gap = gap_us
        self.ring_size = ring_size
        self.pending: dict[str, list] = {}          # entity → heap of (ts, v)
        self.ring: dict[str, deque] = {}            # entity → last K (ts, v) emitted
        self.session: dict[str, int] = {}           # entity → current session id
        self.watermark: dict[str, int] = {}         # entity → emit watermark
        self.max_ts: dict[str, int] = {}
        self.late_dropped = 0

    def _emit_ready(self, eid: str, out: list) -> None:
        wm = self.watermark.get(eid, -1)
        heap = self.pending.get(eid, [])
        ring = self.ring.setdefault(eid, deque(maxlen=self.ring_size))
        while heap and heap[0][0] <= wm:
            ts, v = heapq.heappop(heap)
            prev = ring[-1] if ring else None
            if prev is not None and ts < prev[0]:
                # arrived within lateness but BELOW an already-emitted row:
                # emit flagged with no lag (order already violated)
                self.late_dropped += 1
                continue
            lag_ms = (ts - prev[0]) / 1000.0 if prev is not None else np.nan
            v_lag = prev[1] if prev is not None else np.nan
            sid = self.session.get(eid, 0)
            if prev is not None and ts - prev[0] > self.gap:
                sid += 1
                self.session[eid] = sid
            ring.append((ts, v))
            out.append((eid, ts, v, lag_ms, v_lag, sid))

    def ingest(self, rows: list) -> dict:
        """rows: list of (image_id, ts_us, v). Returns emitted rows + stats."""
        out: list = []
        touched = set()
        for eid, ts, v in rows:
            wm = self.watermark.get(eid, -1)
            if ts <= wm:
                self.late_dropped += 1
                continue
            heapq.heappush(self.pending.setdefault(eid, []), (ts, v))
            m = max(self.max_ts.get(eid, ts), ts)
            self.max_ts[eid] = m
            self.watermark[eid] = m - self.lateness
            touched.add(eid)
        for eid in touched:
            self._emit_ready(eid, out)
        return {"rows": out, "late_dropped": self.late_dropped}

    def flush(self) -> list:
        out: list = []
        for eid in list(self.pending):
            self.watermark[eid] = self.max_ts.get(eid, 0)
            self._emit_ready(eid, out)
        return out


def streaming_lag_sessionize(
    ds,
    num_actors: int = 4,
    allowed_lateness_us: int = 600_000_000,
    key: str = "image_id",
    ts_col: str = "ts",
    value_col: str = "v",
) -> tuple[pa.Table, int]:
    """Run the arrival-ordered Dataset through the actor ring.

    Returns (emitted table, late_dropped count).  The driver routes each
    batch's rows to the entity's pinned actor; emission order is per-entity
    ts order for everything within the lateness budget.
    """
    actors = [EntityStateActor.remote(allowed_lateness_us) for _ in range(num_actors)]
    emitted: list = []
    pending_calls: list = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        ids = batch.column(key).to_pylist()
        ts = batch.column(ts_col).cast(pa.int64()).to_pylist()
        vs = batch.column(value_col).to_pylist()
        per_actor: dict[int, list] = {}
        for eid, t, v in zip(ids, ts, vs):
            per_actor.setdefault(md5_u64(eid) % num_actors, []).append((eid, t, v))
        for a, rows in per_actor.items():
            pending_calls.append(actors[a].ingest.remote(rows))
        # drain completed calls opportunistically (backpressure)
        if len(pending_calls) > 4 * num_actors:
            done, pending_calls = pending_calls[: 2 * num_actors], pending_calls[2 * num_actors :]
            for r in ray.get(done):
                emitted.extend(r["rows"])
    for r in ray.get(pending_calls):
        emitted.extend(r["rows"])
    for rows in ray.get([a.flush.remote() for a in actors]):
        emitted.extend(rows)
    late = sum(ray.get([a.ingest.remote([]) for a in actors])[i]["late_dropped"] for i in range(num_actors))
    cols = list(zip(*emitted)) if emitted else [[]] * 6
    table = pa.table(
        {
            "image_id": pa.array(cols[0], pa.string()),
            "ts": pa.array(cols[1], pa.int64()).cast(pa.timestamp("us")),
            "v": pa.array(cols[2], pa.float64()),
            "lag_ms": pa.array(cols[3], pa.float64()),
            "v_lag1": pa.array(cols[4], pa.float64()),
            "session_id": pa.array(cols[5], pa.int64()),
        }
    )
    return table, late
