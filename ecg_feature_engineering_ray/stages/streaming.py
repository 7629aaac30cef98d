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
    def __init__(self, allowed_lateness_us: int, ring_size: int = 8, gap_us: int = SESSION_GAP_US,
                 seen_cap: int = 4096, seen_rows_cap: int = 262_144):
        self.lateness = allowed_lateness_us
        self.gap = gap_us
        self.ring_size = ring_size
        self.pending: dict[str, list] = {}          # entity → heap of (ts, v)
        self.ring: dict[str, deque] = {}            # entity → last K (ts, v) emitted
        self.session: dict[str, int] = {}           # entity → current session id
        self.watermark: dict[str, int] = {}         # entity → emit watermark
        self.max_ts: dict[str, int] = {}
        self.late_dropped = 0
        # exactly-once re-delivery: ingest is keyed by a content fingerprint;
        # a Ray task retry (or re-execution of the routing stage) replays the
        # SAME batch and gets the memoized emission instead of corrupting
        # watermarks/sessions with a double ingest.  BOUNDED (FIFO eviction)
        # in BOTH entry count and total memoized rows: each entry retains a
        # batch's full emitted rows, so an entry-only cap could still pin
        # (entries × batch rows) of heap — retries replay recent batches, so
        # only a trailing window is ever consulted.
        self.seen: dict[str, dict] = {}
        self.seen_cap = seen_cap
        self.seen_rows_cap = seen_rows_cap
        self._seen_rows = 0

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

    def ingest(self, ids, ts_arr, v_arr, batch_key: str | None = None) -> dict:
        """Parallel arrays: ids (Arrow string array or list), ts_arr (int64
        µs), v_arr (float64).  Array handoff keeps the router free of
        per-row Python tuple construction; the per-row loop below is the
        actor's inherent state machine (heap pushes), not serialization.

        ``batch_key`` (from the router, :func:`_batch_memo_key`) makes
        ingest IDEMPOTENT: a replayed key returns the memoized result
        without touching state — Ray task retries and Dataset re-execution
        deliver each batch's effect exactly once."""
        if batch_key is not None and batch_key in self.seen:
            return self.seen[batch_key]
        if isinstance(ids, (pa.Array, pa.ChunkedArray)):
            ids = ids.to_pylist()
        ts_list = np.asarray(ts_arr).tolist()
        v_list = np.asarray(v_arr, dtype=np.float64).tolist()
        out: list = []
        touched = set()
        for eid, ts, v in zip(ids, ts_list, v_list):
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
        result = {"rows": out, "late_dropped": self.late_dropped}
        if batch_key is not None:
            self.seen[batch_key] = result
            self._seen_rows += len(out)
            # FIFO eviction (dicts keep insertion order), entry- AND row-bounded
            while len(self.seen) > self.seen_cap or (
                self._seen_rows > self.seen_rows_cap and len(self.seen) > 1
            ):
                self._seen_rows -= len(self.seen.pop(next(iter(self.seen)))["rows"])
        return result

    def flush(self) -> list:
        out: list = []
        for eid in list(self.pending):
            self.watermark[eid] = self.max_ts.get(eid, 0)
            self._emit_ready(eid, out)
        return out

    def stats(self) -> dict:
        return {"late_dropped": self.late_dropped}


def _batch_memo_key(ids: pa.Array, ts: np.ndarray, vs: np.ndarray,
                    offsets: np.ndarray | None = None) -> str:
    """Exactly-once memo key for one routed sub-batch.

    With ``offsets`` (source-assigned delivery offsets, e.g. log positions):
    the key is the offset array alone — a retry replays the same offsets
    (same key → memo hit) while a source that legitimately delivers two
    byte-identical payloads at different offsets gets DISTINCT keys, so the
    duplicate hits the watermark path instead of replaying the first
    emission.  Without offsets the key is a content hash over the raw Arrow
    /numpy buffers — retry-safe, but dedup of identical source batches is
    traded away (a true duplicate is indistinguishable from a retry)."""
    import hashlib  # noqa: PLC0415

    h = hashlib.md5()
    if offsets is not None:
        h.update(b"off:")
        h.update(np.ascontiguousarray(offsets, dtype=np.int64).tobytes())
        return h.hexdigest()
    for buf in ids.buffers():
        if buf is not None:
            h.update(buf)
    h.update(np.ascontiguousarray(ts).tobytes())
    h.update(np.ascontiguousarray(vs).tobytes())
    return h.hexdigest()


def _emit_table(emitted: list) -> pa.Table:
    cols = list(zip(*emitted)) if emitted else [[]] * 6
    return pa.table(
        {
            "image_id": pa.array(list(cols[0]), pa.string()),
            "ts": pa.array(list(cols[1]), pa.int64()).cast(pa.timestamp("us")),
            "v": pa.array(list(cols[2]), pa.float64()),
            "lag_ms": pa.array(list(cols[3]), pa.float64()),
            "v_lag1": pa.array(list(cols[4]), pa.float64()),
            "session_id": pa.array(list(cols[5]), pa.int64()),
        }
    )


def streaming_lag_sessionize(
    ds,
    num_actors: int = 4,
    allowed_lateness_us: int = 600_000_000,
    key: str = "image_id",
    ts_col: str = "ts",
    value_col: str = "v",
    router_concurrency: int | tuple = None,
    offset_col: str | None = None,
):
    """Run the arrival-ordered Dataset through the actor ring.

    Returns ``(emitted: Dataset, finalize)``.  Routing runs as a
    ``map_batches`` actor-pool stage: each router task splits its batch by
    the entity hash-pin, forwards to the pinned ``EntityStateActor`` (state
    never crosses workers), and RETURNS the rows those ingests emitted —
    the emitted stream is itself a Dataset (write it, aggregate it, pipe it
    on), with nothing accumulated on the driver.  Concurrent routers may
    deliver inter-batch rows out of arrival order; that is just more
    disorder for the watermark machinery, absorbed up to
    ``allowed_lateness_us`` (an unbounded stream has no total order anyway).

    ``finalize()`` — call AFTER consuming the emitted Dataset — drains every
    actor's pending heap past its watermark and returns
    ``(flush_table, late_dropped)``.  The flush tail is bounded by
    (entities × lateness-window rows), the actors' live state.

    ``offset_col`` (optional): name of a source-assigned int64 delivery-
    offset column (log position / kafka-style offset).  With it, the
    exactly-once memo keys on offsets, so two byte-identical payloads at
    different offsets are correctly treated as distinct deliveries; without
    it the memo keys on content and identical-batch dedup is traded away
    (see :func:`_batch_memo_key`).
    """
    actors = [EntityStateActor.remote(allowed_lateness_us) for _ in range(num_actors)]

    class Route:
        def __init__(self, handles):
            self.handles = handles
            self.n = len(handles)

        def __call__(self, batch: pa.Table) -> pa.Table:
            id_col = batch.column(key).combine_chunks().cast(pa.string())
            ts = np.asarray(batch.column(ts_col).cast(pa.int64()).combine_chunks())
            vs = np.asarray(batch.column(value_col).combine_chunks(), dtype=np.float64)
            offs = (
                np.asarray(batch.column(offset_col).cast(pa.int64()).combine_chunks())
                if offset_col is not None else None
            )
            # hash-pin via the batch's UNIQUE ids only (dictionary-encode →
            # LUT), then split with vectorized masks — no per-row dict/append
            d = id_col.dictionary_encode()
            uniq = d.dictionary.to_pylist()
            lut = np.fromiter((md5_u64(u) % self.n for u in uniq),
                              dtype=np.int64, count=len(uniq))
            row_actor = lut[np.asarray(d.indices)]
            refs = []
            for a in np.unique(row_actor):
                sel = np.flatnonzero(row_actor == a)
                take = pa.array(sel, pa.int64())
                sub_ids = id_col.take(take)
                sub_ts, sub_vs = ts[sel], vs[sel]
                memo_key = _batch_memo_key(
                    sub_ids, sub_ts, sub_vs,
                    offsets=offs[sel] if offs is not None else None,
                )
                # array handoff: Arrow string array + numpy columns, never
                # per-row Python tuples
                refs.append(self.handles[int(a)].ingest.remote(
                    sub_ids, sub_ts, sub_vs, memo_key
                ))
            emitted: list = []
            for r in ray.get(refs):
                emitted.extend(r["rows"])
            return _emit_table(emitted)

    emitted_ds = ds.map_batches(
        Route,
        fn_constructor_kwargs={"handles": actors},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=router_concurrency or (1, max(2, num_actors)),
    )
    # MATERIALIZE the routed stage before handing it out: the stage mutates
    # actor state, so a lazily re-executed Dataset (second consumption, plan
    # re-run) would re-ingest every batch.  Materializing pins the emitted
    # blocks (re-consumption reads blocks, not actors), and the per-batch
    # content-hash memoization above covers mid-execution task retries.  It
    # also discharges finalize()'s "call only after consuming" contract by
    # construction — routing has fully executed when this returns.  (A
    # replayed batch with byte-identical rows is treated as a re-delivery of
    # the same batch — the exactly-once semantics a duplicate-delivering
    # source expects.)
    emitted_ds = emitted_ds.materialize()

    def finalize() -> tuple[pa.Table, int]:
        tail: list = []
        for rows in ray.get([a.flush.remote() for a in actors]):
            tail.extend(rows)
        late = sum(s["late_dropped"] for s in ray.get([a.stats.remote() for a in actors]))
        return _emit_table(tail), late

    return emitted_ds, finalize
