"""Entity-bucket partitioning — the engine's single shuffle spine.

Every per-entity ordered computation (lag/lead, sessionize, rolling windows,
grouped aggregates, as-of join) reuses ONE partitioning scheme so the data is
shuffled once and processed many times:

    bucket = stable_hash(entity_key) % num_buckets        (normal keys)
    bucket = num_buckets + rank(hot_key)                  (detected hot keys)

``num_buckets`` scales with the cluster (≈ 2-4 × total CPUs); each bucket is
processed as ONE Arrow table by ``Dataset.groupby("__bucket").map_groups``,
inside which everything is vectorized numpy over entity segments.  A bucket
must fit in a worker's heap: at 100 TB input project the shuffled columns
down to the key + order + value columns first (images' ``bytes`` never enter
the shuffle — see pipelines.flagship).

Hot-key (skew) handling: the reference has no analog (its skew is "the
longest ECG record just takes longer", SURVEY.md §4).  Three escalating
tools, all fed by the shuffle-free partial-count pre-pass:

1. ``detect_hot_keys`` — entities above ``hot_frac`` of rows get a DEDICATED
   bucket (no shared-bucket straggling);
2. ``plan_buckets`` — greedy LPT packing of heavy entities into balanced
   buckets (hash for the light tail);
3. query-split salting (pipelines/flagship.py) — an entity too heavy for ONE
   bucket has its queries hash-split into k salt groups with its events
   replicated into each, so per-(entity, as-of) order statistics stay exact
   while the work spreads over k workers.  Entity-level order statistics
   (a single percentile over ALL of one entity's rows) are not mergeable
   across salts and keep using 1+2 only.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.hashing import bucket_of_ints, bucket_of_strings

BUCKET_COL = "__bucket"


def _bucket_ids(col: pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    if pa.types.is_integer(col.type):
        return bucket_of_ints(np.asarray(col.combine_chunks()).astype(np.int64), num_buckets)
    return bucket_of_strings(col.combine_chunks(), num_buckets)


def with_bucket(
    ds: Dataset,
    key: str,
    num_buckets: int,
    hot_keys: list | None = None,
    explicit_map: dict | None = None,
) -> Dataset:
    """Append an int32 ``__bucket`` column keyed by ``key``.

    ``hot_keys`` (optional, from :func:`detect_hot_keys`) each get their own
    bucket id ``num_buckets + i`` so one skewed entity cannot straggle a
    shared bucket.  ``explicit_map`` (optional, from :func:`plan_buckets`)
    pins specific keys to specific buckets (cost-balanced packing); unmapped
    keys fall back to the hash.
    """
    # combined override map (explicit placement wins over hot-key buckets)
    override = dict({k: num_buckets + i for i, k in enumerate(hot_keys)} if hot_keys else {})
    if explicit_map:
        override.update(explicit_map)

    def assign(batch: pa.Table) -> pa.Table:
        col = batch.column(key)
        ids = _bucket_ids(col, num_buckets)
        if override:
            # vectorized override: dictionary-encode → LUT over the batch's
            # UNIQUE keys only (the skewed-run hot path; no per-row Python)
            d = col.combine_chunks().dictionary_encode()
            idx = np.asarray(d.indices)
            lut = np.fromiter(
                (override.get(v, -1) for v in d.dictionary.to_pylist()),
                dtype=np.int64, count=len(d.dictionary),
            )
            mapped = lut[idx]
            ids = np.where(mapped >= 0, mapped, ids)
        return batch.append_column(BUCKET_COL, pa.array(ids, pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def entity_counts(ds: Dataset, key: str, max_tracked: int | None = 1_000_000) -> dict:
    """Per-entity row counts via the shuffle-free partial-count pass.

    Driver-side result — call on a pruned key column.  ``max_tracked``
    bounds driver memory with SPACE-SAVING semantics (Metwally et al. —
    public heavy-hitters algorithm): when the map exceeds the cap, the
    lightest keys are evicted and later arrivals of NEW keys inherit the
    largest evicted count as a floor, so every surviving count is an
    OVERESTIMATE by at most that floor.  Overestimates are safe for skew
    planning (conservative packing/salting); exact counts for the light
    tail don't matter because the tail rides the hash anyway.  Pass ``None``
    for an exact unbounded map (test-scale cardinalities).
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        vc = batch.column(key).combine_chunks().value_counts()
        return pa.table({key: vc.field("values"), "__cnt": vc.field("counts")})

    merged: dict = {}
    floor = 0  # max count ever evicted — the space-saving overestimate bound
    partials = ds.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for v, c in zip(b.column(key).to_pylist(), b.column("__cnt").to_pylist()):
            prev = merged.get(v)
            merged[v] = (floor + c) if prev is None else (prev + c)
        if max_tracked and len(merged) > 2 * max_tracked:
            keep = sorted(merged.items(), key=lambda kv: kv[1], reverse=True)
            floor = max(floor, keep[max_tracked][1])
            merged = dict(keep[:max_tracked])
    if max_tracked and len(merged) > max_tracked:
        keep = sorted(merged.items(), key=lambda kv: kv[1], reverse=True)
        merged = dict(keep[:max_tracked])
    return merged


def plan_buckets(
    counts: dict,
    num_buckets: int,
    heavy_frac: float = 0.25,
    cost: "Callable[[int], float] | None" = None,
) -> dict:
    """Greedy LPT packing of heavy entities into balanced buckets.

    Entities whose estimated cost exceeds ``heavy_frac`` × (total/num_buckets)
    are explicitly placed on the currently least-loaded bucket (largest
    first); light entities stay on the hash (their law-of-large-numbers sum is
    already balanced).  Returns {key → bucket}.  This is the engine's answer
    to hash-luck stragglers: the slowest merge task is capped near the mean
    instead of ~3× it.
    """
    import heapq  # noqa: PLC0415

    cost_fn = cost or (lambda n: float(n))
    costs = {k: cost_fn(n) for k, n in counts.items()}
    total = sum(costs.values())
    if total == 0 or num_buckets <= 0:
        return {}
    threshold = heavy_frac * total / num_buckets
    heavy = sorted((c, k) for k, c in costs.items() if c >= threshold)
    heavy.reverse()
    # seed heap with the expected hash load of light entities per bucket
    light_load = (total - sum(c for c, _ in heavy)) / num_buckets
    heap = [(light_load, b) for b in range(num_buckets)]
    heapq.heapify(heap)
    out: dict = {}
    for c, k in heavy:
        load, b = heapq.heappop(heap)
        out[k] = b
        heapq.heappush(heap, (load + c, b))
    return out


def detect_hot_keys(
    ds: Dataset,
    key: str,
    hot_frac: float = 0.05,
    max_keys: int = 64,
    max_tracked: int | None = 1_000_000,
) -> list:
    """Find entity keys holding more than ``hot_frac`` of all rows.

    Built on :func:`entity_counts`, so driver memory is bounded by the same
    space-saving eviction (``max_tracked`` survivors, counts overestimated
    by at most the eviction floor).  Overestimates only ever flag MORE keys
    hot — conservative and safe for salting; a truly hot key (≥ hot_frac of
    rows) can never be evicted because eviction drops the lightest keys.
    """
    merged = entity_counts(ds, key, max_tracked=max_tracked)
    total = sum(merged.values())
    if total == 0:
        return []
    hot = [(v, c) for v, c in merged.items() if c >= hot_frac * total]
    hot.sort(key=lambda t: -t[1])
    return [v for v, _ in hot[:max_keys]]


def grouped_sorted_apply(
    ds: Dataset,
    key: str,
    order_by: list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_buckets: int,
    hot_keys: list | None = None,
    explicit_map: dict | None = None,
    skip_buckets: set[int] | None = None,
    keep_bucket_col: bool = False,
    pre_shuffle_blocks: int | None = None,
    **map_groups_kwargs,
) -> Dataset:
    """THE core primitive: hash-bucket by entity, sort each bucket, apply.

    ``fn`` receives one Arrow table per bucket, already sorted by
    ``[key, *order_by]``, with ``__bucket`` removed (kept when
    ``keep_bucket_col``, for checkpointed sinks), and with the guarantee
    that every row of an entity is in the same table in order.  It returns an
    Arrow table (any schema — aggregates, window columns, exploded rows).

    ``skip_buckets`` drops already-completed partitions right after bucket
    assignment — the resume path (state/checkpoint.py).

    ``pre_shuffle_blocks`` coalesces the bucketed stream into that many
    blocks before the groupby sort.  Stages that shed big payload columns
    (e.g. image decode) emit many tiny blocks, and a sort over thousands of
    KB-sized blocks is dominated by per-block overhead — coalescing first
    keeps the exchange proportional to data, not block count.
    """
    bucketed = with_bucket(ds, key, num_buckets, hot_keys=hot_keys, explicit_map=explicit_map)
    if skip_buckets:
        skip = sorted(skip_buckets)

        def drop_done(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc  # noqa: PLC0415

            mask = pc.invert(pc.is_in(batch.column(BUCKET_COL), value_set=pa.array(skip, pa.int32())))
            return batch.filter(mask)

        bucketed = bucketed.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True)
    if pre_shuffle_blocks:
        bucketed = bucketed.repartition(pre_shuffle_blocks)
    sort_keys = [key] + list(order_by)

    def per_bucket(group: pa.Table) -> pa.Table:
        if not keep_bucket_col:
            group = group.drop_columns([BUCKET_COL])
        group = group.combine_chunks()
        group = group.sort_by([(c, "ascending") for c in sort_keys])
        return fn(group)

    return bucketed.groupby(BUCKET_COL).map_groups(
        per_bucket, batch_format="pyarrow", **map_groups_kwargs
    )


def entity_segments(tbl: pa.Table, key: str) -> tuple[np.ndarray, np.ndarray]:
    """Segment offsets of a table sorted by ``key``.

    Returns ``(starts, ends)`` index arrays such that rows
    ``starts[i]:ends[i]`` are entity i's rows.  Vectorized — no Python loop
    over rows.
    """
    if tbl.num_rows == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    col = tbl.column(key).combine_chunks()
    if pa.types.is_integer(col.type) or pa.types.is_timestamp(col.type):
        vals = np.asarray(col.cast(pa.int64()))
        change = np.flatnonzero(vals[1:] != vals[:-1]) + 1
    else:
        d = col.dictionary_encode()
        idx = np.asarray(d.indices)
        change = np.flatnonzero(idx[1:] != idx[:-1]) + 1
    starts = np.concatenate(([0], change)).astype(np.int64)
    ends = np.concatenate((change, [tbl.num_rows])).astype(np.int64)
    return starts, ends
