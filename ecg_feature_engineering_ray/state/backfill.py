"""Late-data backfill: recompute exactly the partitions a late row touches.

The reference never faces late data (each ECG record arrives whole,
SURVEY.md §2.9); a streaming feature store must. Protocol:

1. The checkpointed run persists its partitioning config (``_run.json``:
   num_buckets, hot keys, fragment list) so bucket assignment is stable
   across runs.
2. A new fragment arrives carrying rows with ``ts`` below a committed
   partition's watermark → those rows are LATE.
3. :func:`invalidate_for_fragments` reads ONLY the key column of the new
   fragments, maps each entity to its bucket under the saved config, and
   deletes the manifests of affected buckets (bounded work: only buckets
   whose entities got late rows).
4. Re-running the checkpointed pipeline recomputes exactly the invalidated
   partitions over the full fragment set — output equal to a from-scratch
   run (tested).
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from ..functions.hashing import md5_u64
from .checkpoint import MANIFEST_SUFFIX, completed_buckets, partition_paths

RUN_CONFIG = "_run.json"


def save_run_config(out_dir: str, num_buckets: int, hot_keys: list, fragments: list[str]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, RUN_CONFIG)
    with open(path + ".tmp", "w") as f:
        json.dump({"num_buckets": num_buckets, "hot_keys": hot_keys, "fragments": fragments}, f)
    os.replace(path + ".tmp", path)


def load_run_config(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, RUN_CONFIG)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def bucket_of(image_id: str, num_buckets: int, hot_keys: list) -> int:
    """Single-key bucket assignment — MUST match stages.partition.with_bucket."""
    if image_id in hot_keys:
        return num_buckets + hot_keys.index(image_id)
    return md5_u64(image_id) % num_buckets


def invalidate_for_fragments(out_dir: str, new_fragments: list[str]) -> set[int]:
    """Drop the partitions whose entities appear in ``new_fragments``.

    Reads only the key column of the late fragments. Returns the invalidated
    bucket ids (these will be recomputed by the next checkpointed run).
    """
    cfg = load_run_config(out_dir)
    if cfg is None:
        raise FileNotFoundError(f"no {RUN_CONFIG} in {out_dir} — nothing to backfill against")
    affected: set[int] = set()
    for frag in new_fragments:
        t = pq.read_table(frag, columns=["image_id"])
        for v in t.column("image_id").combine_chunks().unique().to_pylist():
            affected.add(bucket_of(v, cfg["num_buckets"], cfg["hot_keys"]))
    done = completed_buckets(out_dir)
    invalidated = affected & done
    for b in invalidated:
        data, man = partition_paths(out_dir, b)
        for p in (data, man):
            if os.path.exists(p):
                os.remove(p)
    return invalidated


def late_rows_below_watermark(out_dir: str, new_fragments: list[str]) -> int:
    """Count rows in the new fragments whose ts is below their partition's
    committed watermark (diagnostic: how late was the data?)."""
    import pyarrow as pa  # noqa: PLC0415

    cfg = load_run_config(out_dir)
    if cfg is None:
        return 0
    watermarks: dict[int, int] = {}
    for f in os.listdir(out_dir):
        if f.endswith(MANIFEST_SUFFIX):
            with open(os.path.join(out_dir, f)) as fh:
                m = json.load(fh)
            if m.get("watermark_us") is not None:
                watermarks[m["bucket"]] = m["watermark_us"]
    n_late = 0
    for frag in new_fragments:
        t = pq.read_table(frag, columns=["image_id", "ts"])
        ids = t.column("image_id").to_pylist()
        ts = t.column("ts").cast(pa.int64()).to_pylist()
        for i, v in zip(ts, ids):
            b = bucket_of(v, cfg["num_buckets"], cfg["hot_keys"])
            if b in watermarks and i < watermarks[b]:
                n_late += 1
    return n_late
