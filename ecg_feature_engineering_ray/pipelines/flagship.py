"""Flagship pipeline: point-in-time image feature engineering, end to end.

    read fragments (prune at read)
      → DecodeValidate actor pool (bytes → derived v; payload leaves here)
      → union with as-of query points (co-partitioned, ONE shuffle)
      → entity-bucket groupby, per-bucket (entity, ts)-sort
      → monotone as-of merge emitting the PIT_FEATURE vector per query
      → per-partition checkpointed parquet sink (lineage + watermark + rows/s)

This is the Ray-native restatement of the reference's whole feature-
extraction flow (/root/reference/extract_HRV.py:24-80 and siblings): what was
"loop records → compute per-record stats → append to DataFrame → to_csv"
becomes one streaming co-partitioned pass with explicit skew handling and
resumable output.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

from ..sources.readers import list_fragments, read_events
from ..stages.asof import SIDE_COL, asof_merge_table
from ..stages.decode import decode_stage
from ..stages.partition import BUCKET_COL, detect_hot_keys, grouped_sorted_apply
from ..state.checkpoint import commit_partition, completed_buckets
from .features import PIT_FEATURE_NAMES, make_pit_feature_fn


def pit_features(
    events_dir: str,
    queries_path: str,
    num_buckets: int = 32,
    detect_skew: bool = True,
    hot_frac: float = 0.10,
    decode_concurrency: int | tuple[int, int] = (2, 8),
    sampen_max_n: int = 400,
    hot_keys: list | None = None,
) -> Dataset:
    """Streaming Dataset of (image_id, as_of_ts, caption?, features…)."""
    events = read_events(events_dir)  # full schema — decode needs bytes
    decoded = decode_stage(events, concurrency=decode_concurrency)
    decoded = decoded.select_columns(["image_id", "ts", "v"])

    left = ray.data.read_parquet(queries_path)

    # skew detection reads ONLY the key column (column-pruned scan) — it must
    # not force a second pass through the decode stage.  A precomputed
    # ``hot_keys`` list (periodic stats job in production) skips the pass.
    if hot_keys is not None:
        hot = hot_keys
    elif detect_skew:
        hot = detect_hot_keys(read_events(events_dir, columns=["image_id"]), "image_id", hot_frac=hot_frac)
    else:
        hot = None
    point_fn = make_pit_feature_fn(sampen_max_n)

    # tag + align (see stages/asof.py): one shuffle carries both sides
    def tag_left(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "__ts": b.column("as_of_ts").cast(pa.timestamp("us")),
                "v": pa.nulls(b.num_rows, pa.float64()),
                SIDE_COL: pa.array(np.ones(b.num_rows, np.int8)),
            }
        )

    def tag_right(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "__ts": b.column("ts").cast(pa.timestamp("us")),
                "v": b.column("v"),
                SIDE_COL: pa.array(np.zeros(b.num_rows, np.int8)),
            }
        )

    unioned = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        decoded.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        merged = asof_merge_table(
            tbl, "image_id", "__ts",
            aggs={"__cnt": ("v", "count")},
            left_cols=["image_id", "__ts"],
            point_fn=point_fn,
            point_out=PIT_FEATURE_NAMES,
            value_cols=["v"],
        )
        return merged.rename_columns(
            ["as_of_ts" if c == "__ts" else c for c in merged.column_names]
        ).drop_columns(["__cnt"])

    return grouped_sorted_apply(
        unioned, "image_id", ["__ts", SIDE_COL], per_bucket, num_buckets,
        hot_keys=hot, pre_shuffle_blocks=max(8, num_buckets // 2),
    )


def pit_features_checkpointed(
    events_dir: str,
    queries_path: str,
    out_dir: str,
    num_buckets: int = 32,
    detect_skew: bool = True,
) -> list[dict]:
    """Same pipeline with a resumable per-partition sink.

    Completed buckets (manifest present) are skipped at the partitioning
    stage; each bucket commits data+manifest atomically from its worker.
    Returns the manifests of THIS run (empty if everything was done).
    """
    done = completed_buckets(out_dir)
    fragments = list_fragments(events_dir)

    events = read_events(events_dir)
    decoded = decode_stage(events).select_columns(["image_id", "ts", "v"])
    left = ray.data.read_parquet(queries_path)
    hot = (
        detect_hot_keys(read_events(events_dir, columns=["image_id"]), "image_id", hot_frac=0.10)
        if detect_skew
        else None
    )
    point_fn = make_pit_feature_fn()

    def tag_left(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "__ts": b.column("as_of_ts").cast(pa.timestamp("us")),
                "v": pa.nulls(b.num_rows, pa.float64()),
                SIDE_COL: pa.array(np.ones(b.num_rows, np.int8)),
            }
        )

    def tag_right(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "image_id": b.column("image_id"),
                "__ts": b.column("ts").cast(pa.timestamp("us")),
                "v": b.column("v"),
                SIDE_COL: pa.array(np.zeros(b.num_rows, np.int8)),
            }
        )

    unioned = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        decoded.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        t0 = time.time()
        bucket = int(tbl.column(BUCKET_COL)[0].as_py())
        tbl = tbl.drop_columns([BUCKET_COL])
        merged = asof_merge_table(
            tbl, "image_id", "__ts",
            aggs={"__cnt": ("v", "count")},
            left_cols=["image_id", "__ts"],
            point_fn=point_fn,
            point_out=PIT_FEATURE_NAMES,
            value_cols=["v"],
        )
        merged = merged.rename_columns(
            ["as_of_ts" if c == "__ts" else c for c in merged.column_names]
        ).drop_columns(["__cnt"])
        side = np.asarray(tbl.column(SIDE_COL).combine_chunks())
        ev_ts = np.asarray(tbl.column("__ts").cast(pa.int64()).combine_chunks())[side == 0]
        watermark = int(ev_ts.max()) if ev_ts.size else None
        n_entities = len(set(tbl.column("image_id").to_pylist()))
        manifest = commit_partition(
            out_dir, bucket, merged, fragments, watermark, t0,
            extra={"n_entities": n_entities, "n_input_rows": tbl.num_rows},
        )
        import json  # noqa: PLC0415

        return pa.table({"manifest": pa.array([json.dumps(manifest)], pa.string())})

    out = grouped_sorted_apply(
        unioned, "image_id", ["__ts", SIDE_COL], per_bucket, num_buckets,
        hot_keys=hot, skip_buckets=done, keep_bucket_col=True,
        pre_shuffle_blocks=max(8, num_buckets // 2),
    )
    import json  # noqa: PLC0415

    return [json.loads(r["manifest"]) for r in out.take_all()]
