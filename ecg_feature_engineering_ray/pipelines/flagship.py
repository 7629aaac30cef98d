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
from ..stages.partition import (
    BUCKET_COL,
    entity_counts,
    grouped_sorted_apply,
    plan_buckets,
)
from ..state.checkpoint import commit_partition, completed_buckets
from .features import PIT_FEATURE_NAMES, make_pit_feature_fn


def compute_bucket_plan(
    events_dir: str,
    queries_path: str,
    num_buckets: int,
    sampen_max_n: int = 400,
    max_salt: int = 8,
    granularity: int = 4,
) -> dict:
    """Cost-balanced bucket plan + hot-key salting from key-column count passes.

    Merge-stage cost model: each query pays O(min(prefix, sampen_cap)²) for
    the SampEn kernel over its entity's event prefix.  Query times are ~
    uniform over an entity's history, so the per-query expectation is
    E[min(prefix, cap)²] = n²/3 below the cap and cap²·(1 − 2·(cap/n)/3)
    above it — NOT min(n, cap)²: the naive form under-weights long capped
    entities ~3× relative to short ones, and LPT packs their buckets into
    stragglers.

    Entities whose total cost exceeds a ``1/granularity`` share of a bucket
    are SALTED: their queries split into k salt groups (``image_id#salt``
    composite keys) and their events are replicated into every salt group, so
    no single work atom exceeds ~(bucket fair share)/granularity and LPT can
    pack the tail tightly — the makespan of the merge stage stays near the
    mean instead of max-entity-bound.  (Salting to one-bucket granularity
    keeps single-entity atoms as large as a whole bucket's share; with only
    a few buckets per CPU the slowest bucket then idles the rest of the
    pool — measured 15-18 % wall overhead at 8 buckets/CPU.)  Replicated
    event rows are key+ts+value only (payload long gone), and the re-run
    per-group prefix scans are O(n) against the O(cap²) kernel they spread.
    In production this is a periodic stats job whose output is reused across
    runs — callers may compute it once and pass ``bucket_plan`` to
    :func:`pit_features`.

    Returns ``{"plan": {skey → bucket}, "salt": {image_id → k}}``.
    """
    ev_counts = entity_counts(read_events(events_dir, columns=["image_id"]), "image_id")
    q_counts = entity_counts(ray.data.read_parquet(queries_path, columns=["image_id"]), "image_id")
    cap = float(sampen_max_n)

    def entity_cost(q: int, n: int) -> float:
        if n <= 0:
            return 1.0
        e2 = n * n / 3.0 if n < cap else cap * cap * (1.0 - 2.0 * (cap / n) / 3.0)
        return max(q, 1) * e2 + n

    cost_map = {k: entity_cost(q_counts.get(k, 0), n) for k, n in ev_counts.items()}
    total = sum(cost_map.values())
    atom_target = total / (num_buckets * max(granularity, 1)) if num_buckets else float("inf")
    salt: dict = {}
    salted_cost: dict = {}
    for k, c in cost_map.items():
        s = min(max_salt, max(1, int(np.ceil(c / atom_target)))) if atom_target > 0 else 1
        if s > 1:
            salt[k] = s
            for j in range(s):
                salted_cost[f"{k}#{j}"] = c / s
        else:
            salted_cost[k] = c
    # salting bounds every atom at ~target/granularity, which sits below
    # plan_buckets' default heavy threshold (0.25 × bucket share) — scale the
    # threshold down with the atom size or NOTHING gets LPT-placed and the
    # whole load rides hash luck
    return {
        "plan": plan_buckets(
            salted_cost, num_buckets,
            heavy_frac=0.25 / max(granularity, 1), cost=lambda c: c,
        ),
        "salt": salt,
    }


def _make_tag_fns(salt: dict):
    """Build the (query-side, event-side) batch-tagging fns for a salt map.

    Shared by the streaming and checkpointed flagship paths so BOTH get
    identical salted bucket routing: queries hash-split into k salt groups
    (``image_id#salt`` composite ``__skey``), events replicated into every
    group so each salt bucket sees the full event history and per-(entity,
    as-of) results stay exact while one hot entity's work spreads over k
    workers."""
    import pyarrow.compute as pc  # noqa: PLC0415

    def _salt_k_per_row(id_col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, pa.Array]:
        """Per-row salt-group count via a LUT over the batch's UNIQUE keys
        (dictionary-encode → fromiter over the dictionary only — no per-row
        Python, same trick as partition.with_bucket).  Returns (k_per_row,
        dict-decoded id array)."""
        d = (id_col.combine_chunks() if isinstance(id_col, pa.ChunkedArray) else id_col).dictionary_encode()
        idx = np.asarray(d.indices)
        lut = np.fromiter(
            (salt.get(v, 1) for v in d.dictionary.to_pylist()),
            dtype=np.int64, count=len(d.dictionary),
        )
        return lut[idx], d

    def tag_left(b: pa.Table) -> pa.Table:
        ts = b.column("as_of_ts").cast(pa.timestamp("us"))
        ids = b.column("image_id")
        if not salt:
            skey = ids.cast(pa.string())  # Arrow column reuse — no Python rows
        else:
            ids_c = (ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids).cast(pa.string())
            k, _ = _salt_k_per_row(ids)
            ts_i = np.asarray(ts.cast(pa.int64()).combine_chunks())
            mod = np.mod(ts_i, np.maximum(k, 1))
            salted = pc.binary_join_element_wise(
                ids_c, pa.array(mod.astype("U"), pa.string()), "#"
            )
            skey = pc.if_else(pa.array(k > 1), salted, ids_c)
        return pa.table(
            {
                "__skey": skey,
                "image_id": ids,
                "__ts": ts,
                "v": pa.nulls(b.num_rows, pa.float64()),
                SIDE_COL: pa.array(np.ones(b.num_rows, np.int8)),
            }
        )

    def tag_right(b: pa.Table) -> pa.Table:
        ids = b.column("image_id")
        if salt:
            k, _ = _salt_k_per_row(ids)
            if (k > 1).any():
                # replicate each event row into its k salt buckets: one
                # np.repeat for rows, one modular ramp for the salt index
                idx = np.repeat(np.arange(len(k)), k)
                starts = np.cumsum(k) - k
                j = np.arange(idx.size) - starts[idx]
                take = pa.array(idx, pa.int64())
                rep_ids = ids.combine_chunks().take(take)
                salted = pc.binary_join_element_wise(
                    rep_ids.cast(pa.string()), pa.array(j.astype("U"), pa.string()), "#"
                )
                skey = pc.if_else(pa.array(k[idx] > 1), salted, rep_ids.cast(pa.string()))
                return pa.table(
                    {
                        "__skey": skey,
                        "image_id": rep_ids,
                        "__ts": b.column("ts").cast(pa.timestamp("us")).combine_chunks().take(take),
                        "v": b.column("v").combine_chunks().take(take),
                        SIDE_COL: pa.array(np.zeros(idx.size, np.int8)),
                    }
                )
        return pa.table(
            {
                "__skey": ids.cast(pa.string()),
                "image_id": ids,
                "__ts": b.column("ts").cast(pa.timestamp("us")),
                "v": b.column("v"),
                SIDE_COL: pa.array(np.zeros(b.num_rows, np.int8)),
            }
        )

    return tag_left, tag_right


def pit_features(
    events_dir: str,
    queries_path: str,
    num_buckets: int = 32,
    detect_skew: bool = True,
    hot_frac: float = 0.10,
    decode_concurrency: int | tuple[int, int] = (2, 8),
    sampen_max_n: int = 400,
    hot_keys: list | None = None,
    bucket_plan: dict | None = None,
    decode_batch_size: int = 256,
    pre_shuffle_blocks: int | None = -1,
    instrument=None,
    stage_times: dict | None = None,
) -> Dataset:
    """Streaming Dataset of (image_id, as_of_ts, caption?, features…).

    ``decode_batch_size`` controls decode task granularity: mixed image
    sizes make per-batch cost vary ~16×, so fine batches (256) keep the
    actor pool load-balanced (coarse 1024-row tasks leave the pool idle
    behind one slow straggler wave)."""
    events = read_events(events_dir)  # full schema — decode needs bytes
    # throughput path: decode + phash content check; the canonical-encoding
    # roundtrip is a test-time invariant (see stages/decode.py)
    decoded = decode_stage(events, concurrency=decode_concurrency,
                           batch_size=decode_batch_size, verify_roundtrip=False)
    decoded = decoded.select_columns(["image_id", "ts", "v"])
    # STAGE the decode phase: materialize the projected (payload-free) rows
    # before the shuffle.  The projection is ~400x smaller than the input
    # (40 B/row vs KB-scale image bytes) and is exactly the row set the sort
    # barrier must hold anyway, so this adds no asymptotic memory — and it
    # lets the actor-pool phase and the shuffle phase each get clean
    # scheduling (fused streaming measured ~30% slower end-to-end).
    # ``stage_times`` (observability seam, like ``instrument``): the
    # materialize() barrier is the natural decode/shuffle boundary, so when a
    # dict is passed we record the decode phase's wall seconds into it.
    _t0 = time.time()
    decoded = decoded.materialize()
    if stage_times is not None:
        stage_times["decode_wall_s"] = time.time() - _t0

    left = ray.data.read_parquet(queries_path)

    # skew stats read ONLY the key column (column-pruned scan) — they must
    # not force a second pass through the decode stage.  Heavy entities are
    # LPT-packed into balanced buckets (plan_buckets); the per-entity counts
    # double as hot-key detection.  A precomputed ``hot_keys`` list skips
    # nothing here — packing still needs counts — but is accepted for API
    # compatibility (production runs pass stats from a periodic job).
    if bucket_plan is not None:
        cfg = bucket_plan
    elif detect_skew or hot_keys is not None:
        cfg = compute_bucket_plan(events_dir, queries_path, num_buckets, sampen_max_n)
    else:
        cfg = {"plan": None, "salt": {}}
    plan, salt = cfg["plan"], cfg.get("salt", {})
    point_fn = make_pit_feature_fn(sampen_max_n)

    # tag + align (see stages/asof.py): one shuffle carries both sides;
    # salted routing shared with the checkpointed path (_make_tag_fns)
    tag_left, tag_right = _make_tag_fns(salt)

    unioned = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        decoded.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        merged = asof_merge_table(
            tbl, "__skey", "__ts",
            aggs={"__cnt": ("v", "count")},
            left_cols=["image_id", "__ts"],
            point_fn=point_fn,
            point_out=PIT_FEATURE_NAMES,
            value_cols=["v"],
        )
        return merged.rename_columns(
            ["as_of_ts" if c == "__ts" else c for c in merged.column_names]
        ).drop_columns(["__cnt"])

    # ``instrument`` (observability seam): wraps the per-bucket merge fn —
    # probes/ops use it to record per-bucket wall time without forking the
    # pipeline; must be picklable and must not change result semantics when
    # left None.
    fn = instrument(per_bucket) if instrument is not None else per_bucket
    return grouped_sorted_apply(
        unioned, "__skey", ["__ts", SIDE_COL], fn, num_buckets,
        explicit_map=plan,
        pre_shuffle_blocks=(None if pre_shuffle_blocks == -1 else pre_shuffle_blocks),
    )


def pit_features_checkpointed(
    events_dir: str,
    queries_path: str,
    out_dir: str,
    num_buckets: int = 32,
    detect_skew: bool = True,
    bucket_plan: dict | None = None,
    sampen_max_n: int = 400,
    decode_concurrency: int | tuple[int, int] = (2, 8),
) -> list[dict]:
    """Same pipeline with a resumable per-partition sink.

    Completed buckets (manifest present) are skipped at the partitioning
    stage; each bucket commits data+manifest atomically from its worker.
    Returns the manifests of THIS run (empty if everything was done).

    Skew handling matches the throughput path: the cost-model bucket plan
    (:func:`compute_bucket_plan` — LPT packing + sub-bucket query-split
    salting) is computed on the FIRST run (or passed in), persisted in the
    run config, and reloaded on resume/backfill — bucket assignment is
    invariant across runs even when late fragments change the entity counts
    the plan was derived from.  Passing a ``bucket_plan`` that differs from
    the committed one raises, like a ``num_buckets`` mismatch.
    """
    from ..state.backfill import load_run_config, save_run_config

    done = completed_buckets(out_dir)
    fragments = list_fragments(events_dir)

    cfg = load_run_config(out_dir)
    if cfg is not None:
        # resume/backfill: bucket assignment MUST match the original run
        if cfg["num_buckets"] != num_buckets:
            raise ValueError(
                f"num_buckets {num_buckets} != committed run config {cfg['num_buckets']}"
            )
        plan = cfg.get("plan") or {}
        salt = cfg.get("salt") or {}
        if bucket_plan is not None and (
            (bucket_plan.get("plan") or {}) != plan
            or {k: int(v) for k, v in (bucket_plan.get("salt") or {}).items()} != salt
        ):
            raise ValueError(
                "bucket_plan differs from the committed run config — "
                "resume must reuse the original plan"
            )
        hot = cfg.get("hot_keys") or []
    else:
        hot = []
        if bucket_plan is None and detect_skew:
            bucket_plan = compute_bucket_plan(
                events_dir, queries_path, num_buckets, sampen_max_n
            )
        plan = dict((bucket_plan or {}).get("plan") or {})
        salt = {k: int(v) for k, v in ((bucket_plan or {}).get("salt") or {}).items()}
        save_run_config(out_dir, num_buckets, hot, fragments, plan=plan, salt=salt)

    events = read_events(events_dir)
    decoded = decode_stage(
        events, concurrency=decode_concurrency, verify_roundtrip=False
    ).select_columns(
        ["image_id", "ts", "v"]
    ).materialize()  # staged decode phase — see pit_features
    left = ray.data.read_parquet(queries_path)
    point_fn = make_pit_feature_fn(sampen_max_n)
    tag_left, tag_right = _make_tag_fns(salt)

    unioned = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True).union(
        decoded.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: PLC0415

        t0 = time.time()
        bucket = int(tbl.column(BUCKET_COL)[0].as_py())
        tbl = tbl.drop_columns([BUCKET_COL])
        merged = asof_merge_table(
            tbl, "__skey", "__ts",
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
        n_entities = pc.count_distinct(tbl.column("image_id")).as_py()
        manifest = commit_partition(
            out_dir, bucket, merged, fragments, watermark, t0,
            extra={"n_entities": n_entities, "n_input_rows": tbl.num_rows},
        )
        import json  # noqa: PLC0415

        return pa.table({"manifest": pa.array([json.dumps(manifest)], pa.string())})

    out = grouped_sorted_apply(
        unioned, "__skey", ["__ts", SIDE_COL], per_bucket, num_buckets,
        hot_keys=hot, explicit_map=plan, skip_buckets=done, keep_bucket_col=True,
        pre_shuffle_blocks=num_buckets,
    )
    import json  # noqa: PLC0415

    return [json.loads(r["manifest"]) for r in out.take_all()]
