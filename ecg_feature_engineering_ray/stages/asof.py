"""As-of (point-in-time) join — the engine's core new operator.

Semantics (SURVEY.md §2.5 J3): for every left row (entity, as_of_ts) produce
aggregates / the last value over the right rows of the same entity with
``ts <= as_of_ts`` (inclusive tie), and NULLs when no such row exists —
**zero temporal leakage** by construction.

Physical plan (Ray-Data-first):

1. project both sides down to key + ts + needed value columns (images'
   ``bytes`` never enter the shuffle);
2. tag ``__side`` (0 = right/events, 1 = left/queries), align schemas, union
   — so both sides move through ONE hash-bucket shuffle, co-partitioned;
3. ``grouped_sorted_apply`` buckets by entity and sorts each bucket by
   (entity, ts, side);
4. inside the bucket, loop entity segments (vectorized numpy within):
   ``searchsorted(event_ts, query_ts, side='right')`` gives each query its
   event-prefix length; prefix cumsums / running extrema answer count, sum,
   mean, min, max, last in O(rows); an optional ``point_fn`` computes an
   arbitrary feature vector per query from the prefix slice (the hook the
   flagship feature pipeline uses).

The reference's analog is implicit — every feature row is "features of the
entity as of end-of-record" (/root/reference/challenge2020/get_model.py:29-48
aligned with /root/reference/xgboost_clf.py:12-15 by row position); here the
as-of point is explicit and arbitrary.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .partition import entity_segments, grouped_sorted_apply

SIDE_COL = "__side"
SUPPORTED_AGGS = ("count", "sum", "mean", "min", "max", "last",
                  "wcount", "wsum", "wmean", "wmin", "wmax")


def _range_extrema(v: np.ndarray, lo: np.ndarray, hi: np.ndarray, kind: str) -> np.ndarray:
    """Vectorized range min/max over ``v`` for query windows ``[lo, hi)``.

    Sparse-table RMQ: O(n log n) precompute, O(1) per query, no Python loop
    over queries (only over the ≤ log2(n) distinct window-size classes).
    All windows must be non-empty (``hi > lo``) — caller masks empties.
    """
    op = np.minimum if kind == "min" else np.maximum
    n = v.size
    st = [v]
    k = 1
    while (1 << k) <= n:
        half = 1 << (k - 1)
        prev = st[-1]
        m = n - (1 << k) + 1
        st.append(op(prev[:m], prev[half : half + m]))
        k += 1
    w = (hi - lo).astype(np.float64)
    ks = np.frexp(w)[1] - 1  # floor(log2(width)), width >= 1
    out = np.empty(lo.size, dtype=v.dtype)
    for kk in np.unique(ks):
        mask = ks == kk
        t = st[kk]
        out[mask] = op(t[lo[mask]], t[hi[mask] - (1 << int(kk))])
    return out


def _as_numpy(col: pa.ChunkedArray) -> np.ndarray:
    """Native-dtype numpy view of a numeric/timestamp column (no precision loss)."""
    if pa.types.is_timestamp(col.type):
        return np.asarray(col.cast(pa.int64()).combine_chunks())
    arr = col.combine_chunks()
    if arr.null_count:
        return np.asarray(arr.fill_null(0))
    return np.asarray(arr)


def asof_merge_table(
    tbl: pa.Table,
    key: str,
    ts_col: str,
    aggs: dict[str, tuple[str, str]],
    left_cols: list[str],
    point_fn: Callable[[dict[str, np.ndarray]], np.ndarray] | None = None,
    point_out: list[str] | None = None,
    value_cols: list[str] | None = None,
    window_us: int | None = None,
) -> pa.Table:
    """Monotone merge over ONE bucket table sorted by (key, ts, side).

    ``aggs`` maps out_name → (right_value_col, fn) with fn in
    ``SUPPORTED_AGGS``; the ``w*`` variants aggregate over the BOUNDED
    lookback ``[as_of − window_us, as_of]`` instead of the whole prefix
    (SQL analog: range-predicated join).  ``point_fn`` (optional) receives
    the event-prefix arrays {col → values} of one query and returns a
    fixed-length float vector named by ``point_out``.
    """
    side = np.asarray(tbl.column(SIDE_COL).combine_chunks())
    ts = np.asarray(tbl.column(ts_col).cast(pa.int64()).combine_chunks())
    needed = sorted({src for src, _ in aggs.values()} | set(value_cols or []))
    vals = {c: _as_numpy(tbl.column(c)) for c in needed}
    # output dtype per agg: exact (source dtype) for last/min/max, float64 otherwise
    def _out_type(src: str, fn: str) -> pa.DataType:
        if fn in ("last", "min", "max", "wmin", "wmax"):
            t = tbl.schema.field(src).type
            return pa.int64() if (pa.types.is_integer(t) or pa.types.is_timestamp(t)) else pa.float64()
        return pa.int64() if fn in ("count", "wcount") else pa.float64()

    starts, ends = entity_segments(tbl, key)
    out_left_idx: list[np.ndarray] = []
    agg_out: dict[str, list[np.ndarray]] = {name: [] for name in aggs}
    agg_valid: dict[str, list[np.ndarray]] = {name: [] for name in aggs}
    point_rows: list[np.ndarray] = []

    for s, e in zip(starts, ends):
        seg_side = side[s:e]
        q_local = np.flatnonzero(seg_side == 1)
        if q_local.size == 0:
            continue
        ev_local = np.flatnonzero(seg_side == 0)
        ev_ts = ts[s:e][ev_local]
        q_ts = ts[s:e][q_local]
        pos = np.searchsorted(ev_ts, q_ts, side="right")
        pos_lo = (
            np.searchsorted(ev_ts, q_ts - window_us, side="left")
            if window_us is not None
            else np.zeros_like(pos)
        )
        out_left_idx.append(q_local + s)
        has = pos > 0
        whas = pos > pos_lo
        safe_pos = np.maximum(pos - 1, 0)

        ev_vals = {c: vals[c][s:e][ev_local] for c in needed}
        for name, (src, fn) in aggs.items():
            v = ev_vals[src]
            valid = has
            if fn == "count":
                res = pos.astype(np.int64)
                valid = np.ones_like(has)
            elif fn == "wcount":
                res = (pos - pos_lo).astype(np.int64)
                valid = np.ones_like(has)
            elif fn in ("wsum", "wmean"):
                cs = np.concatenate(([0.0], np.cumsum(v.astype(np.float64))))
                res = cs[pos] - cs[pos_lo]
                valid = whas
                if fn == "wmean":
                    with np.errstate(invalid="ignore", divide="ignore"):
                        res = np.where(whas, res / np.maximum(pos - pos_lo, 1), np.nan)
            elif fn in ("wmin", "wmax"):
                # vectorized windowed extrema via sparse-table RMQ
                res = np.zeros(pos.size, dtype=v.dtype if v.size else np.float64)
                valid = whas.copy()
                if v.size and whas.any():
                    qi = np.flatnonzero(whas)
                    res[qi] = _range_extrema(
                        v, pos_lo[qi], pos[qi], "min" if fn == "wmin" else "max"
                    )
            elif fn in ("sum", "mean"):
                cs = np.concatenate(([0.0], np.cumsum(v.astype(np.float64))))
                res = cs[pos]
                if fn == "mean":
                    with np.errstate(invalid="ignore", divide="ignore"):
                        res = np.where(has, res / np.maximum(pos, 1), np.nan)
            elif fn in ("min", "max") and v.size:
                acc = (np.minimum if fn == "min" else np.maximum).accumulate(v)
                res = acc[safe_pos]
            elif fn == "last" and v.size:
                res = v[safe_pos]
            elif fn in ("min", "max", "last"):
                res = np.zeros(pos.size, dtype=v.dtype if v.size else np.float64)
                valid = np.zeros_like(has)
            else:
                raise ValueError(f"unsupported agg fn {fn!r}")
            agg_out[name].append(res)
            agg_valid[name].append(valid)

        if point_fn is not None:
            for qi, p in zip(q_local, pos):
                prefix = {c: ev_vals[c][:p] for c in needed}
                prefix["ts"] = ev_ts[:p]
                point_rows.append(np.asarray(point_fn(prefix), dtype=np.float64))

    if not out_left_idx:
        empty_cols: dict[str, pa.Array] = {}
        for c in left_cols:
            empty_cols[c] = pa.array([], tbl.schema.field(c).type)
        for name, (src, fn) in aggs.items():
            empty_cols[name] = pa.array([], _out_type(src, fn))
        for name in point_out or []:
            empty_cols[name] = pa.array([], pa.float64())
        return pa.table(empty_cols)

    take = pa.array(np.concatenate(out_left_idx))
    out = {c: tbl.column(c).take(take) for c in left_cols}
    for name, (src, fn) in aggs.items():
        res = np.concatenate(agg_out[name])
        valid = np.concatenate(agg_valid[name])
        typ = _out_type(src, fn)
        if pa.types.is_int64(typ):
            out[name] = pa.array(res.astype(np.int64), pa.int64(), mask=~valid)
        else:
            out[name] = pa.array(
                np.where(valid, res.astype(np.float64), np.nan), pa.float64(), mask=~valid
            )
    if point_fn is not None and point_rows:
        mat = np.vstack(point_rows)
        for j, name in enumerate(point_out or []):
            out[name] = pa.array(mat[:, j], pa.float64())
    return pa.table(out)


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    aggs: dict[str, tuple[str, str]],
    left_cols: list[str],
    num_buckets: int = 64,
    hot_keys: list | None = None,
    point_fn: Callable | None = None,
    point_out: list[str] | None = None,
    value_cols: list[str] | None = None,
    window_us: int | None = None,
) -> Dataset:
    """Distributed point-in-time join of two Datasets (see module docstring)."""
    needed_right = sorted({src for src, _ in aggs.values()} | set(value_cols or []))
    ts_t = pa.timestamp("us")

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key), "__ts": batch.column(left_ts).cast(ts_t)}
        for c in left_cols:
            cols[c] = batch.column(c)
        for c in needed_right:
            cols[c] = pa.nulls(batch.num_rows, right_schema_types[c])
        cols[SIDE_COL] = pa.array(np.ones(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key), "__ts": batch.column(right_ts).cast(ts_t)}
        for c in left_cols:
            # left payload columns are null on the right side
            cols[c] = pa.nulls(batch.num_rows, left_schema_types[c])
        for c in needed_right:
            cols[c] = batch.column(c)
        cols[SIDE_COL] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    left_schema_types = {c: left.schema().base_schema.field(c).type for c in left_cols}
    right_schema_types = {c: right.schema().base_schema.field(c).type for c in needed_right}

    lt = left.map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
    unioned = lt.union(rt)
    out_cols = [key, "__ts"] + [c for c in left_cols if c not in (key, "__ts")]

    def per_bucket(sorted_tbl: pa.Table) -> pa.Table:
        merged = asof_merge_table(
            sorted_tbl, key, "__ts", aggs, out_cols,
            point_fn=point_fn, point_out=point_out, value_cols=value_cols,
            window_us=window_us,
        )
        return merged.rename_columns(
            [left_ts if c == "__ts" else c for c in merged.column_names]
        )

    return grouped_sorted_apply(
        unioned, key, ["__ts", SIDE_COL], per_bucket, num_buckets, hot_keys=hot_keys
    )


def asof_self_join(
    ds: Dataset,
    key: str,
    ts_col: str,
    left_mask: Callable[[pa.Table], pa.Array],
    right_mask: Callable[[pa.Table], pa.Array],
    aggs: dict[str, tuple[str, str]],
    left_cols: list[str],
    right_exprs: "dict[str, Callable[[pa.Table], pa.Array]] | None" = None,
    num_buckets: int = 64,
    hot_keys: list | None = None,
    window_us: int | None = None,
) -> Dataset:
    """Point-in-time join of a stream AGAINST ITSELF — one read, one pass.

    The common "features of event X over the same stream's prior history"
    shape (e.g. each error event over prior non-error events) would pay two
    filtered scans through :func:`asof_join`; here each input batch is
    tagged into both sides in a SINGLE ``map_batches`` so the source is read
    once.  ``left_mask``/``right_mask`` select the query/event rows;
    ``right_exprs`` derive extra value columns (name → fn(right_rows) →
    Array), e.g. exact integer cents.  Same merge semantics as
    :func:`asof_join`.
    """
    right_exprs = right_exprs or {}
    agg_srcs = sorted({src for src, _ in aggs.values()})
    ts_t = pa.timestamp("us")

    def tag_both(batch: pa.Table) -> pa.Table:
        lmask = left_mask(batch)
        rmask = right_mask(batch)
        lb = batch.filter(lmask)
        rb = batch.filter(rmask)
        rvals: dict[str, pa.Array] = {}
        for name, fn in right_exprs.items():
            rvals[name] = fn(rb)
        for c in agg_srcs:
            if c not in rvals:
                rvals[c] = rb.column(c).combine_chunks()
        lcols = {key: lb.column(key), "__ts": lb.column(ts_col).cast(ts_t)}
        for c in left_cols:
            lcols[c] = lb.column(c)
        for c in agg_srcs:
            lcols[c] = pa.nulls(lb.num_rows, rvals[c].type)
        lcols[SIDE_COL] = pa.array(np.ones(lb.num_rows, dtype=np.int8))
        rcols = {key: rb.column(key), "__ts": rb.column(ts_col).cast(ts_t)}
        for c in left_cols:
            rcols[c] = pa.nulls(rb.num_rows, batch.schema.field(c).type)
        for c in agg_srcs:
            rcols[c] = rvals[c]
        rcols[SIDE_COL] = pa.array(np.zeros(rb.num_rows, dtype=np.int8))
        return pa.concat_tables([pa.table(lcols), pa.table(rcols)])

    unioned = ds.map_batches(tag_both, batch_format="pyarrow", zero_copy_batch=True)
    out_cols = [key, "__ts"] + [c for c in left_cols if c not in (key, "__ts")]

    def per_bucket(sorted_tbl: pa.Table) -> pa.Table:
        merged = asof_merge_table(
            sorted_tbl, key, "__ts", aggs, out_cols, window_us=window_us,
        )
        return merged.rename_columns(
            [ts_col if c == "__ts" else c for c in merged.column_names]
        )

    return grouped_sorted_apply(
        unioned, key, ["__ts", SIDE_COL], per_bucket, num_buckets, hot_keys=hot_keys
    )
