"""Broadcast hash joins (inner / left / semi / anti).

The small side is materialized ONCE into the object store (``ray.put``) and
read zero-copy by every map task — never re-shipped per batch, never a
shuffle (SURVEY.md §2.5 J2/J4).  Use for dimension tables (labels, skip
lists, key sets); the as-of join (stages/asof.py) covers the big×big keyed
case.

All per-batch work is vectorized Arrow kernels (``pc.is_in`` membership,
``pc.index_in`` + ``take`` gather) — no pandas conversion and no Python loop
over rows in the hot path.

Reference analogs: positional record↔label lookup
(/root/reference/challenge2020/preprocess/preprocess-300hz.py:142-152) and
the ``index2del`` skip list (:93-99).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def broadcast_join(
    big: Dataset,
    small: pa.Table,
    on: str,
    how: str = "inner",
    small_cols: list[str] | None = None,
    suffix: str = "_r",
) -> Dataset:
    """Join ``big`` (Dataset) with ``small`` (Arrow table) on column ``on``.

    how ∈ {'inner', 'left', 'semi', 'anti'}.  For semi/anti only membership
    is broadcast.  Assumes ``on`` is unique in ``small`` for inner/left
    (dimension-table contract) — duplicate keys raise.  Row order of ``big``
    is preserved (first-match gather, not a sort-merge).
    """
    if how in ("semi", "anti"):
        key_set = ray.put(small.column(on).combine_chunks().unique())

        def member_filter(batch: pa.Table) -> pa.Table:
            keys = ray.get(key_set)
            mask = pc.is_in(batch.column(on), value_set=keys)
            if how == "anti":
                # is_in yields null for null probes; anti keeps non-members only
                mask = pc.invert(pc.fill_null(mask, False))
            else:
                mask = pc.fill_null(mask, False)
            return batch.filter(mask)

        return big.map_batches(member_filter, batch_format="pyarrow", zero_copy_batch=True)

    key_arr = small.column(on).combine_chunks()
    if len(key_arr.unique()) != len(key_arr):
        raise ValueError(f"broadcast_join: duplicate keys in small side on {on!r}")
    cols = small_cols or [c for c in small.column_names if c != on]
    small_ref = ray.put(small.select([on] + cols).combine_chunks())

    def join_batch(batch: pa.Table) -> pa.Table:
        stbl = ray.get(small_ref)
        idx = pc.index_in(batch.column(on), value_set=stbl.column(on))
        if how == "inner":
            valid = pc.is_valid(idx)
            batch = batch.filter(valid)
            idx = idx.filter(valid)
        for c in cols:
            name = c if c not in batch.column_names else c + suffix
            batch = batch.append_column(name, stbl.column(c).take(idx))
        return batch

    return big.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)
