"""Broadcast hash joins (inner / left / semi / anti).

The small side is materialized ONCE into the object store (``ray.put``) and
read zero-copy by every map task — never re-shipped per batch, never a
shuffle (SURVEY.md §2.5 J2/J4).  Use for dimension tables (labels, skip
lists, key sets); the as-of join (stages/asof.py) covers the big×big keyed
case.

Reference analogs: positional record↔label lookup
(/root/reference/challenge2020/preprocess/preprocess-300hz.py:142-152) and
the ``index2del`` skip list (:93-99).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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
    (dimension-table contract) — duplicate keys raise.
    """
    if how in ("semi", "anti"):
        key_set = ray.put(set(small.column(on).to_pylist()))

        def member_filter(batch: pa.Table) -> pa.Table:
            keys = ray.get(key_set)
            col = batch.column(on).to_pylist()
            mask = np.fromiter((v in keys for v in col), bool, len(col))
            if how == "anti":
                mask = ~mask
            return batch.filter(pa.array(mask))

        return big.map_batches(member_filter, batch_format="pyarrow", zero_copy_batch=True)

    keys = small.column(on).to_pylist()
    if len(set(keys)) != len(keys):
        raise ValueError(f"broadcast_join: duplicate keys in small side on {on!r}")
    cols = small_cols or [c for c in small.column_names if c != on]
    small_df = small.select([on] + cols).to_pandas().set_index(on)
    small_ref = ray.put(small_df)

    def join_batch(batch: pa.Table) -> pa.Table:
        sdf = ray.get(small_ref)
        bdf = batch.to_pandas()
        if how == "inner":
            bdf = bdf[bdf[on].isin(sdf.index).values]
        out = bdf.join(sdf, on=on, how="left", rsuffix=suffix)
        return pa.Table.from_pandas(out, preserve_index=False)

    return big.map_batches(join_batch, batch_format="pyarrow", zero_copy_batch=True)
