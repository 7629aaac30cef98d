"""Distributed group-by aggregation with partial (combiner) pre-aggregation.

The scale pattern (SURVEY.md §7.3): aggregate INSIDE ``map_batches`` first so
only (groups × partial-columns) rows enter the shuffle, then a small
``groupby(keys).map_groups`` finalizes.  At 100 TB the shuffle moves partial
rows (≈ #groups × #blocks), not data rows — the difference between an
all-to-all of the table and of a summary.

Reference analog: all reference aggregations are single-process DataFrame
appends (/root/reference/extract_HRV.py:38); the partial/final split is the
Ray-native restatement.

Supported mergeable aggs: count, sum, min, max, mean, std (sample, via
sum/sumsq), plus count_distinct (exact, via per-batch unique sets — use only
on bounded-cardinality columns).  Non-mergeable order statistics (median,
percentiles) belong in ``partition.grouped_sorted_apply`` instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def grouped_agg(
    ds: Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str]],
    round_to: int | None = None,
) -> Dataset:
    """Grouped aggregation: out_name → (source_col, fn).

    fn ∈ {count, sum, mean, min, max, std, count_distinct}.  ``count`` with
    source '*' counts rows.  ``round_to`` rounds float outputs (oracle-hash
    stability).
    """
    # partial columns needed per source column
    need_cents = {src for src, fn in specs.values() if fn == "sum_cents"}
    need_sum = {src for src, fn in specs.values() if fn in ("sum", "mean", "std")}
    need_sumsq = {src for src, fn in specs.values() if fn == "std"}
    need_min = {src for src, fn in specs.values() if fn == "min"}
    need_max = {src for src, fn in specs.values() if fn == "max"}
    need_cnt = {src for src, fn in specs.values() if fn in ("mean", "std")} | {
        src for src, fn in specs.values() if fn == "count" and src != "*"
    }
    need_distinct = {src for src, fn in specs.values() if fn == "count_distinct"}
    count_rows = any(fn == "count" and src == "*" for src, fn in specs.values())

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native partial: pa.TableGroupBy hash-aggregates without a
        # pandas round-trip, so the combiner stays zero-copy on the batch.
        # NaN semantics are DELIBERATELY Arrow's (= ANSI SQL / the DuckDB
        # oracle): NaN is a VALUE — count() includes it, sum/mean/std over a
        # NaN-bearing group return NaN.  (The previous pandas partials
        # silently skipped NaN, diverging from the oracle.)  Nulls are
        # skipped by both, as in SQL.
        import pyarrow.compute as pc  # noqa: PLC0415

        t = batch.select(
            sorted(set(keys) | need_cents | need_sum | need_sumsq | need_min | need_max | need_cnt | need_distinct)
        )
        aggs: list[tuple[str, str]] = []
        rename: dict[str, str] = {}
        for src in need_cents:
            # integer-cents partial sums are exact in float64 → final result
            # is order-independent and bit-identical to a SQL oracle's
            c = pc.round(pc.multiply(pc.cast(t.column(src), pa.float64()), 100.0))
            t = t.append_column(f"__c_{src}", c)
            aggs.append((f"__c_{src}", "sum"))
            rename[f"__c_{src}_sum"] = f"__cents_{src}"
        for src in need_sum:
            aggs.append((src, "sum"))
            rename[f"{src}_sum"] = f"__sum_{src}"
        for src in need_sumsq:
            f = pc.cast(t.column(src), pa.float64())
            t = t.append_column(f"__sq_{src}", pc.multiply(f, f))
            aggs.append((f"__sq_{src}", "sum"))
            rename[f"__sq_{src}_sum"] = f"__sumsq_{src}"
        for src in need_min:
            aggs.append((src, "min"))
            rename[f"{src}_min"] = f"__min_{src}"
        for src in need_max:
            aggs.append((src, "max"))
            rename[f"{src}_max"] = f"__max_{src}"
        for src in need_cnt:
            aggs.append((src, "count"))
            rename[f"{src}_count"] = f"__cnt_{src}"
        for src in need_distinct:
            aggs.append((src, "distinct"))
            rename[f"{src}_distinct"] = f"__set_{src}"
        if count_rows:
            t = t.append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))
            aggs.append(("__one", "sum"))
            rename["__one_sum"] = "__rows"
        res = pa.TableGroupBy(t, keys).aggregate(aggs)
        return res.rename_columns([rename.get(c, c) for c in res.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        row = {k: group[k].iloc[0] for k in keys}
        for name, (src, fn) in specs.items():
            if fn == "count":
                v = group["__rows"].sum() if src == "*" else group[f"__cnt_{src}"].sum()
            elif fn == "sum_cents":
                v = group[f"__cents_{src}"].sum() / 100.0
            elif fn == "sum":
                v = group[f"__sum_{src}"].sum()
            elif fn == "min":
                v = group[f"__min_{src}"].min()
            elif fn == "max":
                v = group[f"__max_{src}"].max()
            elif fn == "mean":
                v = group[f"__sum_{src}"].sum() / group[f"__cnt_{src}"].sum()
            elif fn == "std":
                n = group[f"__cnt_{src}"].sum()
                s = group[f"__sum_{src}"].sum()
                ss = group[f"__sumsq_{src}"].sum()
                v = np.sqrt(max(ss - s * s / n, 0.0) / (n - 1)) if n > 1 else np.nan
            elif fn == "count_distinct":
                # arrow 'distinct' partials may carry nulls — drop them here
                v = len({x for lst in group[f"__set_{src}"] for x in lst
                         if x is not None and x == x})
            else:
                raise ValueError(fn)
            if round_to is not None and isinstance(v, (float, np.floating)):
                v = round(float(v), round_to)
            row[name] = v
        return pd.DataFrame([row])

    return partials.groupby(keys).map_groups(finalize, batch_format="pandas")


def per_group_top_k(
    ds: Dataset,
    group: str,
    order_by: list[str],
    k: int,
    num_buckets: int,
    rank_name: str = "rank",
) -> Dataset:
    """Per-group top-k: the k lexicographically-smallest rows of ``order_by``
    within each ``group``, plus a 1-based ``rank_name`` column.

    Mergeable the same way a KMV sketch is: each block pre-prunes to ≤k rows
    per group inside ``map_batches`` (vectorized lexsort + segment-position
    mask, no Python per-group loop), so the exchange carries
    O(groups-per-block × k) rows regardless of input size; the final pass is
    one ``grouped_sorted_apply`` taking the first k of each sorted segment.
    Descending order = negate the key column before calling.  This is the
    spine for both per-domain contribution caps (order by a deterministic
    row hash) and per-group best-k selection (order by a score).

    Reference analog: the reference selects its top-300 features by
    importance with a driver-local ``np.argsort(-fea_)[:300]``
    (/root/reference/xgboost_clf.py:244); this is that selection restated
    per-group as a distributed mergeable operator.
    """
    from .partition import entity_segments, grouped_sorted_apply  # noqa: PLC0415

    def prune(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        gvals = batch.column(group).to_pandas().to_numpy()
        _, gc = np.unique(gvals, return_inverse=True)
        keys = [np.asarray(batch.column(c).combine_chunks()) for c in order_by]
        # np.lexsort: LAST key is primary → (tie_n … tie_1, primary, group)
        order = np.lexsort(tuple(reversed(keys)) + (gc,))
        sg = gc[order]
        starts = np.flatnonzero(np.concatenate(([True], sg[1:] != sg[:-1])))
        seg_id = np.cumsum(np.concatenate(([False], sg[1:] != sg[:-1])))
        pos = np.arange(n) - starts[seg_id]
        return batch.take(pa.array(order[pos < k]))

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def head_k(tbl: pa.Table) -> pa.Table:
        starts, ends = entity_segments(tbl, group)
        n = tbl.num_rows
        pos = np.arange(n) - np.repeat(
            np.asarray(starts, dtype=np.int64),
            np.asarray(ends, dtype=np.int64) - np.asarray(starts, dtype=np.int64),
        )
        mask = pos < k
        out = tbl.filter(pa.array(mask))
        return out.append_column(rank_name, pa.array(pos[mask] + 1, pa.int64()))

    return grouped_sorted_apply(pruned, group, order_by, head_k, num_buckets)


def global_agg(ds: Dataset, specs: dict[str, tuple[str, str]]) -> pa.Table:
    """Whole-dataset aggregate (no keys) via the same partial pattern.

    Returns a one-row Arrow table (small result — driver-side merge is fine;
    reference analog: the global min-length scan, /root/reference/utils.py:43-56).
    """
    tagged = ds.map_batches(
        lambda b: b.append_column("__g", pa.array(np.zeros(b.num_rows, np.int8))),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = grouped_agg(tagged, ["__g"], specs)
    import ray  # noqa: PLC0415

    parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(parts).combine_chunks()
    return tbl.drop_columns(["__g"])
