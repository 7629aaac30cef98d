"""Per-partition checkpoint manifests: lineage, watermark, metrics, resume.

Each output partition (= one entity bucket) commits atomically: data parquet
written to ``part-<bucket>.parquet.tmp`` then renamed, manifest JSON written
last.  A partition is complete iff its manifest exists; resume = skip those
buckets at the partitioning stage (anti-join on bucket id — the Ray-native
restatement of the reference's manual ``index2del`` resume hack,
/root/reference/challenge2020/preprocess/preprocess-300hz.py:93-95).

Manifest fields: partition/bucket id, input fragment list (lineage), row
counts, watermark (max event ts seen — late rows below it need backfill),
wall seconds and rows/s (per-partition throughput/skew metrics demanded by
the north rule).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..sources.readers import HAVE_LANCE

MANIFEST_SUFFIX = ".manifest.json"


def write_fragment(table: pa.Table, path: str) -> str:
    """Format seam for partition data (SURVEY S5/S6 map to ``write_lance``).

    Lance is the nominal storage format at fleet scale (fragment-level
    commits, column projection on read); the package is absent in this
    container, so parquet is the default physical format and the Lance
    branch is exercised by a monkeypatched seam test.  Writes to a temp
    name; caller renames (atomic commit protocol).  Returns the final path
    the caller should rename to."""
    if HAVE_LANCE:
        import lance  # type: ignore  # noqa: PLC0415

        lance_path = path.removesuffix(".parquet") + ".lance"
        lance.write_dataset(table, lance_path + ".tmp", mode="create")
        return lance_path
    pq.write_table(table, path + ".tmp")
    return path


def partition_paths(out_dir: str, bucket: int) -> tuple[str, str]:
    base = os.path.join(out_dir, f"part-{bucket:05d}")
    return base + ".parquet", base + MANIFEST_SUFFIX


def completed_buckets(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for f in os.listdir(out_dir):
        if f.endswith(MANIFEST_SUFFIX):
            out.add(int(f[len("part-") : -len(MANIFEST_SUFFIX)].split(".")[0]))
    return out


def commit_partition(
    out_dir: str,
    bucket: int,
    table: pa.Table,
    input_fragments: list[str],
    watermark_us: int | None,
    t_start: float,
    extra: dict | None = None,
) -> dict:
    """Atomically write one partition's data + manifest; returns the manifest."""
    os.makedirs(out_dir, exist_ok=True)
    data_path, man_path = partition_paths(out_dir, bucket)
    # A partition is complete iff its MANIFEST exists.  The write is
    # deterministic, and commit runs inside Ray data tasks: a worker lost
    # AFTER the manifest write but before the block returns gets its task
    # replayed by lineage, so an existing manifest with MATCHING content is a
    # benign retry — return it idempotently.  Only a content mismatch (same
    # bucket, different rows — a double-driver or caller bug) fails loudly;
    # the old unconditional raise turned every legitimate retry into a
    # whole-run failure.
    if os.path.exists(man_path):
        with open(man_path) as fh:
            existing = json.load(fh)
        if existing.get("rows") != table.num_rows:
            raise FileExistsError(
                f"bucket {bucket} already committed ({man_path}) with "
                f"{existing.get('rows')} rows but re-commit carries "
                f"{table.num_rows} rows — refusing to overwrite committed data"
            )
        return existing
    data_path = write_fragment(table, data_path)
    # Clearing a stale destination here is safe: the manifest check above
    # proves we can only be re-committing a partition whose manifest was
    # never written (crash between data rename and manifest write).
    # Required for the lance branch — os.replace cannot overwrite a
    # non-empty directory dataset.
    if os.path.isdir(data_path):
        import shutil  # noqa: PLC0415

        shutil.rmtree(data_path)
    os.replace(data_path + ".tmp", data_path)
    wall = time.time() - t_start
    manifest = {
        "bucket": bucket,
        "rows": table.num_rows,
        "input_fragments": input_fragments,
        "watermark_us": watermark_us,
        "wall_s": round(wall, 4),
        "rows_per_s": round(table.num_rows / wall, 2) if wall > 0 else None,
        "committed_at": time.time(),
        **(extra or {}),
    }
    tmp_man = man_path + ".tmp"
    with open(tmp_man, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_man, man_path)
    return manifest


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for f in sorted(os.listdir(out_dir)):
        if f.endswith(MANIFEST_SUFFIX):
            with open(os.path.join(out_dir, f)) as fh:
                out.append(json.load(fh))
    return out


def read_output(out_dir: str) -> pa.Table:
    """Concatenate all committed partitions (test/validation helper).

    Recognizes both physical formats of the write seam: ``.parquet`` files
    and ``.lance`` fragment directories (when the lance package is present),
    so a lance-committed partition is visible to resume validation too."""
    parts = []
    for f in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, f)
        if f.endswith(".parquet"):
            parts.append(pq.read_table(path))
        elif f.endswith(".lance") and os.path.isdir(path):
            if not HAVE_LANCE:
                # Silently omitting a committed lance partition would make
                # resume validation "pass" on partial data.
                raise RuntimeError(
                    f"committed lance partition {path} present but the lance "
                    "package is not importable — cannot read full output"
                )
            import lance  # type: ignore  # noqa: PLC0415

            parts.append(lance.dataset(path).to_table())
    return pa.concat_tables(parts) if parts else pa.table({})
