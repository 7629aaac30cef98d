"""Table readers — fragmented parquet (Lance when available), pruned at the read.

Reference analog: the reference's "source" is a directory of per-record
WFDB/.mat files globbed then loaded whole
(/root/reference/challenge2020/preprocess/preprocess-300hz.py:88-121).  Here a
table is a fragmented columnar dataset; *column pruning happens at the read*
(``columns=[...]``) so e.g. a shuffle over (image_id, ts, derived value)
never loads the image ``bytes`` column from storage.
"""

from __future__ import annotations

import glob
import os

import ray.data

try:  # Lance is the nominal storage format at 10^12 scale; absent here.
    import lance  # type: ignore  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def list_fragments(path: str) -> list[str]:
    """Ordered fragment files of a dataset directory (checkpoint lineage unit)."""
    if os.path.isfile(path):
        return [path]
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def read_events(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read the event table as a streaming Dataset, pruning columns at the read."""
    if HAVE_LANCE and os.path.isdir(path) and os.path.exists(os.path.join(path, "_versions")):
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read one of the benchmark tables (``{sf_dir}/{name}.parquet``)."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs)
