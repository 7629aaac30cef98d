"""Deterministic, process-stable hashing kernels.

Bucket assignment, dedup fingerprints and seeded per-row RNG all need hashes
that are identical across workers, processes and runs (Python's builtin
``hash`` is salted, so it is banned here).  Two families:

- ``splitmix64`` — fast vectorized avalanche hash for int64 key columns.
- ``md5_*``      — cryptographic digests for strings (also what the DuckDB
  oracle uses via its ``md5()`` function, so fingerprints compare exactly).

Reference analog: the reference has no hashing at all (file-per-record);
bucketing replaces its "one file = one unit of work" sharding
(/root/reference/extract_HRV.py:27).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int64/uint64 array."""
    z = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        z += _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def bucket_of_ints(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Stable bucket id in [0, num_buckets) for an integer key column."""
    return (splitmix64(keys) % _U64(num_buckets)).astype(np.int32)


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_u64(s: str) -> int:
    """First 8 bytes of md5 as unsigned 64-bit int (stable string hash)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def bucket_of_strings(arr: pa.Array | pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    """Stable bucket ids for a string column.

    Hashes each *distinct* value once (dictionary-encode first), then maps
    indices — O(uniques) hashing per batch instead of O(rows).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = arr.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    lut = np.array([md5_u64(u) % num_buckets for u in uniq], dtype=np.int32)
    idx = np.asarray(d.indices)
    return lut[idx]


def seeded_uniform(keys: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-row uniform(0,1) keyed by (key, seed).

    Retry-safe replacement for ``np.random`` row sampling
    (reference analog: seeded oversampling,
    /root/reference/challenge2020/preprocess/preprocess-300hz.py:315-341).
    """
    mixed = splitmix64(keys.astype(_U64) ^ splitmix64(np.full(len(keys), seed, dtype=_U64)))
    return (mixed >> _U64(11)).astype(np.float64) / float(1 << 53)


def stable_row_hash(tbl: pa.Table, columns: list[str]) -> np.ndarray:
    """Combined stable uint64 hash of the given columns, row-wise."""
    acc = np.zeros(tbl.num_rows, dtype=_U64)
    for name in columns:
        col = tbl.column(name)
        if pa.types.is_integer(col.type):
            h = splitmix64(np.asarray(col.combine_chunks()).astype(np.int64))
        elif pa.types.is_floating(col.type):
            h = splitmix64(np.asarray(col.combine_chunks()).view(np.int64))
        elif pa.types.is_timestamp(col.type):
            h = splitmix64(np.asarray(col.cast(pa.int64()).combine_chunks()))
        else:
            str_col = col.cast(pa.string()).combine_chunks()
            d = str_col.dictionary_encode()
            lut = np.array([md5_u64(u if u is not None else "\x00null") for u in d.dictionary.to_pylist()],
                           dtype=_U64)
            h = lut[np.asarray(d.indices)]
        with np.errstate(over="ignore"):
            acc = splitmix64(acc * _U64(31) + h)
    return acc
