"""Fail-loud guards: degenerate LSH band buckets and oracle scan bounds.

A silent O(n²) bucket or a silently-truncated oracle scan would read as
"covered everything" — these tests pin the loud failure mode instead.
"""

from __future__ import annotations

import numpy as np
import pytest

from ecg_feature_engineering_ray.pipelines.queries import (
    _guard_oracle_cap,
    near_dup_pairs,
    simhash_near_dups,
)

SF = "/root/testdata/sf0.001"


def test_guard_oracle_cap_raises_and_passes():
    _guard_oracle_cap(4096, 4096, "at the bound")  # at the cap: fine
    with pytest.raises(ValueError, match="scan bound"):
        _guard_oracle_cap(4097, 4096, "over the bound")


def test_simhash_degenerate_bucket_raises(ray_session):
    # max_bucket=1 makes ANY band collision "degenerate" — the planted
    # near-dups in the fixture guarantee at least one collision
    with pytest.raises(Exception, match="max_bucket"):
        simhash_near_dups(SF, max_bucket=1).materialize()


def test_minhash_degenerate_bucket_raises(ray_session):
    with pytest.raises(Exception, match="max_bucket"):
        near_dup_pairs(SF, max_bucket=1).materialize()
