"""Session-scoped Ray + fixture-table setup (one ray.init per pytest session)."""

from __future__ import annotations

import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_events(tmp_path_factory):
    """Small deterministic image+caption event table (FIXTURES.md F1)."""
    from ecg_feature_engineering_ray.sources.fixture import generate_events

    d = str(tmp_path_factory.mktemp("events"))
    manifest = generate_events(d, n_entities=40, seed=42)
    return d, manifest


@pytest.fixture(scope="session")
def fixture_queries(fixture_events, tmp_path_factory):
    """As-of query points over the fixture events (FIXTURES.md F2)."""
    from ecg_feature_engineering_ray.sources.fixture import generate_asof_queries

    d, _ = fixture_events
    p = str(tmp_path_factory.mktemp("queries") / "asof_queries.parquet")
    generate_asof_queries(d, p, n_queries=120, seed=43)
    return p


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
