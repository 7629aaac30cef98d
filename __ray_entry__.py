"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship point-in-time feature pipeline on sf0.001;
``queries()`` exposes every implemented operator/pipeline from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL for the SQL-expressible ones
(same column names both sides — the driver hash-compares values).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: point-in-time (as-of)
    feature vectors for every 'error' event over the user's prior history."""
    from ecg_feature_engineering_ray.pipelines.queries import QUERIES

    return QUERIES["asof_error_features"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ecg_feature_engineering_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ecg_feature_engineering_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
