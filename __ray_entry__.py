"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: transcript feature engineering +
    the stateful scorer actor pool (fixed-width feature vectors)."""
    from dane_visual_feature_extraction_worker_ray.pipelines.scorer_queries import (
        q_feature_vectors,
    )

    return q_feature_vectors(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from dane_visual_feature_extraction_worker_ray.pipelines import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from dane_visual_feature_extraction_worker_ray.pipelines import registry

    return registry.oracle_sql()
