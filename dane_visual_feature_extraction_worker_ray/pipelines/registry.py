"""Central registry of driver-facing queries and their oracle SQL.

Suites register themselves here; ``__ray_entry__.py`` re-exports. A
query without an oracle entry gets the driver's weaker rows-only check
(used only for genuinely non-SQL-expressible ops: sketch-based dedup,
scorer vectors, fingerprints).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def queries() -> dict[str, Callable[[str], Any]]:
    from . import transcript_queries

    q: dict[str, Callable[[str], Any]] = {}
    q.update(transcript_queries.QUERIES)
    for mod in _optional_suites():
        q.update(mod.QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    from . import transcript_queries

    s: dict[str, str] = {}
    s.update(transcript_queries.ORACLE_SQL)
    for mod in _optional_suites():
        s.update(mod.ORACLE_SQL)
    return s


def _optional_suites():
    mods = []
    for name in ("relational_queries", "dedup_queries", "text_queries",
                 "similarity_queries", "scorer_queries",
                 "multimodal_queries", "curation", "join_queries",
                 "stats_queries", "events_queries", "window_queries",
                 "setop_queries", "ingest_queries",
                 "classifier_queries", "feature_queries"):
        try:
            mods.append(
                __import__(
                    f"dane_visual_feature_extraction_worker_ray.pipelines.{name}",
                    fromlist=[name],
                )
            )
        except ImportError:
            pass
    return mods
