"""Graded query plans.

Importing this package populates the registry: every submodule
registers its queries via :func:`pydra_map_reduce_spark.plans.registry.query`.
``__spark_entry__.py`` exposes the registry to the driver.
"""

from __future__ import annotations

from . import (  # noqa: F401  (import-for-side-effect: registry population)
    analytics,
    analytics2,
    corpus,
    dedup,
    events,
    graph,
    io,
    joins,
    mapreduce,
    mleval,
    money,
    multimodal,
    relational,
    scalar,
    setops,
    sketches,
    streaming,
    text,
    vectors,
    windows,
)
from .registry import REGISTRY, Query

__all__ = ["REGISTRY", "Query"]
