"""Registry mapping query name -> (Spark callable, DuckDB oracle SQL).

This is the single source of truth for the driver contract
(``__spark_entry__.py``): each graded operator from SURVEY.md §2 is one
``@query(...)`` registration. Queries with ``oracle=None`` are
non-SQL-expressible (streaming, opaque-UDF escape hatch, approximate
sketches) and get the driver's weaker rows-only check.

Conventions (SURVEY.md §3.2):
- every computed/aggregate column is aliased identically in the Spark
  plan and the oracle SQL (the driver sorts columns by name and hashes
  values — a name mismatch is an automatic fail);
- float aggregates are wrapped in ``round(x, N)`` on BOTH sides so
  summation-order differences between engines collapse to the same
  double;
- integer sums are cast to BIGINT in the oracle (DuckDB widens
  ``sum(BIGINT)`` to HUGEINT, which would break schema comparison).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    section: str  # SURVEY.md §2 row this query evidences


REGISTRY: dict[str, Query] = {}


def query(name: str, *, oracle: str | None, section: str) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query under ``name``.

    ``oracle`` is the DuckDB-equivalent SQL (tables pre-registered as
    views: region nation customer supplier part orders lineitem events
    documents embeddings), or None for rows-only ops.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, section=section)
        return fn

    return deco
