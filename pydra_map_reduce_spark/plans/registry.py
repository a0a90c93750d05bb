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
  ``sum(BIGINT)`` to HUGEINT, which would break schema comparison);
- terminal output columns use ONLY hash-safe types (see
  ``assert_hash_safe_schema``): round 7 proved that DECIMAL-typed
  output cells are canonicalized differently by the two engines'
  client layers (driver ledger: rows/schema green, hash red, values
  bit-identical) — DECIMAL/fixed-point arithmetic stays INTERNAL and
  surfaces as BIGINT minor units, rounded DOUBLE, or STRING digits.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

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


# Terminal types proven to hash identically across the Spark and DuckDB
# client stacks (every driver-green query in rounds 2-7 used only these;
# the one family that surfaced DECIMAL went rows/schema-green but
# hash-RED with bit-identical values — r7 ledger). DecimalType is the
# known offender: a decimal→float64 conversion on one side of the value
# hash makes equal cells hash unequal. Fixed-point math stays internal;
# terminals cast to BIGINT minor units / rounded DOUBLE / STRING digits.
_HASH_SAFE_ATOMIC = (
    T.LongType, T.IntegerType, T.ShortType, T.ByteType,
    T.DoubleType, T.FloatType,
    T.StringType, T.BooleanType,
    T.TimestampType, T.TimestampNTZType, T.DateType,
    T.BinaryType, T.NullType,
)


def _unsafe_leaves(dt: T.DataType, path: str, out: list[str]) -> None:
    # Terminal columns must be ATOMIC, full stop. Round 8 proved that
    # array-of-safe-atomic is NOT safe: the external harness
    # canonicalizes results through pandas sort_values, which throws
    # `TypeError: unhashable type: 'list'` on a list cell — the
    # inverted_index red. List/struct/map-shaped results serialize via
    # array_join / to_json with a documented delimiter (SURVEY §3.2).
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        out.append(
            f"{path}: {dt.simpleString()} (non-atomic terminal: the "
            "driver's pandas canonicalizer cannot sort container cells "
            "— serialize with array_join/to_json)"
        )
    elif not isinstance(dt, _HASH_SAFE_ATOMIC):
        out.append(f"{path}: {dt.simpleString()}")


def assert_hash_safe_schema(df: DataFrame, name: str = "<anonymous>") -> None:
    """Fail fast if a query's TERMINAL schema contains a type the
    driver's value hash is known to canonicalize ambiguously (DECIMAL
    foremost). Authoring-time gate: tests run this over every
    registered query so no future family re-discovers the r7 decimal
    trap at the driver."""
    bad: list[str] = []
    for f in df.schema.fields:
        _unsafe_leaves(f.dataType, f.name, bad)
    if bad:
        raise TypeError(
            f"query {name!r} exposes non-hash-safe terminal column types "
            f"{bad}; keep DECIMAL/interval/etc. internal and cast terminals "
            "to BIGINT minor units, rounded DOUBLE, or STRING digits "
            "(plans/registry.py:_HASH_SAFE_ATOMIC)"
        )
