"""Declared schemas + loaders for the fixture tables.

Schemas are fixed StructTypes (SURVEY.md §1.4): asserted against the
parquet footer at load so drift fails fast instead of silently casting.
At 100 TB the same loader works unchanged — `spark.read.parquet` on a
directory of files; predicate pushdown / column pruning happen in the
scan, so callers should `.select()` early and filter with Column exprs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_L = T.LongType()
_I = T.IntegerType()
_D = T.DoubleType()
_S = T.StringType()
_TS = T.TimestampType()


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, T.StructType] = {
    "region": _st(("r_regionkey", _I), ("r_name", _S)),
    "nation": _st(("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I)),
    "customer": _st(
        ("c_custkey", _L),
        ("c_name", _S),
        ("c_nationkey", _I),
        ("c_acctbal", _D),
        ("c_mktsegment", _S),
    ),
    "supplier": _st(
        ("s_suppkey", _L), ("s_name", _S), ("s_nationkey", _I), ("s_acctbal", _D)
    ),
    "part": _st(
        ("p_partkey", _L),
        ("p_name", _S),
        ("p_brand", _S),
        ("p_type", _S),
        ("p_size", _I),
        ("p_retailprice", _D),
    ),
    "orders": _st(
        ("o_orderkey", _L),
        ("o_custkey", _L),
        ("o_orderstatus", _S),
        ("o_totalprice", _D),
        ("o_orderdate", _TS),
        ("o_orderpriority", _S),
    ),
    "lineitem": _st(
        ("l_orderkey", _L),
        ("l_partkey", _L),
        ("l_suppkey", _L),
        ("l_linenumber", _I),
        ("l_quantity", _D),
        ("l_extendedprice", _D),
        ("l_discount", _D),
        ("l_tax", _D),
        ("l_returnflag", _S),
        ("l_linestatus", _S),
        ("l_shipdate", _TS),
    ),
    "events": _st(
        ("event_id", _L),
        ("ts", _TS),
        ("user_id", _L),
        ("event_type", _S),
        ("value", _D),
        ("props", _S),
    ),
    # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    # reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos
    # (legacy.parquet.nanosAsLong) and convert to TimestampType with
    # integer division (ns div 1000 -> µs), matching DuckDB's ns->µs
    # truncation exactly. The public schema above stays TimestampType.
    "_events_raw": _st(
        ("event_id", _L),
        ("ts", _L),
        ("user_id", _L),
        ("event_type", _S),
        ("value", _D),
        ("props", _S),
    ),
    "documents": _st(
        ("doc_id", _L),
        ("text", _S),
        ("lang", _S),
        ("source", _S),
        ("n_chars", _L),
    ),
    "embeddings": _st(
        ("vec_id", _L),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", _I),
    ),
}

TABLES = tuple(n for n in SCHEMAS if not n.startswith("_"))


def _assert_schema(spark: SparkSession, path: str, name: str) -> None:
    """Fail fast when the parquet footer drifts from the declared schema.

    ``spark.read.schema(S)`` alone would silently NULL-fill missing
    columns; comparing the inferred footer schema first makes drift an
    immediate, descriptive error. Footer inference reads metadata only
    (no data scan), so this is cheap even on a 100 TB directory.
    """
    actual = spark.read.parquet(path).schema
    declared = SCHEMAS[name]

    def norm(t: str) -> str:
        # fixtures store naive timestamps (isAdjustedToUTC=false), which
        # infer as timestamp_ntz; with the session pinned to UTC they are
        # value-identical to TimestampType, so treat them as equal here.
        return "timestamp" if t == "timestamp_ntz" else t

    got = [(f.name, norm(f.dataType.simpleString())) for f in actual.fields]
    want = [(f.name, norm(f.dataType.simpleString())) for f in declared.fields]
    if got != want:
        raise ValueError(
            f"schema drift for table {name!r} at {path}:\n"
            f"  declared: {want}\n  footer:   {got}"
        )


_VERIFIED: set[str] = set()

# Session confs load_table pins (documented public side effect, see
# load_table docstring). Previous values are remembered per session the
# first time each key is pinned so callers can undo the pins.
_SAVED_CONFS: dict[int, dict[str, str | None]] = {}


def _pin_conf(spark: SparkSession, key: str, value: str) -> None:
    saved = _SAVED_CONFS.setdefault(id(spark), {})
    if key not in saved:
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
    spark.conf.set(key, value)


def restore_session_confs(spark: SparkSession) -> None:
    """Undo every session-conf pin load_table applied to ``spark``
    (restores the pre-pin values, unsetting keys that had none). Call
    this if the session is shared with non-engine work that relies on
    a different timezone or parquet nanos handling."""
    for key, prev in _SAVED_CONFS.pop(id(spark), {}).items():
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def convert_events_ts(raw: DataFrame) -> DataFrame:
    """Convert events.ts from raw nanos (read via nanosAsLong) to
    TimestampType: integer `div 1000` matches DuckDB's ns→µs
    truncation bit-for-bit. Shared by the batch loader and the
    streaming source so the two paths cannot drift."""
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, verify: bool = True
) -> DataFrame:
    """Read one fixture table with its declared schema.

    Passing the schema (rather than relying on footer inference) keeps
    the analyzed plan stable across data revisions and lets Catalyst
    prune/push down against known column types. The footer is checked
    against the declared schema once per (path, table) per process.

    PUBLIC SIDE EFFECT: this call pins two confs on the caller's
    session — ``spark.sql.session.timeZone=UTC`` (event-time semantics
    must agree with the ANSI/DuckDB oracle regardless of host TZ) and,
    for ``events``, ``spark.sql.legacy.parquet.nanosAsLong=true`` (the
    fixture stores TIMESTAMP(NANOS)). The pins persist because Spark
    reads confs at *execution* time — restoring them on return would
    silently break the very DataFrames this function handed out. Prior
    values are saved; call :func:`restore_session_confs` to undo.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _pin_conf(spark, "spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk; see _events_raw above.
        _pin_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
        if verify and path not in _VERIFIED:
            _assert_schema(spark, path, "_events_raw")
            _VERIFIED.add(path)
        raw = spark.read.schema(SCHEMAS["_events_raw"]).parquet(path)
        return convert_events_ts(raw)
    if verify and path not in _VERIFIED:
        _assert_schema(spark, path, name)
        _VERIFIED.add(path)
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
