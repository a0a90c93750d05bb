"""Event-time operators: sessionization, funnels (schema-agnostic)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def session_ids(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    *,
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-EVENT session assignment (the lag-gap-cumsum core): the
    input frame plus a ``sess_id`` column, numbered 1..k per key. Gap
    compares exact epoch microseconds so the boundary rule is
    engine-portable (no float seconds). Split out of :func:`sessionize`
    so path/sequence consumers that need event-level session labels
    share the one boundary-rule definition instead of re-deriving it.
    The internal boundary flag uses a collision-safe name and is
    dropped before returning — the output is exactly the input plus
    ``sess_id`` (an input frame already carrying a session-boundary
    column must not be silently clobbered)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    wrun = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros(ts_col)
    prev_us = F.lag(F.unix_micros(ts_col)).over(w)
    return (
        df.withColumn(
            "__sess_new",
            F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0),
        )
        .withColumn("sess_id", F.sum("__sess_new").over(wrun).cast("bigint"))
        .drop("__sess_new")
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    *,
    gap_minutes: int = 30,
    agg_cols: dict | None = None,
) -> DataFrame:
    """Gap-based sessions via lag-gap-cumsum: two window passes over one
    key shuffle + a keyed agg (the per-event core is
    :func:`session_ids`)."""
    numbered = session_ids(
        df, key_col, ts_col, order_col, gap_minutes=gap_minutes
    )
    aggs = [
        F.min(ts_col).alias("sess_start"),
        F.max(ts_col).alias("sess_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for alias, expr in (agg_cols or {}).items():
        aggs.append(expr.alias(alias))
    return numbered.groupBy(key_col, "sess_id").agg(*aggs)


def funnel_steps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Strictly-ordered N-step funnel per key: stage k's anchor is the
    key's earliest ``steps[k]`` event STRICTLY AFTER its stage-(k-1)
    anchor. Returns (key, first_<step> per step, stage) where stage =
    furthest step reached among keys that completed step 1. Output
    column names derive from the step values — genuinely
    schema-agnostic (an earlier 2-step form hardcoded
    first_view/first_purchase whatever the steps were). Every stage is
    a keyed min-aggregate joined on the key, so ONE hash exchange
    partitioning serves the whole chain (AQE reuses it) and stage
    results are key-count-sized. This single fold serves both the
    2-step and 3-step registered queries — the strictly-after rule
    lives in exactly one place."""
    import re

    if len(steps) < 2:
        raise ValueError(f"a funnel needs at least 2 steps, got {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    # Output columns are named first_<step> and later RESOLVED with
    # F.col(), whose only specials are '.' (parses as struct access)
    # and '`' (quoting) — reject exactly those two, failing here with
    # the offending value named instead of an AnalysisException far
    # from the misuse. Anything else (hyphens, '+', unicode) resolves
    # literally and keeps working as it always did.
    bad = [s for s in steps if not s or re.search(r"[.`]", s)]
    if bad:
        raise ValueError(
            f"funnel step values must be non-empty and free of '.' and '`' "
            f"because they become output column names; got {bad}"
        )
    cols = [f"first_{s}" for s in steps]
    # an input frame already carrying a first_<step> column would make
    # the stage join emit duplicate names and the strictly-after
    # filter die with AMBIGUOUS_REFERENCE far from the misuse — fail
    # here with the collision named (same rationale as the '.'/'`'
    # validation above)
    clash = [c for c in cols if c in df.columns]
    if clash:
        raise ValueError(
            f"input frame already has column(s) {clash}, which collide "
            "with the funnel's first_<step> output columns; rename or "
            "drop them first"
        )
    prev = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias(cols[0]))
    )
    stages = [prev]
    for step, col, prev_col in zip(steps[1:], cols[1:], cols):
        prev = (
            df.filter(F.col(type_col) == step)
            .join(prev, key_col)
            .filter(F.col(ts_col) > F.col(prev_col))
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(col))
        )
        stages.append(prev)
    out = stages[0]
    for st in stages[1:]:
        out = out.join(st, key_col, "left")
    stage_expr = F.lit(1)
    for col in cols[1:]:
        stage_expr = stage_expr + F.col(col).isNotNull().cast("int")
    return out.select(key_col, *cols, stage_expr.cast("bigint").alias("stage"))


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    first_step: str,
    second_step: str,
) -> DataFrame:
    """Two-step funnel as a thin view over :func:`funnel_steps`, with
    the classic (first_<a>, first_<b>, converted 0/1) output shape."""
    out = funnel_steps(df, key_col, ts_col, type_col, [first_step, second_step])
    return out.select(
        key_col,
        f"first_{first_step}",
        f"first_{second_step}",
        (F.col("stage") == 2).cast("int").alias("converted"),
    )
