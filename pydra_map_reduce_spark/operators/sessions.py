"""Event-time operators: sessionization, funnels (schema-agnostic)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    key shuffle + a keyed agg. Gap compares exact epoch microseconds so
    the boundary rule is engine-portable (no float seconds)."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    wrun = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros(ts_col)
    prev_us = F.lag(F.unix_micros(ts_col)).over(w)
    numbered = df.withColumn(
        "new_sess", F.when(prev_us.isNull() | ((us - prev_us) > gap_us), 1).otherwise(0)
    ).withColumn("sess_id", F.sum("new_sess").over(wrun).cast("bigint"))
    aggs = [
        F.min(ts_col).alias("sess_start"),
        F.max(ts_col).alias("sess_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for alias, expr in (agg_cols or {}).items():
        aggs.append(expr.alias(alias))
    return numbered.groupBy(key_col, "sess_id").agg(*aggs)


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    first_step: str,
    second_step: str,
) -> DataFrame:
    """Strictly-ordered two-step funnel per key. All shuffles are on
    the key, so AQE shares a single exchange at scale."""
    first = (
        df.filter(F.col(type_col) == first_step)
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("first_view"))
    )
    second = (
        df.filter(F.col(type_col) == second_step)
        .join(first, key_col)
        .filter(F.col(ts_col) > F.col("first_view"))
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("first_purchase"))
    )
    return first.join(second, key_col, "left").select(
        key_col,
        "first_view",
        "first_purchase",
        F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0).alias("converted"),
    )
