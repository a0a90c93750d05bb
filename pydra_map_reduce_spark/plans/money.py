"""Exact fixed-point money queries (DECIMAL family). SURVEY.md §2.4/§2.8.

The fixtures store money as 2dp-intended doubles (verified: every
l_extendedprice/l_discount/l_tax/o_totalprice value at all three SFs is
exactly k/100), so casting to DECIMAL(12,2) at the scan is LOSSLESS in
both engines — Spark goes double → shortest-decimal-repr → setScale(2)
and DuckDB rounds the binary value, and the two only diverge when a
value needs rounding at scale 2, which the 2dp invariant rules out.
From there everything stays in exact decimal arithmetic: sums are
fixed-point integers under the hood (no float accumulation noise, no
.xx5 boundary coin-flips), products carry their exact scale
(2dp × 2dp → 4dp), and comparisons/thresholds are exact. This is the
warehouse money contract the round-6 verdict called out as untested
("no scan-to-agg decimal query").

Cross-engine typing rules pinned here:

- DECIMAL is an INTERNAL type only. Round 7 proved (driver ledger
  r7: rows/schema green, hash red, values bit-identical under manual
  re-run) that DECIMAL-typed TERMINAL columns are canonicalized
  differently by the two engines' client layers (a decimal→float64
  conversion on exactly one side of the driver's value hash). So every
  query here keeps its fixed-point arithmetic — that is the point of
  the family — but surfaces results as BIGINT minor units (integer
  cents / 1e-4 / 1e-6 units): bit-exact AND representation-unambiguous
  in every client stack. Ratios that leave fixed point (division)
  drop to DOUBLE with the repo's portable half-up rounding.
- Engines widen decimal sums differently (Spark sum(decimal(12,2)) →
  decimal(22,2); DuckDB → decimal(38,2)) and multiplication past
  precision 38 triggers engine-specific precision-loss rules — so each
  sum is cast down to a known-fits precision BEFORE the minor-unit
  scale-up multiply, keeping every step ≤ precision 38 and therefore
  exact in both engines.
- BIGINT headroom: the largest surfaced value is sum_charge in 1e-6
  units, ~6e15 at sf1 per group — int64 holds to ~sf1000 per group key.
  Past that, keep the DECIMAL internal sum and surface a STRING (see
  table_checksum for that pattern); the driver gate runs at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import round_half_up
from ..sources.tables import load_table
from .registry import query


def _dec(col: str) -> Column:
    return F.col(col).cast("decimal(12,2)")


def _minor_units(summed: Column, prec: int, scale: int) -> Column:
    """Exact decimal sum → BIGINT minor units (value × 10^scale).

    Casts the engine-widened sum down to a known-fits DECIMAL(prec,
    scale) first so the scale-up multiply stays under precision 38
    (where Spark's allowPrecisionLoss and DuckDB's widening diverge),
    then multiplies by 10^scale — integral by construction — and casts
    to BIGINT. Every step is exact; no rounding anywhere."""
    return (summed.cast(f"decimal({prec},{scale})") * (10 ** scale)).cast("bigint")


@query(
    "pricing_summary_decimal",
    oracle="""
    WITH li AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity      AS DECIMAL(12,2)) AS qty,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
               CAST(l_discount      AS DECIMAL(12,2)) AS disc,
               CAST(l_tax           AS DECIMAL(12,2)) AS tax
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(qty)   AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS sum_qty_cents,
           CAST(CAST(sum(price) AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS sum_base_price_cents,
           CAST(CAST(sum(CAST(price * (1 - disc) AS DECIMAL(18,4)))
                     AS DECIMAL(20,4)) * 10000 AS BIGINT)
               AS sum_disc_price_e4,
           CAST(CAST(sum(CAST(CAST(price * (1 - disc) AS DECIMAL(18,4))
                              * (1 + tax) AS DECIMAL(22,6)))
                     AS DECIMAL(24,6)) * 1000000 AS BIGINT)
               AS sum_charge_e6,
           count(*) AS count_order
    FROM li
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    section="2.4 exact fixed-point pricing summary (DECIMAL Q1)",
)
def pricing_summary_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 in exact money arithmetic: every sum is a fixed-point
    integer accumulation — bit-exact under any partitioning, any
    engine, any row order (the double Q1 needs terminal rounding to
    mask float non-associativity; this one needs none). Products keep
    their exact scale (2dp×2dp → 4dp, ×2dp → 6dp) with intermediate
    down-casts that never round, only bound precision below Spark's
    38-digit cap where engine-specific precision-loss rules would
    kick in. Terminal columns are BIGINT minor units (cents / 1e-4 /
    1e-6), not DECIMAL — see the module docstring for the r7 driver
    hash lesson. Plan shape is identical to the double flagship: one
    pushed-down scan, partial+final HashAggregate; DecimalType sums
    use Spark's long-backed unscaled representation until precision
    > 18, so the map-side combine stays cheap."""
    li = load_table(spark, sf_dir, "lineitem")
    qty, price, disc, tax = (
        _dec("l_quantity"), _dec("l_extendedprice"), _dec("l_discount"), _dec("l_tax")
    )
    disc_price = (price * (1 - disc)).cast("decimal(18,4)")
    charge = (disc_price * (1 + tax)).cast("decimal(22,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _minor_units(F.sum(qty), 18, 2).alias("sum_qty_cents"),
            _minor_units(F.sum(price), 18, 2).alias("sum_base_price_cents"),
            _minor_units(F.sum(disc_price), 20, 4).alias("sum_disc_price_e4"),
            _minor_units(F.sum(charge), 24, 6).alias("sum_charge_e6"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "decimal_threshold_cut",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                         AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS lifetime_value_cents,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
    ) WHERE lifetime_value_cents >= 30000000
    """,
    section="2.4 exact decimal threshold cut (no float boundary flips)",
)
def decimal_threshold_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime value with an EXACT cutoff: the sum is a
    fixed-point decimal accumulation surfaced as integer cents, and
    the 300000.00 threshold becomes the integer comparison
    `cents >= 30000000` — a customer landing exactly ON the boundary
    classifies identically in both engines by construction (the float
    formulation of this query is where cross-engine ulp noise flips
    membership — the class of bug the round-5 .xx5 hunts chased).
    One scan, one keyed shuffle; the threshold can't push below the
    agg by definition but everything else does."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            _minor_units(F.sum(_dec("o_totalprice")), 18, 2).alias(
                "lifetime_value_cents"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("lifetime_value_cents") >= 30000000)
    )


@query(
    "nation_revenue_decimal",
    oracle="""
    WITH r AS (
        SELECT c.c_nationkey,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2)))
                    AS DECIMAL(18,2)) AS revenue
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey
    )
    SELECT c_nationkey,
           CAST(revenue * 100 AS BIGINT) AS revenue_cents,
           floor(100.0 * CAST(revenue AS DOUBLE)
                 / CAST(sum(revenue) OVER () AS DOUBLE) * 10000 + 0.5) / 10000
               AS share_pct
    FROM r
    """,
    section="2.4 exact decimal rollup + double ratio at the boundary",
)
def nation_revenue_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where fixed point ends: per-nation revenue stays exact decimal
    internally (sums commute bit-for-bit) and surfaces as BIGINT
    cents, but share-of-total is a DIVISION — quotient scale rules
    differ across engines, so the ratio drops to double over the two
    exact operands and rounds with the portable half-up form. The
    unpartitioned window is safe for the same reason as
    revenue_share: it runs over the 25-row nation aggregate, never
    base rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql.window import Window

    r = (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(_dec("o_totalprice")).cast("decimal(18,2)").alias("revenue"))
    )
    total = F.sum("revenue").over(Window.partitionBy())
    return r.select(
        "c_nationkey",
        (F.col("revenue") * 100).cast("bigint").alias("revenue_cents"),
        round_half_up(
            100.0 * F.col("revenue").cast("double") / total.cast("double"), 4
        ).alias("share_pct"),
    )


@query(
    "decimal_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DECIMAL(18,2)) * 100 AS BIGINT) AS running_total_cents
    FROM orders
    WHERE o_custkey % 10 = 0
    """,
    section="2.4/2.5 exact decimal running total (fixed-point window frame)",
)
def decimal_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed point meets window frames: each customer's cumulative
    order value as an exact DECIMAL running sum — the ledger shape
    where float windows drift (a double running sum accumulates ulp
    error that GROWS with frame length and differs across engines;
    the decimal frame is an integer accumulation, bit-exact at any
    length, any partitioning). Deterministic frame order is
    (o_orderdate, o_orderkey); the terminal BIGINT-cents cast pins
    cross-engine representation exactly as in the rest of the money
    family. Scale shape: one keyed shuffle on o_custkey, per-customer
    frames windowed independently — embarrassingly parallel across
    customers; the %10 filter is fixture volume control and pushes
    to the scan."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            _minor_units(F.sum(_dec("o_totalprice")).over(w), 18, 2).alias(
                "running_total_cents"
            ),
        )
    )
