"""TPC-H remainder: the query shapes not covered by analytics.py.

analytics.py carries Q1/Q3/Q5/Q6/Q10/Q14/Q18; this module completes
the suite with the remaining shapes (Q2, Q4, Q7, Q8, Q9, Q11, Q12,
Q13, Q15, Q16, Q17, Q19, Q20, Q21, Q22), each adapted to the fixture
schema (SURVEY.md §1: no partsupp table, no commit/receipt dates, no
ship modes, no phone numbers) while preserving the *optimizer shape*
that makes the original interesting: EXISTS/NOT-EXISTS correlation,
correlated scalar aggregates, disjunctive bracket predicates,
double-grouped outer joins, scalar-threshold HAVING, and
argmin-by-join-back. That shape — not the literal predicate — is
what has to survive a 100 TB scale-up, and each docstring says why
the chosen plan does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import e4_revenue_2dp, e4_revenue_2dp_sql, money_sum, round_half_up
from ..sources.tables import load_table
from .registry import query


@query(
    "min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    asia AS (
        SELECT s.s_suppkey, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
    ),
    best AS (
        SELECT ps.l_partkey, min(a.s_acctbal) AS min_bal
        FROM ps JOIN asia a ON a.s_suppkey = ps.l_suppkey
        GROUP BY ps.l_partkey
    )
    SELECT p.p_partkey, a.s_suppkey, round(a.s_acctbal, 2) AS s_acctbal,
           a.n_name AS nation
    FROM part p
    JOIN ps   ON ps.l_partkey = p.p_partkey
    JOIN asia a ON a.s_suppkey = ps.l_suppkey
    JOIN best b ON b.l_partkey = ps.l_partkey AND a.s_acctbal = b.min_bal
    WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
    """,
    section="2.3/2.4 TPC-H Q2 shape: per-part argmin supplier via join-back",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (correlated min). The fixture has no partsupp, so the
    part↔supplier relation is the DISTINCT (l_partkey, l_suppkey)
    projection of lineitem — a keyed dedup, one shuffle. The
    correlated `s_acctbal = (SELECT min ...)` is expressed as a keyed
    min + join-back (what Catalyst decorrelates the subquery into
    anyway), so nothing re-executes per row and both the min and the
    equality comparison are on untouched doubles — exact in both
    engines. Supplier/nation/region are dims → broadcast."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "n_name")
    )
    pairs = ps.join(F.broadcast(asia), ps.l_suppkey == asia.s_suppkey)
    best = pairs.groupBy("l_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        pairs.join(best, "l_partkey")
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(p, pairs.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "s_suppkey",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.col("n_name").alias("nation"),
        )
    )


@query(
    "order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    section="2.3/2.4 TPC-H Q4 shape: EXISTS semi-join + priority count",
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape. The fixture has no commit/receipt dates, so 'late'
    is l_shipdate > o_orderdate + 60 days. The EXISTS becomes a
    left-semi hash join on l_orderkey with the date comparison as a
    residual condition — one keyed shuffle, no row blow-up from
    multi-line orders (semi stops at first match)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS yr,
           {e4_revenue_2dp_sql("l.l_extendedprice", "l.l_discount")} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    """,
    section="2.3/2.4 TPC-H Q7 shape: bilateral nation trade flow by year",
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: revenue flowing between two nations in either
    direction, per ship year. The nation dimension joins twice under
    different roles (supplier side / customer side) — both broadcast —
    and the bilateral OR filter sits above them where Catalyst can
    still prune to the two nations via the dim filters it infers.
    Fact-side shuffles: lineitem↔orders↔customer on their keys only."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    ns = nat.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    nc = nat.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        # exact 1e-4-unit revenue sum (product_type_profit convention):
        # the rounded-float form is midpoint-fragile across engines
        .agg(
            e4_revenue_2dp(
                F.col("l_extendedprice"), F.col("l_discount")
            ).alias("revenue")
        )
    )


@query(
    "market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
           floor(sum(CASE WHEN ns.n_name = 'NATION_3'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount))
                 * 10000 + 0.5) / 10000 AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY year(o.o_orderdate)
    """,
    section="2.4 TPC-H Q8 shape: national market share (conditional ratio)",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_3's share of revenue delivered into ASIA-region
    customers, per order year. Same conditional-sum-over-total-sum
    trick as Q14 — one pass, no self-join — with the nation dimension
    again in two roles (customer region filter vs supplier origin
    flag). The ratio is an ordered-sum of doubles divided by another,
    so it uses the portable half-up rounding form at 4dp."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    nc = nat.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = nat.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    flagged = F.when(F.col("supp_nation") == "NATION_3", net).otherwise(0.0)
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(round_half_up(F.sum(flagged) / F.sum(net), 4).alias("mkt_share"))
    )


@query(
    "product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS yr,
           floor(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                                 - 0.6 * l.l_quantity * p.p_retailprice / 10.0)
                                * 10000) AS BIGINT)) / 10000.0 * 100 + 0.5)
           / 100 AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    section="2.4 TPC-H Q9 shape: product-type profit by supplier nation/year",
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape. The fixture has no ps_supplycost, so unit cost is
    modeled as 60% of p_retailprice/10 (retailprice plays partsupp's
    cost role) — the *shape* is intact: a 5-way join where the part
    filter ('%red%' name) prunes the probe side early, dims broadcast,
    and profit aggregates by (nation, year). At 100 TB the only big
    shuffles are lineitem↔orders; everything else rides broadcasts.

    Per-row profit is an exact 4dp decimal (2dp prices × 2dp discount
    factors, ×0.6/10 integer quantities), so it is summed as
    fixed-point 10^-4 BIGINT units: a float sum of ~10^5 terms at
    ~10^7 magnitude carries ~0.25 absolute order-dependent error —
    enough to flip the cent — while the integer sum is bit-identical
    in any engine and summation order (this repo's integer-exact-sum
    convention, cf. trend_regression)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "l_quantity"
    ) * F.col("p_retailprice") / 10.0
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(
            round_half_up(
                F.sum(F.round(profit * 10000).cast("bigint")) / 10000.0, 2
            ).alias("profit")
        )
    )


@query(
    "important_balance",
    oracle="""
    WITH nb AS (
        SELECT s_nationkey,
               sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS bal_c
        FROM supplier GROUP BY s_nationkey
    )
    SELECT s_nationkey, CAST(bal_c AS DOUBLE) / 100 AS bal
    FROM nb
    WHERE bal_c * 25 > (SELECT sum(CAST(round(s_acctbal * 100) AS BIGINT))
                        FROM supplier)
    """,
    section="2.4 TPC-H Q11 shape: group HAVING scalar-fraction threshold",
)
def important_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (no partsupp → supplier balances play the stock-value
    role): per-nation supplier balance kept only where it exceeds 4%
    of the global total. The scalar subquery is a one-row aggregate
    broadcast against the grouped table — the HAVING-over-global-
    fraction pattern — so the plan is two aggs + a broadcast cross
    join, nothing correlated, nothing re-executed. The 4% cut is
    EXACT INTEGER arithmetic: balances sum as BIGINT cents and
    0.04 = 1/25 exactly, so `bal > 0.04·total` becomes
    `25·bal_cents > total_cents` — no float accumulation, no rounding
    on either side of the comparison, identical in any engine under
    any partitioning (the earlier round-both-sides-at-2dp form still
    leaned on the engine-split round())."""
    sup = load_table(spark, sf_dir, "supplier")
    cents = F.round(F.col("s_acctbal") * 100).cast("bigint")
    nb = sup.groupBy("s_nationkey").agg(F.sum(cents).alias("bal_c"))
    thr = sup.agg(F.sum(cents).alias("total_c"))
    return (
        nb.crossJoin(F.broadcast(thr))
        .filter(F.col("bal_c") * 25 > F.col("total_c"))
        .select("s_nationkey", (F.col("bal_c") / 100.0).alias("bal"))
    )


@query(
    "shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
    section="2.4 TPC-H Q12 shape: late-shipment priority class counts",
)
def shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape. No l_shipmode in the fixture → l_linestatus carries
    the grouping role; 'late' is shipped >60 days after order date
    (no commit/receipt dates). The two CASE counts fold into one
    keyed aggregation after a single orders↔lineitem shuffle; the
    year filter pushes to the lineitem scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderstatus <> 'P'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    section="2.3/2.4 TPC-H Q13 shape: order-count distribution (outer + double agg)",
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: the double aggregation over a LEFT join — customers with
    zero (non-pending) orders must appear in the c_count=0 bucket,
    which is exactly what the outer join preserves and an inner join
    would silently drop. First agg is keyed by custkey (big but
    parallel), second collapses to ~tens of buckets."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                             AS BIGINT)) AS BIGINT) AS rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           floor(rev.rev_e4 / 100 + 0.5) / 100 AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.rev_e4 = (SELECT max(rev_e4) FROM rev)
    """,
    section="2.4/2.6 TPC-H Q15 shape: top supplier via scalar-max subquery",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: quarterly revenue per supplier, keep the max. The revenue
    view computes once and feeds both the max (one-row broadcast) and
    the equality filter — matching the SQL view semantics without
    re-scanning lineitem. Revenue accumulates as EXACT 1e-4-unit
    BIGINTs (2dp price × 2dp discount factor = exact 4dp per row —
    the product_type_profit convention): the previous rounded-float
    form was measured to land ~1% of supplier groups EXACTLY on 2dp
    midpoints at sf0.1, where accumulation-order ulps decide the cent
    and can flip the argmax set between engines; the integer max and
    the integer equality cut are boundary-proof by construction, and
    the one division happens at the report edge."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("bigint")
        ).alias("rev_e4")
    )
    s = load_table(spark, sf_dir, "supplier")
    mx = rev.agg(F.max("rev_e4").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_e4") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.floor(F.col("rev_e4") / 100 + 0.5) / 100).alias("total_revenue"),
        )
    )


@query(
    "supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    section="2.4 TPC-H Q16 shape: distinct-supplier variety per part group",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (lineitem's part↔supplier pairs stand in for
    partsupp): how many distinct suppliers ship each surviving
    (brand, type, size) group. The IN-list and <> filters prune the
    broadcast part dim before the join; count(DISTINCT) expands to
    the standard two-phase distinct aggregate — both shuffles keyed
    by the group, no row explosion."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "small_quantity_revenue",
    oracle="""
    SELECT floor(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / 7.0 + 0.5)
               / 100 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    section="2.4 TPC-H Q17 shape: correlated per-part average threshold",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: lines below 20% of their part's average quantity. The
    correlated scalar average decorrelates into a per-part aggregate
    joined back on partkey — computed ONCE, not per row — and that
    aggregate's input is PRUNED first with a broadcast left-semi join
    against the Brand#11 part keys: only those parts' thresholds can
    survive the final inner join, and the semi join keeps every line
    of a qualifying part, so each avg is bit-identical to the
    unpruned form while the partkey shuffle shrinks ~brand-count-fold
    (the unpruned form shuffled ALL of lineitem to build thresholds
    it then discarded — the dominant cost at 100 TB).
    avg(l_quantity) divides two exact-in-binary numbers (the
    quantities are small integers stored as doubles), so the 0.2×avg
    threshold is bit-identical across engines and the < cut is safe
    without rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    brand_keys = p.select(F.col("p_partkey").alias("bk"))
    per_part = (
        li.join(F.broadcast(brand_keys), li.l_partkey == F.col("bk"), "left_semi")
        .groupBy(F.col("l_partkey").alias("pp_key"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr"))
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(per_part, F.col("l_partkey") == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            # exact cents summed in BIGINT; /7.0 of an exact integer is
            # the identical double in both engines, floored half-up once
            (
                F.floor(
                    F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                    / 7.0
                    + 0.5
                )
                / 100
            ).alias("avg_yearly")
        )
    )


@query(
    "bracket_revenue",
    oracle=f"""
    SELECT {e4_revenue_2dp_sql("l.l_extendedprice", "l.l_discount")} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    section="2.2/2.4 TPC-H Q19 shape: disjunctive bracket predicates over a join",
)
def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: three OR'ed brackets mixing columns from both join sides.
    Catalyst extracts the common join key (partkey equi-join survives)
    and pushes the per-side residue of the disjunction down: the part
    side prunes to the three brands before broadcast, lineitem keeps
    the quantity envelope. The naive reading — no pushdown through
    OR — would scan everything; the test pins that the brand filter
    lands on the part scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    # exact 1e-4-unit revenue sum via the shared Q-shape cell
    return joined.filter(bracket).agg(
        e4_revenue_2dp(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "revenue"
        )
    )


@query(
    "dominant_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'red%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
    ),
    tot AS (SELECT l_partkey, sum(qty) AS total_qty FROM sp GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN sp  ON sp.l_suppkey = s.s_suppkey
    JOIN tot ON tot.l_partkey = sp.l_partkey
    WHERE sp.qty > 0.3 * tot.total_qty
    """,
    section="2.3/2.4 TPC-H Q20 shape: suppliers dominating a part's volume",
)
def dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (availqty → shipped quantity): suppliers providing
    >30% of some red part's annual volume. Two stacked keyed aggs —
    (supp, part) then part — feed a share filter and a semi-style
    DISTINCT projection onto supplier. sum(qty) on each part is the
    sum of the SAME per-pair sums in both engines (grouped values,
    not raw rows), and quantities are integers-in-doubles, so the
    0.3× share comparison is exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    sp = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = sp.groupBy(F.col("l_partkey").alias("t_key")).agg(
        F.sum("qty").alias("total_qty")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        sp.join(tot, F.col("l_partkey") == F.col("t_key"))
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@query(
    "waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
    section="2.3 TPC-H Q21 shape: EXISTS + NOT-EXISTS double correlation",
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21: in finished multi-supplier orders, count per supplier the
    lines where THEY were the only late shipper. The two correlated
    subqueries become a left-semi ('some other supplier exists') and
    a left-anti ('no other supplier was late') — both hash joins on
    l_orderkey with the supplier-inequality (and, for the anti, the
    lateness bound referencing the outer order date) as residual
    conditions. No nested-loop anywhere: the equi key bounds both."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey"),
        "l_shipdate",
    )
    with_other = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    only_late = with_other.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey"))
        & (l2.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        only_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "idle_customers",
    oracle="""
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100 AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT floor(avg(c2.c_acctbal) * 100 + 0.5) / 100
                         FROM customer c2
                         WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
    section="2.3/2.4 TPC-H Q22 shape: anti-join + scalar-avg threshold",
)
def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (no phone prefixes → nationkey groups): well-funded
    customers with no recent orders. The scalar average broadcasts as
    a one-row cross join; the NOT EXISTS is a left-anti hash join
    against the date-filtered orders — the filter pushes to the
    orders scan, shrinking the anti build side to recent orders only.
    The threshold is cut at the ROUNDED average (portable half-up,
    2dp, both engines — the repo's rounded-threshold-cut convention):
    a raw float average's summation order differs between engines by
    ulps, and a balance inside that band would flip membership
    (important_balance documents the same hazard)."""
    c = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        round_half_up(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum("c_acctbal").alias("totacctbal"),
        )
    )


@query(
    "waiting_suppliers_agg",
    oracle="""
    WITH joined AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    stats AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
        FROM joined GROUP BY l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM joined j
    JOIN stats t ON t.l_orderkey = j.l_orderkey
    JOIN supplier s ON s.s_suppkey = j.l_suppkey
    WHERE j.late = 1 AND t.n_supp >= 2 AND t.n_late_supp = 1
    GROUP BY s.s_name
    """,
    section="2.3 TPC-H Q21, aggregate formulation (scale path: one lineitem pass)",
)
def waiting_suppliers_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of waiting_suppliers, same output contract.
    The EXISTS/NOT-EXISTS pair re-probes the full lineitem twice
    (three lineitem shuffles at corpus scale); this form folds both
    correlations into ONE per-order aggregate — n_supp ≥ 2 replaces
    the EXISTS, n_late_supp = 1 (with the probe line itself late)
    replaces the NOT EXISTS — so lineitem crosses the wire once for
    the join and once keyed by order for the stats. Same twin
    pattern as lsh_allpairs_cosine vs allpairs_similarity: the
    canonical shape stays registered as the semantics anchor, the
    aggregate form is what you run at 100 TB."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).cast("int").alias("late"),
        )
        .persist()
    )
    stats = joined.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    # the plan stays LAZY: an earlier form eagerly localCheckpoint'd
    # the result so `joined` could be unpersisted before returning,
    # but that ran the whole three-join job at DataFrame-CONSTRUCTION
    # time (every explain/schema inspection paid a cluster job) and
    # checkpoint blocks are non-recoverable on executor loss — the
    # opposite of a 100 TB posture. The persist entry instead stays
    # registered: Spark's CacheManager dedupes it by canonical plan
    # across invocations (one entry per sf_dir, measured), and
    # MEMORY_AND_DISK-style entries are evictable, so the bounded
    # residue is the price of a recoverable, lazily-planned query.
    return (
        joined.filter(F.col("late") == 1)
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "yoy_growth",
    oracle="""
    WITH m AS (
        SELECT c.c_nationkey,
               CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS mon,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, date_trunc('month', o.o_orderdate)
    )
    SELECT m.c_nationkey, m.mon, m.revenue,
           floor(100.0 * (m.revenue - p.revenue) / p.revenue * 100 + 0.5) / 100
               AS yoy_pct
    FROM m
    LEFT JOIN m p ON p.c_nationkey = m.c_nationkey
                 AND m.mon = p.mon + INTERVAL 12 MONTH
    """,
    section="2.5 year-over-year growth (lag-12 window over monthly rollup)",
)
def yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q47-style period-over-period comparison: monthly revenue
    per customer nation against the SAME CALENDAR MONTH a year
    earlier, via an equi-join on (nation, mon − 12 months) over the
    monthly aggregate (nation × month — dimension-bounded, never base
    rows). A row-based lag(12) would silently misalign whenever a
    nation skips a month; the calendar join leaves those rows NULL
    instead, which is the correct contract. The ratio divides the
    already-2dp-rounded revenues (identical doubles in both engines)
    and rounds with the portable half-up form — the quotient is
    arbitrary-precision and can land on a .xx5 boundary where engine
    round() diverges. NOTE on sign: yoy_pct is NEGATIVE for revenue
    declines, and the floor(x·100+0.5)/100 form rounds a negative
    midpoint toward +inf (−0.125 → −0.12), i.e. toward-positive
    rather than strict half-away-from-zero. Both engines apply the
    identical form, so the differential gate is unaffected; callers
    needing sign-symmetric half-up on signed metrics should apply
    sign(x)·round_half_up(abs(x)) instead."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    m = (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy(
            "c_nationkey", F.date_trunc("month", "o_orderdate").alias("mon")
        )
        .agg(money_sum("o_totalprice").alias("revenue"))
    )
    p = m.select(
        F.col("c_nationkey").alias("p_nat"),
        (F.col("mon") + F.expr("INTERVAL 12 MONTHS")).alias("p_mon"),
        F.col("revenue").alias("prev_revenue"),
    )
    return (
        m.join(
            p,
            (m.c_nationkey == p.p_nat) & (m.mon == p.p_mon),
            "left",
        )
        .select(
            "c_nationkey",
            "mon",
            "revenue",
            round_half_up(
                100.0 * (F.col("revenue") - F.col("prev_revenue"))
                / F.col("prev_revenue"),
                2,
            ).alias("yoy_pct"),
        )
    )


@query(
    "revenue_share",
    oracle="""
    WITH r AS (
        SELECT c.c_nationkey,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey
    )
    SELECT c_nationkey, revenue,
           floor(100.0 * revenue / sum(revenue) OVER () * 10000 + 0.5)
           / 10000 AS share_pct,
           rank() OVER (ORDER BY revenue DESC, c_nationkey) AS rnk
    FROM r
    """,
    section="2.5 share-of-total (unpartitioned window sum over the aggregate)",
)
def revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total with an unpartitioned window — the shape is
    safe ONLY because the window runs over the nation-level aggregate
    (25 rows at any corpus scale), never base rows; the same query
    over raw orders would be a one-executor sort. The share divides
    2dp-rounded revenues (identical doubles in both engines) and
    rounds half-up; the rank carries a nationkey tie-break so
    near-tied revenues cannot reorder between engines."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    r = (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey")
        .agg(money_sum("o_totalprice").alias("revenue"))
    )
    return r.select(
        "c_nationkey",
        "revenue",
        round_half_up(
            100.0 * F.col("revenue") / F.sum("revenue").over(Window.partitionBy()), 4
        ).alias("share_pct"),
        F.rank()
        .over(Window.orderBy(F.col("revenue").desc(), "c_nationkey"))
        .cast("bigint")
        .alias("rnk"),
    )
