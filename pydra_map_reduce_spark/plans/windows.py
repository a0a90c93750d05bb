"""Window functions. SURVEY.md §2.5.

Each window is one shuffle on its partition key then a per-partition
sort — identical physical shape to MR secondary sort.

Scale honesty per key family: the CUSTOMER/USER-keyed windows
(o_custkey, user_id — pergroup_topk, window_running_sum, lag/lead)
have bounded per-key cardinality at any corpus size, so no skew path
is needed. The NATION- and EVENT-TYPE-keyed windows (window_ranking,
window_distribution, window_time_range_avg) partition over a SMALL
FIXED key set whose per-key row counts grow linearly with the corpus
— at 100 TB each such partition is a one-executor sort. They are
correctness demonstrators of the window-function surface; their scale
path is the standard composite-key / two-level decomposition (rank
within (nation, salt-bucket) then merge, or pre-aggregate to a
bounded grid first, as percentile_binned and auc_score do), plus AQE
skew handling. The demonstrator/scale-path pairing is the same
contract as allpairs_similarity vs lsh_allpairs_cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.textops import cents, cents_sql
from ..sources.tables import load_table
from .registry import query


@query(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    section="2.5 ranking: row_number/rank/dense_rank/ntile",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    # bigint casts: DuckDB window ranks are BIGINT, Spark's are INT —
    # aligned so the driver's schema/value comparison sees one type
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2)                              AS total,
           round(lag(o_totalprice)  OVER w, 2)                 AS prev_total,
           round(lead(o_totalprice) OVER w, 2)                 AS next_total,
           round(first_value(o_totalprice) OVER w, 2)          AS first_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    section="2.5 analytic: lag / lead / first / last",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_total"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_total"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_total"),
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(sum({cents_sql("o_totalprice")}) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
               AS running_spend
    FROM orders
    """,
    section="2.5 frame agg: running sum",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        # exact BIGINT cents through the frame, one division at the
        # edge: identical frame order still leaves round(sum(double))
        # exposed to the Spark-BigDecimal vs DuckDB-binary split when
        # a running total's shortest repr lands on .xx5
        (F.sum(cents("o_totalprice")).over(w) / 100.0).alias("running_spend"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
    FROM events
    """,
    section="2.5 frame agg: moving window",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("mov_avg3"),
    )


@query(
    "pergroup_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    section="2.5 per-group top-k (MR secondary sort)",
)
def pergroup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. rank-filter pattern: one shuffle on
    the group key; Spark pushes the rn<=3 limit into the sort via
    WindowGroupLimit, so only k rows per key survive the exchange."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@query(
    "window_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(last_value(o_totalprice) OVER w, 2)     AS last_total,
           round(nth_value(o_totalprice, 2) OVER w, 2)   AS second_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    section="2.5 analytic: last / nth_value (full-partition frame)",
)
def window_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last/nth need an explicit unbounded-following frame — the
    default frame stops at CURRENT ROW and silently returns the
    running last, a classic correctness trap."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.last("o_totalprice").over(w), 2).alias("last_total"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_total"),
    )


@query(
    "window_range_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near,
           CAST(sum({cents_sql("o_totalprice")}) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
               AS near_total
    FROM orders
    """,
    section="2.5 frame agg: RANGE (value-based) frame",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames bound by VALUE distance, not row count — rows with
    o_orderkey within 1000 of the current row's key. Distinct physical
    path from ROWS frames (no fixed-size buffer)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-1000, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_near"),
        (F.sum(cents("o_totalprice")).over(w) / 100.0).alias("near_total"),
    )


@query(
    "window_distribution",
    # floor-bump rounding: cume_dist = k/partition_size terminates at a
    # .xxx5 boundary whenever the partition size is 2^a·5^b (it is at
    # sf0.1: 3200 rows/nation), where Spark round() and DuckDB round()
    # disagree — see operators/textops.round_half_up
    oracle="""
    SELECT c_custkey,
           floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pct_rank,
           floor(cume_dist()    OVER w * 1000000 + 0.5) / 1000000 AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    section="2.5 distribution: percent_rank / cume_dist",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.textops import round_half_up

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        round_half_up(F.percent_rank().over(w), 6).alias("pct_rank"),
        round_half_up(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "window_time_range_avg",
    oracle=f"""
    WITH c AS (
        SELECT event_id, event_type, ts,
               {cents_sql("value")} AS cents
        FROM events
    )
    SELECT event_id, event_type,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           floor(CAST(sum(cents) OVER w AS DOUBLE) * 100.0
                 / CAST(count(*) OVER w AS DOUBLE) + 0.5) / 10000 AS avg_last_hour
    FROM c
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    section="2.5 frame agg: time-interval RANGE frame (trailing 1h per row)",
)
def window_time_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour rolling stats per row — the time-series frame
    (RANGE over an interval, not a row count): each event sees the
    count/avg of its type's events in the 60 minutes up to and
    including itself. Spark's rangeBetween needs a numeric ordering
    key, so ts becomes epoch MICROSECONDS (the exact unit — no
    truncation) and the frame is ±3.6e9 µs; the oracle mirrors with
    epoch_us and the same literal bound, making frame membership
    integer-exact in both engines. One shuffle on event_type — same
    partitioning every per-type op reuses.

    The average is computed INTEGER-EXACTLY: 2dp values become cent
    bigints, the window sums cents (exact), and the 4dp-rounded
    average is floor(cents·100/n + 0.5)/1e4 — one IEEE division of
    exact integers, bit-identical in any engine. Floating window
    sums are NOT usable here: every row is a frame result, frame
    counts hit powers of two constantly, and engine-specific
    accumulation order (sliding vs segment-tree) flipped 514 rows at
    sf0.1 around exact .xxxx5 midpoints before this form."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    n = F.count(F.lit(1)).over(w)
    csum = F.sum(cents("value")).over(w)
    return e.select(
        "event_id",
        "event_type",
        n.cast("bigint").alias("n_last_hour"),
        (
            F.floor(csum.cast("double") * 100.0 / n.cast("double") + 0.5) / 10000
        ).alias("avg_last_hour"),
    )
