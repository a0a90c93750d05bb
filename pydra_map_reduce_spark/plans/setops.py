"""Set operations. SURVEY.md §2.7."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "union_all",
    oracle="""
    SELECT c_custkey AS id, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
    UNION ALL
    SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier WHERE s_acctbal > 9000
    """,
    section="2.7 union (multi-input concat)",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName — no shuffle at all; partitions concatenate."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("id"), F.lit("customer").alias("kind"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_suppkey").alias("id"), F.lit("supplier").alias("kind"))
    )
    return c.unionByName(s)


@query(
    "intersect_rows",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section="2.7 intersect",
)
def intersect_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "except_rows",
    oracle="""
    SELECT o_orderkey AS k FROM orders
    EXCEPT
    SELECT l_orderkey AS k FROM lineitem
    """,
    section="2.7 except",
)
def except_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with no lineitems (~257 at sf0.01) — non-empty EXCEPT."""
    c = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    s = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    # subtract == SQL EXCEPT (distinct semantics); exceptAll would keep
    # left-side multiplicity overhangs that EXCEPT must drop.
    return c.subtract(s)


@query(
    "intersect_all_rows",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section="2.7 intersect all (multiset semantics)",
)
def intersect_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT: each value survives min(left, right) times."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "except_all_rows",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    section="2.7 except all (multiset semantics)",
)
def except_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT: left multiplicity minus right multiplicity."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@query(
    "union_missing_columns",
    oracle="""
    SELECT c_custkey AS id, c_acctbal AS bal, c_mktsegment AS segment
    FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT s_suppkey AS id, s_acctbal AS bal, NULL AS segment
    FROM supplier WHERE s_acctbal > 9000
    """,
    section="2.7 union with schema evolution (allowMissingColumns)",
)
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): the suppliers side lacks
    `segment`, which NULL-fills — the schema-evolution union used when
    concatenating corpus shards with drifting schemas."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_suppkey").alias("id"), F.col("s_acctbal").alias("bal"))
    )
    return c.unionByName(s, allowMissingColumns=True)
