"""Iterative graph analytics. SURVEY.md §2.11 (map-reduce flagship family).

PageRank is THE canonical iterative map-reduce algorithm (the original
MapReduce/Pregel showcase); connected components (the other member of
the family) lives with the dedup operators. Iterative fixpoint loops
are the one shape Catalyst can't express declaratively, so these are
driver-side loops over keyed joins/aggs — each round's plan is fully
distributed, and the per-round driver sync is bounded (a fixed
iteration count here; a 1-row convergence check in dedup_clusters).

Rows-only check: a 10-round damped-PageRank fixpoint is not
expressible in DuckDB's recursive CTEs (aggregation inside the
recursive term); the local suite anchors the rank-sum invariant and
ordering determinism instead (tests/test_clusters.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph as graph_ops
from ..sources.tables import load_table
from .registry import query


def _supplier_part_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed bipartite graph from lineitem: supplier→part plus the
    reverse edge (strongly connected, so no rank sink at either side).
    Node ids are namespaced strings ('s'||k, 'p'||k) — supplier and
    part key spaces overlap."""
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).distinct()
    return sp.unionByName(sp.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


@query(
    "pagerank",
    oracle=None,  # iterative damped fixpoint: not ANSI-SQL-expressible
    section="2.11 PageRank (iterative map-reduce flagship)",
)
def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 suppliers/parts by PageRank over the supplier↔part
    graph, 10 fixed rounds, damping 0.85. See operators/graph.py for
    the per-round shuffle accounting."""
    ranks = graph_ops.pagerank(_supplier_part_edges(spark, sf_dir))
    return (
        ranks.orderBy(F.col("rank").desc(), "node")
        .limit(10)
        .select("node", F.round("rank", 6).alias("rank"))
    )
