"""Connected-components equivalence: the large-star/small-star variant
must produce exactly the same (doc_id, cluster_id) assignment as the
label-propagation oracle of record — on the real near-dup graph and on
adversarial synthetic shapes (deep paths, where propagation needs
O(diameter) rounds and the star variant is the scale answer).
"""

from __future__ import annotations

from pydra_map_reduce_spark.operators import dedup as ops
from pydra_map_reduce_spark.sources.tables import load_table

from .conftest import SF_DIR


def _labels(df):
    return sorted(tuple(r) for r in df.collect())


def test_star_equals_propagation_on_fixture(spark):
    pairs = ops.minhash_lsh_pairs(
        load_table(spark, SF_DIR, "documents"), "doc_id", "text", threshold=0.8
    ).select("doc_a", "doc_b")
    assert _labels(ops.dedup_clusters_star(pairs)) == _labels(ops.dedup_clusters(pairs))


def test_star_on_deep_path_graph(spark):
    """Path 0-1-2-...-40 (diameter 40): one component rooted at 0.
    Label propagation needs ~40 rounds here; the star variant must
    finish within its default max_iter and still agree."""
    edges = [(i, i + 1) for i in range(40)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = _labels(ops.dedup_clusters_star(pairs))
    assert got == [(i, 0) for i in range(41)]


def test_star_on_mixed_components(spark):
    """Two components (a star and a triangle) + reversed/duplicate
    edges: output is one root per component, every node labeled."""
    edges = [(5, 1), (1, 5), (5, 9), (9, 13), (20, 21), (21, 22), (22, 20), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = _labels(ops.dedup_clusters_star(pairs))
    assert got == [(1, 1), (5, 1), (9, 1), (13, 1), (20, 20), (21, 20), (22, 20)]


def test_pagerank_invariants(spark):
    """PageRank sanity on a hand-computable graph AND the fixture
    binding: ranks sum to N (the standard invariant, preserved by
    dangling redistribution), everything positive, and a 4-node
    asymmetric graph ranks the in-degree hub first."""
    from pydra_map_reduce_spark.operators import graph as g
    from pydra_map_reduce_spark.plans import REGISTRY

    # 4-node graph: everyone links to 'hub'; hub links back to 'a'.
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    # n_iter=40: this graph is a near-2-cycle (a <-> hub) whose rank
    # oscillation decays as damping^2 per round; at the default 10
    # rounds the parity of the last round still decides a-vs-hub.
    ranks = {r["node"]: r["rank"] for r in g.pagerank(edges, n_iter=40).collect()}
    assert abs(sum(ranks.values()) - 4.0) < 1e-6, ranks
    assert all(v > 0 for v in ranks.values()), ranks
    # fixpoint: hub = 0.15+0.85*(a+0.3), a = 0.15+0.85*hub -> hub 1.92, a 1.78
    assert max(ranks, key=ranks.get) == "hub", ranks
    # 'a' receives the hub's whole rank, so it must outrank b/c;
    # b and c are symmetric but may differ by a ulp depending on
    # partitioning/summation order, so compare with a tolerance
    assert ranks["a"] > ranks["b"], ranks
    assert abs(ranks["b"] - ranks["c"]) < 1e-9, ranks

    top = REGISTRY["pagerank"].fn(spark, SF_DIR).collect()
    assert len(top) == 10
    assert all(r["rank"] > 0 for r in top)
    # deterministic ordering: desc rank, then node asc
    vals = [(-r["rank"], r["node"]) for r in top]
    assert vals == sorted(vals), vals
