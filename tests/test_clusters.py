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
