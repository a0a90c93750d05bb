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


# ---------------------------------------------------------------------------
# link_prediction_capped completeness (r13 verdict next #2): the capped
# candidate generator's top-20 is graded against the EXACT uncapped
# jaccard ranking on two graph shapes — the hub-structured shape the
# cap is designed for (high recall required) and this fixture's
# no-hub-split uniform shape (documented divergence, pinned so a
# semantics change moves a number instead of hiding).

_LP_EXACT_TOP20_SQL = """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), nbr AS (
        SELECT u AS node, v AS nb FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (SELECT node, count(*) AS d FROM nbr GROUP BY node),
    wedge AS (
        SELECT a.node AS x, b.node AS y, count(*) AS common
        FROM nbr a JOIN nbr b ON a.nb = b.nb AND a.node < b.node
        GROUP BY a.node, b.node
    )
    SELECT x, y
    FROM wedge c JOIN deg dx ON dx.node = c.x JOIN deg dy ON dy.node = c.y
    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.x AND e.v = c.y)
    ORDER BY c.common * 1.0 / (dx.d + dy.d - c.common) DESC, x, y
    LIMIT 20
"""


def _lp_exact_top20(sf_dir: str) -> set[tuple[int, int]]:
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    return {(r[0], r[1]) for r in con.execute(_LP_EXACT_TOP20_SQL).fetchall()}


def _write_powerlaw_lineitem(dirpath: str) -> None:
    """Deterministic Zipf-popularity co-purchase data shaped as a full
    lineitem table (md5 draws — stable across library versions): 500
    parts with weight 1/p, 4000 baskets of 6 draws each. Degrees span
    5..~500 (a real hub/tail split, unlike the fixture's uniform ~119)."""
    import bisect
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    weights = [1.0 / p for p in range(1, 501)]
    tot = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w
        cum.append(acc / tot)
    orderkeys, partkeys = [], []
    for b in range(1, 4001):
        for d in range(6):
            h = hashlib.md5(f"{b}:{d}".encode()).hexdigest()
            u = int(h[:8], 16) / 2**32
            orderkeys.append(b)
            partkeys.append(bisect.bisect_right(cum, u) + 1)
    n = len(orderkeys)
    tbl = pa.table(
        {
            "l_orderkey": pa.array(orderkeys, pa.int64()),
            "l_partkey": pa.array(partkeys, pa.int64()),
            "l_suppkey": pa.array([0] * n, pa.int64()),
            "l_linenumber": pa.array([1] * n, pa.int32()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([1.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, f"{dirpath}/lineitem.parquet")


def test_link_prediction_capped_completeness(spark, tmp_path):
    from pydra_map_reduce_spark.plans import REGISTRY

    fn = REGISTRY["link_prediction_capped"].fn

    # (a) hub-structured graph — the shape the cap exists for: the
    # capped+rescored top-20 must track the exact uncapped ranking.
    _write_powerlaw_lineitem(str(tmp_path))
    got = {(r["x"], r["y"]) for r in fn(spark, str(tmp_path)).collect()}
    truth = _lp_exact_top20(str(tmp_path))
    overlap = len(got & truth)
    assert overlap >= 16, (
        f"power-law top-20 recall regressed: {overlap}/20 (was 18/20 "
        f"at CAP=16/SUP=2)"
    )

    # (b) the fixture's uniform dense graph (no hub/tail split): the
    # documented structural divergence, PINNED at its measured value —
    # top pairs' witnesses rank ~80-160 in every oriented out-list, so
    # no sub-Σdeg² generator can surface them (docstring). sf0.01 is
    # used explicitly (exact truth is Σdeg² ≈ 2.8e7 wedges — tractable;
    # sf0.1's 3e8 is not).
    fx = "/root/testdata/sf0.01"
    got_fx = {(r["x"], r["y"]) for r in fn(spark, fx).collect()}
    overlap_fx = len(got_fx & _lp_exact_top20(fx))
    assert overlap_fx == 2, (
        f"fixture-graph overlap moved: {overlap_fx}/20 (docstring pins "
        f"the measured 2/20 — update both if semantics changed)"
    )
