"""Graded vector queries over `embeddings`. SURVEY.md §2.11.

Thin fixture bindings over ``pydra_map_reduce_spark.operators.similarity``;
oracles (DuckDB list_cosine_similarity) live here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as ops
from ..sources.tables import load_table
from .registry import query


@query(
    "cosine_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS cos
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC, e.vec_id
    LIMIT 10
    """,
    section="2.11 cosine top-k similarity search (brute-force baseline)",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.cosine_topk(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0, k=10
    )


@query(
    "allpairs_similarity",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    section="2.11 all-pairs similarity join (threshold 0.4)",
)
def allpairs_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.allpairs_cosine(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", dim=64, threshold=0.4
    )


@query(
    "lsh_allpairs_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    section="2.11 all-pairs similarity join, banded-LSH generator (scale path)",
)
def lsh_allpairs_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for the thresholded similarity join: hyperplane-band
    equi-join candidates + exact rescore — no cartesian/theta self-join
    anywhere in the plan (asserted in tests/test_plans.py). Output is
    identical to `allpairs_similarity` (miss prob ≤ 1.1e-7 per pair at
    the 0.4 threshold; see operators/similarity.py for the math)."""
    return ops.lsh_allpairs_cosine(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", dim=64, threshold=0.4
    )


@query(
    "embedding_neardup",
    oracle="""
    WITH pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4
    )
    SELECT id_b                        AS dup_id,
           CAST(min(id_a) AS BIGINT)   AS keep_id,
           count(*)                    AS n_neighbors
    FROM pairs
    GROUP BY id_b
    """,
    section="2.11 embedding-cosine near-dup (survivor selection over LSH pairs)",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DECISION on top of the similarity join: every vector
    with a smaller-id neighbor above threshold is a duplicate; its
    survivor is the minimum such neighbor (deterministic keep-first
    rule, same as exact_dedup). Candidates come from the banded-LSH
    generator, so the whole pipeline — generate → rescore → decide —
    is equi-join-only and carries to corpus scale."""
    pairs = ops.lsh_allpairs_cosine(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", dim=64, threshold=0.4
    )
    return pairs.groupBy(F.col("id_b").alias("dup_id")).agg(
        F.min("id_a").cast("bigint").alias("keep_id"),
        F.count(F.lit(1)).alias("n_neighbors"),
    )


@query(
    "ann_lsh_topk",
    oracle="""
    WITH sig AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS bucket
        FROM embeddings
    ), q AS (SELECT emb AS qv, bucket AS qb FROM sig WHERE vec_id = 0)
    SELECT s.vec_id,
           round(list_cosine_similarity(s.emb, q.qv), 4) AS cos
    FROM sig s CROSS JOIN q
    WHERE s.bucket = q.qb AND s.vec_id <> 0
    ORDER BY list_cosine_similarity(s.emb, q.qv) DESC, s.vec_id
    LIMIT 5
    """,
    section="2.11 ANN: LSH sign-bit buckets + exact rescore",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.signbit_lsh_topk(
        load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", query_id=0, bits=4, k=5
    )


@query(
    "label_centroids",
    oracle="""
    SELECT label,
           CAST(dim AS INT)      AS dim,
           round(avg(v), 6)      AS centroid_v,
           count(*)              AS n_vecs
    FROM (
        SELECT label,
               unnest(generate_series(1, len(embedding))) AS dim,
               unnest(CAST(embedding AS DOUBLE[]))        AS v
        FROM embeddings
    )
    GROUP BY label, dim
    """,
    section="2.11 label/cluster stats (per-dim centroids)",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.group_centroids(load_table(spark, sf_dir, "embeddings"), "label", "embedding")


@query(
    "vector_quantize",
    oracle="""
    SELECT vec_id,
           array_to_string([CAST(round(x * 127.0 / mx) AS INT)
                            for x in CAST(embedding AS DOUBLE[])], ',') AS qvec,
           round(mx, 6) AS scale
    FROM (
        SELECT vec_id, embedding,
               greatest(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'),
                        -list_aggregate(CAST(embedding AS DOUBLE[]), 'min')) AS mx
        FROM embeddings
    )
    """,
    section="2.11 vector quantization (symmetric int8 per-vector scale)",
)
def vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: per-vector absmax scale, each dim
    mapped to round(x·127/scale). The embedding-compression pass of a
    training-data pipeline, in pure column expressions. The quantized
    vector is serialized with array_join (the external harness's pandas
    canonicalizer cannot hash top-level ARRAY cells)."""
    from ..operators.similarity import as_double

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb")
    )
    mx = F.greatest(F.array_max("emb"), -F.array_min("emb"))
    qv = F.transform(
        "emb",
        lambda x: F.round(x * 127.0 / F.col("scale")).cast("int").cast("string"),
    )
    return (
        e.withColumn("scale", mx)
        .select(
            "vec_id",
            F.array_join(qv, ",").alias("qvec"),
            F.round("scale", 6).alias("scale"),
        )
    )


@query(
    "ivf_ann_topk",
    oracle=None,  # rows-only: k-means training is iterative (not one SQL stmt)
    section="2.11 ANN: IVF (k-means coarse quantizer + n-probe exact rescore)",
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF scale path for similarity search: deterministic k-means
    (8 cells, 3 Lloyd rounds), probe the 2 cells nearest the query,
    exact cosine rescore inside them."""
    return ops.ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        query_id=0,
        n_clusters=8,
        lloyd_iters=3,
        n_probe=2,
        k=5,
    )
