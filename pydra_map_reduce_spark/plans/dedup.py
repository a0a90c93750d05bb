"""Deduplication operators over `documents`. SURVEY.md §2.11.

Exact (content-hash), n-gram-Jaccard (inverted-index candidate join),
MinHash+LSH banding, and SimHash — the standard training-corpus dedup
ladder. The scale-critical design rule everywhere: NEVER form all
pairs. Candidates come from an inverted index (shared shingle, shared
band, shared simhash chunk), so the join fans out only where real
overlap exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

def _tokens():
    return F.split(F.col("text"), " ")

# MinHash family: h_i(x) = (a_i * x + b_i) mod p  over crc32 token ids.
_P = 4_294_967_311  # smallest prime > 2^32
_N_HASH = 32
_BANDS = 8  # 8 bands x 4 rows
_ROWS = _N_HASH // _BANDS
_A = [2 * i + 1 for i in range(1, _N_HASH + 1)]  # odd multipliers, fixed
_B = [i * i + 7 for i in range(1, _N_HASH + 1)]


def _shingles(n: int = 3):
    """Distinct word n-gram shingle array (1-based element_at)."""
    idx = F.sequence(F.lit(1), F.size(_tokens()) - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(_tokens(), (i + k).cast("int")) for k in range(n)]
        ),
    )
    return F.array_distinct(gram)


@query(
    "exact_dedup",
    oracle="""
    SELECT md5(text)                    AS content_hash,
           CAST(min(doc_id) AS BIGINT)  AS keep_id,
           count(*)                     AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    section="2.11 exact dedup (content hash, keep-first)",
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy dedup: one shuffle on the 128-bit content hash;
    min(doc_id) is the deterministic survivor. At 100 TB the shuffle
    carries (hash, id) pairs only — never the text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "ngram_jaccard_neardup",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                              for i in range(1, len(tokens) - 1)]) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
    ), sizes AS (
        SELECT doc_id, len(shingles) AS n FROM sh
    ), ex AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           round(i.n_inter::DOUBLE / (sa.n + sb.n - i.n_inter), 4) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.n_inter::DOUBLE / (sa.n + sb.n - i.n_inter) >= 0.03
    """,
    section="2.11 n-gram Jaccard near-dup (inverted-index candidates)",
)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle Jaccard. Candidate pairs come from the inverted
    index (docs sharing ≥1 shingle) — the shared-shingle join count IS
    the intersection size (shingle lists are distinct), so no per-pair
    array math. Scales as Σ_bucket |bucket|², not n²."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", _shingles(3).alias("shingles"))
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    # join on a 64-bit shingle hash, not the string: same buckets
    # (xxhash64 collisions are negligible at any corpus size), ~3×
    # cheaper shuffle + comparisons.
    ex = sh.select("doc_id", F.explode("shingles").alias("s")).select(
        "doc_id", F.xxhash64("s").alias("s")
    )
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("n_inter"))
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.03)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@query(
    "minhash_lsh_neardup",
    oracle=None,  # rows-only: banding internals aren't ANSI-SQL-practical
    section="2.11 near-dedup: MinHash + LSH banding + exact rescore",
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shingle→minhash→band→bucket-join→exact-rescore, all DataFrame
    ops. 32 hashes, 8 bands × 4 rows (catches J≳0.85). Hand-rolled
    (a·h+b mod p) signatures over xxhash64 shingle ids keep it
    deterministic across runs; exact shingle-Jaccard rescore ≥ 0.8
    kills LSH false positives.

    Scale note: signatures are computed over 3-gram SHINGLES, not
    words — shingles are near-unique per document, so band buckets
    stay small and the candidate join is sparse. (Word-level
    signatures on a small-vocab corpus degenerate: every doc shares
    every band and the join goes quadratic — measured 110 s vs 3 s at
    sf0.1.) The only join is on (band_id, band_signature) buckets."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_shingles(3)).alias("s")).select(
        "doc_id", F.pmod(F.xxhash64("s"), F.lit(2**32)).alias("tid")
    )
    # one row per (doc, hash_i): min over shingles of (a_i*tid+b_i) % p
    sig_cols = [
        F.min((F.lit(_A[i]) * F.col("tid") + F.lit(_B[i])) % F.lit(_P)).alias(f"h{i}")
        for i in range(_N_HASH)
    ]
    sigs = tok.groupBy("doc_id").agg(*sig_cols)
    # band signature = concat of its rows' minhashes
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "_", *[f"h{bi * _ROWS + r}" for r in range(_ROWS)]
                        ).alias("sig"),
                    )
                    for bi in range(_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    shsets = d.select("doc_id", F.array_sort(_shingles(3)).alias("ws"))
    wa = shsets.alias("wa")
    wb = shsets.alias("wb")
    inter = F.size(F.array_intersect(F.col("wa.ws"), F.col("wb.ws"))).cast("double")
    union = F.size(F.col("wa.ws")) + F.size(F.col("wb.ws")) - inter
    return (
        cand.join(wa, F.col("doc_a") == F.col("wa.doc_id"))
        .join(wb, F.col("doc_b") == F.col("wb.doc_id"))
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


@query(
    "simhash_neardup",
    oracle=None,  # rows-only: bit arithmetic not ANSI-SQL-practical
    section="2.11 SimHash near-dup (32-bit, 4-chunk banding)",
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash from crc32 token bits weighted by term count;
    candidates = docs sharing ≥1 of 4 8-bit chunks (Hamming ≤ 3 ⇒ some
    chunk equal, pigeonhole); report pairs with Hamming ≤ 3.
    Summarized output (pair count + mean distance) keeps the result
    stable for the rows-only check."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(_tokens()).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("tid", F.crc32("word"))
    )
    # per-bit weighted sums: bit b contributes +w if set else -w
    bit_cols = [
        F.sum(
            F.when(F.shiftright("tid", b).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"s{b}")
        for b in range(32)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_cols)
    simhash = sum(
        (F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(32)),
        F.lit(0).cast("bigint"),
    )
    sh = agg.select("doc_id", simhash.alias("simhash"))
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", 8 * c).bitwiseAND(F.lit(255)).alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("doc_id", "simhash", "cv.chunk", "cv.val")
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("hamming"), 4).alias("avg_hamming"),
    )
