"""Generic text-analysis operators (schema-agnostic)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def word_count(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) — explode+groupBy with automatic map-side combine."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, word, tf, tfidf) with idf = ln(N/df).

    DF is vocab-sized → broadcast; N is a 1-row broadcast cross join
    (never a driver collect)."""
    words = df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # plain count, NOT countDistinct: tf is already one row per
    # (doc_id, word) by construction, and a distinct aggregate would
    # pay the expand/two-phase plan over the corpus-sized term table
    # for an identical result
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("bigint").alias("tf"),
            # portable half-up, not engine round(): a tfidf double
            # whose shortest repr ends in ...5 at 7 digits renders
            # differently under Spark's BigDecimal path vs DuckDB's
            # binary rounding (the r5 lesson; r9 sweep)
            round_half_up(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


def stopword_ratio(text_col: str | Column, stopwords: tuple[str, ...] = ("the", "a")) -> Column:
    toks = tokens(text_col)
    return F.size(F.filter(toks, lambda w: w.isin(*stopwords))).cast("double") / F.size(toks)


def round_half_up(c: Column, digits: int) -> Column:
    """floor(x·10^d + 0.5)/10^d — engine-independent rounding.

    Spark's round() goes through BigDecimal.valueOf (shortest decimal
    repr, half-up) while DuckDB rounds the raw binary double, so a
    ratio that lands exactly on a .xxx5 boundary (possible whenever
    the denominator is 2^a·5^b — token counts, partition sizes) rounds
    DIFFERENTLY in the two engines even from bit-identical inputs.
    This form is plain float arithmetic, identical in any engine; the
    oracle mirrors it verbatim. Surfaced by the sf0.1 sweep (round 5):
    quality_score and window_distribution disagreed at 1-2 boundary
    rows per 5000. Non-negative inputs only (floor ≠ half-up below 0)."""
    scale = 10**digits
    return F.floor(c * scale + F.lit(0.5)) / scale


def cents(c: str | Column, dp: int = 2) -> Column:
    """round(x·10^dp) as BIGINT — THE per-row fixed-point money cell
    (dp-decimal fixture money is exact in these units). One definition
    for every money aggregate: money_sum composes it for grouped sums,
    and windowed/CASE forms apply it directly so the conversion can
    never drift per call site. SQL twin: cents_sql."""
    scale = 10**dp
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * scale).cast("bigint")


def cents_sql(expr: str, dp: int = 2) -> str:
    """DuckDB mirror of :func:`cents`."""
    return f"CAST(round({expr} * {10 ** dp}) AS BIGINT)"


def e4_revenue_2dp(price: Column, disc: Column) -> Column:
    """TPC-H revenue Σ price·(1−discount), summed as EXACT 1e-4 units
    (2dp price × 2dp discount is exact at that grain) and rendered
    half-up at 2dp — the Q3/Q5/Q7/Q10/Q19 revenue cell. One
    definition; SQL twin: e4_revenue_2dp_sql. The units sum widens to
    DECIMAL(38,0) for the same int64-overflow reason as money_sum
    (1e-4 units hit 2^63 at ~1/100th the rows), then converts to
    double exactly like DuckDB's HUGEINT sum does under ``/``."""
    return (
        F.floor(
            F.sum(F.round(price * (1 - disc) * 10000).cast("bigint").cast("decimal(38,0)"))
            .cast("double")
            / 100
            + F.lit(0.5)
        )
        / 100
    )


def e4_revenue_2dp_sql(price: str, disc: str) -> str:
    """DuckDB mirror of :func:`e4_revenue_2dp`."""
    return (
        f"floor(sum(CAST(round({price} * (1 - {disc}) * 10000) AS BIGINT))"
        " / 100 + 0.5) / 100"
    )


def money_sum(c: str | Column, dp: int = 2) -> Column:
    """Exact fixed-point money sum surfaced as DOUBLE: per-row units
    of 10^-dp (exact integers for dp-decimal fixture money) summed in
    DECIMAL(38,0) — int64 units overflow around 9.2e18, i.e. a single
    hot group at the 100 TB design scale, while DuckDB's sum(BIGINT)
    silently widens to HUGEINT and would diverge (or, ANSI-on, Spark
    would throw) — then ONE cast+division at the end: both engines
    convert the IDENTICAL exact integer to double before dividing, so
    the result is bit-identical under any partitioning. THE money-sum
    discipline (pricing_summary / rollup_agg / the events family all
    follow it); hand-typing the expression per query is how pivot_agg
    drifted back to a raw double sum. SQL twin: money_sum_sql — edit
    the pair together."""
    return F.sum(cents(c, dp).cast("decimal(38,0)")).cast("double") / float(10**dp)


def money_sum_sql(expr: str, dp: int = 2) -> str:
    """DuckDB mirror of :func:`money_sum`."""
    return f"CAST(sum({cents_sql(expr, dp)}) AS DOUBLE) / {10 ** dp}"


def quality_features(
    df: DataFrame, id_col: str, text_col: str, chars_col: str
) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stop_ratio, quality∈[0,1]) —
    pure column math, vectorized end-to-end."""
    toks = tokens(text_col)
    ntok = F.size(toks).cast("double")
    avg_len = (F.col(chars_col) - ntok + 1.0) / ntok
    stop = stopword_ratio(text_col)
    quality = F.least(F.lit(1.0), F.greatest(F.lit(0.0), 0.2 + 0.12 * avg_len - 0.5 * stop))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        round_half_up(avg_len, 4).alias("avg_token_len"),
        round_half_up(stop, 4).alias("stop_ratio"),
        round_half_up(quality, 4).alias("quality"),
    )


def bpe_token_count(text_col: str | Column, chars_per_token: int = 4) -> Column:
    """BPE-proxy token count: Σ ceil(len(word)/chars_per_token)."""
    return F.aggregate(
        F.transform(tokens(text_col), lambda w: F.ceil(F.length(w) / float(chars_per_token))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def content_fingerprint(text_col: str | Column) -> Column:
    """Space-stripped md5 content fingerprint — ASCII space ONLY, by
    contract (mirrored verbatim in the oracles as replace(text,' ','')):
    tab/newline/NBSP variants fingerprint differently. A \\s+ normal-
    ization would be a VALUE change across doc_fingerprint and the
    corpus keep-first window; if that semantics is ever wanted, change
    both twins together and queue the consumers for fresh driver
    evidence."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.regexp_replace(c, " ", ""))


def py_round_half_up(x: float, digits: int) -> float:
    """Python-side twin of :func:`round_half_up` — the SAME
    floor(x·10^d + 0.5)/10^d form for values computed inside pandas /
    Arrow functions (Python round() is banker's and diverges on
    midpoints). Non-negative inputs only, like the Column form. One
    definition: the inline copies this replaces are exactly how a
    convention change lands one-sided."""
    import math

    return math.floor(x * 10**digits + 0.5) / 10**digits


def hash_bucket(col: str | Column, dim: int) -> Column:
    """md5-first-8-hex integer mod ``dim`` — THE hashing-trick bucket
    (the feature-hashing encoder and the linear quality scorer's
    features use the identical mapping; one definition keeps the
    scorer's feature space in lockstep with the encoder diagnostic —
    a drifted copy would silently split them while each query stayed
    green against its own oracle). SQL mirror: :func:`hash_bucket_sql`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint") % dim


def hash_bucket_sql(expr: str, dim: int) -> str:
    """DuckDB text of :func:`hash_bucket` for oracle f-strings."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT) % {dim}"


def hash_uniform(id_col: str | Column) -> Column:
    """Deterministic uniform draw on [0,1) from an id: first 8 md5
    hex chars as an integer over 2^32 — an exact dyadic rational, so
    the value (and any threshold comparison on it) is bit-identical
    across engines, runs, and repartitions. THE one definition of the
    repo's hash-to-[0,1) mapping: weighted_sample's priorities and
    mix_apply's mixture draws both build on it, and that shared
    identity is the reproducibility contract ('the 100 TB mixture is
    re-buildable bit-for-bit') — a second copy that drifts (say, to
    16 hex chars) would silently break it."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )


def hash_uniform_sql(key_expr: str) -> str:
    """DuckDB text of :func:`hash_uniform` for oracle f-strings — the
    SQL mirror the other shared helpers already provide
    (signed_round_half_up_sql et al.), so the oracles' draws cannot
    drift from the engine's."""
    return (
        f"(('0x' || substr(md5({key_expr}::VARCHAR), 1, 8))::BIGINT"
        " / 4294967296.0)"
    )


def adjacent_pairs_expr(col: str) -> str:
    """Spark SQL text of the adjacent-pairs idiom: all consecutive
    element pairs of ``split(col, ' ')`` as 'a b' strings. THE one
    definition of the pair generator (BPE merge rounds pair symbols,
    DSIR pairs words — same shape, one level apart); zip_with over
    two slices, never F.sequence, which RAISES on one-element arrays
    where the DuckDB twin's generate_series is just empty. SQL mirror:
    :func:`adjacent_pairs_sql`."""
    arr = f"split({col}, ' ')"
    return (
        f"zip_with(slice({arr}, 1, size({arr}) - 1),"
        f"         slice({arr}, 2, size({arr}) - 1),"
        f"         (a, b) -> concat(a, ' ', b))"
    )


def adjacent_pairs_sql(col: str) -> str:
    """DuckDB twin of :func:`adjacent_pairs_expr` (an unnest-ready
    list; generate_series(1, 0) is empty for one-element arrays)."""
    arr = f"string_split({col}, ' ')"
    return (
        f"list_transform(generate_series(1, len({arr}) - 1),"
        f" i -> {arr}[i] || ' ' || {arr}[i+1])"
    )


def signed_round_half_up(c: str | Column, digits: int) -> Column:
    """SIGN-AWARE half-up rendering for values that can go negative:
    sign(x) * floor(|x|*10^d + 0.5)/10^d — plain :func:`round_half_up`
    is floor-form and rounds negative midpoints toward +inf, violating
    the half-up convention (the r7 advisor's yoy note). THE one Column
    definition for every negative-capable score (sentiment, zipf
    slope, DSIR weights, cosines, inclusion-exclusion sketch
    estimates); the inline copies this replaces are exactly how a
    convention change lands one-sided. SQL mirror:
    :func:`signed_round_half_up_sql`."""
    col = F.col(c) if isinstance(c, str) else c
    p = 10**digits
    return F.signum(col) * F.floor(F.abs(col) * p + 0.5) / p


def signed_round_half_up_sql(expr: str, digits: int) -> str:
    """DuckDB text of :func:`signed_round_half_up` for oracle
    f-strings."""
    p = 10**digits
    return f"sign({expr}) * floor(abs({expr}) * {p} + 0.5) / {p}"
