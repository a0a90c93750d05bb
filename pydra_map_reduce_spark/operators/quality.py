"""Data-quality / corpus-science operators, parameterized.

SURVEY.md §2.11: the drift screens, diversity metrics, and weighted
sampling used by large-scale training-data pipelines. The graded
fixture bindings live in plans/analytics.py, plans/text.py, and
plans/corpus.py; this module holds the generic forms the Pipeline API
exposes so users can run them on their own tables/columns.

Scale posture (shared by all three):
- ks_drift / token_entropy never sort base rows — windows run over the
  bounded (group × distinct-value) grid or per-group aggregates only.
- weighted_sample is one narrow pass + TakeOrdered (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textops import hash_uniform, py_round_half_up, round_half_up


def ks_drift(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group two-sample KS statistic of ``value_col`` against the
    rest of the table (group vs complement), via ECDFs over the
    distinct-value grid. Returns (group_col, n_s, ks). NULL values
    are EXCLUDED up front — a NULL grid row breaks the non-null-safe
    rejoin (NULL==NULL never matches, so cum_s understates in BOTH
    engines — invisible to the differential gate) and window-orders
    opposite ways (Spark nulls-first vs DuckDB nulls-last), shifting
    every cumulative count; "drift over observed values" is the
    honest contract. A group spanning the WHOLE table has an empty
    complement — its ks surfaces as NULL ("undefined") via the same
    nullif guard auc uses, where unguarded division diverges (Spark
    NULL vs a DuckDB-mirror inf)."""
    df = df.filter(F.col(value_col).isNotNull())
    vals = df.groupBy(F.col(value_col).alias("v")).agg(F.count(F.lit(1)).alias("cnt_v"))
    pv = df.groupBy(group_col, F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt_sv")
    )
    tot = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_s"))
    n_all = df.agg(F.count(F.lit(1)).alias("n_all"))
    grid = (
        tot.crossJoin(F.broadcast(vals))
        .join(pv, [group_col, "v"], "left")
        .withColumn("cnt_sv", F.coalesce("cnt_sv", F.lit(0)))
        .crossJoin(F.broadcast(n_all))
    )
    w = Window.partitionBy(group_col).orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        group_col,
        "n_s",
        "n_all",
        F.sum("cnt_sv").over(w).alias("cum_s"),
        F.sum("cnt_v").over(w).alias("cum_all"),
    )
    dev = F.abs(
        F.col("cum_s") * F.lit(1.0) / F.col("n_s")
        - (F.col("cum_all") - F.col("cum_s"))
        * F.lit(1.0)
        / F.nullif(F.col("n_all") - F.col("n_s"), F.lit(0))
    )
    return cum.groupBy(group_col).agg(
        F.max("n_s").cast("bigint").alias("n_s"),
        round_half_up(F.max(dev), 6).alias("ks"),
    )


def token_entropy(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group Shannon entropy (nats) of the whitespace-token
    unigram distribution, via H = ln(N) - Σ n·ln(n)/N. Returns
    (group_col, n_tokens, n_types, entropy)."""
    tf = (
        df.select(group_col, F.explode(F.split(text_col, " ")).alias("w"))
        .groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return tf.groupBy(group_col).agg(
        F.sum("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        round_half_up(
            F.log(F.sum("n")) - F.sum(F.col("n") * F.log("n")) / F.sum("n"), 4
        ).alias("entropy"),
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str | Column, k: int
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows without
    replacement (sequential Poisson sampling, Ohlsson 1998): priority
    = hash-uniform(id) / weight, keep the k smallest. Returns the
    input columns + ``priority`` (rounded half-up, 8dp).

    Non-positive weights are EXCLUDED before the division (a weight-0
    row has zero inclusion probability by definition, and u/0 is the
    one spot where engines genuinely disagree — Spark double/0 yields
    NULL, which ascending nulls-first would sort INTO the sample,
    while DuckDB yields +inf, which sorts out; the guard removes the
    divergence instead of papering over it)."""
    u = hash_uniform(id_col)
    weight = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    pri = u / weight
    # collision-safe internal name: withColumn REPLACES an existing
    # column, so a user frame with its own 'pri' would be silently
    # destroyed and then dropped from the output (r10 review)
    return (
        df.filter(weight > 0)
        .withColumn("__ws_pri", pri)
        .orderBy("__ws_pri", id_col)
        .limit(k)
        .withColumn("priority", round_half_up(F.col("__ws_pri"), 8))
        .drop("__ws_pri")
    )


def auc(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """ROC AUC of ``score_col`` as a predictor of the 0/1 integer
    ``label_col``, via the Mann-Whitney rank-sum identity with
    tie-averaged ranks. Returns one row (n_pos, n_neg, auc@6dp).

    Runs on the DISTINCT-score grid: per-score (count, positives)
    shuffle once, ranks derive from cumulative counts over the grid
    (bounded by the score domain, never corpus-sized), and the whole
    computation stays integer until the single final division — so
    the result is independent of partitioning and engine. NULL
    scores are EXCLUDED (unrankable): a NULL score group would
    window-order first in Spark and last in a DuckDB mirror,
    shifting cum_less for every real score. NULL LABELS are excluded
    too: F.sum skips them in p/rank2_sum while their n still feeds
    cum_less, which silently pushes AUC outside [0,1] (r10 review —
    an unlabeled row can neither rank as positive nor as negative)."""
    df = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    vals = df.groupBy(F.col(score_col).alias("v")).agg(
        F.count(F.lit(1)).alias("n"), F.sum(label_col).alias("p")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn("cum_less", F.coalesce(F.sum("n").over(w), F.lit(0)))
    n_pos = F.sum("p")
    n_neg = F.sum(F.col("n") - F.col("p"))
    # per-value rank terms reach ~n_pos·2N ≈ N² — far past int64 at
    # corpus scale — so the sums widen to DECIMAL(38,0) (DuckDB's
    # integer sums widen to HUGEINT on their own); the single final
    # division drops to double identically in both engines.
    rank2_sum = F.sum(
        F.col("p").cast("decimal(38,0)")
        * (2 * F.col("cum_less").cast("decimal(38,0)") + F.col("n") + 1)
    )
    n_pos_d = n_pos.cast("decimal(38,0)")
    return ranked.agg(
        n_pos.cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        # nullif guard: a single-class input (no positives or no
        # negatives) has denominator 0, where the engines diverge
        # (Spark NULL vs DuckDB inf/NaN); NULL/NULL — "AUC
        # undefined" — is the portable answer, mirrored in the oracle
        round_half_up(
            (rank2_sum - n_pos_d * (n_pos_d + 1)) * 1.0
            / F.nullif(
                2 * n_pos_d * n_neg.cast("decimal(38,0)"),
                F.lit(0).cast("decimal(38,0)"),
            ),
            6,
        ).alias("auc"),
    )


def running_balance(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    delta_col: Column,
    *,
    cap: float,
) -> DataFrame:
    """Per-key clamped cumulative sum: in ``order_cols`` order,
    balance ← clamp(balance + delta, 0, cap). The clamp makes the
    recurrence NON-associative — no window frame or prefix closed
    form exists — so this is the genuine applyInPandas case: one
    vectorized pass per key after the keyed shuffle, one float of
    state per key, output bounded to one row per key
    (key, n_events, final_balance). The key column keeps its INPUT
    type in the output schema (hardcoding e.g. 'long' would break
    string-keyed tables). NULL deltas are EXCLUDED before the replay
    (and from n_events): a NULL arrives in pandas as NaN, NaN
    propagates through the clamp, and the final rounding would die
    with an opaque Python-worker ValueError — a no-movement row has
    no defined place in an order-sensitive recurrence anyway
    (mirrored in the registered oracle's WHERE)."""
    import pandas as pd

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        # stable sort: the clamp recurrence is order-sensitive, and
        # pandas' default quicksort is UNSTABLE — tied order keys
        # would replay in run-dependent order
        pdf = pdf.sort_values(order_cols, kind="stable")
        bal = 0.0
        for d in pdf["_delta"].to_numpy():
            bal = min(max(bal + d, 0.0), cap)
        # floor-based half-up via the shared Python twin of
        # round_half_up (bal is clamped ≥ 0, so the form is exact) —
        # Python round() is banker's and diverges from the repo's
        # cross-engine half-up convention on 2dp midpoints.
        final = py_round_half_up(bal, 2)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_events": [len(pdf)],
                "final_balance": [final],
            }
        )

    key_type = df.schema[key_col].dataType.simpleString()
    return (
        df.select(key_col, *order_cols, delta_col.alias("_delta"))
        .filter(F.col("_delta").isNotNull())
        .groupBy(key_col)
        .applyInPandas(
            replay, f"{key_col} {key_type}, n_events long, final_balance double"
        )
    )


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent content fingerprint over ``cols``: per-row
    md5 of the '|'-joined canonical serialization, first 8 hex digits
    summed in DECIMAL(38,0) (int64 would wrap past ~4e9 rows — the
    scale the gate exists for). Addition commutes, so the number is
    identical under any partitioning, ordering, or engine — the
    one-number-per-table copy/migration gate. Returns (checksum,
    n_rows); the checksum surfaces as a STRING because DECIMAL
    terminal columns canonicalize ambiguously across client stacks
    (the r7 driver-hash lesson — plans/money.py module docstring)
    while the decimal→string rendering of an integer-scale value is
    identical everywhere, at full 38-digit precision no BIGINT could
    hold. NULLs serialize as an explicit NUL-byte sentinel per
    column BEFORE joining: concat_ws silently SKIPS null elements, so
    without the sentinel ('a', NULL, 'b') and ('a', 'b', NULL) would
    both hash as 'a|b' and a nullable column would break positional
    integrity (and an ||-style oracle would drop the whole row).

    Column-type contract: engine-independence holds for columns whose
    cast('string') rendering is canonical across engines — integers,
    strings, dates. DOUBLE/FLOAT (and timestamp) columns are NOT
    portable through this serialization — Spark renders Java-style
    ('1.0E-4', 'Infinity') where DuckDB renders '0.0001' / 'inf', so
    bit-identical data would checksum differently; normalize such
    columns to a fixed-point string (cents) before gating on them
    (the registered binding uses int/string columns only)."""
    row_ser = F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols],
    )
    h = F.conv(F.substring(F.md5(row_ser), 1, 8), 16, 10).cast("decimal(20,0)")
    return df.agg(
        F.sum(h).cast("decimal(38,0)").cast("string").alias("checksum"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    *,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing, generic form: within each
    ``group_col`` stream, rows concatenate in ``order_col`` order and
    chunk into fixed ``budget``-token sequences, rows spanning
    boundaries (the LLM-pretraining packing regime). Returns one row
    per (group, seq_no): n_docs touching the sequence and its
    fill_tokens (== budget except each group's final sequence).

    Entirely closed-form integer math on each row's token interval
    [start, start+n): touched sequences are floor(start/B) ..
    floor((end-1)/B) — an explode of that bounded range — and the
    contribution to a sequence is the interval overlap. No sequential
    packer state exists (contrast running_balance's clamp recurrence,
    which genuinely needs applyInPandas); the window and the final
    aggregate both key on the group, so groups pack independently —
    per-writer parallelism at any scale."""
    if budget <= 0:
        # Spark's `div 0` yields NULL → sequence(NULL,NULL) → explode
        # drops every row: a silently EMPTY packing where a SQL mirror
        # errors — name the misuse instead
        raise ValueError(f"budget must be positive, got {budget}")
    B = budget
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = df.select(
        group_col, order_col, F.col(tokens_col).cast("bigint").alias("_n")
    ).filter(F.col("_n") > 0)
    pos = d.withColumn("_start", F.coalesce(F.sum("_n").over(w), F.lit(0)))
    spans = pos.select(
        group_col,
        "_n",
        "_start",
        F.explode(
            F.sequence(
                # integer division end-to-end: `/` would go through
                # double, whose ulp past ~2^53 cumulative tokens can
                # mis-bin a boundary row — `div` keeps the bin math
                # exact at any corpus size (and matches the oracle's
                # `//`)
                F.expr(f"_start div {B}"),
                F.expr(f"(_start + _n - 1) div {B}"),
            )
        ).alias("seq_no"),
    )
    overlap = F.least(
        F.col("_start") + F.col("_n"), (F.col("seq_no") + 1) * B
    ) - F.greatest(F.col("_start"), F.col("seq_no") * B)
    return spans.groupBy(group_col, "seq_no").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(overlap).alias("fill_tokens"),
    )


def psi_drift(
    df: DataFrame, group_col: str, value_col: str, *, bin_width: float
) -> DataFrame:
    """Per-group population-stability index of ``value_col`` (binned
    at ``bin_width``) against the rest of the table, with +0.5
    Laplace smoothing so empty bins stay finite. Returns
    (group_col, n_bins, psi@4dp). Same bounded (group × bin) grid
    shape as ks_drift, with the SAME NULL exclusion up front: a NULL
    value bins to b = NULL, which the grid's left join can never match
    (NULL == NULL is not true) — the owning group's mass would drop
    from cnt_sb while staying inside n_s/cnt_b, skewing psi
    identically in BOTH engines, invisible to the differential gate.
    "Drift over observed values" is the honest contract (the ks_drift
    rationale)."""
    import math

    if not (isinstance(bin_width, (int, float)) and math.isfinite(bin_width) and bin_width > 0):
        # value/0 is NULL under non-ANSI Spark → every row bins to the
        # NULL bin the docstring above warns about → a plausible-
        # looking garbage PSI over n_bins=1, silently. Name the misuse
        # instead (the pack_sequences budget-guard convention).
        raise ValueError(f"bin_width must be a positive finite number, got {bin_width!r}")
    df = df.filter(F.col(value_col).isNotNull())
    binned = df.select(
        group_col, F.floor(F.col(value_col) / bin_width).cast("bigint").alias("b")
    )
    bins = binned.groupBy("b").agg(F.count(F.lit(1)).alias("cnt_b"))
    pb = binned.groupBy(group_col, "b").agg(F.count(F.lit(1)).alias("cnt_sb"))
    tot = binned.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_s"))
    scalars = binned.agg(F.count(F.lit(1)).alias("n_all")).crossJoin(
        bins.agg(F.count(F.lit(1)).alias("k"))
    )
    grid = (
        tot.crossJoin(F.broadcast(bins))
        .join(pb, [group_col, "b"], "left")
        .withColumn("cnt_sb", F.coalesce("cnt_sb", F.lit(0)))
        .crossJoin(F.broadcast(scalars))
    )
    p_s = (F.col("cnt_sb") + 0.5) / (F.col("n_s") + 0.5 * F.col("k"))
    p_r = (F.col("cnt_b") - F.col("cnt_sb") + 0.5) / (
        F.col("n_all") - F.col("n_s") + 0.5 * F.col("k")
    )
    return grid.groupBy(group_col).agg(
        F.max("k").cast("bigint").alias("n_bins"),
        round_half_up(F.sum((p_s - p_r) * F.log(p_s / p_r)), 4).alias("psi"),
    )


def unrolled_gd(
    px: DataFrame,
    yv: DataFrame,
    key: str,
    n: int,
    eta: float,
    iters: int,
) -> DataFrame:
    """THE unrolled full-batch logistic-regression GD loop — ONE
    definition for the three in-engine trainers (logreg_train over
    embedding features, lang_id_train over hashed char trigrams,
    quality_classifier_gate over hashed word tokens), which had
    drifted into three identical copies before round 12 factored them
    here (the _minhash_sigs_ctes precedent: a re-typed copy of the
    recurrence is the drift hazard).

    Inputs: ``px`` = the (key, j, x) feature frame (j=0 intercept
    rows included), ``yv`` = the (key, y) labels, ``n`` = label
    count (the caller's one driver sync). Returns the (j, w) weight
    frame after ``iters`` rounds. Arithmetic order is EXACTLY the
    original loops' — w0 = 0 makes round 1's sigmoid exactly 0.5 on
    both engines, so round 1 collapses to the closed gradient the
    w1 CTE of every paired oracle writes; later rounds are one
    broadcast-weight matvec + one key-joined residual + one j-keyed
    gradient sum each — two co-partitioned passes over the feature
    frame per round, weights always broadcast-sized."""
    r = yv.select(key, (F.lit(0.5) - F.col("y")).alias("r"))
    g = px.join(r, key).groupBy("j").agg(
        F.sum(F.col("r") * F.col("x")).alias("g")
    )
    w = g.select("j", (F.lit(-eta) * F.col("g") / F.lit(n)).alias("w"))
    for _ in range(2, iters + 1):
        z = (
            px.join(F.broadcast(w), "j")
            .select(key, (F.col("w") * F.col("x")).alias("t"))
            .groupBy(key)
            .agg(F.sum("t").alias("z"))
        )
        r = z.join(yv, key).select(
            key,
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y")
            ).alias("r"),
        )
        g = px.join(r, key).groupBy("j").agg(
            F.sum(F.col("r") * F.col("x")).alias("g")
        )
        w = w.join(F.broadcast(g), "j").select(
            "j",
            (F.col("w") - F.lit(eta) * F.col("g") / F.lit(n)).alias("w"),
        )
    return w


def gd_scores(px: DataFrame, w: DataFrame, key: str) -> DataFrame:
    """(key, z): the trained model's logit per entity — the broadcast
    matvec every trainer's scoring pass runs (sigmoid/pinning is the
    caller's, since each query renders at its own precision)."""
    return (
        px.join(F.broadcast(w), "j")
        .select(key, (F.col("w") * F.col("x")).alias("t"))
        .groupBy(key)
        .agg(F.sum("t").alias("z"))
    )
