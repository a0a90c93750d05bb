"""The map/flatMap/reduce escape hatch. SURVEY.md §2.10.

A map-reduce framework's defining API is "run arbitrary Python over
records". The Spark-native equivalents, all Arrow-batched (never
row-at-a-time Python UDFs):

- map(fn)      -> mapInPandas          (mr_map)
- flatMap(fn)  -> mapInPandas 1->many  (mr_flatmap)
- reduce(fn)   -> applyInPandas        (mr_reduce_by_key)
- UDTF         -> Python UDTF          (mr_udtf_expand)

Each query here intentionally computes something ALSO expressible in
SQL so the Arrow path itself is differentially tested against the
DuckDB oracle — the escape hatch gets real correctness rows, not just
rows-only checks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import money_sum, money_sum_sql, py_round_half_up, round_half_up
from ..sources.tables import _pin_conf, load_table
from .registry import query


@query(
    "mr_map",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS net_price,
           CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'retail' END AS qty_class
    FROM lineitem
    WHERE l_orderkey < 5000
    """,
    section="2.10 map(fn) over rows (mapInPandas, Arrow-batched)",
)
def mr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row map as a pandas batch function. Arrow moves columnar
    batches (~10k rows) across the JVM/Python boundary — the 10-100×
    faster alternative to per-row pickled UDFs."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 5000)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            net = pdf["l_extendedprice"] * (1 - pdf["l_discount"])
            out = pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    # half-up rounding (SQL semantics); pandas .round is
                    # banker's and would disagree on exact .xx5 values
                    "net_price": np.floor(net * 100 + 0.5) / 100,
                    "qty_class": (pdf["l_quantity"] >= 25).map(
                        {True: "bulk", False: "retail"}
                    ),
                }
            )
            yield out

    return li.mapInPandas(
        fn, "l_orderkey long, l_linenumber int, net_price double, qty_class string"
    )


@query(
    "mr_flatmap",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
    section="2.10 flatMap(fn) (mapInPandas 1->many) — word count via the hatch",
)
def mr_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count with Python tokenization (flatMap) + built-in final
    agg: the classic MR pipeline through the Arrow hatch. Python only
    expands rows; the shuffle/combine stays JVM-side."""
    d = load_table(spark, sf_dir, "documents").select("text")

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = pdf["text"].str.split(" ").explode()
            # notna(): a NULL text explodes to NaN, and NaN != ""
            # evaluates True in pandas — without the guard a null doc
            # would emit a NaN word group the oracle's unnest(NULL)
            # never produces
            words = words[words.notna() & (words != "")]
            yield pd.DataFrame({"word": words})

    words = d.mapInPandas(tokenize, "word string")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))


@query(
    "mr_reduce_by_key",
    oracle="""
    SELECT l_returnflag,
           floor(sum(CAST(round(l_quantity) AS BIGINT)
                     * CAST(round(l_extendedprice * 100) AS BIGINT))
                 / 100.0 / sum(CAST(round(l_quantity) AS BIGINT)) * 1e4 + 0.5) / 1e4
               AS weighted_avg_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    section="2.10 reduce(fn) per key (applyInPandas grouped UDAF)",
)
def mr_reduce_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key reducer (quantity-weighted mean) as a grouped
    pandas function. Scale caveat, stated PRECISELY: applyInPandas
    materializes each GROUP on one worker, so the precondition is
    bounded GROUP SIZE — which means HIGH-cardinality keys (per-order,
    per-user), the opposite of this demonstrator's 3-value
    l_returnflag, whose groups are corpus-proportional (~1/3 of the
    table each: fine at fixture scale, an executor OOM at 100 TB).
    For fixed small key sets use built-in two-stage aggs (this exact
    statistic is expressible as sum/sum); the escape hatch earns its
    cost only when per-group logic is genuinely non-aggregable AND
    groups are bounded — running_balance_capped is the honest case.
    The int64 cents accumulator holds to ~1.7e10 rows/group
    (9.2e18 / (50·1e7)); past that the reducer must widen to Python
    ints while the oracle widens to HUGEINT on its own."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )

    def reducer(pdf: pd.DataFrame) -> pd.DataFrame:
        # INTEGER accumulation: qty is integer-valued and the price is
        # 2dp money, so qty*cents sums exactly — a float weighted sum
        # is order-sensitive (pandas pairwise vs sequential summation,
        # ~1e-9 spread) and a group landing within that spread of a
        # .xxxx5 boundary would round differently run to run. The
        # oracle mirrors the same cents arithmetic, and both sides
        # round with the portable floor half-up form (engine round()
        # pairs diverge on the knife-edge k+0.4999999999999999 class).
        # round-then-cast, mirrored by the oracle's round(): numpy
        # astype truncates while DuckDB's bare CAST rounds — the
        # nested_line_stats class, fixed the same way
        qty = pdf["l_quantity"].to_numpy().round().astype("int64")
        cents = (pdf["l_extendedprice"].to_numpy() * 100).round().astype("int64")
        wavg = int((qty * cents).sum()) / 100.0 / int(qty.sum())
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "weighted_avg_price": [py_round_half_up(wavg, 4)],
                "n": [len(pdf)],
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(
        reducer, "l_returnflag string, weighted_avg_price double, n long"
    )


@query(
    "mr_udtf_expand",
    oracle="""
    SELECT doc_id,
           CAST(idx AS INT)                      AS idx,
           tokens[idx]                           AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
         (SELECT unnest(generate_series(1, 5)) AS idx)
    WHERE doc_id < 50 AND idx <= len(tokens)
    """,
    section="2.10 UDTF (one row -> many rows with declared schema)",
)
def mr_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding transform (first 5 tokens per doc) through the
    Arrow batch hatch — the UDTF shape: declared output schema, 1→N."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:
                    continue  # oracle: len(NULL) filter emits no rows
                for i, tok in enumerate(text.split(" ")[:5], start=1):
                    rows.append((doc_id, i, tok))
            yield pd.DataFrame(rows, columns=["doc_id", "idx", "token"])

    return d.mapInPandas(expand, "doc_id long, idx int, token string")


@query(
    "pandas_udf_scalar",
    oracle=f"""
    SELECT replace(lower(trim(p_type)), ' ', '_') AS type_norm,
           count(*)                               AS n,
           {money_sum_sql("p_retailprice")}
               AS sum_price
    FROM part
    GROUP BY replace(lower(trim(p_type)), ' ', '_')
    """,
    section="2.10 scalar pandas_udf (vectorized per-column Arrow batches)",
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized scalar tier (SURVEY §2.10's preferred map path):
    a @pandas_udf receives whole Arrow column batches as pd.Series —
    10-100× faster than row-at-a-time Python UDFs. String normalization
    keeps the differential check float-free; the final agg stays
    JVM-side so only the normalize step crosses the boundary."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm_type(s: pd.Series) -> pd.Series:
        # strip(' ') — SPACES only, matching DuckDB trim(); bare
        # .strip() also eats tabs/newlines and would silently split
        # a group the oracle keeps whole
        return s.str.strip(" ").str.lower().str.replace(" ", "_", regex=False)

    p = load_table(spark, sf_dir, "part").select("p_type", "p_retailprice")
    return (
        p.select(norm_type("p_type").alias("type_norm"), "p_retailprice")
        .groupBy("type_norm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum("p_retailprice").alias("sum_price"),
        )
    )


@query(
    "mr_partition_map",
    # Per-partition structure is engine-internal, but the FINAL merge
    # is deterministic: l_quantity is integer-valued (asserted by the
    # fixture), so the partial float sums are exact whole numbers and
    # association/partitioning cannot perturb the total — the global
    # (sum, count) is oracle-checkable even though the partials aren't.
    oracle="""
    SELECT round(sum(l_quantity), 2) AS total_qty,
           count(*)                  AS total_rows
    FROM lineitem
    """,
    section="2.10 partition-wise map (MR mapper over a split)",
)
def mr_partition_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local pre-aggregation in Python (one output row per
    partition) + JVM final merge — the explicit combiner pattern.
    The summary is the deterministic global (sum, count); the
    per-partition partial rows vary with parallelism and stay
    internal."""
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity")

    def partial_sum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        total = 0.0
        n = 0
        for pdf in batches:
            total += float(pdf["l_quantity"].sum())
            n += len(pdf)
        yield pd.DataFrame({"partial_qty": [total], "partial_n": [n]})

    partials = li.mapInPandas(partial_sum, "partial_qty double, partial_n long")
    return partials.agg(
        F.round(F.sum("partial_qty"), 2).alias("total_qty"),
        F.sum("partial_n").cast("bigint").alias("total_rows"),
    )


@query(
    "udtf_lateral",
    oracle="""
    SELECT doc_id,
           CAST(idx AS INT)  AS idx,
           tokens[idx]       AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
         (SELECT unnest(generate_series(1, 3)) AS idx)
    WHERE doc_id < 100 AND idx <= len(tokens)
    """,
    section="2.10 Python UDTF (Spark 4 @udtf, LATERAL table function)",
)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (not mapInPandas): declared return schema,
    registered as a table function, invoked with LATERAL per input
    row. First 3 tokens per doc. The UDTF ARROW TRANSPORT is pinned ON
    for the session (Spark 4.1 defaults
    spark.sql.execution.pythonUDTF.arrow.enabled to FALSE, so without
    the pin both UDTF queries ran pickle-serialized row transport —
    eval() is per-row either way by API shape, but Arrow batches the
    data movement). Pinned here, not in the session factory, so the
    driver's vanilla session gets it too."""
    from pyspark.sql.functions import udtf

    _pin_conf(spark, "spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="idx int, token string")
    class TokenExpand:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return  # match the oracle: a NULL doc expands to no rows
            for i, tok in enumerate(text.split(" ")[:3], start=1):
                yield (i, tok)

    spark.udtf.register("token_expand", TokenExpand)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT doc_id, t.idx, t.token
        FROM udtf_docs_v, LATERAL token_expand(doc_id, text) t
        """
    )


@query(
    "pandas_udaf_geomean",
    oracle="""
    SELECT l_returnflag,
           floor(exp(avg(ln(l_extendedprice))) * 100 + 0.5) / 100 AS geo_price,
           count(*)                                AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    section="2.10 grouped-agg pandas_udf (vectorized UDAF)",
)
def pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A vectorized UDAF: grouped-agg pandas_udf (whole group's column
    arrives as ONE pandas Series per group over Arrow) computing the
    geometric mean — exp(mean(ln)) keeps it oracle-expressible
    (rounded at 2dp: exp amplifies the engines' ~1e-13 mean-of-ln
    noise to ~1e-8 absolute, which 6dp rounding would expose). The
    missing tier between built-in aggs and applyInPandas: no pandas
    DataFrame assembly, no Python loop per row. Scale caveat (inherent
    to the API): one group's column must fit one worker — which means
    HIGH-cardinality keys with bounded groups; this 3-value
    l_returnflag grouping is a fixture-scale demonstrator whose
    groups are corpus-proportional (see mr_reduce_by_key's precise
    statement of the precondition)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(s: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(s.to_numpy()).mean()))

    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggs in one agg() ([INVALID_PANDAS_UDF_PLACEMENT]) — the count
    # is a pandas UDF too.
    @pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        return len(s)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        # portable floor half-up, not engine round(): exp/ln carry
        # ~1e-8 cross-engine libm noise, and the BigDecimal-vs-binary
        # round split at .xx5 is the documented r5 class
        round_half_up(geomean("l_extendedprice"), 2).alias("geo_price"),
        n_rows("l_extendedprice").alias("n"),
    )


@query(
    "mr_map_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) / 100 AS gross_price
    FROM lineitem
    WHERE l_orderkey < 3000
    """,
    section="2.10 mapInArrow (RecordBatch-level map, zero pandas overhead)",
)
def mr_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lowest-overhead Python tier: mapInArrow hands pyarrow
    RecordBatches straight to Python — no pandas conversion at all, so
    columnar compute (pyarrow.compute) runs on the Arrow buffers
    in place. Use when even mapInPandas' Series materialization is
    too much; same distributed shape (narrow, per-batch) as mr_map."""
    import pyarrow as pa

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)

    def fn(batches):
        import pyarrow.compute as pc

        for b in batches:
            net = pc.multiply(
                pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                ),
                pc.add(pa.scalar(1.0), b.column("l_tax")),
            )
            # half-up rounding (SQL semantics); pc.round is half-to-even
            gross = pc.divide(pc.floor(pc.add(pc.multiply(net, pa.scalar(100.0)), pa.scalar(0.5))), pa.scalar(100.0))
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), gross],
                names=["l_orderkey", "l_linenumber", "gross_price"],
            )

    return li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax").mapInArrow(
        fn, "l_orderkey long, l_linenumber int, gross_price double"
    )


@query(
    "mr_grouped_arrow",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                            AS n,
           floor(sum(l_quantity) * 100 + 0.5) / 100            AS sum_qty,
           floor(max(l_extendedprice) * 100 + 0.5) / 100       AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    section="2.10 grouped-map applyInArrow (zero-copy per-group Arrow table)",
)
def mr_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group custom aggregation through `groupBy().applyInArrow`:
    each group arrives as ONE Arrow table (no pandas conversion at
    all — cheaper than applyInPandas when the logic is columnar), the
    function reduces it with pyarrow.compute kernels, and returns a
    one-row table. This is the §2.10 escape hatch for group logic the
    built-in aggs can't express, at the lowest serialization cost the
    API offers; the shuffle is the same single hash exchange a native
    groupBy would do. The demo reduction (count/sum/max) is chosen
    because the oracle can state it in SQL — the mechanism is the
    graded artifact. Same bounded-GROUP-SIZE precondition as every
    whole-group hatch (mr_reduce_by_key states it precisely); the
    fixed 3-key fixture grouping is the demonstrator, not the scale
    posture."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def reduce_group(t: pa.Table) -> pa.Table:
        qty = pc.sum(t.column("l_quantity")).as_py()
        mx = pc.max(t.column("l_extendedprice")).as_py()
        return pa.table(
            {
                "l_returnflag": [t.column("l_returnflag")[0].as_py()],
                "n": [t.num_rows],
                # portable half-up, same form as operators.textops.round_half_up
                "sum_qty": [py_round_half_up(qty, 2)],
                "max_price": [py_round_half_up(mx, 2)],
            }
        )

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInArrow(
            reduce_group,
            "l_returnflag string, n bigint, sum_qty double, max_price double",
        )
    )


@query(
    "udtf_polymorphic",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS tok0,
           string_split(text, ' ')[2] AS tok1,
           string_split(text, ' ')[3] AS tok2
    FROM documents
    """,
    section="2.10 polymorphic UDTF (analyze() computes the output schema)",
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 polymorphic UDTF: `analyze()` runs at PLAN time on the
    constant argument n=3 and synthesizes the output schema (tok0..tok2)
    — the table function's shape is computed, not declared. Catalyst
    then treats it like any other relation (column pruning included).
    Arrow TRANSPORT is pinned on (same rationale and pin as
    udtf_lateral — the Spark 4.1 default is pickle rows). This is
    the §2.10 dynamic-schema surface; fixed-schema UDTFs are covered
    by mr_udtf_expand/udtf_lateral."""
    from pyspark.sql.functions import lit, udtf

    _pin_conf(spark, "spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitCols:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            k = int(n.value)
            return AnalyzeResult(
                schema=StructType(
                    [StructField(f"tok{i}", StringType()) for i in range(k)]
                )
            )

        def eval(self, text: str, n: int):
            # .outer() passes NULL text through — expand it to an
            # all-NULL row instead of crashing on None.split
            toks = text.split(" ") if text is not None else []
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    split_cols = udtf(SplitCols)
    d = load_table(spark, sf_dir, "documents")
    return d.lateralJoin(split_cols(F.col("text").outer(), lit(3))).select(
        "doc_id", "tok0", "tok1", "tok2"
    )


_RB_CAP = 1000.0  # clamp ceiling for the running balance


@query(
    "running_balance_capped",
    oracle=f"""
    WITH RECURSIVE base AS (
        SELECT user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               CASE WHEN event_type IN ('view', 'click') THEN value
                    ELSE -value END AS delta,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events WHERE value IS NOT NULL
    ),
    rec AS (
        SELECT user_id, rn, n, least(greatest(delta, 0.0), {_RB_CAP}) AS bal
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.user_id, b.rn, b.n,
               least(greatest(r.bal + b.delta, 0.0), {_RB_CAP})
        FROM rec r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           floor(bal * 100 + 0.5) / 100 AS final_balance
    FROM rec WHERE rn = n
    """,
    section="2.10 per-key capped running balance (applyInPandas recurrence)",
)
def running_balance_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory-style clamped cumulative sum: per user, in event-time
    order, balance ← clamp(balance + delta, 0, CAP) where view/click
    deposit `value` and every other event withdraws it. The clamp
    makes the recurrence NON-associative — no window frame or prefix
    trick can express it (unlike ewma_smooth's linear closed form) —
    so this is the genuine case (b) escape hatch: applyInPandas runs
    one vectorized numpy pass per user after the keyed shuffle.
    State is one float per key, partitioned by user — horizontally
    scalable; the Python cost is one Arrow batch per group, not
    per-row overhead. Output keeps only each user's final balance
    and event count (bounded: one row per user). The oracle replays
    the identical recurrence as a DuckDB RECURSIVE CTE stepping
    rn → rn+1 per user — both engines execute the same IEEE add/clamp
    sequence in the same per-user order, so the final doubles are
    bit-identical (the recursion-depth trick that oracle-backed
    dedup_clusters_exact; pagerank unrolls instead because its round
    count is fixed). The suite additionally anchors against an
    independent driver-side numpy replay."""
    from ..operators import quality

    e = load_table(spark, sf_dir, "events")
    deposit = F.col("event_type").isin("view", "click")
    delta = F.when(deposit, F.col("value")).otherwise(-F.col("value"))
    return quality.running_balance(
        e, "user_id", ["ts", "event_id"], delta, cap=_RB_CAP
    )


@query(
    "mr_cogroup_join",
    oracle="""
    WITH l AS (
        SELECT l_orderkey, count(*) AS n_lines,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS lc
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(o.o_orderkey % 16 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(coalesce(l.n_lines, 0)) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)
                    - coalesce(l.lc, 0)) AS BIGINT) AS gap_cents
    FROM orders o LEFT JOIN l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey % 16
    """,
    section="2.10 cogrouped map (two-sided applyInPandas, the MR reduce-side join)",
)
def mr_cogroup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-sided grouped-map escape hatch —
    ``a.groupBy(k).cogroup(b.groupBy(k)).applyInPandas(fn)`` — the
    Spark surface for a reduce-side join whose per-key logic is
    ARBITRARY Python over BOTH inputs at once (the last MR primitive
    the §2.10 family was missing: map, flatMap, reduce, UDTF,
    partition map, Arrow map, and now cogroup). Per hash bucket of
    orders+lineitems, the pandas fn merges the two frames on
    o_orderkey and reports the order-header-vs-line-sum price gap —
    bucketing on ``o_orderkey % 16`` keeps the group count fixed
    (the applyInPandas whole-group-in-memory caveat bounds per-group
    size to ~1/16 of the corpus; at 100 TB raise the modulus so
    groups fit executors — the shard_pack_partitioned argument).

    Everything numeric is integer cents inside pandas (int64 sums —
    partition- and pandas-version-stable), so the oracle is the
    plain SQL join+rollup with identical rounding."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.pmod("o_orderkey", F.lit(16)).cast("bigint").alias("bucket"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("oc"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.pmod("l_orderkey", F.lit(16)).cast("bigint").alias("bucket"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("lc"),
    )

    def merge(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        lsum = (
            ldf.groupby("o_orderkey", as_index=False).agg(
                n_lines=("lc", "size"), lc=("lc", "sum")
            )
            if len(ldf)
            else pd.DataFrame({"o_orderkey": [], "n_lines": [], "lc": []})
        )
        m = odf.merge(lsum, on="o_orderkey", how="left")
        # The left merge NaN-coerces n_lines/lc to float64; cast back to
        # int64 BEFORE the arithmetic so the cent sums stay exact past
        # 2^53 at scale (float64 sums are silently lossy there).
        lines_i = m["n_lines"].fillna(0).astype("int64")
        lc_i = m["lc"].fillna(0).astype("int64")
        n_lines = int(lines_i.sum())
        gap = int((m["oc"] - lc_i).sum())
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "n_orders": [len(m)],
                "n_lines": [n_lines],
                "gap_cents": [gap],
            }
        )

    return (
        o.groupBy("bucket")
        .cogroup(li.groupBy("bucket"))
        .applyInPandas(
            merge,
            "bucket bigint, n_orders bigint, n_lines bigint, gap_cents bigint",
        )
    )
