"""Scalar function families. SURVEY.md §2.8.

All expressions are built-in Catalyst functions (JVM-side, whole-stage
codegen) — zero Python UDFs in this module, so every query here stays
in one codegen span per stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.textops import round_half_up
from ..sources.tables import load_table
from .registry import query


@query(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           lower(c_name)                                   AS lname,
           upper(c_mktsegment)                             AS useg,
           trim(concat(c_name, ' '))                       AS trimmed,
           substr(c_name, 1, 8)                            AS prefix,
           length(c_name)                                  AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1)           AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g')       AS masked,
           CASE WHEN c_name LIKE '%1' THEN 1 ELSE 0 END         AS like_ends_1,
           string_split(c_name, '#')[1]                    AS first_token
    FROM customer
    """,
    section="2.8 string family",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.trim(F.concat(F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        # LIKE with MIXED outcomes: every c_name starts 'Customer#',
        # so the old 'Customer#%' predicate was True on 100% of rows —
        # an engine with broken LIKE semantics would still pass; the
        # trailing-anchor '%1' splits the rows and pins both the %
        # wildcard and the literal-suffix match
        F.when(F.col("c_name").like("%1"), 1).otherwise(0).alias("like_ends_1"),
        F.split(F.col("c_name"), "#").getItem(0).alias("first_token"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                     AS yr,
           CAST(month(o_orderdate) AS INT)                    AS mo,
           CAST(day(o_orderdate) AS INT)                      AS dy,
           CAST(quarter(o_orderdate) AS INT)                  AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', o_orderdate,
                          TIMESTAMP '2000-01-01') AS BIGINT)  AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)       AS odate
    FROM orders
    """,
    section="2.8 date/time family",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
        # the date cast is exercised, then re-raised to timestamp so
        # this query ALSO covers the date->timestamp cast; DATE-typed
        # terminals themselves are driver-green since r4 (month_end in
        # date_funcs2 ships one, and registry._HASH_SAFE_ATOMIC lists
        # DateType)
        F.col("o_orderdate").cast("date").cast("timestamp").alias("odate"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                    AS r1,
           abs(l_discount - 0.05)                       AS adisc,
           CAST(floor(l_quantity) AS BIGINT)            AS fq,
           CAST(ceil(l_quantity / 7) AS BIGINT)         AS cq,
           round(pow(l_discount, 2), 6)                 AS disc_sq,
           round(sqrt(l_extendedprice), 4)              AS sqrt_price,
           round(ln(l_extendedprice + 1), 4)            AS log_price,
           round(exp(l_discount), 6)                    AS exp_disc
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
    section="2.8 math family",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.abs(F.col("l_discount") - 0.05).alias("adisc"),
        F.floor("l_quantity").alias("fq"),
        F.ceil(F.col("l_quantity") / 7).alias("cq"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("log_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)                                         AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)                 AS first_val,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS vec_sum,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 6) AS vec_max,
           len(list_distinct([label, label + 1, label]))          AS n_distinct_demo
    FROM embeddings
    """,
    section="2.8 array family (size/index/fold/distinct)",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops incl. fold (F.aggregate) — all JVM-side higher-order
    functions, no Python in the loop."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(F.array_max(dbl), 6).alias("vec_max"),
        F.size(
            F.array_distinct(F.array(F.col("label"), F.col("label") + 1, F.col("label")))
        )
        .cast("bigint")
        .alias("n_distinct_demo"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_type,
           count(*)                                                    AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           floor(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 10000 + 0.5) / 10000 AS avg_k
    FROM events
    GROUP BY event_type
    """,
    section="2.8 JSON extraction (events.props)",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        round_half_up(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) AS BIGINT)             AS n_keys
    FROM events
    WHERE event_id < 500
    """,
    section="2.8 map family (from_json -> map_keys/element_at)",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props parsed into MapType; element_at/map_keys exercise the map
    surface. The oracle COMPUTES n_keys from the JSON (json_keys
    cardinality) — an earlier form hardcoded the literal 1, which
    could never register a map_keys divergence."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
    )


@query(
    "string_funcs2",
    oracle="""
    SELECT c_custkey,
           upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2)) AS title_seg,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')     AS padded,
           reverse(c_name)                              AS rev_name,
           replace(c_name, 'Customer', 'Client')        AS swapped,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS lev_dist,
           CAST(instr(c_name, '#') AS BIGINT)           AS hash_pos
    FROM customer
    """,
    section="2.8 string family II (initcap/pad/reverse/replace/levenshtein/instr)",
)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.initcap(F.lower("c_mktsegment")).alias("title_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse("c_name").alias("rev_name"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Client")).alias("swapped"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("lev_dist"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
    )


@query(
    "date_funcs2",
    oracle="""
    SELECT o_orderkey,
           round(date_diff('month', TIMESTAMP '1995-01-01', o_orderdate)
                 + (day(o_orderdate) - 1) / 31.0, 0) AS months_approx,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)  AS plus3m,
           CAST(last_day(o_orderdate) AS DATE)                AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INT)            AS dow,
           CAST(weekofyear(o_orderdate) AS INT)               AS woy
    FROM orders WHERE o_orderkey < 2000
    """,
    section="2.8 date family II (add_months/last_day/dayofweek/weekofyear)",
)
def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date batch. months_approx intentionally uses the shared
    integer month-diff formula (Spark months_between has fractional
    semantics DuckDB lacks, so both sides compute the same explicit
    expression)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    month_diff = (
        (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    ).cast("double")
    approx = F.round(month_diff + (F.dayofmonth("o_orderdate") - 1) / 31.0, 0)
    return o.select(
        "o_orderkey",
        approx.alias("months_approx"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
    )


@query(
    "array_funcs2",
    oracle="""
    SELECT vec_id,
           len(list_intersect([label, label + 1, label + 2],
                              [label + 1, label + 2, label + 3]))       AS n_inter,
           array_to_string(list_sort(list_distinct([label + 2, label, label + 1, label])),
                           ',')                                         AS sorted_arr,
           array_to_string([label, label + 1] || [label + 10], ',')     AS concatenated,
           len(flatten([[label], [label + 1, label + 2]]))              AS flat_len,
           round(CAST(list_aggregate(list_slice(CAST(embedding AS DOUBLE[]), 1, 8),
                                     'sum') AS DOUBLE), 5)              AS head_sum
    FROM embeddings
    """,
    section="2.8 array family II (intersect/sort/concat/flatten/slice)",
)
def array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    lbl = F.col("label")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size(
            F.array_intersect(
                F.array(lbl, lbl + 1, lbl + 2), F.array(lbl + 1, lbl + 2, lbl + 3)
            )
        )
        .cast("bigint")
        .alias("n_inter"),
        # serialized via array_join: the external harness's pandas
        # canonicalizer cannot hash top-level ARRAY cells
        F.array_join(
            F.transform(
                F.array_sort(F.array_distinct(F.array(lbl + 2, lbl, lbl + 1, lbl))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("sorted_arr"),
        F.array_join(
            F.transform(
                F.concat(F.array(lbl, lbl + 1), F.array(lbl + 10)),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("concatenated"),
        F.size(F.flatten(F.array(F.array(lbl), F.array(lbl + 1, lbl + 2))))
        .cast("bigint")
        .alias("flat_len"),
        F.round(
            F.aggregate(F.slice(dbl, 1, 8), F.lit(0.0), lambda a, x: a + x), 5
        ).alias("head_sum"),
    )


@query(
    "split_part_funcs",
    oracle="""
    SELECT c_custkey,
           split_part(c_name, '#', 1)                       AS name_head,
           split_part(c_name, '#', 2)                       AS name_tail,
           CAST(len(string_split(c_name, '0')) - 1 AS INT)  AS n_zeros
    FROM customer
    """,
    section="2.8 string family III (split_part / occurrence count)",
)
def split_part_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_tail"),
        (F.size(F.split(F.col("c_name"), "0")) - 1).cast("int").alias("n_zeros"),
    )


@query(
    "regex_funcs",
    # Dialect note: DuckDB regexp_extract(s, re, group) matches Spark's
    # group semantics; regexp_matches ≡ Spark rlike (unanchored search).
    # Both engines use RE2-ish syntax for this subset — stick to
    # character classes and quantifiers, no lookarounds.
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1)                 AS digits,
           CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_digits,
           regexp_matches(c_name, '[02468]$')                    AS ends_even,
           regexp_replace(c_name, '[0-9]', '#', 'g')             AS masked
    FROM customer
    WHERE c_custkey < 200
    """,
    section="2.8 regex family (extract / extract_all count / rlike / replace)",
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: group extraction, match counting via
    extract_all, anchored rlike, and global replace. All JVM codegen
    expressions — regexes compile once per task, so this is scan-speed
    at any scale. The one dialect trap (bit round 2): DuckDB
    regexp_replace is first-match unless given the 'g' flag; Spark's
    is always global — the oracle must say 'g' explicitly."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), r"([0-9]+)", 1).alias("digits"),
        # direct builtin (not an F.expr SQL string): keeps the column
        # reference resolvable at authoring time
        F.size(F.regexp_extract_all(F.col("c_name"), F.lit(r"[0-9]"), F.lit(0)))
        .cast("int")
        .alias("n_digits"),
        # '[02468]$': MIXED outcomes over the fixture — every c_name
        # ends in a digit, so the old '[0-9]$' was True on 100% of
        # rows and an engine that ignored the $ anchor entirely would
        # still have matched (a vacuous anchor); even-digit endings
        # split the rows and genuinely pin the anchor semantics
        F.col("c_name").rlike(r"[02468]$").alias("ends_even"),
        F.regexp_replace(F.col("c_name"), r"[0-9]", "#").alias("masked"),
    )


@query(
    "bitwise_funcs",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_linenumber)                     AS and_all,
           bit_or(l_linenumber)                      AS or_all,
           bit_xor(l_linenumber)                     AS xor_all,
           CAST(sum(l_linenumber << 1) AS BIGINT)    AS sum_shifted,
           CAST(sum(l_linenumber & 1) AS BIGINT)     AS n_odd_mask
    FROM lineitem
    GROUP BY l_returnflag
    """,
    section="2.8 bitwise family (bit_and/or/xor aggs, shifts, masks)",
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate + scalar surface: the reducers (bit_and/or/
    xor — flag-intersection / flag-union / parity fingerprints) and
    per-row shifts and masks. Everything is whole-stage codegen
    integer math with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("and_all"),
        F.bit_or("l_linenumber").alias("or_all"),
        F.bit_xor("l_linenumber").alias("xor_all"),
        F.sum(F.shiftleft("l_linenumber", 1)).cast("bigint").alias("sum_shifted"),
        F.sum(F.col("l_linenumber").bitwiseAND(F.lit(1))).cast("bigint").alias("n_odd_mask"),
    )


@query(
    "nested_line_stats",
    oracle="""
    WITH nested AS (
        SELECT l_orderkey,
               list_sort(list(struct_pack(
                   ln := l_linenumber,
                   qty := CAST(round(l_quantity) AS BIGINT),
                   cents := CAST(round(l_extendedprice * 100) AS BIGINT)
               ))) AS lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(lines) AS INT)                             AS n_lines,
           CAST(list_sum(list_transform(lines, x -> x.qty)) AS BIGINT)
                                                               AS total_qty,
           CAST(list_sum(list_transform(lines, x -> x.cents)) AS DOUBLE) / 100
                                                               AS total_price,
           len(list_filter(lines, x -> x.qty >= 45)) > 0       AS has_bulk_line,
           lines[1].ln                                         AS first_line
    FROM nested
    """,
    section="2.8/2.2 nested record-array processing (collect struct array + HOFs)",
)
def nested_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-data surface: each order's line items collect into an
    ARRAY OF STRUCTS (the shape denormalized/nested parquet arrives
    in), and all per-order stats compute from the nested column with
    higher-order functions — transform, filter, element access —
    WITHOUT re-exploding. sort_array on struct arrays orders
    lexicographically by field position (l_linenumber first) in both
    engines, making array order deterministic; quantities and cent
    prices are bigints, so the HOF sums are integer-exact. One
    shuffle (the collect_list groupBy); everything after is a narrow
    codegen pass — the point at scale is that nested processing adds
    ZERO exchanges once the records are grouped."""
    li = load_table(spark, sf_dir, "lineitem")
    # qty ROUNDS-then-casts on BOTH sides: a bare Spark cast truncates
    # while DuckDB's bare double->BIGINT cast rounds, so the pair held
    # only on the fixture's integral-quantity luck; cents comes from
    # the one shared textops pair
    from ..operators.textops import cents as _cents

    rec = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
        _cents("l_extendedprice").alias("cents"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(rec)).alias("lines")
    )
    qty = F.transform("lines", lambda x: x.getField("qty"))
    cents = F.transform("lines", lambda x: x.getField("cents"))
    return nested.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.aggregate(qty, F.lit(0).cast("bigint"), lambda s, v: s + v).alias("total_qty"),
        (
            F.aggregate(cents, F.lit(0).cast("bigint"), lambda s, v: s + v).cast("double")
            / 100
        ).alias("total_price"),
        (F.size(F.filter("lines", lambda x: x.getField("qty") >= 45)) > 0).alias(
            "has_bulk_line"
        ),
        F.element_at("lines", 1).getField("ln").alias("first_line"),
    )


@query(
    "variant_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
    GROUP BY event_type
    """,
    section="2.8 VARIANT semi-structured path (parse_json / variant_get)",
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-4-native semi-structured path: props parses ONCE into
    a VARIANT column (binary-encoded, shredded — not a string re-parse
    per field access) and fields come out with `variant_get` typed
    paths. For hot multi-field JSON at 100 TB, variant decode beats
    repeated get_json_object string parsing; the filter on the
    extracted field stays codegen. Oracle states the same facts via
    DuckDB's JSON path functions."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") % 7 == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


@query(
    "try_arithmetic",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN CAST(floor(value) AS BIGINT) % 3 <> 0
                           THEN value END) AS BIGINT) AS n_div_ok,
           floor(sum(CASE WHEN CAST(floor(value) AS BIGINT) % 3 <> 0
                          THEN value / (CAST(floor(value) AS BIGINT) % 3)
                          END) * 100 + 0.5) / 100 AS sum_safe_div,
           CAST(count(TRY_CAST(event_type AS BIGINT)) AS BIGINT)
               AS n_type_casts,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.plan') AS BIGINT))
                AS BIGINT) AS sum_plan_nums
    FROM events WHERE value IS NOT NULL
    """,
    section="2.8 error-safe expressions (try_divide / try_cast NULL-on-failure)",
)
def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe arithmetic at corpus scale: `try_divide` turns
    division-by-zero into NULL instead of a job-killing exception
    (here: value over floor(value) mod 3, NULL whenever the mod is
    0), and `try_cast` turns malformed strings into NULL instead of
    failing the stage (a non-numeric event_type; a JSON field that
    is sometimes non-numeric). On a 100 TB run these are the
    difference between one poison record costing a retry storm and
    it costing one NULL — the jsonl_quarantine philosophy at the
    expression level. The oracle mirrors try_divide with an explicit
    zero-guard CASE (DuckDB raises on integer division by zero) and
    try_cast with TRY_CAST; counts of surviving rows are the
    evidence the NULL-on-failure semantics agree."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    mod3 = F.floor("value").cast("bigint") % 3
    safe_div = F.try_divide(F.col("value"), F.nullif(mod3, F.lit(0)))
    return e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count(F.when(mod3 != 0, F.col("value")))
        .cast("bigint")
        .alias("n_div_ok"),
        round_half_up(F.sum(safe_div), 2).alias("sum_safe_div"),
        F.count(F.expr("try_cast(event_type AS BIGINT)"))
        .cast("bigint")
        .alias("n_type_casts"),
        F.sum(
            F.expr("try_cast(get_json_object(props, '$.plan') AS BIGINT)")
        )
        .cast("bigint")
        .alias("sum_plan_nums"),
    )


@query(
    "map_funcs2",
    oracle="""
    SELECT event_id,
           CAST(2 * k + 1 AS BIGINT)     AS k_doubled,
           CAST((CASE WHEN k >= 50 THEN 1 ELSE 0 END)
              + (CASE WHEN lt >= 50 THEN 1 ELSE 0 END)
              + (CASE WHEN cents >= 50 THEN 1 ELSE 0 END) AS INT) AS n_big,
           CAST(3 * cents + 1 AS BIGINT) AS cents_tripled,
           'CENTS,K,LEN'                 AS keys_upper
    FROM (
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(length(event_type) AS BIGINT)                AS lt,
               CAST(round(value * 100) AS BIGINT)                AS cents
        FROM events WHERE event_id < 500 AND value IS NOT NULL
    )
    """,
    section="2.8 map family II (higher-order: transform_values/map_filter/map_zip_with/transform_keys)",
)
def map_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order half of the map surface `map_funcs` leaves
    untouched: build a 3-entry typed map per event (the JSON 'k', the
    event-type length, exact value cents), then exercise every map
    HOF — transform_values (v -> 2v+1), map_filter (v >= 50),
    map_zip_with (original + transformed), transform_keys (upper) —
    and project SCALAR witnesses of each (the element the transform
    touched, the filtered size, the zipped element, the sorted
    re-keyed key list). The oracle re-derives each witness by plain
    arithmetic on the three entry values — a DuckDB map runtime is
    unnecessary precisely because every HOF here is a pointwise
    integer function, which also keeps the comparison engine-exact.
    Whole-stage codegen throughout; one scan, no shuffle."""
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") < 500) & F.col("value").isNotNull()
    )
    k_val = F.element_at(
        F.from_json("props", T.MapType(T.StringType(), T.LongType())), "k"
    )
    m = F.create_map(
        F.lit("k"), k_val,
        F.lit("len"), F.length("event_type").cast("long"),
        F.lit("cents"), F.round(F.col("value") * 100).cast("long"),
    )
    tv = F.transform_values(m, lambda _, v: v * 2 + 1)
    flt = F.map_filter(m, lambda _, v: v >= 50)
    zw = F.map_zip_with(m, tv, lambda _, a, b: a + b)
    tk = F.transform_keys(m, lambda k, _: F.upper(k))
    return e.select(
        "event_id",
        F.element_at(tv, "k").alias("k_doubled"),
        F.size(flt).alias("n_big"),
        F.element_at(zw, "cents").alias("cents_tripled"),
        F.array_join(F.array_sort(F.map_keys(tk)), ",").alias("keys_upper"),
    )


@query(
    "array_funcs3",
    oracle="""
    SELECT o_orderkey,
           CAST(CASE WHEN m % 3 = 0 THEN n ELSE n // 3 END AS INT) AS n_div3,
           (m % 2 = 0)                                             AS all_even,
           CAST((n * n * n - n) / 3 AS BIGINT)                     AS idx_sum,
           CAST(CASE WHEN n >= 3 THEN 3 ELSE 0 END AS BIGINT)      AS pos3
    FROM (
        SELECT o_orderkey,
               o_orderkey % 6 + 2 AS n,
               o_orderkey % 5 + 1 AS m
        FROM orders WHERE o_orderkey < 1000
    )
    """,
    section="2.8 array family III (higher-order predicates: exists/forall/filter/indexed transform)",
)
def array_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order PREDICATE half of the array surface the two
    existing array queries leave untouched: per order, build
    arr = sequence(1, n) (n = o_orderkey%6+2) and its scaled form
    arr·m (m = o_orderkey%5+1), then exercise filter (multiples of
    3 in the scaled array), forall (all-even — true iff m is even),
    transform with the INDEX lambda ((x, i) -> x·i, summed by the
    fold), and array_position (position of 3 in arr). The oracle
    re-derives every witness in closed form over (n, m) — e.g. the
    0-based indexed transform sums Σ i·(i−1) = (n³−n)/3 — so the
    comparison is pure integer arithmetic. One scan, whole-stage
    codegen, no shuffle; the key-pruned o_orderkey < 1000 predicate
    pushes to the parquet scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    n = F.pmod("o_orderkey", F.lit(6)) + 2
    m = F.pmod("o_orderkey", F.lit(5)) + 1
    arr = F.sequence(F.lit(1).cast("long"), n.cast("long"))
    arr_m = F.transform(arr, lambda x: x * m)
    return o.select(
        "o_orderkey",
        F.size(F.filter(arr_m, lambda x: x % 3 == 0)).alias("n_div3"),
        F.forall(arr_m, lambda x: x % 2 == 0).alias("all_even"),
        F.aggregate(
            F.transform(arr, lambda x, i: x * i),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("idx_sum"),
        F.array_position(arr, 3).alias("pos3"),
    )
