"""Local replica of the driver's differential gate (SURVEY.md §5.2-5.4).

For every registered query: run the Spark plan and the DuckDB oracle
at sf0.01 and compare row count, sorted column names, and the full
order-insensitive multiset of canonicalized values. Rows-only queries
(oracle=None) are checked for successful execution and sane shape.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pydra_map_reduce_spark.plans import REGISTRY
from pydra_map_reduce_spark.plans.registry import assert_hash_safe_schema

from .conftest import SF_DIR


def canon_val(v):
    """Canonicalize a cell so Spark and DuckDB values compare equal.

    Any cell type outside the proven hash-safe set — decimal.Decimal
    foremost — is a hard FAILURE, not a pass-through: the driver's
    value hash canonicalizes such cells differently per engine even
    when they compare equal here (the r7 decimal trap, where this
    replica was green and the driver ledger red). Failing at
    authoring time forces terminal casts; see
    plans/registry.py:assert_hash_safe_schema for the schema-level
    twin of this guard."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            # TAGGED sentinel: NULL-vs-NaN disagreements between the
            # engines must FAIL, not silently compare equal to None —
            # and a genuine VARCHAR cell 'NaN' must not collide with a
            # float NaN either (the bool-tag rationale)
            return ("float", "NaN")
        # collapse ulp-level diffs that survive in-query round(); the
        # +0.0 normalizes -0.0 so the repr-keyed multiset sort can't
        # misalign two frames whose cells all compare == (repr(-0.0)
        # sorts before repr(0.0) but -0.0 == 0.0). TAGGED like bool:
        # a Spark BIGINT 3 vs an oracle DOUBLE 3.0 is a type
        # disagreement the driver's typed pandas canonicalization
        # sees (int64 vs float64 columns) — 3 == 3.0 in bare Python
        # would green the exact replica-green/driver-red gap the bool
        # tag closed (and the r10 driver_sim rewrite now reds).
        return ("float", round(v, 9) + 0.0)
    if isinstance(v, bool):
        # DISTINCT from int: True == 1 in Python, so without the tag a
        # Spark boolean column silently compares equal to an oracle
        # CASE WHEN ... THEN 1 integer — a type disagreement a typed
        # driver canonicalization would fail. The tag also keeps the
        # repr-based multiset sort aligned across the two sides.
        return ("bool", v)
    if isinstance(v, int):
        return v
    if isinstance(v, (str, bytes)):
        return v
    if isinstance(v, (list, tuple, dict, set)):
        # Round-8 driver red (inverted_index): the DRIVER's pandas
        # canonicalizer crashes sorting list cells, so a container that
        # this replica happily tuples is a latent driver err. The safe
        # set must model what the driver survives — fail at authoring
        # time and serialize (array_join / to_json) instead.
        raise AssertionError(
            f"container cell {type(v).__name__} ({v!r}): the driver's "
            "pandas canonicalizer cannot sort container cells — "
            "serialize the terminal column (array_join/to_json)"
        )
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return canon_val(v.item())
    raise AssertionError(
        f"non-hash-safe cell type {type(v).__name__} ({v!r}): the driver's "
        "value hash canonicalizes this ambiguously — cast the terminal "
        "column to BIGINT minor units, rounded DOUBLE, or STRING"
    )


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_val(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", _ORACLE)
def test_differential(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_DIR)
    # authoring-time terminal-type lint (the r7 decimal trap): the
    # driver's value hash only canonicalizes a proven-safe type set
    assert_hash_safe_schema(sdf, name)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    sc, dc = canon_rows(scols, srows), canon_rows(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


def test_streaming_late_drop_excludes_late_row(spark):
    """The append-mode watermark query must finalize the 10:00 window
    WITHOUT the late 10:20 event: exactly one row, count 2 (a count of
    3 means the watermark failed to drop the late record)."""
    rows = REGISTRY["streaming_late_drop"].fn(spark, SF_DIR).collect()
    # window_start is now a STRING rendered inside the UTC-pinned
    # session (a raw timestamp terminal shifts through collect()'s
    # OS-local datetime on non-UTC hosts)
    got = [(r["window_start"], r["n"]) for r in rows]
    assert got == [("2024-01-01 10:00:00", 2)], got


def test_late_drop_batch_matches_streaming_sink(spark):
    """The oracle-backed late_drop_batch twin must equal the streaming
    sink's append-mode content row for row — closing the stream ≡
    batch ≡ oracle chain for the watermark-drop proof (the
    tumbling_count_batch pattern). The twin returns a timestamp
    window_start; the streaming form renders a UTC string (its anchor
    compares literals), so the batch side formats for the compare."""
    stream = [
        (r["window_start"], r["n"])
        for r in REGISTRY["streaming_late_drop"].fn(spark, SF_DIR).collect()
    ]
    # Format IN-ENGINE under the pinned UTC session timezone: collect()
    # converts timestamps through the driver's OS timezone, so a
    # driver-side strftime would shift the string on a non-UTC host
    # and fail this assert spuriously (r12 advice).
    from pyspark.sql import functions as F

    batch = [
        (r["ws"], r["n"])
        for r in REGISTRY["late_drop_batch"]
        .fn(spark, SF_DIR)
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "n",
        )
        .collect()
    ]
    assert stream == batch == [("2024-01-01 10:00:00", 2)], (stream, batch)


def test_streaming_dedup_batch_matches_streaming(spark):
    """The oracle-backed streaming_dedup_batch twin and the stateful
    streaming dedup must agree on the survivor count (the batch
    distinct-id count), and the twin's bookkeeping must balance:
    injected duplicates in, exactly the unique ids out."""
    stream_row = tuple(REGISTRY["streaming_dedup"].fn(spark, SF_DIR).first())
    twin = REGISTRY["streaming_dedup_batch"].fn(spark, SF_DIR).first()
    assert stream_row == (twin["n_after_dedup"], twin["n_after_dedup"]), (
        stream_row, dict(twin.asDict()),
    )
    assert twin["n_input"] - twin["n_injected"] == twin["n_after_dedup"]
    assert twin["n_injected"] > 0


def test_stream_join_matches_batch_anchor(spark):
    """The watermarked stream-stream attribution join must produce the
    same summary as its registered batch twin. The anchor IS the
    oracle-backed `stream_stream_join_batch` registry entry — not an
    inline copy of its plan — so the stream ≡ batch ≡ oracle chain
    stays closed by construction: editing the twin moves this anchor
    with it instead of leaving a stale duplicate passing silently."""
    stream_row = tuple(REGISTRY["streaming_stream_join"].fn(spark, SF_DIR).first())
    batch_row = tuple(REGISTRY["stream_stream_join_batch"].fn(spark, SF_DIR).first())
    assert stream_row == batch_row and stream_row[0] > 0, (stream_row, batch_row)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(name, spark):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_DIR)
    # rows-only queries skip the oracle but NOT the terminal-type lint:
    # one of them gaining an oracle later (or the driver hashing them)
    # must not re-discover the r7 decimal trap
    assert_hash_safe_schema(sdf, name)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0


def test_parquet_sink_matches_batch_anchor(spark):
    """The streaming parquet file sink must land exactly the rows the
    batch filter selects: read-back summary == batch summary."""
    from pyspark.sql import functions as F

    from pydra_map_reduce_spark.sources.tables import load_table

    stream_row = tuple(REGISTRY["streaming_parquet_sink"].fn(spark, SF_DIR).first())
    batch_row = tuple(
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0)
            .alias("sum_value"),
        )
        .first()
    )
    assert stream_row == batch_row and stream_row[0] > 0, (stream_row, batch_row)


def test_streaming_tumbling_matches_batch_anchor(spark):
    """Complete-mode streaming tumbling counts == batch window agg,
    row for row."""
    from pyspark.sql import functions as F

    from pydra_map_reduce_spark.sources.tables import load_table

    stream = sorted(
        tuple(r) for r in REGISTRY["streaming_tumbling_count"].fn(spark, SF_DIR).collect()
    )
    batch = sorted(
        tuple(r)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    )
    assert stream == batch and len(stream) > 0, (len(stream), len(batch))


def test_streaming_session_matches_batch_anchor(spark):
    """Complete-mode streaming session windows == the identical
    session_window agg run in batch mode, row for row."""
    from pyspark.sql import functions as F

    from pydra_map_reduce_spark.sources.tables import load_table

    stream = sorted(
        tuple(r) for r in REGISTRY["streaming_session_window"].fn(spark, SF_DIR).collect()
    )
    batch = sorted(
        tuple(r)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("sess_start"),
            F.col("sw.end").alias("sess_end"),
            "n_events",
        )
        .collect()
    )
    assert stream == batch and len(stream) > 0, (len(stream), len(batch))


def test_streaming_dedup_matches_batch_anchor(spark):
    """Watermarked stateful dedup on event_id must keep exactly the
    batch-distinct id count (and no duplicate survivors)."""
    from pyspark.sql import functions as F

    from pydra_map_reduce_spark.sources.tables import load_table

    stream_row = tuple(REGISTRY["streaming_dedup"].fn(spark, SF_DIR).first())
    n_distinct = (
        load_table(spark, SF_DIR, "events")
        .agg(F.countDistinct("event_id").alias("n"))
        .first()["n"]
    )
    assert stream_row == (n_distinct, n_distinct) and n_distinct > 0, (
        stream_row,
        n_distinct,
    )


def test_streaming_stateful_counter_matches_batch_anchor(spark):
    """GroupState per-user running counts must end at the batch
    per-user event counts, user for user."""
    from pyspark.sql import functions as F

    from pydra_map_reduce_spark.sources.tables import load_table

    stream = sorted(
        tuple(r) for r in REGISTRY["streaming_stateful_counter"].fn(spark, SF_DIR).collect()
    )
    batch = sorted(
        tuple(r)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert stream == batch and len(stream) > 0, (len(stream), len(batch))


def test_foreach_batch_matches_batch_anchor(spark):
    """The foreachBatch parquet sink (epoch-partitioned, idempotent
    overwrite) must land exactly the rows the batch filter selects."""
    from pyspark.sql import functions as F

    from pydra_map_reduce_spark.sources.tables import load_table

    stream_row = tuple(REGISTRY["streaming_foreach_batch"].fn(spark, SF_DIR).first())
    batch_row = tuple(
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "signup")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("event_id").alias("n_ids"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .first()
    )
    assert stream_row == batch_row and stream_row[0] > 0, (stream_row, batch_row)


def test_streaming_static_join_matches_batch_anchor(spark):
    """The stream-static broadcast enrichment must equal its
    registered batch twin, segment for segment. The anchor IS the
    oracle-backed `stream_static_join_batch` registry entry (not an
    inline plan copy) — same closed-chain rationale as
    test_stream_join_matches_batch_anchor."""
    stream = sorted(
        tuple(r) for r in REGISTRY["streaming_static_join"].fn(spark, SF_DIR).collect()
    )
    batch = sorted(
        tuple(r)
        for r in REGISTRY["stream_static_join_batch"].fn(spark, SF_DIR).collect()
    )
    assert stream == batch and len(stream) > 0, (len(stream), len(batch))


def test_streaming_stateful_max_matches_batch_anchor(spark):
    """The state-API-v2 running max must equal batch groupBy max over
    the same events — full equality, not just shape."""
    from pyspark.sql import functions as F

    from pydra_map_reduce_spark.sources.tables import load_table

    got = {
        r["user_id"]: r["max_value"]
        for r in REGISTRY["streaming_stateful_max"].fn(spark, SF_DIR).collect()
    }
    want = {
        r["user_id"]: r["mx"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.max("value").alias("mx"))
        .collect()
    }
    assert got == want


def test_waiting_suppliers_twins_agree(spark):
    """The Q21 aggregate formulation must reproduce the EXISTS/NOT-
    EXISTS form's output exactly (same twin contract as the LSH pair)."""
    a = sorted(
        tuple(r) for r in REGISTRY["waiting_suppliers"].fn(spark, SF_DIR).collect()
    )
    b = sorted(
        tuple(r) for r in REGISTRY["waiting_suppliers_agg"].fn(spark, SF_DIR).collect()
    )
    assert a == b


def test_running_balance_capped_matches_numpy_anchor(spark):
    """The applyInPandas recurrence must equal an independent
    driver-side replay of the same clamped cumsum over the raw
    events — full equality per user."""
    from pydra_map_reduce_spark.plans.mapreduce import _RB_CAP
    from pydra_map_reduce_spark.sources.tables import load_table

    got = {
        r["user_id"]: (r["n_events"], r["final_balance"])
        for r in REGISTRY["running_balance_capped"].fn(spark, SF_DIR).collect()
    }
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts", "event_type", "value")
        .collect()
    )
    from collections import defaultdict

    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append(r)
    want = {}
    for uid, evs in per_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        bal = 0.0
        for r in evs:
            d = r["value"] if r["event_type"] in ("view", "click") else -r["value"]
            bal = min(max(bal + d, 0.0), _RB_CAP)
        want[uid] = (len(evs), math.floor(bal * 100 + 0.5) / 100)
    assert got == want


def test_compression_ratio_matches_zlib_anchor(spark):
    """The compressibility gate is rows-only by necessity (no SQL
    zlib) — so anchor it EXACTLY: recompute every per-source summary
    driver-side with the same zlib level and banding and require full
    equality, not shape. zlib output is deterministic per level, so
    any divergence is an engine bug, not codec noise."""
    import zlib
    from collections import defaultdict

    from pydra_map_reduce_spark.sources.tables import load_table

    got = {
        r["source"]: tuple(r)[1:]
        for r in REGISTRY["compression_ratio_quality"].fn(spark, SF_DIR).collect()
    }
    rows = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, kept, bytes, comp, ratio_e4_sum
    for r in rows:
        b = (r["text"] or "").encode("utf-8")
        c = len(zlib.compress(b, 6))
        ratio_e4 = math.floor(c / len(b) * 10000 + 0.5) if b else 0
        a = acc[r["source"]]
        a[0] += 1
        a[1] += 1 if 2500 <= ratio_e4 <= 9500 else 0
        a[2] += len(b)
        a[3] += c
        a[4] += ratio_e4
    want = {
        s: (a[0], a[1], a[2], a[3], math.floor(a[4] / a[0] + 0.5) / 10000)
        for s, a in acc.items()
    }
    assert got == want and len(got) > 0


def test_observed_metrics_match_direct_agg(spark):
    """The observe()-collected metrics must equal a direct aggregation
    over the same table — the accumulator path loses nothing."""
    from pyspark.sql import functions as F

    from pydra_map_reduce_spark.sources.tables import load_table

    got = REGISTRY["observed_metrics"].fn(spark, SF_DIR).collect()[0]
    want = (
        load_table(spark, SF_DIR, "lineitem")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("bigint")).alias("qty_cents"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .collect()[0]
    )
    assert tuple(got) == tuple(want)
