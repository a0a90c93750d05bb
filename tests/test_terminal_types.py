"""Authoring-time terminal-type lint (the r7 decimal-trap regression
gate). The driver's order-insensitive value hash canonicalizes
DECIMAL-typed output cells differently per engine even when the values
are bit-identical (CORRECTNESS_r07: rows/schema green, hash red on
exactly the DECIMAL-terminal family). These tests make that class of
failure impossible to re-introduce: every registered query's TERMINAL
schema must use only the proven hash-safe types, and the local
differential replica must reject Decimal cells outright."""

from __future__ import annotations

import decimal

import pytest

from pydra_map_reduce_spark.plans.registry import assert_hash_safe_schema

# The positive direction — every registered oracle-backed query's
# terminal schema is hash-safe — is asserted inside
# tests/test_correctness.py::test_differential, which already builds
# each query's frame (re-building all ~240 here would double the
# suite's plan-construction cost for zero extra coverage). This file
# holds the negative probes proving the guard actually rejects.


def test_decimal_terminal_rejected(spark):
    """A DECIMAL-terminal frame must be rejected by the lint — the
    exact shape that went driver-red in r7."""
    df = spark.range(3).selectExpr("CAST(id AS DECIMAL(18,2)) AS money")
    with pytest.raises(TypeError, match="non-hash-safe"):
        assert_hash_safe_schema(df, "decimal_probe")


def test_decimal_cell_rejected_by_canon_val():
    """The local replica's cell canonicalizer must FAIL on Decimal
    instead of passing it through (it compared raw Decimals equal in
    r7 while the driver's hash diverged)."""
    from .test_correctness import canon_val

    with pytest.raises(AssertionError, match="non-hash-safe"):
        canon_val(decimal.Decimal("1.50"))


def test_nested_decimal_rejected(spark):
    """Container terminals are rejected AS CONTAINERS (r8 tightening):
    even array-of-safe-atomic crashed the driver's pandas
    canonicalizer, so the lint no longer recurses — any top-level
    array/struct/map is an error."""
    df = spark.range(3).selectExpr(
        "array(CAST(id AS DECIMAL(10,2))) AS monies",
        "named_struct('v', CAST(id AS DECIMAL(10,2))) AS rec",
    )
    with pytest.raises(TypeError) as exc:
        assert_hash_safe_schema(df, "nested_probe")
    msg = str(exc.value)
    assert "monies" in msg and "rec" in msg and "non-atomic" in msg


def test_array_of_atomic_terminal_rejected(spark):
    """The exact r8 driver red: inverted_index exposed array<bigint>
    and the driver's pandas sort_values threw `unhashable type:
    'list'`. Array-of-SAFE-atomic must now be rejected too — the
    previous lint codified this known hazard as safe."""
    df = spark.range(3).selectExpr("array(id, id + 1) AS doc_ids")
    with pytest.raises(TypeError, match="non-atomic"):
        assert_hash_safe_schema(df, "array_probe")


def test_container_cell_rejected_by_canon_val():
    """The replica's cell canonicalizer must FAIL on list cells
    instead of tupling them (it compared list cells fine locally in
    r8 while the driver crashed on them)."""
    from .test_correctness import canon_val

    with pytest.raises(AssertionError, match="container cell"):
        canon_val([1, 2, 3])
    with pytest.raises(AssertionError, match="container cell"):
        canon_val({"k": 1})
    # The full-registry sweep (zero non-atomic terminals across every
    # registered plan) is covered by the suite itself: every
    # oracle-backed query passes through assert_hash_safe_schema in
    # test_differential and every rows-only query in test_rows_only.
