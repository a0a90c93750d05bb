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
    """The lint must walk arrays/structs — a DECIMAL hiding inside a
    container is just as unhashable as a top-level one."""
    df = spark.range(3).selectExpr(
        "array(CAST(id AS DECIMAL(10,2))) AS monies",
        "named_struct('v', CAST(id AS DECIMAL(10,2))) AS rec",
    )
    with pytest.raises(TypeError) as exc:
        assert_hash_safe_schema(df, "nested_probe")
    msg = str(exc.value)
    assert "monies[]" in msg and "rec.v" in msg
