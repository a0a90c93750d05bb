"""Simulate the external driver's CORRECTNESS pass over the 50-query
window (SURVEY §3.2, memory: the ledger covers exactly the first 50
entries of ``queries()``).

Faithful to the driver's observed behavior where it matters:
- a VANILLA SparkSession — ``local[8]``, default 1 GB driver heap, no
  session factory, no tuned shuffle partitions (a query that OOMs or
  relies on factory conf passes the tuned suite but fails the ledger);
- results canonicalized THROUGH PANDAS ``sort_values`` (the layer that
  crashed on array cells in r8 — plain python tuple compares would
  mask that class entirely);
- per-query row-count / column-set / order-insensitive value
  comparison against the DuckDB oracle at sf0.01.

Run: ``python tools/driver_sim.py [n_queries]`` (default 50).
Prints one line per query and a final SUMMARY line; exit 1 on any red.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # the driver's canonicalization path: pandas lexsort over all
    # columns — this is exactly where a container/Decimal cell dies.
    # Float columns round to 9dp BEFORE the sort (the canon_val
    # convention: ulp-level diffs survive in-query round(), and an
    # unrounded sort could mis-align two frames whose values are
    # driver-equal, cascading misaligned-cell mismatches).
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    """Typed per-cell compare for OBJECT columns (strings, dates,
    Nones). DATE-typed terminals are driver-green since r4, but pandas
    has no date dtype: Spark's toPandas gives datetime.date objects —
    normalize to Timestamp before comparing (the r9 date_funcs2 false
    positive). NULL-vs-NaN is a RED, not a match: canon_val tags NaN
    with a distinct sentinel because the engines must agree on
    null-ness, so the sim must not green that class either."""
    import datetime as dt
    import math

    # bool is tagged BEFORE the == check: Python True == 1, but the
    # driver's typed canonicalization fails a boolean-vs-integer
    # terminal disagreement (the same reason canon_val tags bools) —
    # the sim must not green what the driver would red.
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return round(a, 9) == round(b, 9)
    try:
        if a == b:
            return True
    except (TypeError, ValueError):
        return False
    if isinstance(a, (dt.date, dt.datetime)) and isinstance(b, (dt.date, dt.datetime)):
        return pd.Timestamp(a) == pd.Timestamp(b)
    try:
        return bool(pd.isna(a)) and bool(pd.isna(b))
    except (TypeError, ValueError):
        return False


def _col_eq(sa: pd.Series, da: pd.Series) -> bool:
    """Column compare on the ORIGINAL dtypes — never through one
    promoted to_numpy() array, which (a) greens int-vs-float dtype
    mismatches (the HUGEINT/untyped-oracle-sum class the driver reds
    even when values compare equal) and (b) collapses BIGINTs past
    2^53 into lossy doubles on both sides."""
    ks = "i" if sa.dtype.kind == "u" else sa.dtype.kind
    kd = "i" if da.dtype.kind == "u" else da.dtype.kind
    # datetime family: normalize object-of-datetime.date (Spark DATE)
    # and any datetime64 RESOLUTION split (Spark toPandas gives [ns],
    # DuckDB .df() gives [us]) to comparable values. NOT .equals() —
    # that checks dtype identity and reds equal values stored at
    # different resolutions (the r10 yoy_growth false red).
    if {ks, kd} <= {"M", "O"} and "M" in (ks, kd):
        try:
            a, b = pd.to_datetime(sa), pd.to_datetime(da)
            return bool(((a == b) | (a.isna() & b.isna())).all())
        except (TypeError, ValueError):
            return False
    if ks != kd:
        return False
    if ks == "f":
        # both already 9dp-rounded by _canon; NaN==NaN (a NULL in a
        # float64 column is NaN on BOTH sides — a pandas rendering
        # limit shared with the real driver's pandas path)
        return bool(((sa == da) | (sa.isna() & da.isna())).all())
    if ks in ("i", "b"):
        return bool((sa == da).all())
    return all(_cell_eq(x, y) for x, y in zip(sa.tolist(), da.tolist()))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    # Slice the window from the FULL queries() order first — the real
    # ledger covers the literal first n entries, so a rows-only query
    # that sneaks into the window is a WASTED SLOT the sim must
    # surface, not silently skip past (which would green query n+1
    # that the driver never reaches).
    window_all = list(qs)[:n]
    wasted = [name for name in window_all if name not in osql]
    if wasted:
        print(f"WASTED SLOTS (rows-only in the driver window): {wasted}")
    window = [name for name in window_all if name in osql]
    reds = list(wasted)
    for name in window:
        try:
            s = _canon(qs[name](spark, SF).toPandas())
            d = _canon(con.execute(osql[name]).df())
            rows = len(s) == len(d)
            cols = list(s.columns) == list(d.columns)
            vals = rows and cols and all(
                _col_eq(s[c], d[c]) for c in s.columns
            )
            ok = rows and cols and vals
            print(f"{name}: rows={rows} cols={cols} vals={vals}", flush=True)
            if not ok:
                reds.append(name)
        except Exception:
            print(f"{name}: ERR\n{traceback.format_exc()}", flush=True)
            reds.append(name)
    # wasted slots are in reds but not in window — don't double-
    # subtract them from the green numerator
    greens = len(window) - len([r for r in reds if r in window])
    print(f"SUMMARY: {greens}/{len(window)} green; reds={reds}")
    return 1 if reds else 0


if __name__ == "__main__":
    sys.exit(main())
