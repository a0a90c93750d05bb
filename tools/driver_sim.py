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
    # columns — this is exactly where a container/Decimal cell dies
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    """DATE-typed terminals are driver-green since r4, but pandas has
    no date dtype: DuckDB's .df() renders DATE as datetime64 while
    Spark's toPandas gives datetime.date objects — normalize both to
    Timestamp before comparing so the sim doesn't flag a proven-safe
    type (the r9 date_funcs2 false positive)."""
    import datetime as dt

    # bool is tagged BEFORE the == check: Python True == 1, but the
    # driver's typed canonicalization fails a boolean-vs-integer
    # terminal disagreement (the same reason canon_val tags bools) —
    # the sim must not green what the driver would red.
    if isinstance(a, bool) != isinstance(b, bool):
        return False
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
                _cell_eq(a, b)
                for a, b in zip(
                    s.to_numpy().ravel().tolist(), d.to_numpy().ravel().tolist()
                )
            )
            ok = rows and cols and vals
            print(f"{name}: rows={rows} cols={cols} vals={vals}", flush=True)
            if not ok:
                reds.append(name)
        except Exception:
            print(f"{name}: ERR\n{traceback.format_exc()}", flush=True)
            reds.append(name)
    print(f"SUMMARY: {len(window) - len(reds)}/{len(window)} green; reds={reds}")
    return 1 if reds else 0


if __name__ == "__main__":
    sys.exit(main())
