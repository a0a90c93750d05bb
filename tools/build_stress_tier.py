#!/usr/bin/env python
"""Build the derived ~10x stress fixture (VERDICT r12 next #4).

Usage: python tools/build_stress_tier.py [out_dir] [copies]

Unions /root/testdata/sf0.1 with key-shifted copies into <out_dir>
(default /tmp/pydra_sf1, 10 copies -> ~sf1). TESTDATA.md forbids
writing under /root/testdata, so the tier lives in scratch space and
is rebuilt on demand (~seconds via DuckDB) rather than committed.

Shift rules keep referential integrity and realistic statistics:
- every key column shifts by copy_i * (max_key + 1), consistently
  across fact/dim tables, so joins land exactly as in the base tier;
- `documents.text` word-suffixes every token with `_i` for copies
  i > 0: the copy shares NO tokens/shingles with the base corpus, so
  dedup/LSH workloads scale by corpus size at the BASE duplicate
  rate instead of drowning in synthetic 10-way exact clusters (a
  corpus that is 90% duplicates would stress only the pair-explosion
  path, which the banded-join design bounds anyway);
- `embeddings.embedding` gets a deterministic small per-copy offset
  (+0.001 * i per component) — neighbor structure stays realistic,
  vectors stay distinct;
- nation/region stay fixed (TPC-H scales them sublinearly too).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> list of key columns to shift by copy_i * (max+1)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key -> the table that owns it (for max lookup)
OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pydra_sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    strides = {
        k: con.execute(
            f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        for k, (t, col) in OWNER.items()
    }
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, keys in KEYS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(copies):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i} * {strides[c]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    exprs.append(
                        "array_to_string(list_transform(string_split(text, ' '),"
                        f" x -> x || '_{i}'), ' ') AS text"
                    )
                elif t == "documents" and c == "n_chars" and i > 0:
                    exprs.append(
                        "CAST(length(array_to_string(list_transform("
                        f"string_split(text, ' '), x -> x || '_{i}'), ' ')) "
                        "AS BIGINT) AS n_chars"
                    )
                elif t == "embeddings" and c == "embedding" and i > 0:
                    exprs.append(
                        "list_transform(embedding, "
                        f"x -> CAST(x + {i} * 0.001 AS FLOAT)) AS embedding"
                    )
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{SRC}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"stress tier written to {out}")


if __name__ == "__main__":
    main()
