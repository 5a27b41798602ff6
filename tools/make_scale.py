#!/usr/bin/env python
"""Tile an existing testdata SF directory N× into a larger one.

The driver ships sf{0.001,0.01,0.1}; the perf story above sf0.1 (the
"Spark's ~0.2-0.5 s/query scheduling floor amortizes at scale" claim in
BASELINE.md) needs at least one in-repo datapoint at a larger SF
(VERDICT r10 task 3).  This produces an sf1-shaped directory from sf0.1
by tiling each fact table 10× with disjoint key ranges:

- every BIGINT key column shifts by ``i * STRIDE`` per copy, applied
  consistently on both sides of each FK (l_orderkey/o_orderkey,
  o_custkey/c_custkey, l_suppkey/s_suppkey, l_partkey/p_partkey), so
  join fan-outs match real TPC-H scaling (supplier also tiles 10×, as
  TPC-H does);
- ``s_name``/``c_name`` get a per-copy suffix so per-entity group
  cardinality scales with the data instead of collapsing 10 copies
  into one group;
- ``region``/``nation`` stay fixed (TPC-H dims are constant-size);
- ``documents`` texts are tiled verbatim: every doc gains ~9 exact
  near-duplicates, which is the realistic (and adversarial) shape for
  the dedup benchmarks, not a flaw.

Usage:  python tools/make_scale.py [src_dir] [dst_dir] [copies]
Defaults: /root/testdata/sf0.1 /tmp/sf1data 10
"""
from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 100_000_000  # larger than any sf0.1 key range

# per-table: (shift columns, name-suffix columns)
SPEC: dict[str, tuple[list[str], list[str]]] = {
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], []),
    "orders": (["o_orderkey", "o_custkey"], []),
    "customer": (["c_custkey"], ["c_name"]),
    "part": (["p_partkey"], ["p_name"]),
    "supplier": (["s_suppkey"], ["s_name"]),
    "events": (["event_id", "user_id"], []),
    "documents": (["doc_id"], []),
    "embeddings": (["vec_id"], []),
    "region": ([], []),  # fixed dims: copied once, not tiled
    "nation": ([], []),
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1data"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, (shifts, suffixes) in SPEC.items():
        f = f"{src}/{table}.parquet"
        out = f"{dst}/{table}.parquet"
        if not shifts and not suffixes:
            con.execute(
                f"COPY (SELECT * FROM '{f}') TO '{out}' (FORMAT parquet)"
            )
            continue
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM '{f}'").fetchall()
        ]
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"CAST({c} + i * {STRIDE} AS BIGINT) AS {c}")
            elif c in suffixes:
                sel.append(
                    f"CASE WHEN i = 0 THEN {c} "
                    f"ELSE {c} || '#' || i::VARCHAR END AS {c}"
                )
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{f}' "
            f"CROSS JOIN range({copies}) t(i)) TO '{out}' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
