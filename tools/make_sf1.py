#!/usr/bin/env python
"""Materialize an sf1-shaped dataset from the driver's sf0.1 tables.

/root/testdata is read-only and ships no sf1, so the scale-proof bench
replicates sf0.1 tenfold with disjoint key ranges per copy: every
foreign key is shifted by the same per-table stride as its parent's
primary key, so join fan-outs and group cardinalities scale the way a
real 10x data growth would (10x orders per customer region, 10x users,
10x documents). Fixed-size dimensions (region, nation) stay fixed,
exactly like TPC-H at higher scale factors.

Text/doc copies get a per-copy suffix token so the dedup workload sees
realistic near-duplicates (high-similarity 10-groups) instead of
degenerate exact 10-cliques.

Output: .data/sf1/*.parquet (gitignored). Usage:
    python tools/make_sf1.py [--out .data/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> (primary key to stride by, {fk_col: parent_table})
KEYED = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": ("l_orderkey", {"l_orderkey": "orders",
                                "l_partkey": "part",
                                "l_suppkey": "supplier"}),
    "events": ("event_id", {"user_id": None}),   # user_id strides by own max
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}
COPY_AS_IS = ["region", "nation"]


def stride_of(con, table: str, col: str) -> int:
    return con.sql(f"SELECT MAX({col}) + 1 FROM "
                   f"'{SRC}/{table}.parquet'").fetchone()[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".data/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_AS_IS:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                f"'{args.out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied as-is")

    strides = {t: stride_of(con, t, pk) for t, (pk, _) in KEYED.items()}
    user_stride = stride_of(con, "events", "user_id")

    for t, (pk, fks) in KEYED.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        exprs = []
        for c in cols:
            if c == pk or (c in fks and fks[c] == t):
                exprs.append(f"{c} + r.i * {strides[t]} AS {c}")
            elif c in fks and fks[c] is None:
                exprs.append(f"{c} + r.i * {user_stride} AS {c}")
            elif c in fks:
                exprs.append(f"{c} + r.i * {strides[fks[c]]} AS {c}")
            elif t == "documents" and c == "text":
                # near-dup (not exact-dup) copies for the dedup workload
                exprs.append("CASE WHEN r.i = 0 THEN text "
                             "ELSE text || ' v' || r.i END AS text")
            else:
                exprs.append(c)
        con.sql(f"""
            COPY (SELECT {', '.join(exprs)}
                  FROM '{SRC}/{t}.parquet', range({args.copies}) r(i))
            TO '{args.out}/{t}.parquet' (FORMAT PARQUET)""")
        n = con.sql(f"SELECT count(*) FROM "
                    f"'{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
