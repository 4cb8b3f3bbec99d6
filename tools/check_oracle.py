#!/usr/bin/env python
"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracle.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_from_scratch_spark.queries import (  # noqa: E402
    INVARIANTS,
    ORACLES,
    QUERIES,
)
from clickhouse_from_scratch_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple))
                              else (str(v) if v is not None and not isinstance(v, (str, bytes, int, float)) else v))
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="last").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount {len(spark_pdf)} vs {len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)

    def kind_group(k: str) -> str:
        return {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "dt", "m": "td", "O": "obj"}.get(k, k)

    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            # dtype-KIND strict: the driver value-hashes rendered cells,
            # so an int Spark column vs a float oracle column (DuckDB
            # HUGEINT→float64 widening) hash-mismatches even when every
            # value is numerically equal — fail locally too. Exception:
            # either side all-NaN float vs int (NULL-widening) stays a
            # value comparison.
            ga, gb = kind_group(av.dtype.kind), kind_group(bv.dtype.kind)
            if ga != gb and {ga, gb} == {"int", "float"} \
                    and not (av.isna().any() or bv.isna().any()):
                problems.append(
                    f"col {c}: dtype kind mismatch {av.dtype} vs "
                    f"{bv.dtype} (driver hashes these differently — cast "
                    f"the oracle, e.g. HUGEINT sums to BIGINT)")
                continue
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                import numpy as np
                aa = pd.to_numeric(av, errors="coerce")
                bb = pd.to_numeric(bv, errors="coerce")
                if not np.allclose(aa.fillna(-1e300), bb.fillna(-1e300),
                                   rtol=0, atol=0):
                    bad = (aa.fillna(-1e300) != bb.fillna(-1e300))
                    problems.append(
                        f"col {c}: {int(bad.sum())} exact-mismatches, first: "
                        f"{aa[bad].head(3).tolist()} vs {bb[bad].head(3).tolist()}")
            else:
                eq = (av.fillna("__null__") == bv.fillna("__null__")) if av.dtype == object else (av.isna() & bv.isna()) | (av == bv)
                if not eq.all():
                    bad = ~eq
                    problems.append(
                        f"col {c}: {int(bad.sum())} mismatches, first: "
                        f"{av[bad].head(3).tolist()} vs {bv[bad].head(3).tolist()}")
    return problems


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = args.names or list(QUERIES)
    n_pass = n_fail = n_weak = 0
    for name in names:
        try:
            sdf = QUERIES[name](spark, args.sf)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            if name in INVARIANTS:
                desc, fn = INVARIANTS[name]
                try:
                    prob = fn(spark_pdf, con)
                except Exception as e:
                    prob = f"invariant check error: {e}"
                if prob:
                    print(f"FAIL  {name}: invariant violated: {prob}")
                    n_fail += 1
                else:
                    print(f"ok~   {name}: {len(spark_pdf)} rows "
                          f"(invariant: {desc})")
                    n_pass += 1
            else:
                print(f"weak  {name}: {len(spark_pdf)} rows (no oracle)")
                n_weak += 1
            continue
        try:
            duck_pdf = con.execute(ORACLES[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(spark_pdf)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_weak} weak (no oracle), {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
