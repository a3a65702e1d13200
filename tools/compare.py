#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify (a parquet dir per query + an
oracle_sql.json), run the oracle SQL in DuckDB over the same parquet fixture
tables, then compare: columns sorted by name, rows sorted by all columns,
exact value equality (with a fp-noise report to distinguish real mismatches
from rounding-boundary noise).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        mismatch_cols = []
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                # the driver hashes printed values, so int64-vs-float64 is a
                # real mismatch (e.g. DuckDB windowed sum(BIGINT) -> HUGEINT
                # -> float64) even when the numbers are equal
                if a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} <= {"i", "u", "f"}:
                    mismatch_cols.append((c, f"DTYPE {a.dtype} vs {b.dtype}", None))
                elif a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    af, bf = a.astype(float), b.astype(float)
                    exact = ((af == bf) | (af.isna() & bf.isna())).all()
                    if not exact:
                        close = np.isclose(af, bf, rtol=1e-9, atol=1e-9, equal_nan=True).all()
                        mismatch_cols.append((c, "fp-noise" if close else "VALUES",
                                              (af - bf).abs().max()))
                else:
                    if not ((a == b) | (a.isna() & b.isna())).all():
                        nbad = int((~((a == b) | (a.isna() & b.isna()))).sum())
                        mismatch_cols.append((c, f"VALUES({nbad} rows)", None))
            except Exception as ex:
                mismatch_cols.append((c, f"cmp-error {ex}", None))
        if mismatch_cols:
            print(f"FAIL {name}: {mismatch_cols}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ROWS {name}: unreadable: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
