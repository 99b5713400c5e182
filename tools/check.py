#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the parquet tables in
<sfDir>, and compares: row count, column names (sorted), and a hash of the
value matrix with columns sorted by name and rows sorted by all columns.
"""
import json
import sys
import glob
import os
import hashlib

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell(v):
    if isinstance(v, float):
        return repr(v)
    return repr(v)


def table_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(cell(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # sf1-scale knobs (dev-only; defaults match the driver's gate):
    # GRAFT_DUCK_TMP      spill directory (default: ./.tmp)
    # GRAFT_DUCK_MEM      memory_limit, e.g. "24GB"
    # GRAFT_DUCK_NO_ORDER=1  preserve_insertion_order=false — halves
    #   spill for the giant DISTINCTs; output order is irrelevant here
    #   because the comparison sorts rows and columns before hashing
    if os.environ.get("GRAFT_DUCK_TMP"):
        con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCK_TMP']}'")
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
    if os.environ.get("GRAFT_DUCK_NO_ORDER"):
        con.execute("SET preserve_insertion_order=false")
    if os.environ.get("GRAFT_DUCK_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCK_THREADS'])}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        want = con.execute(oracle[name]).fetchdf()
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        hg, hw = table_hash(g), table_hash(w)
        if hg != hw:
            print(f"FAIL {name}: hash mismatch")
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            print("  spark:", g[bad].head(5).to_dict("records"))
            print("  duck :", w[bad].head(5).to_dict("records"))
            failures += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
