#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify's
outputs against the DuckDB oracle SQL and compare canonicalized results.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Dev tool only — the shipped Scala library has no Python dependency.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Faithful to the driver's comparator: sort the RAW frame first
    # (this throws on array-typed cells, exactly like the driver —
    # round 2 hid two failures by stringifying before sorting), then
    # stringify for a stable compare.
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    out = pd.DataFrame()
    def norm(v):
        if isinstance(v, np.ndarray):
            v = v.tolist()
        return json.dumps(v, default=str, sort_keys=True)
    for c in df.columns:
        out[c] = df[c].map(norm)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
        elif len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            failures += 1
        elif not got.equals(want):
            neq = (got != want).any(axis=1)
            idx = neq[neq].index[:3]
            print(f"FAIL  {name}: {int(neq.sum())}/{len(got)} rows differ; first:")
            for i in idx:
                print(f"      got  {got.loc[i].to_dict()}")
                print(f"      want {want.loc[i].to_dict()}")
            failures += 1
        else:
            print(f"OK    {name} ({len(got)} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
