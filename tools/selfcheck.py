#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row counts, column names/order-insensitive schemas, and value hashes
(rows sorted, columns sorted by name — per the driver's documented compare).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize to plain python values via string repr with float care
    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            # negative zero equals zero: Spark's BigDecimal round drops
            # the sign of -0.0, DuckDB's round keeps it — numerically
            # identical values must not string-mismatch
            if v == 0.0:
                return "0.0"
            return repr(v)
        return str(v)
    out = df.apply(lambda col: col.map(norm))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; ScaleGen corpora are Spark
        # output DIRECTORIES of part files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'ROWS' if ok else 'FAIL'}  {name}: rows-only check, {len(got)} rows")
            n_rowsonly += ok; n_fail += (not ok)
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if g.equals(e):
            print(f"PASS  {name}: {len(got)} rows"); n_pass += 1
        else:
            diff = (g != e).any(axis=1)
            i = diff.idxmax()
            print(f"FAIL  {name}: value mismatch at sorted-row {i}:")
            print("  spark:", g.iloc[i].to_dict())
            print("  duck :", e.iloc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
