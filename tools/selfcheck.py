#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row counts, column names/order-insensitive schemas, and value hashes
(rows sorted, columns sorted by name — per the driver's documented compare).

Optional third arg `--json <path>` writes the per-query results as one JSON
artifact (the standing SCALECHECK gate's output).

Queries in RECALL_BOUND grade as approximate candidate generators instead of
set-equal: the engine's pair set must be a SUBSET of the exact oracle pair set
(precision 1 — candidates are exact-verified) with recall >= the bound. At the
gate SFs (no organic near-dup pairs, spec-pinned) recall is 1.0 and the check
degenerates to equality; on tiled corpora with organic >=0.95 pairs the
blocked LSH search legitimately recovers a subset, like every banded LSH.
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
            # no -0.0 special case: the engines normalize negative zero
            # at the source (oracle SQL `+ 0.0` after the final round)
            return repr(v)
        return str(v)
    out = df.apply(lambda col: col.map(norm))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

# query -> minimum recall of the exact >=0.95 pair set (see module doc)
# 0.20: the theoretical floor of q_dedup_embed's blocking for ORGANIC
# pairs sitting exactly at the 0.95 threshold — a pair at angle
# theta = arccos(0.95) ~ 18.2deg matches all 16 sign bits with
# probability (1 - theta/pi)^16 ~ 0.18, and the clustered ~sf1 corpus
# (round 11) measured 0.23 with precision 1. Planted near-identical
# pairs recover at ~1.0; corpora without organic >=0.95 pairs (the
# driver fixtures, the adversarial tiles) degrade this check to
# planted-set equality.
RECALL_BOUND = {"q_dedup_embed": 0.20}

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    results = {}
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
    def record(name, status, **kw):
        results[name] = {"status": status, **kw}
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1
            record(name, "fail", reason="no output"); continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'ROWS' if ok else 'FAIL'}  {name}: rows-only check, {len(got)} rows")
            n_rowsonly += ok; n_fail += (not ok)
            record(name, "rows_only" if ok else "fail", rows=len(got)); continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1
            record(name, "fail", reason=f"oracle error: {e}"); continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL  {name}: columns {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1; record(name, "fail", reason="schema"); continue
        if name in RECALL_BOUND:
            # approximate candidate generator: subset + recall grading
            keys = [c for c in sorted(got.columns) if c != "cos"]
            gk = set(map(tuple, got[keys].itertuples(index=False)))
            ek = set(map(tuple, exp[keys].itertuples(index=False)))
            extra = gk - ek
            recall = len(gk & ek) / len(ek) if ek else 1.0
            ok = not extra and recall >= RECALL_BOUND[name]
            tag = "PASS" if ok else "FAIL"
            print(f"{tag}  {name}: recall {recall:.2f} of {len(ek)} exact pairs"
                  f" (bound {RECALL_BOUND[name]}), {len(extra)} false positives")
            n_pass += ok; n_fail += (not ok)
            record(name, "pass" if ok else "fail", mode="recall",
                   recall=round(recall, 4), exact_pairs=len(ek),
                   false_positives=len(extra)); continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}"); n_fail += 1
            record(name, "fail", reason=f"rows {len(got)} != {len(exp)}"); continue
        g, e = canon(got), canon(exp)
        if g.equals(e):
            print(f"PASS  {name}: {len(got)} rows"); n_pass += 1
            record(name, "pass", rows=len(got))
        else:
            diff = (g != e).any(axis=1)
            i = diff.idxmax()
            print(f"FAIL  {name}: value mismatch at sorted-row {i}:")
            print("  spark:", g.iloc[i].to_dict())
            print("  duck :", e.iloc[i].to_dict())
            n_fail += 1
            record(name, "fail", reason="value mismatch",
                   row={k: str(v) for k, v in g.iloc[i].to_dict().items()})
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "pass": n_pass, "rows_only": n_rowsonly,
                       "fail": n_fail, "queries": results}, f, indent=1)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
