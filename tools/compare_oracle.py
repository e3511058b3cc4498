#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script runs each
oracle SQL in DuckDB against the same parquet tables and compares row count,
column names, and values (column-name-sorted, row-sorted, tolerant float
compare at 1e-9 since both sides round explicitly)."""
import json, math, sys, glob, os
import duckdb

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for q, sql in sorted(oracle.items()):
        rdir = f"{out_dir}/{q}"
        if not os.path.isdir(rdir):
            print(f"FAIL {q}: no spark output"); n_fail += 1; continue
        try:
            want = con.sql(sql)
            want_cols = sorted(c.lower() for c in want.columns)
            want_rows = con.sql(
                f"SELECT * FROM ({sql.rstrip().rstrip(';')})").fetchall()
            got = con.sql(f"SELECT * FROM '{rdir}/*.parquet'")
            got_cols = sorted(c.lower() for c in got.columns)
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {q}: {e}"); n_fail += 1; continue
        if want_cols != got_cols:
            print(f"FAIL {q}: cols {got_cols} != {want_cols}"); n_fail += 1
            continue
        if len(want_rows) != len(got_rows):
            print(f"FAIL {q}: rows {len(got_rows)} != {len(want_rows)}")
            n_fail += 1; continue
        # column-name-sorted projection, row-sorted compare
        wi = [list(c.lower() for c in want.columns).index(c) for c in want_cols]
        gi = [list(c.lower() for c in got.columns).index(c) for c in got_cols]
        key = lambda row: tuple((v is None, str(v)) for v in row)
        w = sorted((tuple(norm(r[i]) for i in wi) for r in want_rows), key=key)
        g = sorted((tuple(norm(r[i]) for i in gi) for r in got_rows), key=key)
        bad = next((k for k in range(len(w)) if w[k] != g[k]), None)
        if bad is not None:
            print(f"FAIL {q}: first diff row {bad}:\n  spark={g[bad]}\n  duck ={w[bad]}")
            n_fail += 1
        else:
            print(f"PASS {q} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
