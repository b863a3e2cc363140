#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet (Spark result), runs oracle_sql.json's SQL in
DuckDB over the sf parquet tables, and compares rows (sorted columns, sorted
rows, values stringified).
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out

def main():
    sf, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    raw = json.load(open(f"{outdir}/oracle_sql.json"))
    # Verify emits each query under both bare and .parquet-suffixed keys
    # (driver key-shape tolerance); normalize to bare and dedupe.
    oracle = {}
    for k, v in raw.items():
        oracle[k[: -len(".parquet")] if k.endswith(".parquet") else k] = v
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}.parquet/*.parquet')").fetchall()
            gcols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            ecols = [d[0] for d in con.description]
            if sorted(gcols) != sorted(ecols):
                print(f"FAIL {name}: columns differ spark={sorted(gcols)} oracle={sorted(ecols)}")
                fails += 1
                continue
            cg, ce = canon(got, gcols), canon(exp, ecols)
            if len(cg) != len(ce):
                print(f"FAIL {name}: rowcount spark={len(cg)} oracle={len(ce)}")
                fails += 1
            elif cg != ce:
                bad = [i for i, (a, b) in enumerate(zip(cg, ce)) if a != b]
                print(f"FAIL {name}: {len(bad)} rows differ; first: ")
                i = bad[0]
                print("  spark :", cg[i])
                print("  oracle:", ce[i])
                fails += 1
            else:
                print(f"OK   {name}: {len(cg)} rows")
        except Exception as ex:
            print(f"ERROR {name}: {ex}")
            fails += 1
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
