#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB over
views on <sfDir>/*.parquet, loads the engine result from
<verifyOutDir>/<name>/*.parquet, canonicalizes (columns sorted by name,
doubles rounded to 6 decimals, timestamps → str) and diffs.
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "nan"
                else: v = round(v, 6)
                # normalize -0.0
                if v == 0: v = 0.0
            elif v.__class__.__name__ in ("datetime", "date", "Timestamp"):
                v = str(v)
            elif isinstance(v, bool):
                v = bool(v)
            # type-tag so int 10 != float 10.0 (the driver hashes values,
            # so cross-engine type skew fails there even when == passes)
            vals.append((v.__class__.__name__, v))
        out.append(tuple(vals))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only: continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: engine output missing"); n_fail += 1; continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        cur = con.execute(f"SELECT * FROM read_parquet({files})")
        ecols = [d[0] for d in cur.description]
        erows = cur.fetchall()
        oc, orows = canon(orows, ocols)
        ec, erows = canon(erows, ecols)
        if oc != ec:
            print(f"FAIL {name}: columns differ oracle={oc} engine={ec}"); n_fail += 1; continue
        if len(orows) != len(erows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} engine={len(erows)}")
            n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, erows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first at {i}:")
            print(f"  cols:   {oc}")
            print(f"  oracle: {a}")
            print(f"  engine: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
