#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB over
views on <sfDir>/*.parquet, loads the engine result from
<verifyOutDir>/<name>/*.parquet, canonicalizes (columns sorted by name,
doubles rounded to 6 decimals, timestamps → str) and diffs.

Both sides are fetched through Arrow (the driver's fetch path), NOT
fetchall(): cursor.fetchall() collapses DuckDB INTEGER/BIGINT/HUGEINT
to Python int, hiding integer-width skew that the driver's type-strict
hash fails on (that's how the round-2 l6_pack_shards HUGEINT skew
shipped "green"). With Arrow, HUGEINT surfaces as decimal128 and gets
a non-int type tag, so the skew fails locally too.
"""
import sys, json, glob, math, os
import duckdb
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def type_tag(t):
    """Coarse type tag mirroring the driver's type-strict hash: every
    integer width is 'int', but float/decimal/bool/etc. are distinct —
    so DuckDB HUGEINT (decimal128 in Arrow) vs Spark BIGINT fails."""
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_decimal(t): return "decimal"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_timestamp(t) or pa.types.is_date(t): return "ts"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + type_tag(t.value_type) + ">"
    return str(t)

def norm(v, tg):
    if v is None:
        return None
    if tg == "float":
        if isinstance(v, float) and math.isnan(v): return "nan"
        v = round(v, 6)
        if v == 0: v = 0.0  # normalize -0.0
        return v
    if tg == "ts":
        return str(v)
    if tg.startswith("list<"):
        inner = tg[5:-1]
        return tuple(norm(x, inner) for x in v)
    return v

def canon(tbl):
    """Arrow table → (sorted col names, list of row tuples of (tag, value))."""
    names = list(tbl.column_names)
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols, tags = [], []
    for i in order:
        cols.append(tbl.column(i).to_pylist())
        tags.append(type_tag(tbl.schema.field(i).type))
    rows = []
    for r in range(tbl.num_rows):
        rows.append(tuple((tags[c], norm(cols[c][r], tags[c])) for c in range(len(cols))))
    return [names[i] for i in order], [tags[c] for c in range(len(cols))], rows

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
            otbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        etbl = con.execute(f"SELECT * FROM read_parquet({files})").fetch_arrow_table()
        oc, otags, orows = canon(otbl)
        ec, etags, erows = canon(etbl)
        nested = [c for c, t in zip(ec, etags) if "list<" in t or "struct" in t or "map" in t]
        if nested:
            # The driver canonicalizes through pandas sort_values, which
            # raises "unhashable type: numpy.ndarray" on array cells
            # (that is how l3_quantize_int8 shipped green locally and
            # red in round 4). Reject nested output columns outright.
            print(f"FAIL {name}: nested output columns {nested} — driver comparer "
                  f"cannot sort/hash array cells; emit scalars (len/sum/checksum)")
            n_fail += 1; continue
        if oc != ec:
            print(f"FAIL {name}: columns differ oracle={oc} engine={ec}"); n_fail += 1; continue
        if otags != etags:
            print(f"FAIL {name}: column TYPES differ (driver hash would fail)")
            print(f"  cols:   {oc}")
            print(f"  oracle: {otags}")
            print(f"  engine: {etags}")
            n_fail += 1; continue
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
