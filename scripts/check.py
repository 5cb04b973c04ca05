#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB on each
oracle_sql.json entry over the sf parquet tables, compare row/schema/hash
against the Spark parquet dumps written by graft.Verify.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, decimal
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(tbl: pa.Table):
    # sort columns by name, convert to python values
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    rows = []
    for batch in tbl.to_pylist():
        rows.append(tuple(norm(batch[c]) for c in cols))
    return cols, rows

def norm(v):
    # Strict on purpose: the driver hashes serialized values, so compare
    # floats bit-exact and decimals scale-exact (Decimal('1.45')==
    # Decimal('1.4500') in Python would hide a str-level hash mismatch).
    if isinstance(v, float):
        return v.hex()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"MISS  {name}: no spark output"); n_fail += 1; continue
        try:
            spark_tbl = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
            duck_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ERR   {name}: {str(e)[:200]}"); n_fail += 1; continue
        sc, sr = canon(spark_tbl)
        dc, dr = canon(duck_tbl)
        if sc != dc:
            print(f"SCHEMA {name}: spark={sc} duck={dc}"); n_fail += 1; continue
        if len(sr) != len(dr):
            print(f"ROWS  {name}: spark={len(sr)} duck={len(dr)}"); n_fail += 1; continue
        if sr != dr:
            bad = next(i for i,(a,b) in enumerate(zip(sr,dr)) if a!=b)
            print(f"HASH  {name}: first diff row {bad}:\n  spark={sr[bad]}\n  duck ={dr[bad]}")
            n_fail += 1; continue
        print(f"OK    {name} ({len(sr)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
