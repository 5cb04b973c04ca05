#!/usr/bin/env python3
"""Scale-soak data generator: amplify an SF directory N× by unioning
key-shifted copies (foreign keys shifted consistently, dims left alone).
The driver ships no SF beyond 0.1, so quadratic creep that is invisible
at the gated SFs is soaked here: both Spark and the DuckDB oracle read
the SAME amplified parquet, so every gate stays meaningful.

Usage: python3 scripts/amplify.py [src] [dst] [copies]
Defaults: /root/testdata/sf0.1 -> ./soakdata/sfa1, 10 copies (~sf1).
"""
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "soakdata/sfa1")
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def base(tbl):
    return f"'{src}/{tbl}.parquet'"

def maxp1(tbl, col):
    return con.execute(f"SELECT MAX({col}) + 1 FROM {base(tbl)}").fetchone()[0]

# shift units: one contiguous id block per copy, FKs move with their PKs
OK = maxp1("orders", "o_orderkey")
CK = maxp1("customer", "c_custkey")
SK = maxp1("supplier", "s_suppkey")
PK = maxp1("part", "p_partkey")
DK = maxp1("documents", "doc_id")
VK = maxp1("embeddings", "vec_id")
EK = maxp1("events", "event_id")
UK = maxp1("events", "user_id")

SHIFTS = {
    "region": {},    # dims: unchanged (FK targets stay valid)
    "nation": {},
    "customer": {"c_custkey": CK},
    "supplier": {"s_suppkey": SK},
    "part": {"p_partkey": PK},
    "orders": {"o_orderkey": OK, "o_custkey": CK},
    "lineitem": {"l_orderkey": OK, "l_partkey": PK, "l_suppkey": SK},
    "events": {"event_id": EK, "user_id": UK},
    "documents": {"doc_id": DK},
    "embeddings": {"vec_id": VK},
}

for tbl, shifts in SHIFTS.items():
    cols = con.execute(f"DESCRIBE SELECT * FROM {base(tbl)}").fetchall()
    if not shifts:
        con.execute(f"COPY (SELECT * FROM {base(tbl)}) TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
        print(f"{tbl}: copied (dim)")
        continue
    exprs = []
    for name, dtype, *_ in cols:
        if name in shifts:
            exprs.append(f"CAST({name} + k.i * {shifts[name]} AS {dtype}) AS {name}")
        else:
            exprs.append(name)
    sql = (f"COPY (SELECT {', '.join(exprs)} FROM {base(tbl)}, "
           f"(SELECT unnest(range({copies})) AS i) k) "
           f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)")
    con.execute(sql)
    n = con.execute(f"SELECT COUNT(*) FROM '{dst}/{tbl}.parquet'").fetchone()[0]
    print(f"{tbl}: {n} rows ({copies} copies)")
print(f"done -> {dst}")
