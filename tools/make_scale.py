#!/usr/bin/env python3
"""Scale-up generator for the engine-curve bench (driver-side tooling,
like check.py): replicates the sf0.1 parquet tables N times with
consistent key shifts into an output dir, so the bench can record a
measured 10x scale point (sf1-equivalent) next to sf0.1 instead of
synthetic growth pins.

Key shifting: every id-domain column moves by copy_index * OFFSET on
both sides of each FK pair (orders.o_custkey and customer.c_custkey
shift together, etc.), so join cardinalities scale exactly linearly.
Dimension tables (region, nation) stay fixed, as TPC-H scales them.
Payload columns (text, embeddings, props, timestamps) are duplicated
verbatim: duplicated documents/vectors make the dedup/ANN tiers do
MORE work at scale, never less.

Usage: python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys
import duckdb

OFFSET = 1_000_000_000


def main(src: str, dst: str, copies: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    shifted = {
        "region": None,  # dims: copied once
        "nation": None,
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    con = duckdb.connect()
    for table, keys in shifted.items():
        src_file = f"{src}/{table}.parquet"
        dst_file = f"{dst}/{table}.parquet"
        if keys is None:
            con.sql(f"COPY (SELECT * FROM '{src_file}') TO '{dst_file}' (FORMAT PARQUET)")
            continue
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]
        selects = []
        for i in range(copies):
            proj = ", ".join(
                f"({c} + {i * OFFSET}) AS {c}" if c in keys else c for c in cols)
            selects.append(f"SELECT {proj} FROM '{src_file}'")
        union = " UNION ALL ".join(selects)
        con.sql(f"COPY ({union}) TO '{dst_file}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{dst_file}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst_file}", file=sys.stderr)


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, copies)
