"""Generate a key-shifted scaled copy of a testdata SF directory.

The driver ships sf0.001/0.01/0.1 only; scale behavior (skew, spill,
AQE decisions) needs more rows than sf0.1's 600k-lineitem. This tool
replicates each fact table FACTOR times with primary/foreign keys
shifted per copy — join fan-out and group cardinality per key stay
realistic (each copy is an independent "shard" of customers/orders/
docs), while totals scale linearly. Dimension tables (region, nation,
part, supplier) are copied as-is, like TPC-H's fixed-small dims.

Usage: python tools/make_scale_data.py SRC_DIR DST_DIR [FACTOR=10]

Output goes to a gitignored directory; this is bench-only scaffolding,
never test input (correctness stays pinned to driver-shipped data).
"""

from __future__ import annotations

import os
import sys

import duckdb

DIMS = ("region", "nation", "part", "supplier")

# fact table -> columns to shift by (copy_index * stride(col's max+1))
SHIFTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "_scale_data/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied as-is")

    for t, cols in SHIFTS.items():
        strides = {
            c: con.sql(f"SELECT max({c}) + 1 FROM '{src}/{t}.parquet'").fetchone()[0]
            for c in cols
        }
        repl = ", ".join(f"t.{c} + r.i * {strides[c]} AS {c}" for c in cols)
        # one file PER COPY (hive-partitioned by the copy index, then
        # flattened): a single big file would scan as one Spark input
        # split and serialize the whole table through one task —
        # nothing like a real lake, where facts are always many files
        os.makedirs(f"{dst}/{t}.parquet", exist_ok=True)
        for i in range(factor):
            con.sql(
                f"COPY (SELECT t.* REPLACE ({repl}) "
                f"FROM '{src}/{t}.parquet' t, (SELECT {i}::BIGINT AS i) r) "
                f"TO '{dst}/{t}.parquet/part-{i:03d}.parquet' (FORMAT PARQUET)"
            )
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet/*.parquet'").fetchone()[0]
        print(f"{t}: x{factor} -> {n} rows in {factor} files (shifted {cols})")


if __name__ == "__main__":
    main()
