"""Build a measurement-only sfN proxy by replicating sf0.1 K times.

The driver benches at a driver-generated sf (BENCH_r05 ran at sf1.0)
that is not on disk in the sandbox; this tool builds a same-shape
stand-in for at-scale timing: each fact-table copy gets offset keys
(RI stays valid copy-by-copy), document text is suffixed per copy so
dedup cardinalities do not collapse into one 10x tie-class, and
embeddings get a tiny per-copy epsilon so vectors stay distinct.
Dims (nation/region) are constant, as in TPC-H.  NEVER used by
bench.py or any oracle path — timing only.

Usage: python tools/make_sf_proxy.py [--k 10] [--src /root/testdata/sf0.1]
       [--out /root/testdata_proxy/sf1.0]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/testdata_proxy/sf1.0")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # key column -> offset stride multiplier source table
    KEYED = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "events": ["event_id", "user_id"],
    }
    CONST = ["nation", "region"]

    strides: dict = {}

    def stride_for(col: str, arr) -> int:
        if col not in strides:
            strides[col] = int(pc.max(arr).as_py()) + 1
        return strides[col]

    # pre-compute strides from the tables that own each key so foreign
    # keys shift by the SAME stride as their dimension's primary key
    own = {
        "l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey", "o_custkey": "c_custkey",
    }
    for t in ("orders", "customer", "part", "supplier"):
        tbl = pq.read_table(os.path.join(args.src, f"{t}.parquet"),
                            columns=[KEYED[t][0]])
        stride_for(KEYED[t][0], tbl.column(0))

    for t in CONST:
        pq.write_table(
            pq.read_table(os.path.join(args.src, f"{t}.parquet")),
            os.path.join(args.out, f"{t}.parquet"),
        )

    for t, keys in KEYED.items():
        tbl = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        copies = []
        for i in range(args.k):
            cols = {}
            for name in tbl.column_names:
                col = tbl.column(name)
                if name in keys:
                    base = own.get(name, name)
                    s = stride_for(base, tbl.column(name))
                    cols[name] = pc.add(col, i * s) if i else col
                elif t == "documents" and name == "text" and i:
                    cols[name] = pc.binary_join_element_wise(
                        col.cast(pa.string()), f" xq{i}", "")
                elif t == "documents" and name == "n_chars" and i:
                    cols[name] = pc.add(col, len(f" xq{i}"))
                elif t == "embeddings" and name == "embedding" and i:
                    a = col.combine_chunks()
                    flat = a.values.to_numpy(zero_copy_only=False).copy()
                    off = np.asarray(a.offsets)
                    flat[off[:-1]] += i * 1e-7
                    cols[name] = pa.ListArray.from_arrays(
                        pa.array(off), pa.array(flat, type=a.values.type))
                else:
                    cols[name] = col
            copies.append(pa.table(cols))
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(args.out, f"{t}.parquet"),
                       row_group_size=1 << 20)
        print(t, out.num_rows)


if __name__ == "__main__":
    main()
