"""Build an approximate sfX dataset by replicating /root/testdata/sf0.1
with key offsets (MEASUREMENT ONLY — correctness always runs against the
driver's own testdata; this exists because the driver's round-5 bench ran
at sf=1.0, a scale we cannot regenerate exactly without its generator).

Replication scheme (factor F):
- events:    event_id/user_id offset per replica (F x conversations)
- documents: doc_id offset; replica index appended to text so replicas
  are near- but not exact-duplicates (keeps dedup/LSH bucket shapes sane)
- lineitem/orders/customer/part/supplier: key offsets
- embeddings: vec_id offset; queries (vec_id < 3) stay replica-0 only
- nation/region: copied as-is (dims)

Usage: python tools/make_scaled_sf.py --factor 10 --out /dev/shm/sf1.0x
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pacompute
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _offset(col: pa.ChunkedArray, off: int) -> pa.Array:
    return pa.chunked_array([pacompute.add(c, off) for c in col.chunks])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--factor", type=int, default=10)
    p.add_argument("--out", required=True)
    p.add_argument("--src", default=SRC)
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    pc = pacompute

    plans = {
        "events": {"event_id": 1_000_000, "user_id": 10_000},
        "documents": {"doc_id": 1_000_000},
        "lineitem": {"l_orderkey": 10_000_000},
        "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
        "customer": {"c_custkey": 1_000_000},
        "part": {"p_partkey": 10_000_000},
        "supplier": {"s_suppkey": 1_000_000},
        "embeddings": {"vec_id": 1_000_000},
    }
    for name in ["nation", "region"]:
        t = pq.read_table(f"{args.src}/{name}.parquet")
        pq.write_table(t, f"{args.out}/{name}.parquet")
    for name, offs in plans.items():
        t = pq.read_table(f"{args.src}/{name}.parquet")
        parts = []
        for i in range(args.factor):
            r = t
            for col, step in offs.items():
                idx = r.schema.get_field_index(col)
                r = r.set_column(idx, col, _offset(r.column(col), i * step))
            if name == "documents" and i > 0:
                # interleave a replica marker every 3 tokens: cross-replica
                # jaccard drops to ~0.2 (below the LSH catch range), so the
                # near-dup pair DENSITY matches natural scaling instead of
                # every doc having factor-1 near-duplicates
                idx = r.schema.get_field_index("text")
                mark = f"r{i}x"
                texts = r.column("text").to_pylist()
                out_t = []
                for txt in texts:
                    w = (txt or "").split(" ")
                    out_t.append(
                        " ".join(
                            tok if j % 3 else f"{mark} {tok}"
                            for j, tok in enumerate(w)
                        )
                    )
                r = r.set_column(idx, "text", pa.array(out_t, pa.string()))
            parts.append(r)
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{args.out}/{name}.parquet")
        print(name, big.num_rows)


if __name__ == "__main__":
    main()
