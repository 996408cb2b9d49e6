#!/usr/bin/env python3
"""Replicate a driver testdata scale N× into a new directory (local
scale-probe tooling, not part of the engine): fact/corpus tables get N
key-shifted copies, dimension tables stay single-copy (lineitem keeps
resolving its part/supplier keys — dims grow slower than facts, the
realistic shape). pyarrow, not duckdb, so events.parquet keeps its
TIMESTAMP(NANOS) physical type.

Usage: make_scale.py SRC_DIR DST_DIR FACTOR
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pathlib import Path

SHIFT = 10_000_000  # clear of every aug-offset scheme in the query surface

# table -> key columns shifted by replica*SHIFT (others copied verbatim)
SHIFTED = {
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
}
DIMS = ["nation", "region", "part", "supplier"]


def main(src, dst, factor):
    dst.mkdir(parents=True, exist_ok=True)
    for name in DIMS:
        t = pq.read_table(src / f"{name}.parquet")
        pq.write_table(t, dst / f"{name}.parquet")
        print(f"{name}: {t.num_rows} rows (dim, single copy)")
    for name, keys in SHIFTED.items():
        t = pq.read_table(src / f"{name}.parquet")
        copies = []
        for i in range(factor):
            c = t
            for k in keys:
                idx = c.schema.get_field_index(k)
                shifted = pc.add(c.column(k), i * SHIFT)
                c = c.set_column(idx, c.schema.field(k), shifted)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, dst / f"{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3]))
