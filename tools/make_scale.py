#!/usr/bin/env python3
"""Replicate a driver testdata scale N× into a new directory (local
scale-probe tooling, not part of the engine): fact/corpus tables get N
key-shifted copies, dimension tables stay single-copy (lineitem keeps
resolving its part/supplier keys — dims grow slower than facts, the
realistic shape). pyarrow, not duckdb, so events.parquet keeps its
TIMESTAMP(NANOS) physical type.

With --vary, replicas are deterministically PERTURBED instead of
byte-identical — the "real-shaped" scale fixture: replica i of a
document gets i extra suffix tokens (so the corpus isn't an exact-dup
flood that distorts dedup/BM25 distributions N×), replica i of an
embedding gets a small deterministic per-dimension jitter (so ANN
candidate structure isn't N identical copies of every vector), and
replica i of events shifts timestamps by i days (so the time axis
extends instead of stacking). Perturbations are pure functions of
(replica, key) — two runs produce identical fixtures.

Usage: make_scale.py SRC_DIR DST_DIR FACTOR [--vary]
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

DAY_NS = 86_400_000_000_000


def vary_copy(name, c, i):
    """Deterministic per-replica perturbation (no-op for replica 0)."""
    if i == 0:
        return c
    if name == "documents":
        idx = c.schema.get_field_index("text")
        ids = c.column("doc_id").to_pylist()
        texts = c.column("text").to_pylist()
        # i suffix tokens keyed by (replica, doc_id): byte-identical
        # replicas disappear, token/length distributions shift mildly
        new = [
            (t or "") + "".join(
                f" r{i}v{(d * 131 + i * 31 + k * 17) % 9973}"
                for k in range(min(i, 4)))
            for d, t in zip(ids, texts)
        ]
        return c.set_column(idx, c.schema.field("text"),
                            pa.array(new, type=c.schema.field("text").type))
    if name == "embeddings":
        idx = c.schema.get_field_index("embedding")
        ids = c.column("vec_id").to_pylist()
        embs = c.column("embedding").to_pylist()
        # +/- ~1e-2 jitter, pure function of (replica, vec_id, dim)
        new = [
            [v + (((d * 73 + i * 37 + j * 11) % 201) - 100) * 1e-4
             for j, v in enumerate(e)] if e is not None else None
            for d, e in zip(ids, embs)
        ]
        return c.set_column(idx, c.schema.field("embedding"),
                            pa.array(new,
                                     type=c.schema.field("embedding").type))
    if name == "events":
        idx = c.schema.get_field_index("ts")
        ts = c.column("ts")
        # day length in the column's own unit: fixtures have shipped both
        # TIMESTAMP(NANOS) and timestamp[us] generations (TESTDATA r6)
        unit = getattr(ts.type, "unit", None)
        day = {"s": 86_400, "ms": 86_400_000, "us": 86_400_000_000,
               "ns": DAY_NS}.get(unit, DAY_NS)
        shifted = pc.add(ts.cast(pa.int64()), i * day).cast(ts.type)
        return c.set_column(idx, c.schema.field("ts"), shifted)
    return c


def main(src, dst, factor, vary=False):
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
            if vary:
                c = vary_copy(name, c, i)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, dst / f"{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows"
              + (" (varied)" if vary and name in
                 ("documents", "embeddings", "events") else ""))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--vary"]
    main(Path(args[0]), Path(args[1]), int(args[2]),
         vary="--vary" in sys.argv)
