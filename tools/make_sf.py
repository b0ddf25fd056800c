#!/usr/bin/env python3
"""Synthesize a larger scale factor by replicating a driver-generated sf
directory K times with shifted keys (referential integrity preserved).

Usage: make_sf.py <srcDir> <dstDir> [K=10]

Local stress-testing tool only (the driver's testdata is read-only and
tops out at sf0.1). pyarrow round-trip preserves the exact physical
schemas — notably events.ts keeps whatever timestamp encoding the
source dir has (TIMESTAMP_NTZ micros since the 2026-08-13 generation;
TIMESTAMP(NANOS) before), which graft.Tables.events normalizes by
branching on the reported dtype.

Copy i != 0 mutations:
  - every key column shifts by i * (a range-clearing constant), with
    foreign keys shifted by the same constant as their parent key;
  - documents.text gains one trailing token unique to (doc, copy), so
    cross-copy pairs are NEAR-duplicates (Jaccard < 1) — a dup-heavy
    corpus that stresses the dedup chain's candidate generation;
  - embeddings shift component 0 by i*1e-3 to break cosine ties in
    top-k (exact duplicates would make rank order ill-defined).
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os

SHIFTS = {
    # table -> {column: shift_unit}
    "customer": {"c_custkey": 20_000},
    "orders": {"o_orderkey": 200_000, "o_custkey": 20_000},
    "lineitem": {"l_orderkey": 200_000, "l_partkey": 25_000,
                 "l_suppkey": 2_000},
    "part": {"p_partkey": 25_000},
    "supplier": {"s_suppkey": 2_000},
    "events": {"event_id": 200_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 10_000},
    "nation": {},
    "region": {},
}


def copy_of(name: str, t: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return t
    for col, unit in SHIFTS[name].items():
        idx = t.column_names.index(col)
        typ = t.schema.field(col).type
        shifted = pc.add(t.column(col), pa.scalar(i * unit, type=typ))
        t = t.set_column(idx, t.schema.field(col), shifted.cast(typ))
    if name == "documents":
        idx = t.column_names.index("text")
        doc = t.column("doc_id").to_pylist()
        txt = t.column("text").to_pylist()
        new = [f"{x} c{i}d{d}" for x, d in zip(txt, doc)]
        t = t.set_column(idx, t.schema.field("text"),
                         pa.array(new, type=pa.string()))
        nidx = t.column_names.index("n_chars")
        t = t.set_column(nidx, t.schema.field("n_chars"),
                         pa.array([len(x) for x in new], type=pa.int64()))
    if name == "embeddings":
        idx = t.column_names.index("embedding")
        vecs = t.column("embedding").to_pylist()
        for v in vecs:
            v[0] += i * 1e-3
        t = t.set_column(idx, t.schema.field("embedding"),
                         pa.array(vecs, type=t.schema.field("embedding").type))
    return t


def main():
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in SHIFTS:
        t = pq.read_table(f"{src}/{name}.parquet")
        reps = 1 if name in ("nation", "region") else k
        # stream copies through one writer instead of concatenating K
        # tables in memory (K=1000 of lineitem would not fit)
        n_out = 0
        with pq.ParquetWriter(f"{dst}/{name}.parquet", t.schema,
                              coerce_timestamps=None) as w:
            for i in range(reps):
                c = copy_of(name, t, i)
                w.write_table(c)
                n_out += c.num_rows
        print(f"{name}: {t.num_rows} -> {n_out}", flush=True)


if __name__ == "__main__":
    main()
