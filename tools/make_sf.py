#!/usr/bin/env python3
"""Synthesize a larger scale factor by replicating a driver-generated sf
directory K times with shifted keys (referential integrity preserved).

Usage: make_sf.py <srcDir> <dstDir> [K=10] [--perturb F]

Local stress-testing tool only (the driver's testdata is read-only and
tops out at sf0.1). pyarrow round-trip preserves the exact physical
schemas — notably events.ts keeps whatever timestamp encoding the
source dir has (TIMESTAMP_NTZ micros since the 2026-08-13 generation;
TIMESTAMP(NANOS) before), which graft.Tables.events normalizes by
branching on the reported dtype.

Copy i != 0 mutations (default mode):
  - every key column shifts by i * (a range-clearing constant), with
    foreign keys shifted by the same constant as their parent key;
  - documents.text gains one trailing token unique to (doc, copy), so
    cross-copy pairs are NEAR-duplicates (Jaccard < 1) — a dup-heavy
    corpus that stresses the dedup chain's candidate generation;
  - embeddings shift component 0 by i*1e-3 to break cosine ties in
    top-k (exact duplicates would make rank order ill-defined).

--perturb F (round-13 verdict ask #7): the default design puts every
document/vector in a K-member near-dup family, which at K=1000 makes
any pair-emitting operator's OUTPUT quadratic in K (4x10^9 verdict rows
at sf100) — a synthesis artifact, not a property of real corpora. With
--perturb F, only copies i < F stay near-duplicates of the base (the
same light one-token suffix noise), so every dup family has EXACTLY F
members and pair output is bounded at any K; copies i >= F become
INDEPENDENT documents: a copy-unique tag token is interleaved between
every pair of tokens (one vectorized replace), so every 3-token shingle
of copy i contains the tag — zero shingle overlap with the base or any
other copy (Jaccard 0 against everything outside the family). Their
embeddings are regenerated from a (vec_id, copy)-seeded gaussian at the
base corpus's norm scale — near-orthogonal to everything. Stated dup
rate: F/K of the corpus is near-duplicated, the number SCALE.md rows
must quote.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import numpy as np
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


def copy_of(name: str, t: pa.Table, i: int, perturb: int = 0) -> pa.Table:
    if i == 0:
        return t
    for col, unit in SHIFTS[name].items():
        idx = t.column_names.index(col)
        typ = t.schema.field(col).type
        shifted = pc.add(t.column(col), pa.scalar(i * unit, type=typ))
        t = t.set_column(idx, t.schema.field(col), shifted.cast(typ))
    # an "independent" copy under --perturb: not a near-dup of anything
    indep = perturb > 0 and i >= perturb
    if name == "documents":
        idx = t.column_names.index("text")
        if indep:
            # interleave a copy-unique tag token between every pair of
            # tokens: every 3-shingle of this copy contains the tag, so
            # shingle overlap with the base (and every other copy) is 0
            new = pc.replace_substring(t.column("text"), " ", f" q{i}z ")
        elif perturb > 0:
            # near-dup family member: same one-token suffix noise as the
            # default mode, vectorized (base + copies 1..F-1 = family F)
            tag = pc.binary_join_element_wise(
                f"c{i}d", pc.cast(t.column("doc_id"), pa.string()), "")
            new = pc.binary_join_element_wise(t.column("text"), tag, " ")
        else:
            doc = t.column("doc_id").to_pylist()
            txt = t.column("text").to_pylist()
            new = pa.array([f"{x} c{i}d{d}" for x, d in zip(txt, doc)],
                           type=pa.string())
        t = t.set_column(idx, t.schema.field("text"),
                         pc.cast(new, pa.string()))
        nidx = t.column_names.index("n_chars")
        t = t.set_column(nidx, t.schema.field("n_chars"),
                         pc.cast(pc.utf8_length(t.column("text")),
                                 pa.int64()))
    if name == "embeddings":
        idx = t.column_names.index("embedding")
        typ = t.schema.field("embedding").type
        if perturb > 0:
            col = t.column("embedding").combine_chunks()
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            n = len(col)
            dim = len(flat) // n
            m = flat.reshape(n, dim).astype(np.float64)
            if indep:
                # regenerated at the base corpus's norm scale, seeded by
                # copy index: near-orthogonal to every other vector
                rng = np.random.RandomState(1_000_003 * i + 17)
                scale = float(np.sqrt((m * m).sum(axis=1)).mean())
                fresh = rng.standard_normal((n, dim))
                fresh *= scale / np.sqrt((fresh * fresh).sum(
                    axis=1, keepdims=True))
                m = fresh
            else:
                m = m.copy()
                m[:, 0] += i * 1e-3  # family member: cosine stays ~1
            t = t.set_column(idx, t.schema.field("embedding"),
                             pa.FixedSizeListArray.from_arrays(
                                 pa.array(m.astype(np.float32).ravel(),
                                          type=typ.value_type), dim)
                             if pa.types.is_fixed_size_list(typ) else
                             pa.array(m.tolist(), type=typ))
        else:
            vecs = t.column("embedding").to_pylist()
            for v in vecs:
                v[0] += i * 1e-3
            t = t.set_column(idx, t.schema.field("embedding"),
                             pa.array(vecs, type=typ))
    return t


def main():
    argv = sys.argv[1:]
    perturb = 0
    if "--perturb" in argv:
        j = argv.index("--perturb")
        perturb = int(argv[j + 1])
        argv = argv[:j] + argv[j + 2:]
    src, dst = argv[0], argv[1]
    k = int(argv[2]) if len(argv) > 2 else 10
    if perturb:
        print(f"perturb mode: dup family width {perturb} "
              f"(dup rate {perturb}/{k})", flush=True)
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
                c = copy_of(name, t, i, perturb)
                w.write_table(c)
                n_out += c.num_rows
        print(f"{name}: {t.num_rows} -> {n_out}", flush=True)


if __name__ == "__main__":
    main()
