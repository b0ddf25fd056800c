#!/usr/bin/env python3
"""Negative-zero audit over every DuckDB oracle.

The driver's compare hashes raw float bits, so a -0.0 on either side flips
the hash even though the values are numerically equal (q_embed_cov, round 5:
DuckDB's ROUND keeps the IEEE sign of a tiny negative rounding to zero;
Spark's BigDecimal round emits +0.0). The repo discipline is
`ROUND(x, d) + 0.0` in oracle SQL / `Q.roundz` on the Spark side for every
rounded possibly-negative double; this script audits that no oracle output
(and, when present, no Spark result parquet) still carries a signed zero in
any float column.

Usage: signbit_sweep.py <sfDir> <outDir>
  <outDir> must contain oracle_sql.json (a graft.Verify dump); Spark result
  parquet dirs are checked too when present. Exit 1 on any hit.
"""
import sys, json, glob
import duckdb
import numpy as np
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def signed_zeros(df, side, name):
    hits = 0
    for c in df.columns:
        vals = np.asarray(df[c])
        if vals.dtype.kind != "f":
            continue
        n = int(np.sum(np.signbit(vals) & (vals == 0.0)))
        if n:
            print(f"SIGNBIT {name} [{side}] column={c}: {n} row(s) of -0.0")
            hits += n
    return hits


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for n in TABLES:
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{sf}/{n}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    hits = 0
    for name in sorted(oracle):
        odf = con.execute(oracle[name]).fetchdf()
        hits += signed_zeros(odf, "oracle", name)
        if glob.glob(f"{out}/{name}/*.parquet"):
            sdf = pq.ParquetDataset(f"{out}/{name}").read().to_pandas()
            hits += signed_zeros(sdf, "spark", name)
    print(f"swept {len(oracle)} oracles: {hits} signed zero(s)")
    sys.exit(1 if hits else 0)


if __name__ == "__main__":
    main()
