#!/usr/bin/env python3
"""Dev harness: driver-style DTYPE parity check.

The driver reads the Spark parquet result via pyarrow/pandas and the DuckDB
oracle via .df() — a value-identical result can still hash-mismatch when the
two sides canonicalize different dtypes differently. Round-1 evidence:

 - DuckDB sum(BIGINT)=HUGEINT and sum(DECIMAL)=DECIMAL land as float64 /
   object(Decimal) in pandas while Spark writes int64/float64 -> FAILS.
   Rule: CAST every aggregate to BIGINT or DOUBLE on BOTH sides.
 - int32 vs int64 and datetime64[ns] vs [us] and object(date) vs
   datetime64[us] are normalized by the driver -> benign.

Usage: python3 tools/dtype_check.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BENIGN = [("int32", "int64"), ("float32", "float64")]


def norm(kind):
    if kind.startswith("datetime64"):
        return "datetime"
    for a, b in BENIGN:
        if kind == a:
            return b
    return kind


def val_kind(series, dtype):
    if str(dtype) != "object":
        return str(dtype)
    v = next((x for x in series if x is not None), None)
    if type(v).__name__ == "date":
        return "datetime"  # driver normalizes dates
    return f"object({type(v).__name__})"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or name not in oracle or (only and name not in only):
            continue
        # read EVERY part file: a multi-partition result can carry a drifted
        # dtype (or an all-null object column) in a later part only
        parts = sorted(glob.glob(f"{d}/*.parquet"))
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        exp = con.sql(oracle[name]).df()
        ed = {c.lower(): exp[c] for c in exp.columns}
        gset = {c.lower() for c in got.columns}
        for missing in sorted(gset - set(ed)):
            print(f"COLUMN-MISMATCH {name}.{missing}: in spark output only")
            bad += 1
        for missing in sorted(set(ed) - gset):
            print(f"COLUMN-MISMATCH {name}.{missing}: in oracle only")
            bad += 1
        for c in got.columns:
            if c.lower() not in ed:
                continue
            gk = norm(val_kind(got[c], got[c].dtype))
            ek = norm(val_kind(ed[c.lower()], ed[c.lower()].dtype))
            if gk != ek:
                print(f"DTYPE-MISMATCH {name}.{c}: spark={gk} oracle={ek}")
                bad += 1
    print(f"== {bad} suspicious dtype mismatches ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
