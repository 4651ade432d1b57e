#!/usr/bin/env python3
"""Dev harness: replicate the driver's Verify -> DuckDB oracle compare loop.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ spark parquet result, runs the matching SQL
from <verifyOutDir>/oracle_sql.json in DuckDB (tables registered as views over
<sfDir>/*.parquet), and compares: column names (sorted), row count, and a
canonical hash of sorted rows with floats rounded to 9 significant digits.

Dev-only tool (mirrors the driver); the engine itself has no Python deps.
"""
import sys, json, glob, math, hashlib, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return "%.9g" % v
    if isinstance(v, bool):
        return "1" if v else "0"
    # dates/timestamps/decimals/ints -> str
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark parquet output")
            n_fail += 1
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        got_cols = list(got_rel.columns)
        got_rows = got_rel.fetchall()
        if name not in oracle:
            print(f"[skip] {name}: no oracle sql (rows={len(got_rows)})")
            n_skip += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = list(exp_rel.columns)
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in got_cols) != sorted(c.lower() for c in exp_cols):
            print(f"[FAIL] {name}: columns differ\n  spark:  {sorted(got_cols)}\n  oracle: {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"[FAIL] {name}: row count spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
            continue
        gh, gl = frame_sig([c.lower() for c in got_cols], got_rows)
        eh, el = frame_sig([c.lower() for c in exp_cols], exp_rows)
        if gh != eh:
            ndiff = len([1 for a, b in zip(gl, el) if a != b])
            # Distinguish ulp-level float-rounding flips from real mismatches:
            # retry with coarse 6-sig-digit canonicalization.
            def coarse(rows, cols):
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                def c6(v):
                    if isinstance(v, float) and not math.isnan(v) and v != 0:
                        return "%.6g" % v
                    return canon(v)
                return sorted("\x01".join(c6(r[i]) for i in order) for r in rows)
            if coarse(got_rows, got_cols) == coarse(exp_rows, exp_cols):
                print(f"[pass~] {name}: exact-hash miss but matches at 6 sig digits ({ndiff} knife-edge rows)")
                n_pass += 1
                continue
            diffs = [(a, b) for a, b in zip(gl, el) if a != b][:3]
            print(f"[FAIL] {name}: hash mismatch ({ndiff}/{len(gl)} rows differ)")
            for a, b in diffs:
                print(f"  spark:  {a[:240]}")
                print(f"  oracle: {b[:240]}")
            n_fail += 1
        else:
            print(f"[pass] {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
