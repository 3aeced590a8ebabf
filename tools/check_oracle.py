#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over <sfDir>/*.parquet tables, and
compares: row count, column names (sorted), and per-row value hashes with rows
sorted canonically. Exit 0 iff all match.
"""
import sys, os, json, glob
import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def bitwise(df: pd.DataFrame) -> pd.DataFrame:
    """Replace float64 columns with their uint64 bit patterns (NaN/null
    canonicalized to one pattern) so the comparison is BYTEWISE — exactly as
    strict as the driver's hasher. pandas `.equals` treats -0.0 == +0.0,
    which let the q163 signed-zero divergence ship in r7; this view does
    not."""
    df = df.copy()
    canon_nan = np.uint64(0x7FF8000000000000)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            v = df[c].to_numpy(dtype="float64", na_value=np.nan)
            bits = v.view(np.uint64).copy()
            bits[np.isnan(v)] = canon_nan
            df[c] = bits
    return df


def selftest():
    """Prove the bitwise gate catches what pandas `.equals` misses."""
    a = pd.DataFrame({"x": [1.5, 0.0, float("nan")]})
    b = pd.DataFrame({"x": [1.5, -0.0, float("nan")]})
    assert a.equals(b), "pandas itself should conflate -0.0 == +0.0"
    assert not bitwise(a).equals(bitwise(b)), "bitwise gate must flag -0.0 vs +0.0"
    c = pd.DataFrame({"x": [1.5, 0.0, float("nan")]})
    assert bitwise(a).equals(bitwise(c)), "identical frames (incl NaN) must pass"
    print("selftest ok: -0.0 vs +0.0 flagged; NaN==NaN canonicalized")
    sys.exit(0)


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures, passed, skipped = [], 0, 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            failures.append((name, "no spark output parquet"))
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        if name not in oracle:
            skipped += 1
            if len(got) == 0:
                failures.append((name, "rows-only check: 0 rows"))
            else:
                print(f"  ~ {name}: no oracle, rows={len(got)} (rows-only ok)")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"columns differ: spark={list(g.columns)} duckdb={list(e.columns)}"))
            continue
        if len(g) != len(e):
            failures.append((name, f"row count differs: spark={len(g)} duckdb={len(e)}"))
            continue
        gb, eb = bitwise(g), bitwise(e)
        if not gb.equals(eb):
            neq = (gb != eb) & ~(gb.isna() & eb.isna())
            bad = neq.any(axis=1)
            idx = list(g.index[bad])[:3]
            detail = []
            for i in idx:
                cols = [c for c in g.columns if neq.at[i, c]]
                detail.append(f"row {i} {[(c, g.at[i, c], e.at[i, c]) for c in cols]}")
            failures.append((name, "values differ: " + "; ".join(map(str, detail))))
            continue
        passed += 1
        print(f"  ✓ {name}: {len(g)} rows")
    print(f"\n{passed} passed, {skipped} rows-only, {len(failures)} failed")
    for n, msg in failures:
        print(f"  ✗ {n}: {msg}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
