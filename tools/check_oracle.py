#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Reads the Verify dump (outDir/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf parquet tables, and compares: schema
(column names), row count, and a hash of all values with columns sorted by
name. This mimics the driver harness so oracle mismatches are caught before
a round ends. Dev-only tool — the engine itself is pure Scala/Spark.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def decimal_cols(df: pd.DataFrame) -> set:
    """Columns whose values are Python Decimals (Spark DecimalType or
    DuckDB DECIMAL surface as dtype=object holding decimal.Decimal)."""
    out = set()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            nn = s.dropna()
            if len(nn) and hasattr(nn.iloc[0], "as_tuple"):
                out.add(c)
    return out

def float_cols(df: pd.DataFrame) -> set:
    return {c for c in df.columns
            if np.issubdtype(df[c].dtype, np.floating)}

def type_drift(got: pd.DataFrame, exp: pd.DataFrame):
    """Driver-faithful type check: the driver hashes textual/typed values,
    so a Spark DECIMAL ('0.250000') vs oracle DOUBLE ('0.25') hash-differs
    even when canon()'s float coercion would call them equal. Flag any
    column decimal on one side and float on the other (ds_kanon r9)."""
    gd, ed = decimal_cols(got), decimal_cols(exp)
    gf, ef = float_cols(got), float_cols(exp)
    drift = sorted((gd & ef) | (ed & gf))
    return [f"{c}: spark={'DECIMAL' if c in gd else 'DOUBLE'} "
            f"oracle={'DECIMAL' if c in ed else 'DOUBLE'}" for c in drift]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.floating):
            df[c] = s.round(6)
        elif np.issubdtype(s.dtype, np.integer):
            df[c] = s.astype("int64")
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        parts = sorted(glob.glob(f"{qdir}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        got_raw = pd.read_parquet(qdir)
        try:
            exp_raw = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        drift = type_drift(got_raw, exp_raw)
        if drift:
            print(f"FAIL {name}: decimal/double type drift "
                  f"(driver hash would differ): {'; '.join(drift)}")
            n_fail += 1; continue
        got, exp = canon(got_raw), canon(exp_raw)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        eq = got.reset_index(drop=True).equals(exp.reset_index(drop=True))
        if not eq:
            diff = (got.reset_index(drop=True) != exp.reset_index(drop=True))
            bad = diff.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())} mismatched rows; first:")
            i = bad.idxmax()
            print("  spark:", got.iloc[i].to_dict())
            print("  duckdb:", exp.iloc[i].to_dict())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
