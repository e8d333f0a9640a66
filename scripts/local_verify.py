#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB over the sf parquet
tables and compares against the Spark results written by graft.Verify.
Usage:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.map(
                                lambda v: '' if pd.isna(v) else str(v)))
    return df.reset_index(drop=True)


# Mirrors the driver's hash compare: the driver hashes the materialized
# frames exactly, so an int64 Spark column vs a float64 oracle column
# (e.g. DuckDB HUGEINT sum() -> pandas float64) must FAIL even when the
# values are numerically identical.
def dtype_family(dtype) -> str:
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def values_equal(a, b) -> bool:
    """Exact equality — no tolerance, matching the driver's hash gate."""
    if pd.isna(a) is True and pd.isna(b) is True:
        return True
    if (pd.isna(a) is True) != (pd.isna(b) is True):
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    # Explicit sequence types only: a bare hasattr(a, "tolist") check
    # would also route numpy SCALARS (np.int64 etc.) here and crash on
    # list(scalar). Current pandas yields Python scalars when iterating
    # numeric Series, but don't depend on that.
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
        if np.isscalar(a) or np.isscalar(b):
            return False
        la = list(a.tolist() if isinstance(a, np.ndarray) else a)
        lb = list(b.tolist() if isinstance(b, np.ndarray) else b)
        return len(la) == len(lb) and all(
            values_equal(x, y) for x, y in zip(la, lb))
    if isinstance(a, np.generic) or isinstance(b, np.generic):
        # numpy scalar vs python scalar: compare as plain values.
        return bool(np.asarray(a) == np.asarray(b))
    return bool(a == b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET threads TO 4")
    con.execute("SET memory_limit = '8GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            failures += 1
            continue
        bad_dtype = [
            (c, dtype_family(g[c].dtype), dtype_family(e[c].dtype))
            for c in g.columns
            if dtype_family(g[c].dtype) != dtype_family(e[c].dtype)]
        if bad_dtype:
            c, fg, fe = bad_dtype[0]
            print(f"FAIL {name}: dtype family col={c}: spark={fg} oracle={fe}")
            failures += 1
            continue
        mismatch = None
        for col in g.columns:
            for i, (a, b) in enumerate(zip(g[col], e[col])):
                if not values_equal(a, b):
                    mismatch = (col, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            col, i, a, b = mismatch
            print(f"FAIL {name}: value mismatch col={col} row={i}: {a!r} vs {b!r}")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows, {len(g.columns)} cols")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
