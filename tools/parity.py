#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Reads the Verify output directory (one parquet dir per query +
oracle_sql.json), runs each oracle statement in DuckDB against the same
scale-factor tables, and compares values with columns sorted by name and
rows sorted canonically. Reports exact match / near-miss (float drift) /
mismatch so oracle drift is visible before the driver round runs.

Usage: tools/parity.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os, time
import duckdb
import pandas as pd
import numpy as np

# An oracle slower than this at sf0.01 is a red flag: the driver's
# sweep runs every oracle sequentially, and one pathological statement
# (e.g. a multiply-referenced non-materialized CTE chain that DuckDB
# inlines exponentially) can hang the sweep and blank the round's
# correctness record — exactly what round 9's q157 did.
SLOW_ORACLE_SEC = 20.0

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to naive strings so tz-awareness can't differ
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            dt = df[c]
            try:
                dt = dt.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = dt.astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    slow = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            t0 = time.monotonic()
            exp = canon(con.sql(oracle[name]).df())
            oracle_sec = time.monotonic() - t0
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_bad += 1
            continue
        if oracle_sec > SLOW_ORACLE_SEC:
            print(f"SLOW-ORACLE {name}: {oracle_sec:.1f}s — the driver's sweep "
                  f"runs these sequentially; materialize CTEs or simplify "
                  f"before this becomes a hung round record")
            slow.append((name, oracle_sec))
        if got.shape != exp.shape:
            print(f"SHAPE    {name}: spark {got.shape} vs duckdb {exp.shape}")
            print(f"  spark cols:  {list(got.columns)}")
            print(f"  duckdb cols: {list(exp.columns)}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"COLS     {name}: {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c], exp[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                same = (a.isna() & b.isna()) | (a == b)
                if not same.all():
                    close = np.isclose(a.fillna(np.nan), b.fillna(np.nan), rtol=1e-9, equal_nan=True)
                    kind = "NEARMISS" if close.all() else "VALUES  "
                    i = int(np.argmin(same.values))
                    print(f"{kind} {name}.{c}: row {i} spark={a.iloc[i]!r} duckdb={b.iloc[i]!r} "
                          f"(n_diff={int((~same).sum())})")
                    eq = False
            else:
                same = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
                if not same.all():
                    i = int(np.argmin(same.values))
                    print(f"VALUES   {name}.{c}: row {i} spark={a.iloc[i]!r} duckdb={b.iloc[i]!r} "
                          f"(n_diff={int((~same).sum())})")
                    eq = False
        if eq:
            print(f"OK       {name}  ({got.shape[0]} rows x {got.shape[1]} cols)")
            n_ok += 1
        else:
            n_bad += 1
    if slow:
        worst = ", ".join(f"{n}={s:.1f}s" for n, s in slow)
        print(f"\nWARNING: {len(slow)} slow oracle(s): {worst}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
