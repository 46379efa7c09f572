#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify.scala output
against DuckDB oracle SQL and compare per query (rows / schema / values).

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver-style: sort columns by name; then sort rows for stable compare
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        g, e = norm(got.copy()), norm(exp.copy())
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
            continue
        bad = []
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                ok = np.allclose(gv.astype(float), ev.astype(float), rtol=0, atol=0, equal_nan=True)
                if not ok:
                    # report max diff
                    diff = np.abs(gv.astype(float) - ev.astype(float))
                    bad.append(f"{c} maxdiff={np.nanmax(diff)}")
            else:
                if not (pd.Series(gv).astype(str).values == pd.Series(ev).astype(str).values).all():
                    idx = np.where(pd.Series(gv).astype(str).values != pd.Series(ev).astype(str).values)[0][:3]
                    bad.append(f"{c} first_mismatch_rows={idx.tolist()} got={gv[idx].tolist()} exp={ev[idx].tolist()}")
        results[name] = "OK rows=%d" % len(g) if not bad else "VALUE_MISMATCH " + "; ".join(bad)
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        print(f"{k:<{width}}  {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    # queries present in oracle but missing output
    missing = set(oracle) - set(results)
    if missing:
        print("MISSING OUTPUT:", sorted(missing))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
