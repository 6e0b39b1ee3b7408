#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same parquet tables, canonicalizes both (columns sorted by name, rows
sorted by all columns), and reports exact match / mismatch.

Dev-tool only — the shipped Scala library has no python dependency.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, ints to int64 where lossless
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]) or str(df[c].dtype) == "boolean" or df[c].dtype == object:
            # unify None/<NA>/nan and bools/Decimals across engines;
            # list-valued cells (np.ndarray/list) stringify directly —
            # pd.isna on them is elementwise and would raise
            df[c] = df[c].map(lambda v: str(list(v)) if isinstance(v, (list, np.ndarray))
                              else ("NULL" if pd.isna(v) else str(v)))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        if name == "events":
            con.execute(f"CREATE VIEW events AS SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM read_parquet('{p}')")
        else:
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    failures = []
    for name in sorted(oracles):
        sql = oracles[name]
        resdir = os.path.join(outdir, name)
        if not os.path.isdir(resdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; failures.append(name); continue
        try:
            got = canon(pd.read_parquet(resdir))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; failures.append(name); continue
        ok = list(got.columns) == list(want.columns) and len(got) == len(want)
        detail = ""
        if ok:
            for c in got.columns:
                g, w = got[c], want[c]
                # Match the driver's strictness: an integer column on one
                # side vs a float column on the other hashes differently
                # ("5" vs "5.0") even when values are equal — DuckDB widens
                # uncast SUM(int) to HUGEINT->float64. Fail it here so the
                # local gate can never pass what the driver fails.
                gi = pd.api.types.is_integer_dtype(g)
                wi = pd.api.types.is_integer_dtype(w)
                gf = pd.api.types.is_float_dtype(g)
                wf = pd.api.types.is_float_dtype(w)
                if (gi and wf) or (gf and wi):
                    ok = False
                    detail = (f" col={c} dtype mismatch got={g.dtype} want={w.dtype}"
                              f" (cast the oracle aggregate, e.g. CAST(SUM(..) AS BIGINT))")
                    break
                if gf or wf:
                    eq = ((g.isna() & w.isna()) | (g.astype(float).values == w.astype(float).values))
                else:
                    eq = (g.isna() & w.isna()) | (g.values == w.values)
                if not bool(np.all(eq)):
                    ok = False
                    i = int(np.argmin(np.asarray(eq)))
                    detail = f" col={c} row={i} got={g.iloc[i]!r} want={w.iloc[i]!r}"
                    break
        else:
            detail = f" cols got={list(got.columns)} want={list(want.columns)} rows got={len(got)} want={len(want)}"
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}:{detail}"); n_fail += 1; failures.append(name)
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {failures}" if failures else ""))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
