#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query
output parquet in OUTDIR, run the matching oracle SQL from
oracle_sql.json in DuckDB over the SFDIR tables and compare
(column-name-sorted, row-sorted, exact values)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # driver data ships single-file tables; ScaleGen (sf1/sf5) writes
    # Spark directory tables — glob the parts in that case
    src = f"{sfdir}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
results = {}

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    try:
        got = pd.read_parquet(path)
    except Exception as e:
        results[name] = f"READ_FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows_only rows={len(got)}" + (" EMPTY!" if len(got)==0 else "")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_FAIL {str(e)[:150]}"
        continue
    g, e = norm(got.copy()), norm(exp.copy())
    if list(g.columns) != list(e.columns):
        results[name] = f"COLS got={list(g.columns)} exp={list(e.columns)}"
        continue
    if len(g) != len(e):
        results[name] = f"ROWS got={len(g)} exp={len(e)}"
        continue
    bad = []
    for c in g.columns:
        gc, ec = g[c], e[c]
        # Driver's gate hashes FORMATTED values, so int64 123 vs float64
        # 123.0 (e.g. DuckDB sum(INTEGER) -> HUGEINT -> pandas float64)
        # is a hash mismatch even when numerically equal. Flag it here.
        kinds = {gc.dtype.kind, ec.dtype.kind}
        if kinds == {"i", "f"} or kinds == {"u", "f"}:
            bad.append(f"{c} DTYPE got={gc.dtype} exp={ec.dtype} (int-vs-float formats differently in the hash gate)")
            continue
        try:
            if str(gc.dtype).startswith("datetime") or str(ec.dtype).startswith("datetime"):
                ok = (pd.to_datetime(gc).values == pd.to_datetime(ec).values) | (gc.isna().values & ec.isna().values)
            elif gc.dtype == object or ec.dtype == object:
                ok = (gc.astype(str).values == ec.astype(str).values)
            else:
                ok = (gc.values == ec.values) | (pd.isna(gc).values & pd.isna(ec).values)
            if not ok.all():
                i = int((~ok).argmax())
                bad.append(f"{c}[{i}] got={gc.iloc[i]!r} exp={ec.iloc[i]!r} ndiff={int((~ok).sum())}")
        except Exception as ex:
            bad.append(f"{c} cmp_err {ex} dtypes {gc.dtype}/{ec.dtype}")
    results[name] = "OK" if not bad else "VAL " + "; ".join(bad[:3])

npass = sum(1 for v in results.values() if v == "OK" or v.startswith("rows_only rows=") and "EMPTY" not in v)
for k, v in results.items():
    flag = "PASS" if (v == "OK" or (v.startswith("rows_only") and "EMPTY" not in v)) else "FAIL"
    print(f"{flag}  {k}: {v}")
print(f"\n{npass}/{len(results)} pass")
