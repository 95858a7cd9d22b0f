#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.
Usage: compare_oracle.py <sfDir> <verifyOutDir>"""
import duckdb, json, glob, sys
import pandas as pd, numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    files = sorted(glob.glob(f'{out}/{name}/*.parquet'))
    if not files:
        fails.append((name, 'no spark output')); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f'oracle SQL error: {e}')); continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        fails.append((name, f'cols: spark={list(s.columns)} duck={list(d.columns)}')); continue
    if len(s) != len(d):
        fails.append((name, f'rows: spark={len(s)} duck={len(d)}')); continue
    bad = []
    for c in s.columns:
        a, b = s[c].values, d[c].values
        eq = (pd.isna(a) & pd.isna(b)) | (a == b)
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append(f'{c}[{i}]: spark={a[i]!r} duck={b[i]!r} ({s[c].dtype}/{d[c].dtype}) n_bad={int((~eq).sum())}')
    if bad: fails.append((name, '; '.join(bad[:2])))
for name, msg in fails: print('FAIL', name, '--', msg[:400])
print(('ALL PASS' if not fails else f'{len(fails)} FAILURES'), '/', len(oracle), 'oracled queries')
