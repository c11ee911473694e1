#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify output
parquet, run the oracle SQL in DuckDB over the same source tables, compare
row count / column names / values (columns sorted by name, exact compare).
Usage: python3 tools/check.py [sfdir] [outdir] [only_prefix]
"""
import duckdb, glob, json, math, os, sys
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = sys.argv[3] if len(sys.argv) > 3 else ''

con = duckdb.connect()
for f in glob.glob(f'{sf}/*.parquet'):
    name = os.path.basename(f).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
results = {}
for name in sorted(os.listdir(out)):
    dirp = os.path.join(out, name)
    if not os.path.isdir(dirp):
        continue
    if only and not name.startswith(only):
        continue
    files = glob.glob(f'{dirp}/*.parquet')
    if not files:
        results[name] = 'NO_OUTPUT'
        continue
    sdf = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
    if name not in oracle:
        results[name] = f'rows_only rows={len(sdf)}' + ('' if len(sdf) > 0 else ' EMPTY!')
        continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        results[name] = f'ORACLE_SQL_ERROR: {str(e)[:200]}'
        continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        results[name] = f'COLS_MISMATCH spark={scols} oracle={ocols}'
        continue
    if len(sdf) != len(odf):
        results[name] = f'ROWS_MISMATCH spark={len(sdf)} oracle={len(odf)}'
        continue
    sdf, odf = sdf[scols], odf[scols]
    bad = None
    for c in scols:
        sv, ov = sdf[c], odf[c]
        # normalize timestamps to us
        if 'datetime' in str(sv.dtype) or 'datetime' in str(ov.dtype):
            sv = pd.to_datetime(sv).astype('datetime64[us]')
            ov = pd.to_datetime(ov).astype('datetime64[us]')
        for i, (a, b) in enumerate(zip(sv.tolist(), ov.tolist())):
            eq = (a == b) or (a is None and b is None) or \
                 (isinstance(a, float) and isinstance(b, float) and
                  ((math.isnan(a) and math.isnan(b)) or a == b)) or \
                 (pd.isna(a) and pd.isna(b))
            if not eq:
                bad = f'VALUE_MISMATCH col={c} row={i} spark={a!r} oracle={b!r}'
                break
        if bad:
            break
    # dtype check: flag kind mismatches (int vs float vs object vs bool)
    if not bad:
        for c in scols:
            sk = sdf[c].dtype
            ok = odf[c].dtype
            def kind(d):
                s = str(d)
                if 'datetime' in s: return 'ts'
                if s == 'object': return 'obj'
                return getattr(d, 'kind', '?')
            if kind(sk) != kind(ok) or (kind(sk) == 'i' and str(sk) != str(ok)):
                bad = f'DTYPE col={c} spark={sk} oracle={ok}'
                break
    results[name] = bad or 'OK'

n_ok = sum(1 for v in results.values() if v == 'OK')
n_rows_only = sum(1 for v in results.values() if str(v).startswith('rows_only'))
for k, v in sorted(results.items()):
    flag = ' ' if v == 'OK' or str(v).startswith('rows_only') else '*'
    print(f'{flag} {k}: {v}')
print(f'\n{n_ok} OK, {n_rows_only} rows-only, {len(results)-n_ok-n_rows_only} FAIL of {len(results)}')
