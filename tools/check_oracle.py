import duckdb, json, sys, glob
import pyarrow.parquet as pq
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.001'
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
for t in ['documents','embeddings','lineitem','orders','customer','events','part','supplier','nation','region']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
allok = True
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = pq.read_table(glob.glob(f'{outdir}/{name}/*.parquet')[0]).to_pandas()
        # driver-style: sort columns by name
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        ok_schema = list(exp.columns) == list(got.columns)
        ok_rows = len(exp) == len(got)
        ok_vals = False
        if ok_schema and ok_rows:
            ok_vals = True
            for c in exp.columns:
                e, g = exp[c], got[c]
                if e.dtype.kind in 'fc':
                    import numpy as np
                    if not np.allclose(e.astype(float), g.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True): ok_vals=False; bad=c; break
                else:
                    if not (e.astype(str).values == g.astype(str).values).all(): ok_vals=False; bad=c; break
        status = 'OK' if (ok_schema and ok_rows and ok_vals) else 'FAIL'
        if status=='FAIL':
            allok=False
            print(f'{name}: FAIL schema={ok_schema} rows={ok_rows}({len(exp)}/{len(got)}) vals={ok_vals}')
            if ok_schema and ok_rows and not ok_vals:
                diff = exp[bad].astype(str).values != got[bad].astype(str).values
                idx = diff.nonzero()[0][:3]
                for i in idx:
                    print(f'  col {bad} row {i}:\n    exp={exp[bad].iloc[i]!r}\n    got={got[bad].iloc[i]!r}')
        else:
            print(f'{name}: OK ({len(got)} rows)')
    except Exception as ex:
        allok=False
        print(f'{name}: ERROR {ex}')
print('ALL OK' if allok else 'FAILURES')
