import duckdb, json, glob, sys, math
import pandas as pd
sfdir = sys.argv[1] if len(sys.argv)>1 else '/root/testdata/sf0.001'
outdir = sys.argv[2] if len(sys.argv)>2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"create view {t} as select * from '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
fails = []
for name, sql in sorted(oracle.items()):
    try:
        got = pd.read_parquet(f'{outdir}/{name}')
        want = con.sql(sql).df()
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            fails.append((name, f"cols {list(g.columns)} vs {list(w.columns)}")); continue
        # The driver's hash compare is dtype-sensitive (round-1 lesson:
        # DuckDB HUGEINT -> float64 vs Spark int64 fails the hash even when
        # every value matches), so dtype mismatches are failures here too.
        bad = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
               if g[c].dtype != w[c].dtype]
        if bad:
            fails.append((name, f"dtypes {bad}")); continue
        if len(g) != len(w):
            fails.append((name, f"rows {len(g)} vs {len(w)}")); continue
        ok = True
        for c in g.columns:
            a, b = g[c].tolist(), w[c].tolist()
            for x, y in zip(a, b):
                if isinstance(x, float) or isinstance(y, float):
                    if not (x==y or (isinstance(x,float) and isinstance(y,float) and math.isclose(x,y,rel_tol=0,abs_tol=1e-9)) or (pd.isna(x) and pd.isna(y))):
                        fails.append((name, f"col {c}: {x} vs {y}")); ok=False; break
                elif x != y:
                    fails.append((name, f"col {c}: {x!r} vs {y!r}")); ok=False; break
            if not ok: break
        if ok: print(f"OK    {name} ({len(g)} rows)")
    except Exception as e:
        fails.append((name, f"EXC {e}"))
for name, why in fails: print(f"FAIL  {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} match")
