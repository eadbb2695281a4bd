import duckdb, json, glob, sys
sfdir = sys.argv[1] if len(sys.argv)>1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv)>2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); continue
    try:
        act = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"{name}: SPARK OUTPUT READ ERROR: {e}"); continue
    exp = exp[sorted(exp.columns)]; act = act[sorted(act.columns)]
    if list(exp.columns) != list(act.columns):
        print(f"{name}: COLUMN MISMATCH exp={list(exp.columns)} act={list(act.columns)}"); continue
    if len(exp) != len(act):
        print(f"{name}: ROWCOUNT MISMATCH exp={len(exp)} act={len(act)}"); continue
    e2 = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    a2 = act.sort_values(by=list(act.columns)).reset_index(drop=True)
    same = e2.equals(a2)
    if not same:
        # detailed diff
        diffcols = [c for c in e2.columns if not e2[c].equals(a2[c])]
        print(f"{name}: VALUE MISMATCH in cols {diffcols}")
        for c in diffcols[:2]:
            m = e2[c] != a2[c]
            print('  exp', e2[m][c].head(3).tolist(), 'act', a2[m][c].head(3).tolist())
    else:
        print(f"{name}: OK ({len(exp)} rows)")
