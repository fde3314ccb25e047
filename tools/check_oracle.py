import duckdb, json, glob, os, sys
sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad, skipped = [], [], 0
for name, sql in sorted(oracle.items()):
    if not glob.glob(f"{outdir}/{name}/*.parquet"):
        skipped += 1  # filtered Verify run (3rd arg) — not a failure
        continue
    try:
        exp = con.execute(sql).df()
        got = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            bad.append((name, f"columns exp={list(exp.columns)} got={list(got.columns)}")); continue
        if exp.dtypes.tolist() != got.dtypes.tolist():
            bad.append((name, f"dtypes exp={exp.dtypes.tolist()} got={got.dtypes.tolist()}")); continue
        if len(exp) != len(got):
            bad.append((name, f"rows exp={len(exp)} got={len(got)}")); continue
        e = exp.fillna("<null>").astype(str).values.tolist()
        g = got.fillna("<null>").astype(str).values.tolist()
        if e == g: ok.append(name)
        elif sorted(map(tuple,e)) == sorted(map(tuple,g)): bad.append((name, "ORDER-ONLY mismatch"))
        else:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(e, g)) if a != b][:3]
            bad.append((name, f"values differ, first diffs: {diffs}"))
    except Exception as ex:
        bad.append((name, f"EXC {str(ex)[:200]}"))
print(f"OK ({len(ok)}):", " ".join(ok))
if skipped: print(f"SKIPPED (no dump — filtered run): {skipped}")
for name, msg in bad: print(f"FAIL {name}: {msg}")
