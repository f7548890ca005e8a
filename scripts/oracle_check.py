#!/usr/bin/env python3
"""Full oracle gate: run every oracle_sql.json entry in DuckDB over the
sf parquet corpus and compare against the Spark parquet outputs the
same way the driver does (sort columns by name, sort rows, compare
stringified values exactly, NULL == NULL)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(oracle)
fails, no_oracle = [], []

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str).where(~df.isna(), "<NULL>")
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

spark_outs = {d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d))}
missing = [n for n in names if n not in spark_outs]
checked = 0
for name in names:
    sql = oracle[name]
    if not sql:
        no_oracle.append(name)
        continue
    if name not in spark_outs:
        fails.append((name, "oracle entry has no Spark output (query dropped from Verify run?)"))
        continue
    try:
        o = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    s = pd.read_parquet(f"{outdir}/{name}")
    co, cs = canon(o), canon(s)
    if list(co.columns) != list(cs.columns):
        fails.append((name, f"schema: oracle {list(co.columns)} vs spark {list(cs.columns)}"))
        continue
    if len(co) != len(cs):
        fails.append((name, f"rows: oracle {len(co)} vs spark {len(cs)}"))
        continue
    if not co.equals(cs):
        diff = (co != cs)
        cells = diff.to_numpy().sum()
        # first differing row for debugging
        idx = diff.any(axis=1).idxmax()
        fails.append((name, f"hash: {cells} differing cells; first at row {idx}:\n  oracle: {co.loc[idx].to_dict()}\n  spark:  {cs.loc[idx].to_dict()}"))
        continue
    checked += 1

# checked counts fully passing queries; compared = everything we attempted
compared = checked + len(fails)
print(f"checked={compared} pass={checked} fail={len(fails)} "
      f"no_oracle={len(no_oracle)} spark_outputs={len(spark_outs)}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
if no_oracle:
    print("no_oracle:", ",".join(no_oracle))
if missing:
    print("oracle entries with no spark output:", ",".join(missing))
sys.exit(1 if fails else 0)
