#!/usr/bin/env python3
"""Local stand-in for the driver's t2 compare: run Verify's parquet dumps
against the DuckDB oracle (oracle_sql.json) over the same sf tables.
Columns sorted by name; rows compared in result order; floats to 4dp."""
import sys, os, json, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.4f}"
    return str(v)

fails = 0
present = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
for missing in sorted(set(oracle) - present):
    print(f"{missing}: MISSING OUTPUT (query failed in Verify)")
    fails += 1
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d): continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    if name not in oracle:
        print(f"{name}: rows-only ({len(got)} rows) {'OK' if len(got)>0 else 'EMPTY!'}")
        if len(got) == 0: fails += 1
        continue
    exp = con.execute(oracle[name]).fetchdf()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    ok = True
    if list(got.columns) != list(exp.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(got.columns)} duck={list(exp.columns)}"); ok = False
    elif len(got) != len(exp):
        print(f"{name}: ROWCOUNT {len(got)} vs {len(exp)}"); ok = False
    else:
        grows = [[canon(v) for v in r] for r in got.itertuples(index=False)]
        erows = [[canon(v) for v in r] for r in exp.itertuples(index=False)]
        if grows != erows:
            ok = False
            for i, (g, e) in enumerate(zip(grows, erows)):
                if g != e:
                    print(f"{name}: first diff row {i}: spark={g} duck={e}")
                    break
    if ok: print(f"{name}: OK ({len(got)} rows)")
    else: fails += 1
print(f"\n{'FAIL ' + str(fails) if fails else 'ALL OK'}")
sys.exit(1 if fails else 0)
