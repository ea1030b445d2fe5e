#!/usr/bin/env python3
"""Multi-scale variant of compare.py (same canon/compare semantics) for
oracle replays at sf0.1, where some generated oracle SQLs (suffix-family
unrolls) exceed DuckDB's default in-memory budget:
  - file-backed DuckDB database + temp_directory so blocking operators
    SPILL instead of dying (preserve_insertion_order stays DEFAULT —
    see the in-function note: disabling it reordered ORDER BY results),
  - per-query try/except with a fresh connection after a failure, so one
    oracle OOM records as ORACLE-OOM and the sweep continues,
  - optional resume: --skip-ok <prior log> skips queries already OK.
The driver's gate stays tools/compare.py (sf0.01, all in-memory); this
tool exists to extend the evidence to other scales without pretending an
oracle-engine limit is an engine mismatch."""
import sys, os, json, math, gc
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
skip = set()
if len(sys.argv) > 4 and sys.argv[3] == "--skip-ok":
    for line in open(sys.argv[4]):
        if ": OK" in line or ": rows-only" in line:
            skip.add(line.split(":")[0].strip())

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def fresh_con():
    try: os.remove("/tmp/duck_scale.db")
    except OSError: pass
    con = duckdb.connect("/tmp/duck_scale.db")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    # NOTE: preserve_insertion_order stays at the DEFAULT (true). An
    # earlier sweep set it false for memory and DuckDB returned rows of
    # ORDER BY-terminated UNION ALL plans out of order in fetchdf() -
    # five ordered certificate queries "mismatched" on row order alone.
    # Spilling via temp_directory is the memory relief instead.
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

con = fresh_con()
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return f"{v:.4f}"
    return str(v)

fails, oracle_limits = 0, 0
present = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
for missing in sorted(set(oracle) - present):
    print(f"{missing}: MISSING OUTPUT (query failed in Verify)", flush=True)
    fails += 1
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d): continue
    if name in skip:
        print(f"{name}: OK (skipped, prior log)", flush=True); continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    if name not in oracle:
        print(f"{name}: rows-only ({len(got)} rows) {'OK' if len(got)>0 else 'EMPTY!'}", flush=True)
        if len(got) == 0: fails += 1
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except (duckdb.OutOfMemoryException, MemoryError) as e:
        print(f"{name}: ORACLE-OOM at this scale ({type(e).__name__}) — engine output present, oracle replay exceeds the oracle engine's memory", flush=True)
        oracle_limits += 1
        con.close(); gc.collect(); con = fresh_con()
        continue
    except Exception as e:
        msg = str(e)
        if "No space left" in msg:
            # spill exhausted the disk: an oracle-engine capacity limit,
            # same bucket as in-memory OOM
            print(f"{name}: ORACLE-OOM at this scale (spill exceeded free disk) — engine output present", flush=True)
            oracle_limits += 1
        else:
            print(f"{name}: ORACLE-ERROR {type(e).__name__}: {msg[:200]}", flush=True)
            fails += 1
        con.close(); gc.collect(); con = fresh_con()
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    ok = True
    if list(got.columns) != list(exp.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(got.columns)} duck={list(exp.columns)}", flush=True); ok = False
    elif len(got) != len(exp):
        print(f"{name}: ROWCOUNT {len(got)} vs {len(exp)}", flush=True); ok = False
    else:
        grows = [[canon(v) for v in r] for r in got.itertuples(index=False)]
        erows = [[canon(v) for v in r] for r in exp.itertuples(index=False)]
        if grows != erows:
            ok = False
            for i, (g, e) in enumerate(zip(grows, erows)):
                if g != e:
                    print(f"{name}: first diff row {i}: spark={g} duck={e}", flush=True)
                    break
    if ok: print(f"{name}: OK ({len(got)} rows)", flush=True)
    else: fails += 1
print(f"\nmismatches={fails} oracle_memory_limits={oracle_limits}", flush=True)
print(("FAIL " + str(fails)) if fails else "ALL COMPARED OK", flush=True)
sys.exit(1 if fails else 0)
