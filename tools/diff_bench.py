#!/usr/bin/env python3
"""Diff two Bench JSON artifacts: per-query ratio table (worst first),
plan-hash flips, and totals. Usage: diff_bench.py OLD.json NEW.json
[ratio_threshold]."""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

oq, nq = old["queries"], new["queries"]
op, np_ = old.get("plans", {}), new.get("plans", {})
common = sorted(set(oq) & set(nq))
added = sorted(set(nq) - set(oq))
removed = sorted(set(oq) - set(nq))

rows = []
for q in common:
    o, n = oq[q], nq[q]
    rows.append((n / o if o else float("inf"), q, o, n,
                 "FLIP" if op.get(q) and np_.get(q) and op[q] != np_[q] else ""))
rows.sort(reverse=True)

print(f"common {len(common)}  added {len(added)}  removed {len(removed)}")
print(f"sum old(common) {sum(oq[q] for q in common):.1f}s  "
      f"new(common) {sum(nq[q] for q in common):.1f}s  "
      f"new(all) {sum(nq.values()):.1f}s")
print(f"\nqueries above {thr}x:")
for r, q, o, n, flip in rows:
    if r >= thr:
        print(f"  {q:40s} {o:6.2f} -> {n:6.2f}  ({r:4.2f}x) {flip}")
print("\nqueries below 1/%.1fx:" % thr)
for r, q, o, n, flip in sorted(rows):
    if r <= 1 / thr:
        print(f"  {q:40s} {o:6.2f} -> {n:6.2f}  ({r:4.2f}x) {flip}")
flips = [q for _, q, _, _, f in rows if f]
print(f"\nplan-hash flips ({len(flips)}): {', '.join(flips) if flips else 'none'}")
if added:
    print(f"\nadded: " + ", ".join(f"{q} {nq[q]:.2f}s" for q in added))
