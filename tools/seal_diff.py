#!/usr/bin/env python3
"""Per-query seal diff: compare two BENCH_LOCAL.json snapshots.

Usage: python3 tools/seal_diff.py <old.json> <new.json> [ratio_threshold]

Prints new/removed queries, total ratio, and every common query whose
time moved more than the threshold (default 1.3x) AND more than 0.4 s
absolute — the per-query granularity the cross-window drift caveat
requires (totals lie across host windows; per-query ratios on the same
host window do not).
"""
import json
import sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
oq, nq = old["queries"], new["queries"]
common = sorted(set(oq) & set(nq))
print(f"old total {sum(oq.values()):.1f} s / {len(oq)} q (runs={old.get('runs')})")
print(f"new total {sum(nq.values()):.1f} s / {len(nq)} q (runs={new.get('runs')})")
added = sorted(set(nq) - set(oq))
removed = sorted(set(oq) - set(nq))
if added:
    print("added:", ", ".join(f"{q}={nq[q]:.2f}s" for q in added))
if removed:
    print("removed:", ", ".join(added))
tot_o = sum(oq[q] for q in common)
tot_n = sum(nq[q] for q in common)
print(f"common-query total ratio: {tot_n / tot_o:.3f} ({tot_n:.1f}/{tot_o:.1f} s)")
regs, imps = [], []
for q in common:
    o, n = oq[q], nq[q]
    if n > o * thr and n - o > 0.4:
        regs.append((n / max(o, 1e-9), q, o, n))
    elif o > n * thr and o - n > 0.4:
        imps.append((o / max(n, 1e-9), q, o, n))
print(f"\nregressions >{thr}x and >0.4s ({len(regs)}):")
for r, q, o, n in sorted(regs, reverse=True):
    print(f"  {q}: {o:.2f} -> {n:.2f} s ({r:.2f}x)")
print(f"\nimprovements >{thr}x and >0.4s ({len(imps)}):")
for r, q, o, n in sorted(imps, reverse=True):
    print(f"  {q}: {o:.2f} -> {n:.2f} s ({r:.2f}x)")
print("\nguards:", json.dumps(new.get("outliers")), json.dumps(new.get("shuffle_outliers")))
