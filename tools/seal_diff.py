#!/usr/bin/env python3
"""Per-query seal diff: compare two BENCH_LOCAL.json snapshots.

Usage: python3 tools/seal_diff.py <old.json> <new.json> [ratio_threshold]

Prints new/removed queries, total ratio, and every common query whose
time moved more than the threshold (default 1.3x) AND more than 0.4 s
absolute — the per-query granularity the cross-window drift caveat
requires (totals lie across host windows; per-query ratios on the same
host window do not).

Host-window normalization (round 15): the documented 143-194 s drift
span means a raw per-query ratio mixes two causes — the host window and
the plan. The window factor is computed mechanically as the MEDIAN
per-query ratio over all common queries >= 0.3 s (a plan change touches
a handful of queries; the median over ~100 rows is the window), and the
deviation lists below are NORMALIZED by it: a query is flagged only
when its ratio exceeds the threshold AFTER dividing out the window.
"window vs plan" is a printed number, not an argument.
"""
import json
import statistics
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
    print("removed:", ", ".join(f"{q}={oq[q]:.2f}s" for q in removed))
tot_o = sum(oq[q] for q in common)
tot_n = sum(nq[q] for q in common)
print(f"common-query total ratio: {tot_n / tot_o:.3f} ({tot_n:.1f}/{tot_o:.1f} s)")
# window factor: median per-query ratio over common queries big enough
# that the harness floor (~0.05 s) does not dominate the ratio
ratios = [nq[q] / oq[q] for q in common if oq[q] >= 0.3 and nq[q] >= 0.0]
window = statistics.median(ratios) if ratios else 1.0
print(f"window factor (median ratio, {len(ratios)} queries >=0.3s): "
      f"{window:.3f} — deviations below are normalized by it")
regs, imps = [], []
for q in common:
    o, n = oq[q], nq[q]
    nn = n / window  # window-normalized new time
    if nn > o * thr and nn - o > 0.4:
        regs.append((nn / max(o, 1e-9), q, o, n, nn))
    elif o > nn * thr and o - nn > 0.4:
        imps.append((o / max(nn, 1e-9), q, o, n, nn))
print(f"\nnormalized regressions >{thr}x and >0.4s ({len(regs)}):")
for r, q, o, n, nn in sorted(regs, reverse=True):
    print(f"  {q}: {o:.2f} -> {n:.2f} s raw, {nn:.2f} s normalized ({r:.2f}x)")
print(f"\nnormalized improvements >{thr}x and >0.4s ({len(imps)}):")
for r, q, o, n, nn in sorted(imps, reverse=True):
    print(f"  {q}: {o:.2f} -> {n:.2f} s raw, {nn:.2f} s normalized ({r:.2f}x)")
print("\nguards:", json.dumps(new.get("outliers")), json.dumps(new.get("shuffle_outliers")))
