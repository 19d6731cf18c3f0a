#!/usr/bin/env python3
"""Compare two (sets of) Bench JSON artifacts: median per query per side,
calibration medians, and per-query ratios. Usage:
  bench_cmp.py A.json[,A2.json...] B.json[,B2.json...]
"""
import json, statistics, sys

def load(paths):
    qs, cals = {}, []
    for p in paths.split(','):
        d = json.load(open(p))
        cals += d.get('calibration', [])
        for k, v in d['queries'].items():
            if v >= 0:
                qs.setdefault(k, []).append(v)
    return {k: statistics.median(v) for k, v in qs.items()}, \
        (statistics.median(cals) if cals else None)

a, ca = load(sys.argv[1])
b, cb = load(sys.argv[2])
print(f"calibration medians: A={ca:.3f} B={cb:.3f} (B/A={cb/ca:.2f})")
rows = [(b[k]/a[k], k, a[k], b[k]) for k in a if k in b]
rows.sort()
ta, tb = sum(a[k] for _, k, _, _ in rows), sum(b[k] for _, k, _, _ in rows)
print(f"shared-total: A={ta:.2f}s B={tb:.2f}s  B/A={tb/ta:.3f}")
g = statistics.geometric_mean([r for r, *_ in rows])
print(f"geomean B/A: {g:.3f}")
for r, k, va, vb in rows:
    print(f"{r:5.2f}  {k:35s} A={va:7.3f} B={vb:7.3f}")
