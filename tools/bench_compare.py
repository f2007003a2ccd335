#!/usr/bin/env python3
"""Compare two bench artifacts (BENCH_r*.json or bench_details.json).

Usage: python3 tools/bench_compare.py <old.json> <new.json> [ratio_flag]

Prints per-query new/old ratios (worst first), the median ratio (the
host-speed proxy when canaries are absent), and flags queries whose
ratio exceeds `ratio_flag` (default 2.0) AFTER dividing out the median
— i.e. genuine per-query regressions, not host drift. Tolerates the
truncated stdout-captured artifacts: parses whatever query keys are
present in both files.
"""
import sys, json, re, statistics

def load(path):
    txt = open(path).read()
    try:
        d = json.loads(txt)
        if d.get("queries"):
            return d["queries"], d
        # driver wrapper around a truncated capture: scavenge the tail
        txt = d.get("tail", "")
        raise json.JSONDecodeError("wrapper", txt, 0)
    except json.JSONDecodeError:
        # truncated one-line artifact: scavenge "name":float pairs
        qs = {}
        for m in re.finditer(r'"([a-z0-9_]+)"\s*:\s*([0-9.]+)', txt):
            k, v = m.group(1), float(m.group(2))
            if k not in ("value", "total", "n", "sf", "canary_first",
                         "canary_second", "failed_n"):
                qs[k] = v
        return qs, {}

old_p, new_p = sys.argv[1], sys.argv[2]
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
old, dold = load(old_p)
new, dnew = load(new_p)
common = sorted(set(old) & set(new))
if not common:
    print("no common queries"); sys.exit(1)
ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
med = statistics.median(ratios.values())
print(f"common={len(common)}  old-only={len(set(old)-set(new))}  "
      f"new-only={len(set(new)-set(old))}  median_ratio={med:.2f}")
for side, d in (("old", dold), ("new", dnew)):
    if d.get("canary_first") is not None:
        print(f"{side} canaries: {d.get('canary_first')}/{d.get('canary_second')}")
worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:15]
print(f"{'query':34s} {'old_s':>8s} {'new_s':>8s} {'ratio':>6s} {'norm':>6s}")
flagged = 0
for q, r in worst:
    norm = r / med
    mark = "  <-- REGRESSION" if norm > flag else ""
    if mark:
        flagged += 1
    print(f"{q:34s} {old[q]:8.2f} {new[q]:8.2f} {r:6.2f} {norm:6.2f}{mark}")
print(f"flagged (norm ratio > {flag}): {flagged}")
sys.exit(0)
