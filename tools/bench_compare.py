#!/usr/bin/env python3
"""Compare bench artifacts (BENCH_r*.json or bench_details.json).

Two-file mode:
  python3 tools/bench_compare.py <old.json> <new.json> [ratio_flag]

Prints per-query new/old ratios (worst first), the median ratio (the
host-speed proxy when canaries are absent), and flags queries whose
ratio exceeds `ratio_flag` (default 2.0) AFTER dividing out the median
— i.e. genuine per-query regressions, not host drift. Tolerates the
truncated stdout-captured artifacts: parses whatever query keys are
present in both files.

Band mode (VERDICT r13 next §6 — the five-run discipline, automated):
  python3 tools/bench_compare.py --band <snap1.json> ... [--out report.md]

Reads N bench_details.json snapshots of the SAME suite and emits the
per-query band (min..max seconds across runs), each run's host factor
(median of its queries against the cross-run per-query median — the
canary discipline derived from the data itself), and the worst
HOST-NORMALIZED spread per query: max over runs of t/host_factor
divided by min over runs of the same. A query whose normalized spread
exceeds the flag (default 2.0) moved more than the host did — the
actual regression signal the closing claim needs. With --out the full
table lands as a markdown artifact; stdout always carries the summary.
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

def band_mode(argv):
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    snaps = [(p, load(p)[0]) for p in argv]
    if len(snaps) < 2:
        print("band mode needs >= 2 snapshots"); sys.exit(1)
    common = sorted(set.intersection(*(set(q) for _, q in snaps)))
    if not common:
        print("no common queries"); sys.exit(1)
    # per-query cross-run median is the reference; each run's host
    # factor is the median of its ratios against that reference
    ref = {q: statistics.median(qs[q] for _, qs in snaps) for q in common}
    hf = {p: statistics.median(qs[q] / ref[q] for q in common if ref[q] > 0)
          for p, qs in snaps}
    rows = []
    for q in common:
        ts = [(qs[q], qs[q] / hf[p]) for p, qs in snaps]
        lo, hi = min(t for t, _ in ts), max(t for t, _ in ts)
        nlo, nhi = min(n for _, n in ts), max(n for _, n in ts)
        rows.append((q, lo, hi, (nhi / nlo) if nlo > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    flag = 2.0
    flagged = [r for r in rows if r[3] > flag]
    lines = []
    lines.append(f"# Bench band over {len(snaps)} runs, "
                 f"{len(common)} common queries")
    lines.append("")
    lines.append("Host factors (median vs cross-run per-query median): " +
                 ", ".join(f"{p.split('/')[-1]}={hf[p]:.2f}" for p, _ in snaps))
    totals = [sum(qs[q] for q in common) for _, qs in snaps]
    lines.append(f"Suite totals over common queries: "
                 f"{min(totals):.1f}–{max(totals):.1f} s")
    lines.append(f"Worst host-normalized spread: {rows[0][0]} "
                 f"{rows[0][3]:.2f}x; queries over {flag}x: {len(flagged)}")
    lines.append("")
    lines.append("| query | band (s) | normalized spread |")
    lines.append("|---|---|---|")
    for q, lo, hi, spread in rows:
        lines.append(f"| {q} | {lo:.2f}–{hi:.2f} | {spread:.2f}x |")
    report = "\n".join(lines) + "\n"
    if out_path:
        open(out_path, "w").write(report)
        print("\n".join(lines[:8]))
        print(f"... full table written to {out_path}")
    else:
        print(report)
    sys.exit(0)

if sys.argv[1] == "--band":
    band_mode(sys.argv[2:])

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
