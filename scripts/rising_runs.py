#!/usr/bin/env python3
"""Rising-run detector over a Bench per-query artifact (verdict r16 item
#2): min-of-N deliberately hides a within-cell monotone RISE (run3 slower
than run1 — storage/state accumulating inside the JVM across a query's own
runs), and the medians sidecar only catches uniform ambient shifts. Four
r16 cells with this signature (3 of them fused-CC consumers) were found by
judge inspection; this makes them self-announcing.

Flags any cell where the LAST raw run exceeds 1.5x the FIRST and the
absolute delta exceeds 0.5 s; annotates whether the cell is strictly
monotone (every run slower than the previous — the strongest form).
The common benign shape (run1 slowest = JIT warm-up) can never trip this.

Usage: rising_runs.py <bench_queries.json> [...]   # exit 1 if any flagged
"""
import json
import sys

RATIO, DELTA = 1.5, 0.5

rc = 0
for path in sys.argv[1:]:
    d = json.load(open(path))
    flagged = []
    for name, cell in sorted(d["queries"].items()):
        runs = cell.get("runs_raw") or cell.get("runs") or []
        if len(runs) < 2:
            continue
        first, last = runs[0], runs[-1]
        if last > RATIO * first and last - first > DELTA:
            mono = all(b > a for a, b in zip(runs, runs[1:]))
            flagged.append((name, runs, mono))
    print(f"{path}: {len(flagged)} rising cell(s) / {len(d['queries'])} queries")
    for name, runs, mono in flagged:
        shape = "monotone" if mono else "rising"
        print(f"  RISING {name:<28} {[round(r, 2) for r in runs]}  [{shape}]")
    rc |= 1 if flagged else 0
sys.exit(rc)
