#!/usr/bin/env python3
"""Reformat a JobCountSweep SPARK_GRAFT_JOBS_OUT dump into the committed
JOBS.json census artifact: one query per line, sorted by name, so the
round-over-round job-count diff reads like the bench diff does.

Usage: format_jobs.py <sweep_out.json> <JOBS.json>
"""
import json
import sys

src, dst = sys.argv[1], sys.argv[2]
d = json.load(open(src))
incomplete = sorted(k for k, v in d["queries"].items() if v.get("incomplete"))
if incomplete:
    sys.exit(f"refusing to commit an INCOMPLETE census: {incomplete}")
failed = sorted(k for k, v in d["queries"].items() if v.get("failed"))
if failed:
    sys.exit(f"refusing to commit a census with FAILED queries: {failed}")
lines = [f'  "{k}": {v["jobs"]}' for k, v in sorted(d["queries"].items())]
head = (f'  "_sf": "{d["sf"]}",\n  "_cpus": "{d["cpus"]}",\n'
        f'  "_n_queries": {d["n_queries"]},\n'
        f'  "_total_jobs": {d["total_jobs"]},\n')
open(dst, "w").write("{\n" + head + ",\n".join(lines) + "\n}\n")
json.load(open(dst))
print(f"{dst}: {d['n_queries']} queries, {d['total_jobs']} jobs")
