#!/usr/bin/env python3
"""Cross-compare two Verify dumps: every query's output parquet must be
row- and value-identical between dumps (columns compared in sorted order,
exact values). The output half of the permuted-input sweep, and of the
width-invariance sweep (SPARK_GRAFT_CPUS=2 vs 8).

Usage: diff_dumps.py <dumpA> <dumpB>   # exits 1 on any difference
"""
import glob
import os
import sys

import pandas as pd

a, b = sys.argv[1], sys.argv[2]
# Union of both dumps (ADVICE r16: taking the query set from dump A alone
# let a query present only in dump B pass silently).
def subdirs(root):
    return {d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))}
names = sorted(subdirs(a) | subdirs(b))

def read_all(root, n):
    """Concat ALL part files (ADVICE r16: comparing only the first part
    silently under-compares if Verify ever stops coalescing to one file).
    Parts concat in sorted filename order; Verify's outputs carry a total
    ORDER BY, so multi-part outputs still compare deterministically."""
    parts = sorted(glob.glob(os.path.join(root, n, "*.parquet")))
    if not parts:
        return None
    df = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    return df

bad = []
for n in names:
    da = read_all(a, n)
    db = read_all(b, n)
    if da is None or db is None:
        bad.append((n, "missing output in dump " + ("A" if da is None else "B")))
        continue
    da = da.reindex(sorted(da.columns), axis=1)
    db = db.reindex(sorted(db.columns), axis=1)
    try:
        pd.testing.assert_frame_equal(da, db, check_exact=True)
    except AssertionError as e:
        bad.append((n, str(e).split(chr(10))[0]))
print(f"{len(names) - len(bad)}/{len(names)} content-identical")
for n, msg in bad:
    print("DIFF", n, msg)
sys.exit(1 if bad else 0)
