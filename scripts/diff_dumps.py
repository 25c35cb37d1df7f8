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
names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
bad = []
for n in names:
    fa = glob.glob(os.path.join(a, n, "*.parquet"))
    fb = glob.glob(os.path.join(b, n, "*.parquet"))
    if not fa or not fb:
        bad.append((n, "missing output"))
        continue
    da = pd.read_parquet(sorted(fa)[0])
    db = pd.read_parquet(sorted(fb)[0])
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
