#!/usr/bin/env python3
"""Rewrite every parquet table in a testdata dir with a seeded row-order
permutation — the input half of the permuted-input sweep (verify recipe):
any engine output that differs between the original and permuted inputs is
input-order sensitivity, i.e. a latent hash flake under repartitioning
(the q_unpivot lesson: a non-total ORDER BY rode encounter order and both
engines agreed only by shared file order).

Usage: permute_inputs.py <srcDir> <dstDir> <seed>
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src, dst, seed = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
rng = np.random.default_rng(seed)
for f in sorted(os.listdir(src)):
    if not f.endswith(".parquet"):
        continue
    t = pq.read_table(os.path.join(src, f))
    idx = rng.permutation(t.num_rows)
    pq.write_table(t.take(pa.array(idx)), os.path.join(dst, f))
    print(f, t.num_rows, "permuted")
