#!/usr/bin/env python3
"""Time every DuckDB oracle statement; fail if any exceeds the budget.

The round-9 failure mode: two oracle statements (q_remove_top,
q_pca_power) took 517 s / 75 s in DuckDB at sf0.01 because their
chained power-iteration CTEs were re-inlined exponentially, blowing the
driver harness's time budget and zeroing CORRECTNESS_r09.json — a
failure invisible to `sbt test` and to the Spark-side Verify dump.
This guard runs driver-side (python + duckdb, not library code) after
every Verify dump and fails loudly if any single oracle statement is
slower than PER_QUERY_BUDGET_S or the whole suite exceeds
SUITE_BUDGET_S at sf0.01.

Usage: python3 scripts/time_oracles.py [SF_DIR] [ORACLE_JSON]
Defaults: /root/testdata/sf0.01 /tmp/verify_out/oracle_sql.json
Exit code 1 on any budget violation.
"""
import sys, os, json, glob, time

import duckdb

PER_QUERY_BUDGET_S = 10.0
SUITE_BUDGET_S = 60.0

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
oracle_path = (sys.argv[2] if len(sys.argv) > 2
               else "/tmp/verify_out/oracle_sql.json")

con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(
        f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(oracle_path))
slow, total = [], 0.0
for name, sql in sorted(oracles.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
    except Exception as exc:  # noqa: BLE001 - report and keep timing
        print(f"ERROR {name}: {exc}")
        slow.append((name, float("inf")))
        continue
    dt = time.time() - t0
    total += dt
    if dt > 1.0:
        print(f"{name}: {dt:.1f} s")
    if dt > PER_QUERY_BUDGET_S:
        slow.append((name, dt))

print(f"suite total: {total:.1f} s over {len(oracles)} oracles")
ok = not slow and total <= SUITE_BUDGET_S
if slow:
    print("BUDGET VIOLATIONS (> %.0f s):" % PER_QUERY_BUDGET_S)
    for name, dt in slow:
        print(f"  {name}: {dt:.1f} s")
if total > SUITE_BUDGET_S:
    print(f"SUITE OVER BUDGET: {total:.1f} s > {SUITE_BUDGET_S:.0f} s")
sys.exit(0 if ok else 1)
