#!/usr/bin/env python3
"""Whole-inventory determinism sweep: diff two Verify dumps pairwise.

Usage:
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify <sfDir> /tmp/det_a"
  SPARK_GRAFT_CPUS=5 sbt -batch "runMain graft.Verify <sfDir> /tmp/det_b"
  python3 tools/check_determinism.py /tmp/det_a /tmp/det_b

Running the two dumps at DIFFERENT core counts varies partitioning,
task scheduling, and AQE decisions — any query whose result depends on
them (float re-association, unpinned ties, re-executed nondeterministic
subtrees like the old assignContiguousIds) diffs here even when a
single run hash-matches its oracle by luck. Exit 0 = every query's
row multiset is identical across the two runs.
"""
import os, sys
import pandas as pd

a, b = sys.argv[1], sys.argv[2]
names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
diff, missing = [], []
for n in names:
    pb = os.path.join(b, n)
    if not os.path.isdir(pb):
        missing.append(n)
        continue
    da = pd.read_parquet(os.path.join(a, n))
    db = pd.read_parquet(pb)
    if list(da.columns) != list(db.columns):
        diff.append((n, "schema"))
        continue
    if len(da) != len(db):
        diff.append((n, f"rows {len(da)} vs {len(db)}"))
        continue
    ka = da.astype(str).sort_values(by=list(da.columns)).reset_index(drop=True)
    kb = db.astype(str).sort_values(by=list(db.columns)).reset_index(drop=True)
    if not ka.equals(kb):
        diff.append((n, "values"))
print(f"checked: {len(names)}  missing-in-b: {missing}")
print("NONDETERMINISTIC:", diff if diff else "none")
sys.exit(1 if (diff or missing) else 0)
