#!/usr/bin/env python3
"""Per-query bench regression gate (r8 verdict item #4).

Diffs a freshly-recorded bench record against the last committed one and
FAILS (exit 1) when any shared query regressed by BOTH ratio > 1.5x AND
delta > +0.5s. The double condition keeps the gate quiet on ambient
machine variance (+-20% measured in r8) and on sub-second queries whose
ratios swing on scheduler noise, while catching the real thing: a query
that got materially slower in absolute terms.

Usage:
  python3 tools/check_bench_regression.py [NEW.json] [BASE.json]
defaults: NEW = BENCH_LOCAL.json in the working tree,
          BASE = BENCH_LOCAL.json at HEAD (git show HEAD:BENCH_LOCAL.json).

Run this BEFORE committing a re-recorded BENCH_LOCAL.json — it is the
check the r8 round was missing when 80 legacy queries drifted 1.3x
without anything naming it.
"""
import json
import subprocess
import sys

RATIO = 1.5
DELTA = 0.5
# Adjudication tier (VERDICT r11 #5): a query drifting past 1.7x used to
# surface only at the judge's 2.0x cross-round gate a round LATE
# (embed_decontaminate closed r11 at 1.95x unadjudicated). Anything
# crossing this tier gets named loudly so the PERF_DRIFT old-tree
# protocol runs the round it appears; it does not fail the gate.
ADJ_RATIO = 1.7
ADJ_DELTA = 0.3


def queries(rec):
    if "queries" in rec and rec["queries"]:
        return {k: float(v) for k, v in rec["queries"].items()}
    return {k: float(v["median"]) for k, v in rec["detail"].items()}


def load_new(path):
    with open(path) as f:
        return json.load(f)


def load_base(path, new_path="BENCH_LOCAL.json"):
    if path is not None:
        with open(path) as f:
            return json.load(f)
    # default baseline: the committed copy of the SAME record (so this
    # gate works for BENCH_LOCAL.json and BENCH_SF1.json alike)
    import os
    name = os.path.basename(new_path)
    out = subprocess.run(
        ["git", "show", f"HEAD:{name}"],
        capture_output=True, text=True)
    if out.returncode != 0:
        print(f"no committed {name} at HEAD; nothing to compare")
        sys.exit(0)
    return json.loads(out.stdout)


def main():
    new_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else None
    new = queries(load_new(new_path))
    base = queries(load_base(base_path, new_path))
    shared = sorted(set(new) & set(base))
    if not shared:
        print("no shared queries between records; nothing to compare")
        sys.exit(0)

    regressions = []
    drift = []
    adjudicate = []
    for q in shared:
        b, n = base[q], new[q]
        ratio = n / b if b > 0 else float("inf")
        delta = n - b
        if ratio > RATIO and delta > DELTA:
            regressions.append((q, b, n, ratio, delta))
        elif ratio > ADJ_RATIO and delta > ADJ_DELTA:
            adjudicate.append((q, b, n, ratio, delta))
        elif ratio > 1.3:
            drift.append((q, b, n, ratio, delta))

    tb, tn = sum(base[q] for q in shared), sum(new[q] for q in shared)
    print(f"shared queries: {len(shared)}  base total {tb:.1f}s  "
          f"new total {tn:.1f}s  ratio {tn / tb:.3f}")
    print(f"new-only: {len(set(new) - set(base))}  "
          f"removed: {len(set(base) - set(new))}")

    if adjudicate:
        print(f"\nADJUDICATE (ratio>{ADJ_RATIO}x AND >+{ADJ_DELTA}s — run "
              f"the PERF_DRIFT old-tree protocol THIS round): "
              f"{len(adjudicate)}")
        for q, b, n, r, d in sorted(adjudicate, key=lambda x: -x[4]):
            print(f"  {q:32s} {b:7.3f}s -> {n:7.3f}s  ({r:.2f}x, {d:+.2f}s)")

    if drift:
        print(f"\nnon-fatal drift (ratio>1.3 but under the "
              f">{RATIO}x AND >+{DELTA}s gate): {len(drift)}")
        for q, b, n, r, d in sorted(drift, key=lambda x: -x[4])[:10]:
            print(f"  {q:32s} {b:7.3f}s -> {n:7.3f}s  ({r:.2f}x, {d:+.2f}s)")

    if regressions:
        print(f"\nFAIL: {len(regressions)} quer"
              f"{'y' if len(regressions) == 1 else 'ies'} regressed "
              f">{RATIO}x AND >+{DELTA}s:")
        for q, b, n, r, d in sorted(regressions, key=lambda x: -x[4]):
            print(f"  {q:32s} {b:7.3f}s -> {n:7.3f}s  ({r:.2f}x, {d:+.2f}s)")
        sys.exit(1)
    print("\nPASS: no query regressed beyond the gate")
    sys.exit(0)


if __name__ == "__main__":
    main()
