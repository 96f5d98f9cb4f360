#!/usr/bin/env bash
# Streaming-ingest crash/replay chaos run (VERDICT r10 #5, streaming half).
# Drives graft.ChaosStreamIngest through its four phases and compares the
# crashed-and-resumed sinks against the undisturbed control:
#
#   sbt -batch compile
#   tools/chaos_stream.sh /tmp/chaos_stream
#
# Phase `victim` EXITS 137 on purpose (Runtime.halt mid-stream). Phase
# `resume` deletes the newest commit marker first, so Spark recovery
# genuinely RE-EXECUTES an already-written batch — the at-least-once
# replay the ingest_batch dynamic-overwrite idempotency exists for.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
DIR="${1:-/tmp/chaos_stream}"
rm -rf "$DIR"
mkdir -p "$DIR"

run() { GRAFT_MAIN=graft.ChaosStreamIngest "$HERE/run_verify.sh" "$@"; }

run prep    "$DIR"
run control "$DIR"
if run victim "$DIR"; then
  echo "[chaos-stream] ERROR: victim did not crash"; exit 1
else
  echo "[chaos-stream] victim crashed as designed (exit $?)"
fi
run resume  "$DIR"

python3 - "$DIR" <<'EOF'
import sys, pandas as pd
d = sys.argv[1]
ok = True
for sink in ("corpus", "index", "rejects"):
    a = pd.read_parquet(f"{d}/control/{sink}")
    b = pd.read_parquet(f"{d}/victim/{sink}")
    cols = sorted(a.columns)
    ka = a[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    kb = b[cols].astype(str).sort_values(by=cols).reset_index(drop=True)
    same = ka.equals(kb)
    ok &= same
    print(f"[chaos-stream] {sink}: control={len(a)} victim={len(b)} "
          f"identical={same}")
print("[chaos-stream] RESULT:", "IDENTICAL" if ok else "DIVERGED")
sys.exit(0 if ok else 1)
EOF
