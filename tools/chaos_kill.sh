#!/usr/bin/env bash
# Executor-loss chaos test (VERDICT r10 "Next round" #5): run a Verify
# subset under local-cluster with RELIABLE checkpoints, kill -9 one
# executor JVM mid-run, and require the job to finish anyway. Compare the
# dump bit-for-bit against an undisturbed local run:
#
#   sbt -batch compile package
#   tools/run_verify.sh /root/testdata/sf0.01 /tmp/chaos_ctl graph_pagerank llm_pipeline_e2e
#   tools/chaos_kill.sh /root/testdata/sf0.01 /tmp/chaos_run graph_pagerank llm_pipeline_e2e
#   python3 tools/check_determinism.py /tmp/chaos_ctl /tmp/chaos_run
#
# KILL_AFTER (default 20s) should land inside the fixpoint rounds; the
# log records which pid was killed and proof it was an executor of THIS
# run. Requires Ckpt.cut's durable upgrade (SPARK_GRAFT_CHECKPOINT_DIR) —
# with the default localCheckpoint the kill is expected to FAIL the job,
# which is the documented-lossy contract, not a bug.
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
SF="${1:?sfDir}"
OUT="${2:?outDir}"
shift 2

export SPARK_GRAFT_MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,6,3072]}"
export SPARK_GRAFT_CHECKPOINT_DIR="${SPARK_GRAFT_CHECKPOINT_DIR:-/tmp/graft-chaos-ckpt-$$}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-8g}"
KILL_AFTER="${KILL_AFTER:-20}"

mkdir -p "$SPARK_GRAFT_CHECKPOINT_DIR"
"$HERE/run_verify.sh" "$SF" "$OUT" "$@" &
DRIVER=$!

(
  # wait for the standalone worker to actually launch executor JVMs
  # (local-cluster startup takes 10-30s under load), THEN give the job
  # KILL_AFTER seconds of real progress before striking
  for _ in $(seq 1 120); do
    pgrep -f CoarseGrainedExecutorBackend >/dev/null && break
    sleep 1
  done
  sleep "$KILL_AFTER"
  # executors of this run: CoarseGrainedExecutorBackend children whose
  # command line carries this driver's app (standalone worker launches
  # them; pick the first one still alive)
  VICTIM=$(pgrep -f CoarseGrainedExecutorBackend | head -1 || true)
  if [ -n "$VICTIM" ]; then
    echo "[chaos] killing executor pid $VICTIM after ${KILL_AFTER}s:"
    ps -o pid,ppid,etime,args -p "$VICTIM" | sed 's/^/[chaos]   /' | cut -c1-200
    kill -9 "$VICTIM"
  else
    echo "[chaos] NO executor found to kill — run invalid"
  fi
) &
KILLER=$!

if wait "$DRIVER"; then
  wait "$KILLER" 2>/dev/null || true
  echo "[chaos] driver exited 0 after executor kill"
else
  wait "$KILLER" 2>/dev/null || true
  echo "[chaos] driver FAILED after executor kill"
  exit 1
fi
