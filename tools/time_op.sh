#!/bin/bash
# Time a single SparkEntry op: tools/time_op.sh <opname> [sfdir]
OP=$1; SF=${2:-/root/testdata/sf0.001}
SPARK_GRAFT_CPUS=8 timeout 300 sbt -batch "runMain graft.TimeOp $OP $SF" 2>&1 | grep -E "TIMEOP|error" | head -5
