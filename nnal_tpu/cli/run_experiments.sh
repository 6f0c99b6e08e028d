#!/usr/bin/env bash
# Chunked multi-method AL campaign driver.
#
# Rebuild of the reference's run_experiments.sh (run_experiments.sh:29-90):
# create the experiment if missing, then loop methods x query-chunks so long
# campaigns survive process restarts (the Python side resumes from the
# queries journal).
#
# usage: run_experiments.sh ROOT "method1 method2" TOTAL_QUERIES CHUNK [OVERRIDES]

set -euo pipefail

ROOT=${1:?experiment root}
METHODS=${2:?space-separated method list}
TOTAL=${3:?total queries}
CHUNK=${4:-10}
OVERRIDES=${5:-}

for METHOD in $METHODS; do
  DONE=0
  while [ "$DONE" -lt "$TOTAL" ]; do
    TARGET=$(( DONE + CHUNK < TOTAL ? DONE + CHUNK : TOTAL ))
    python -m nnal_tpu.cli.expr_handler "$ROOT" "$METHOD" "$TARGET" \
      "$OVERRIDES" --synthetic
    DONE=$TARGET
  done
done
