#!/usr/bin/env bash
# Round-open hygiene: commit any driver artifacts left as working-tree drift
# from the previous round (BENCH_r*.json, CORRECTNESS_r*.json, VERDICT.md,
# ADVICE.md, LEAKCHECK.json, COPYCHECK.json, bench_local.json), then verify
# the tree is clean before new round work begins.
#
# The driver writes these files AFTER the round's last builder commit, so
# unless the driver itself commits them they appear as drift at the next
# round open (VERDICT r11 "What's wrong" #3). Run this FIRST each round.
set -euo pipefail
cd "$(dirname "$0")/.."

DRIFT=$(git status --porcelain -- \
  'BENCH_r*.json' 'CORRECTNESS_r*.json' VERDICT.md ADVICE.md \
  LEAKCHECK.json COPYCHECK.json bench_local.json BASELINE.json || true)

if [[ -n "$DRIFT" ]]; then
  echo "Committing previous round's driver artifacts:"
  echo "$DRIFT"
  git add BENCH_r*.json CORRECTNESS_r*.json VERDICT.md ADVICE.md \
    LEAKCHECK.json COPYCHECK.json bench_local.json BASELINE.json 2>/dev/null || true
  git commit -m "Commit previous round's driver artifacts at round open"
else
  echo "No driver-artifact drift."
fi

REST=$(git status --porcelain)
if [[ -n "$REST" ]]; then
  echo "WARNING: tree not clean after artifact commit:" >&2
  echo "$REST" >&2
  exit 1
fi
echo "Tree clean — round open OK."
