#!/usr/bin/env bash
# Canary-gated full-suite bench (VERDICT r12 item 1): refuse to RECORD a
# bench run on a contended host. Pre-gates with tools.CanaryGate (the same
# CPU + shuffle probes Bench embeds in its artifact), runs the full suite
# only when quiet, then post-checks the artifact's own first/last canaries
# so a run that turned loud mid-sweep is rejected too.
#
# Usage: scripts/bench_quiet.sh [outJson] [sfDir]
#   outJson default: /tmp/bench_quiet.json (the one-line JSON from Bench)
# Exit 0 = a quiet run was recorded at outJson (bench_local.json is also
# refreshed by Bench itself). Exit 1 = host loud at pre-gate. Exit 2 =
# run completed but its own canaries breached the band (artifact left at
# outJson.loud for inspection, NOT to be committed).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/bench_quiet.json}"
SF="${2:-/root/testdata/sf0.1}"
MAX_SH="${SPARK_GRAFT_MAX_SHUFFLE:-1.3}"
MAX_CPU="${SPARK_GRAFT_MAX_CPU:-0.45}"

echo "== canary pre-gate (max shuffle $MAX_SH, max cpu $MAX_CPU) =="
if ! scripts/run_graft.sh graft.tools.CanaryGate "$MAX_SH" "$MAX_CPU" \
    2>/dev/null | tee /tmp/canary_gate.json | grep -q '"quiet":true'; then
  echo "host LOUD — refusing to record a bench artifact" >&2
  cat /tmp/canary_gate.json >&2 || true
  exit 1
fi

echo "== full bench at $SF =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  scripts/run_graft.sh graft.Bench 2>/dev/null | grep '"metric"' | tail -1 > "$OUT"

# post-check: the artifact's own first/last canaries must sit in the band
# (tolerate last up to 1.15× the gate — a full sweep warms page cache and
# drifts slightly even on a quiet host)
rc=0
python3 - "$OUT" "$MAX_SH" "$MAX_CPU" <<'EOF' || rc=$?
import json, sys
art = json.load(open(sys.argv[1])); max_sh = float(sys.argv[2]); max_cpu = float(sys.argv[3])
shf, shl = art["canary_shuffle_first"], art["canary_shuffle_last"]
cf, cl = art["canary_first"], art["canary_last"]
ok = shf <= max_sh and shl <= max_sh * 1.15 and cf <= max_cpu and cl <= max_cpu * 1.15
print(f"canaries: cpu {cf}->{cl}, shuffle {shf}->{shl}, quiet={ok}")
sys.exit(0 if ok else 3)
EOF
if [ $rc -ne 0 ]; then
  mv "$OUT" "$OUT.loud"
  echo "run turned LOUD mid-sweep — artifact moved to $OUT.loud (do not commit)" >&2
  exit 2
fi
echo "quiet run recorded at $OUT"
