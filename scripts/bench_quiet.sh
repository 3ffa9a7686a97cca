#!/usr/bin/env bash
# Canary-gated full-suite bench (VERDICT r12 item 1, acceptance rule made
# BINDING per VERDICT r13 item 3): refuse to RECORD a bench run on a
# contended host. Pre-gates with tools.CanaryGate (the same CPU + shuffle
# probes Bench embeds in its artifact), runs the full suite only when
# quiet, then applies THE acceptance rule to the artifact's own canaries.
#
# Acceptance rule (the committed number and the gate agree by construction
# — only an artifact this script exits 0 on may be committed):
#   canary_first        <= maxCpu          (CPU quiet at open)
#   canary_last         <= maxCpu * 1.15   (CPU quiet at close; slight warm
#                                           drift tolerated)
#   canary_shuffle_last <= maxShuffle      (the run ENDS inside the band)
# The opening in-artifact shuffle canary is reported but not binding: the
# pre-gate already proved the host quiet seconds earlier, and the first
# in-artifact probe races the suite's cold page-cache warmup (r13's
# refused-then-promoted 238.7s run read 1.85 there while both CPU probes
# and the closing shuffle probe sat in band — that promotion-by-hand is
# exactly what this codified rule replaces).
#
# Usage: scripts/bench_quiet.sh [outJson] [sfDir]
#   outJson default: /tmp/bench_quiet.json (the one-line JSON from Bench)
# Exit 0 = an ACCEPTED run was recorded at outJson (bench_local.json is
# also refreshed by Bench itself). Exit 1 = host loud at pre-gate. Exit 2 =
# run completed but failed the acceptance rule (artifact left at
# outJson.loud for inspection, NOT to be committed). Exit 4 = bench
# produced no artifact line (crash — see the run log), distinct from
# "host loud" for callers scripting on exit codes (ADVICE r13).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/bench_quiet.json}"
SF="${2:-/root/testdata/sf0.1}"
MAX_SH="${SPARK_GRAFT_MAX_SHUFFLE:-1.3}"
MAX_CPU="${SPARK_GRAFT_MAX_CPU:-0.45}"
RUN_LOG="${OUT}.run.log"

echo "== canary pre-gate (max shuffle $MAX_SH, max cpu $MAX_CPU) =="
if ! scripts/run_graft.sh graft.tools.CanaryGate "$MAX_SH" "$MAX_CPU" \
    2>/dev/null | tee /tmp/canary_gate.json | grep -q '"quiet":true'; then
  echo "host LOUD — refusing to record a bench artifact" >&2
  cat /tmp/canary_gate.json >&2 || true
  exit 1
fi

echo "== full bench at $SF =="
if ! SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
    scripts/run_graft.sh graft.Bench > "$RUN_LOG" 2>/dev/null; then
  echo "bench run FAILED (non-zero exit, no artifact) — see $RUN_LOG" >&2
  exit 4
fi
if ! grep '"metric"' "$RUN_LOG" | tail -1 > "$OUT" || [ ! -s "$OUT" ]; then
  echo "bench produced no artifact line — see $RUN_LOG" >&2
  exit 4
fi

# the binding acceptance rule (see header)
rc=0
python3 - "$OUT" "$MAX_SH" "$MAX_CPU" <<'EOF' || rc=$?
import json, sys
art = json.load(open(sys.argv[1])); max_sh = float(sys.argv[2]); max_cpu = float(sys.argv[3])
shf, shl = art["canary_shuffle_first"], art["canary_shuffle_last"]
cf, cl = art["canary_first"], art["canary_last"]
ok = cf <= max_cpu and cl <= max_cpu * 1.15 and shl <= max_sh
print(f"canaries: cpu {cf}->{cl}, shuffle {shf}->{shl} (first informational), accepted={ok}")
sys.exit(0 if ok else 3)
EOF
if [ $rc -ne 0 ]; then
  mv "$OUT" "$OUT.loud"
  echo "run failed the acceptance rule — artifact moved to $OUT.loud (do not commit)" >&2
  exit 2
fi
echo "ACCEPTED run recorded at $OUT"
